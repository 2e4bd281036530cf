"""realestatedeals_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the jaesto/RealEstateDeals reference
(snapshot at /root/reference, read-only), re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession builder
- ``io``         : sources/sinks (parquet/CSV/JSON, nested-zip flatten, HTTP
                   ingest edge, Neo4j-shaped graph sink)
- ``functions``  : scalar column-expression library (reference transforms
                   T1-T14 from SURVEY.md §2a.3, plus text/vector functions)
- ``operators``  : relational operators — CDC join, anti-join dedup,
                   aggregations, LLM-pipeline ops (dedup/similarity/text)
- ``plans``      : the query registry exposed through ``__spark_entry__.py``
- ``streaming``  : Structured Streaming equivalents of the poll loop / CDC

Everything here is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"
