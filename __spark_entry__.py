"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship agent-dedup query (SURVEY.md §3.3 / §7
step 1) at sf0.001; ``queries()``/``oracle_sql()`` expose the full registry
from ``realestatedeals_spark.plans`` — one entry per implemented operator
from SURVEY.md §2, each with a DuckDB oracle unless inherently
non-SQL-expressible (those get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from realestatedeals_spark.plans import all_oracles, all_queries, flagship

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    return all_oracles()
