"""Record linkage: blocked fuzzy matching (entity-resolution family).

The classic two-phase shape — cheap blocking keys generate candidates, an
edit-distance verify confirms them — applied to the parts catalog as a
product-name near-duplicate match. This is the entity-level counterpart of
the X2 document dedup family: same candidates→verify architecture, but the
verifier is Levenshtein on short strings instead of Jaccard on shingle sets.

Cross-engine note: Spark's ``levenshtein`` (commons-text) and DuckDB's
``levenshtein`` compute the same standard unit-cost edit distance, so the
verify is oracle-exact (pinned in tests/test_linkage.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register

_J5_FUZZY_ORACLE = """
WITH p AS (
  SELECT p_partkey, p_name, p_size,
         string_split(p_name, ' ')[-1] AS noun
  FROM part)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM p a JOIN p b
  ON a.noun = b.noun AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 3
"""


def fuzzy_blocked_join(
    left: DataFrame,
    key: str,
    name: str,
    block_cols: list[F.Column] | None = None,
    max_dist: int = 3,
) -> DataFrame:
    """Blocked fuzzy self-join: candidates via equi-join on blocking keys,
    verified with Levenshtein ≤ ``max_dist``.

    Scale: the join is a plain shuffle equi-join on the blocking key — cost
    is Σ block_size², never n², so blocking-key design (not the verifier) is
    the knob that controls work; AQE's skew split handles a hot block. The
    edit-distance verify runs JVM-side inside codegen (no Python).
    """
    blocks = block_cols if block_cols is not None else [F.col(name)]
    p = left.select(
        F.col(key).alias("k"),
        F.col(name).alias("nm"),
        *[b.alias(f"blk{i}") for i, b in enumerate(blocks)],
    )
    a, b = p.alias("a"), p.alias("b")
    cond = F.col("a.k") < F.col("b.k")
    for i in range(len(blocks)):
        cond = cond & (F.col(f"a.blk{i}") == F.col(f"b.blk{i}"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
            F.col("a.nm").alias("name_a"),
            F.col("b.nm").alias("name_b"),
            F.levenshtein("a.nm", "b.nm").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


@register("j5_fuzzy_blocked_join", oracle=_J5_FUZZY_ORACLE, tags=("J5", "linkage", "dedup"))
def j5_fuzzy_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate product names: block on (head noun, size), verify
    Levenshtein ≤ 3. Candidate volume is bounded by the block structure
    (the catalog-dedup / customer-record-linkage pattern); at 100 TB the
    blocking key would add a phonetic or q-gram component, but the plan —
    equi-join candidates, codegen verify — is unchanged."""
    part = load_table(spark, sf_dir, "part")
    return fuzzy_blocked_join(
        part,
        key="p_partkey",
        name="p_name",
        block_cols=[F.element_at(F.split("p_name", " "), -1), F.col("p_size")],
    )
