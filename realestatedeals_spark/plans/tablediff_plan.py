"""T-diff — snapshot reconciliation query over the orders table.

Diffs ``orders`` against a deterministically mutated copy (keys ≡0 mod 97
deleted, prices ≡0 mod 89 bumped, keys ≡0 mod 101 re-inserted shifted by
1e9) through the bucketed Merkle-style ``table_diff`` operator. The oracle
states the expected diff SET directly from the mutation rules — so a hash
match proves the two-phase digest + drill-down finds exactly the mutated
keys, no more, no less (a false bucket match would LOSE a row; a hash
mismatch in the drill-down would invent one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register

_TDIFF_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, 'removed' AS status
FROM orders WHERE o_orderkey % 97 = 0
UNION ALL
SELECT CAST(o_orderkey AS BIGINT), 'changed'
FROM orders WHERE o_orderkey % 97 <> 0 AND o_orderkey % 89 = 0
UNION ALL
SELECT CAST(o_orderkey + 1000000000 AS BIGINT), 'added'
FROM orders WHERE o_orderkey % 101 = 0
"""


@register("t_table_diff", oracle=_TDIFF_ORACLE, tags=("diff", "reconciliation"))
def t_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realestatedeals_spark.operators.tablediff import table_diff

    cols = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    left = load_table(spark, sf_dir, "orders").select("o_orderkey", *cols)
    surviving = left.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1).otherwise(
            F.col("o_totalprice")
        ),
    )
    inserted = left.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 1000000000
    )
    right = surviving.unionByName(inserted)
    return table_diff(left, right, "o_orderkey", cols).select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"), "status"
    )
