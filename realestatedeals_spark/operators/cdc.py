"""Change-data-capture operators — the reference's snapshot-vs-scrape diff
(SURVEY.md §2a.4 J1/J3, §2a.6 C1/C5) as one full-outer join.

Reference shape: ``currentListings`` dict keyed on mls is probed per scraped
row (main.py:24-35) — new key ⇒ 'new_listing', price differs ⇒ 'price_change'
with pct (main.py:39-52); after the sweep, saved keys not seen this cycle ⇒
'off_market' + delete from state (hunter.py:336-354).

Spark shape: ONE ``full_outer`` equi-join on the key yields all three
branches; the next-state snapshot falls out of the same join (scraped side
where present, minus off-market keys). At scale both sides shuffle on the
key; when the scrape batch is much smaller than the snapshot, Spark/AQE
broadcasts it instead — no per-row probe loop anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realestatedeals_spark.functions.scalars import price_change_pct

STATUS_NEW = "new_listing"
STATUS_PRICE_CHANGE = "price_change"
STATUS_OFF_MARKET = "off_market"
STATUS_UNCHANGED = "unchanged"


def classify_cdc(
    scraped: DataFrame,
    snapshot: DataFrame,
    key: str = "mls",
    price: str = "price",
    keep_unchanged: bool = False,
) -> DataFrame:
    """Full-outer CDC join. Output columns: key, status, old_price, new_price,
    price_change_percentage.

    ``keep_unchanged=False`` mirrors the reference, which emits nothing for
    unchanged rows (main.py:24-35 falls through silently).
    """
    s = scraped.select(F.col(key), F.col(price).alias("new_price"))
    p = snapshot.select(F.col(key), F.col(price).alias("old_price"))
    joined = s.join(p, on=key, how="full_outer")

    status = (
        F.when(F.col("old_price").isNull(), F.lit(STATUS_NEW))
        .when(F.col("new_price").isNull(), F.lit(STATUS_OFF_MARKET))
        .when(F.col("new_price") != F.col("old_price"), F.lit(STATUS_PRICE_CHANGE))
        .otherwise(F.lit(STATUS_UNCHANGED))
    )
    out = joined.withColumn("status", status).withColumn(
        "price_change_percentage",
        F.when(
            F.col("status") == STATUS_PRICE_CHANGE,
            price_change_pct(F.col("new_price"), F.col("old_price")),
        ),
    )
    if not keep_unchanged:
        out = out.filter(F.col("status") != STATUS_UNCHANGED)
    return out.select(key, "status", "old_price", "new_price", "price_change_percentage")


def next_snapshot(scraped: DataFrame, key: str = "mls") -> DataFrame:
    """C4 — the state carried to the next cycle is exactly this cycle's scrape
    keyed+deduped on ``key`` (main.py:29,34 last-write-wins into the dict;
    off-market keys are deleted, hunter.py:352 — i.e. absent from the scrape).
    Deterministic last-write-wins via row_number over foundDate is in
    operators.dedup.dedup_by_key."""
    return scraped.dropDuplicates([key])
