"""Z-order layout: measured row-group skipping, not just a sorted write.

Writes the same events slice twice — natural order vs Z-ordered on
(user_id, event_id) — with small parquet row groups, then uses the parquet
footers (pyarrow metadata, the same statistics a scan's predicate pushdown
consults) to count how many row groups a point predicate on EACH clustered
column could skip. The Z-ordered layout must prune substantially on both
columns simultaneously, which no single-column sort achieves.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from realestatedeals_spark.io.sinks import write_zordered


def _matching_row_groups(path: str, col: str, value) -> tuple[int, int]:
    """(row groups whose [min,max] admit value, total row groups)."""
    hit = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or (st.min <= value <= st.max):
                hit += 1
    return hit, total


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    from realestatedeals_spark.io.sources import load_events

    # sf0.01: enough rows for many small row groups (sf0.001 yields 1/file)
    ev = load_events(spark, "/root/testdata/sf0.01").select("event_id", "user_id", "value")
    natural, zordered = str(tmp_path / "nat"), str(tmp_path / "zo")
    small = {"parquet.block.size": 16 * 1024}
    ev.write.mode("overwrite").options(**small).parquet(natural)

    # write_zordered with the same small row groups, inlined option-wise
    from realestatedeals_spark.io.sinks import zorder_key

    base, key = zorder_key(ev, ["user_id", "event_id"])
    (
        base.withColumn("_zorder", key)
        .repartitionByRange(4, F.col("_zorder"))
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .options(**small)
        .parquet(zordered)
    )

    # layout must not change content
    a = spark.read.parquet(natural)
    b = spark.read.parquet(zordered)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0

    probe_user = ev.select("user_id").first()["user_id"]
    probe_event = ev.select("event_id").first()["event_id"]
    for col, val in (("user_id", probe_user), ("event_id", probe_event)):
        nat_hit, nat_total = _matching_row_groups(natural, col, val)
        zo_hit, zo_total = _matching_row_groups(zordered, col, val)
        assert zo_total >= 8, f"need multiple row groups to measure ({zo_total})"
        # the natural layout admits (almost) every row group on user_id; the
        # z-ordered one must admit at most half on BOTH clustered columns
        assert zo_hit / zo_total <= 0.5, (
            f"z-order failed to prune on {col}: {zo_hit}/{zo_total} row groups "
            f"admit {val} (natural: {nat_hit}/{nat_total})"
        )
