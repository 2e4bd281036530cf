"""CDC scenario tests (SURVEY.md §5 item 3): new / price_change / off_market
branches, including the off-market delete-from-state transition."""

from __future__ import annotations

from realestatedeals_spark.operators.cdc import classify_cdc, next_snapshot


def frames(spark):
    scraped = spark.createDataFrame(
        [("m1", 100), ("m2", 150), ("m4", 300)], ["mls", "price"]
    )
    snapshot = spark.createDataFrame(
        [("m1", 100), ("m2", 120), ("m3", 500)], ["mls", "price"]
    )
    return scraped, snapshot


def test_cdc_branches(spark):
    scraped, snapshot = frames(spark)
    out = {r["mls"]: r for r in classify_cdc(scraped, snapshot).collect()}
    assert "m1" not in out  # unchanged rows dropped (main.py:24-35 fallthrough)
    assert out["m2"]["status"] == "price_change"
    assert abs(out["m2"]["price_change_percentage"] - 25.0) < 1e-9  # main.py:49
    assert out["m3"]["status"] == "off_market"  # hunter.py:336-354
    assert out["m4"]["status"] == "new_listing"


def test_cdc_keep_unchanged(spark):
    scraped, snapshot = frames(spark)
    out = {r["mls"]: r["status"] for r in classify_cdc(scraped, snapshot, keep_unchanged=True).collect()}
    assert out["m1"] == "unchanged"


def test_next_snapshot_drops_off_market(spark):
    scraped, _ = frames(spark)
    keys = {r["mls"] for r in next_snapshot(scraped).collect()}
    assert keys == {"m1", "m2", "m4"}  # m3 (off-market) deleted, hunter.py:352
