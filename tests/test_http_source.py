"""Ingest-edge tests against recorded HTML fixtures (never live sites)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realestatedeals_spark.io.http_source import (
    extract_cards,
    fetch_pages,
    parse_listings,
    scrape_pipeline,
    scrape_tasks,
)
from tests.fixtures_html import fake_fetcher_factory


def test_task_frame_shape(spark):
    tasks = scrape_tasks(spark, ["84601", "84101"], max_pages=3)
    assert tasks.count() == 6
    assert tasks.columns == ["zip", "page"]


def test_fetch_skips_empty_pages(spark):
    tasks = scrape_tasks(spark, ["84601"], max_pages=5)
    pages = fetch_pages(tasks, fake_fetcher_factory)
    assert pages.count() == 1  # only page 1 has cards — stop-at-empty as filter


def test_extract_and_parse(spark):
    tasks = scrape_tasks(spark, ["84601"], max_pages=2)
    cards = extract_cards(fetch_pages(tasks, fake_fetcher_factory))
    assert cards.count() == 3
    listings = parse_listings(cards)
    rows = {r["mls"]: r for r in listings.collect()}

    assert rows["100001"]["price"] == 450000
    assert rows["100001"]["city"] == "Provo"
    assert rows["100001"]["zip"] == "84601"
    assert rows["100001"]["sqft"] == 1800
    assert abs(rows["100001"]["ppsqft"] - 250.0) < 1e-9
    assert rows["100001"]["agent_phone"] == "+18015551234"

    # double-space address collapses (ure_scraping.py:173,180 semantics)
    assert rows["100002"]["city"] == "Salt Lake City"

    # lenient defaults (T14): bad price → 0, no sqft → 0 → ppsqft 0
    assert rows["100003"]["price"] == 0
    assert rows["100003"]["sqft"] == 0
    assert rows["100003"]["ppsqft"] == 0.0
    assert rows["100003"]["agent_last_name"] == ""
    assert rows["100003"]["agent_phone"] == "not-a-phone"  # passthrough branch


def test_full_pipeline_with_details(spark):
    out = scrape_pipeline(spark, ["84601"], fake_fetcher_factory, max_pages=2)
    rows = {r["mls"]: r for r in out.collect()}
    assert len(rows) == 3
    assert rows["100001"]["days_on_ure"] == 12
    assert rows["100001"]["type"] == "Condo"
    assert rows["100002"]["style"] == "2-Story"
