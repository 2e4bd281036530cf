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


# -- ingest-edge resilience: retry-with-backoff + failure quarantine --------


def _flaky_factory(fail_first_n: int, exc=ConnectionError, record=None):
    """Fetcher factory whose fetch fails the first ``fail_first_n`` attempts
    PER URL, then serves the normal fixtures. Deterministic — attempt
    counts are keyed by URL, so Spark-side batching can't reorder them."""
    from tests.fixtures_html import fake_fetcher_factory

    def factory():
        inner = fake_fetcher_factory()
        attempts: dict[str, int] = {}

        def fetch(url: str) -> str:
            attempts[url] = attempts.get(url, 0) + 1
            if record is not None:
                record.append((url, attempts[url]))
            if attempts[url] <= fail_first_n:
                raise exc(f"transient failure #{attempts[url]}")
            return inner(url)

        return fetch

    return factory


def test_retry_succeeds_on_attempt_n(spark):
    """Every URL fails twice then succeeds: with 3 attempts the pipeline
    output is IDENTICAL to the no-failure run — retries are invisible."""
    from realestatedeals_spark.io.http_source import fetch_pages

    tasks = scrape_tasks(spark, ["84601"], max_pages=2)
    pages = fetch_pages(
        tasks, _flaky_factory(2), sleeper=lambda s: None
    )
    rows = pages.collect()
    assert len(rows) == 1 and rows[0]["fetch_error"] is None
    assert "listing-card" in rows[0]["html"]


def test_fail_forever_quarantines_typed_rows(spark):
    """A URL dead beyond max_attempts becomes a typed fetch_error row —
    the other tasks in the same partition still produce their pages (the
    reference aborts its whole loop on one bad GET)."""
    from realestatedeals_spark.io.http_source import fetch_pages

    tasks = scrape_tasks(spark, ["84601"], max_pages=2)
    pages = fetch_pages(
        tasks, _flaky_factory(10**9, exc=TimeoutError), sleeper=lambda s: None
    )
    rows = pages.collect()
    assert len(rows) == 2  # every task quarantined, none dropped
    assert all(r["html"] is None for r in rows)
    assert all(
        r["fetch_error"] == "FetchError after 3 attempts: TimeoutError: transient failure #3"
        for r in rows
    )


def test_partial_failure_keeps_good_pages(spark):
    """Only the page-2 URL is dead: page 1 serves its cards, page 2 lands
    in quarantine, and the happy-path filter splits them."""
    from realestatedeals_spark.io.http_source import fetch_pages
    from tests.fixtures_html import fake_fetcher_factory

    def factory():
        inner = fake_fetcher_factory()

        def fetch(url: str) -> str:
            if "page/2?" in url:
                raise ConnectionError("page 2 is down")
            return inner(url)

        return fetch

    tasks = scrape_tasks(spark, ["84601"], max_pages=2)
    pages = fetch_pages(tasks, factory, sleeper=lambda s: None)
    good = pages.filter(F.col("fetch_error").isNull())
    quarantined = pages.filter(F.col("fetch_error").isNotNull())
    assert good.count() == 1
    q = quarantined.collect()
    assert [(r["zip"], r["page"]) for r in q] == [("84601", 2)]
    assert "ConnectionError: page 2 is down" in q[0]["fetch_error"]


def test_backoff_schedule_is_deterministic():
    """The retry seam sleeps backoff_s * 2**(attempt-1) between attempts —
    exact schedule, no jitter; a slow-but-eventually-successful fetch (the
    injected sleeper stands in for wall-clock) retries on schedule."""
    from realestatedeals_spark.io.http_source import fetch_with_retry

    sleeps: list[float] = []
    calls = {"n": 0}

    def slow_then_ok(url: str) -> str:
        calls["n"] += 1
        if calls["n"] < 4:
            raise TimeoutError("read timed out")
        return "ok"

    text, err = fetch_with_retry(
        slow_then_ok, "u", max_attempts=4, backoff_s=0.5, sleeper=sleeps.append
    )
    assert (text, err) == ("ok", None)
    assert sleeps == [0.5, 1.0, 2.0]  # no sleep after the final success
    # fail-forever: sleeps only BETWEEN attempts, typed error out
    sleeps.clear()
    text, err = fetch_with_retry(
        lambda u: (_ for _ in ()).throw(ConnectionError("down")),
        "u", max_attempts=3, backoff_s=0.25, sleeper=sleeps.append,
    )
    assert text is None and err.startswith("FetchError after 3 attempts")
    assert sleeps == [0.25, 0.5]


def test_detail_fetch_quarantine_joins_as_nulls(spark):
    """A dead detail URL quarantines (mls kept, typed error); the pipeline
    left-join surfaces the listing with null detail fields instead of
    dying."""
    from realestatedeals_spark.io.http_source import fetch_details
    from tests.fixtures_html import fake_fetcher_factory

    def factory():
        inner = fake_fetcher_factory()

        def fetch(url: str) -> str:
            if url.endswith("/100002"):
                raise ConnectionError("detail page gone")
            return inner(url)

        return fetch

    listings = spark.createDataFrame(
        [("100001",), ("100002",)], "mls string"
    )
    det = fetch_details(listings, factory)
    rows = {r["mls"]: r for r in det.collect()}
    assert rows["100001"]["fetch_error"] is None
    assert rows["100001"]["detail_html"] is not None
    assert rows["100002"]["detail_html"] is None
    assert "ConnectionError: detail page gone" in rows["100002"]["fetch_error"]
