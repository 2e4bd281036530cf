"""HTTP ingest edge (SURVEY.md §2a.1 S1-S4, §7 step 5).

The reference scrapes listings single-threaded: a per-zip page loop with
predicates encoded in the URL (ure_scraping.py:19-49, hunter.py:20) and an
N+1 detail GET per listing (ure_scraping.py:216). Spark shape:

- a **task DataFrame** of (zip, page) drives the fetch — embarrassingly
  parallel across executors (the reference's ``for zip`` loop, main.py:113);
- predicates ride along as source options and are formatted into each URL —
  predicate pushdown to the source, same role as parquet PushedFilters (F1);
- fetching happens in ``mapInPandas`` with one session per partition
  (connection reuse, the reference's ``requests.Session``,
  ure_scraping.py:20);
- the N+1 detail fetch becomes a second batched fetch stage over the
  listing keys — a lookup join, not a per-row round trip;
- HTML → columns is vectorized pandas ``str.extract`` over the raw ``html``
  column (S2's "semi-structured projection"); the relational core then uses
  the scalar expression library (functions.scalars) — no Python in the hot
  path after the ingest edge.

Tests inject a recorded-fixture fetcher; nothing here ever hits a live site
in CI (SURVEY.md §7 step 5).
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Fetcher = Callable[[str], str]

# Deterministic retry schedule: attempt k (1-based) sleeps
# backoff_s * 2**(k-1) before retrying — fixed, jitter-free, so tests can
# assert the exact schedule. At the ingest edge retries happen INSIDE the
# partition task (no Spark task retry, which would re-fetch every URL in
# the partition for one bad page).
_DEFAULT_MAX_ATTEMPTS = 3
_DEFAULT_BACKOFF_S = 0.25


def fetch_with_retry(
    fetch: Fetcher,
    url: str,
    max_attempts: int = _DEFAULT_MAX_ATTEMPTS,
    backoff_s: float = _DEFAULT_BACKOFF_S,
    sleeper: Callable[[float], None] = time.sleep,
) -> tuple[str | None, str | None]:
    """(text, None) on success, (None, typed error string) after
    ``max_attempts`` failures — the quarantine seam: a dead page becomes a
    typed ``fetch_error`` row (the io_corrupt_scan pattern), never a task
    failure that kills the whole partition's fetches. The error string is
    deterministic (exception type + message + attempt count), so
    quarantine rows are stable query output."""
    if max_attempts < 1:
        raise ValueError("max_attempts must be >= 1")
    last: Exception | None = None
    for attempt in range(1, max_attempts + 1):
        try:
            return fetch(url), None
        except Exception as exc:  # requests and fakes raise hetero types
            last = exc
            if attempt < max_attempts:
                sleeper(backoff_s * 2 ** (attempt - 1))
    return None, (
        f"FetchError after {max_attempts} attempts: "
        f"{type(last).__name__}: {last}"
    )

# URL template with pushed-down predicates — parameter names follow the
# public site's query interface the reference targets (hunter.py:20).
URE_SEARCH_TEMPLATE = (
    "https://www.utahrealestate.com/search/form.result/page/{page}"
    "?geo_zip={zip}&listprice2={max_price}&tot_sqf1={min_sqft}&dim_acres1={min_lot}"
)


def default_fetcher_factory() -> Fetcher:
    """One HTTP session per partition (import-gated; tests inject fakes)."""
    import requests

    session = requests.Session()

    def fetch(url: str) -> str:
        resp = session.get(url, timeout=30)
        resp.raise_for_status()
        return resp.text

    return fetch


def scrape_tasks(spark: SparkSession, zips: list[str], max_pages: int = 10) -> DataFrame:
    """(zip, page) task frame — the unit of parallelism. Repartitioned so
    each executor core gets work even when one zip has many pages."""
    rows = [(z, p) for z in zips for p in range(1, max_pages + 1)]
    df = spark.createDataFrame(rows, "zip string, page int")
    return df.repartition(min(len(rows), 64))


def fetch_pages(
    tasks: DataFrame,
    fetcher_factory: Callable[[], Fetcher] = default_fetcher_factory,
    url_template: str = URE_SEARCH_TEMPLATE,
    max_price: int = 15_000_000,
    min_sqft: int = 750,
    min_lot: float = 0.01,
    max_attempts: int = _DEFAULT_MAX_ATTEMPTS,
    backoff_s: float = _DEFAULT_BACKOFF_S,
    sleeper: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """S1 — fetch each task's page; empty pages yield no rows (the
    reference's stop-at-empty-page, ure_scraping.py:36-38, becomes
    filter-at-source). Transient failures retry with deterministic
    backoff inside the partition; a page still dead after ``max_attempts``
    yields a QUARANTINE row (html null, typed ``fetch_error``) instead of
    failing the task — the reference aborts its whole zip loop on one bad
    GET (ure_scraping.py:29); at 100 TB one dead URL must not re-run a
    partition of good ones. Filter ``fetch_error IS NULL`` for the happy
    path; the quarantine rows are the retry queue."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = fetcher_factory()
        for pdf in batches:
            htmls, zips_, pages, errs = [], [], [], []
            for z, p in zip(pdf["zip"], pdf["page"]):
                url = url_template.format(
                    page=p, zip=z, max_price=max_price, min_sqft=min_sqft, min_lot=min_lot
                )
                html, err = fetch_with_retry(
                    fetch, url, max_attempts, backoff_s, sleeper
                )
                if err is not None:
                    htmls.append(None)
                    zips_.append(z)
                    pages.append(p)
                    errs.append(err)
                elif html and "listing-card" in html:
                    htmls.append(html)
                    zips_.append(z)
                    pages.append(p)
                    errs.append(None)
            yield pd.DataFrame(
                {"zip": zips_, "page": pages, "html": htmls, "fetch_error": errs}
            )

    return tasks.mapInPandas(
        run, schema="zip string, page int, html string, fetch_error string"
    )


# one listing card per match; fields extracted vectorized below
_CARD_RE = re.compile(r'<div class="listing-card"[^>]*data-mls="(?P<mls>\d+)".*?</div>\s*</div>', re.S)
_FIELD_RES = {
    "priceStr": re.compile(r'<span class="price">([^<]*)</span>'),
    "full_address": re.compile(r'<span class="address">([^<]*)</span>'),
    "stats": re.compile(r'<span class="stats">([^<]*)</span>'),
    "agent_name": re.compile(r'<span class="agent">([^<]*)</span>'),
    "agent_phone": re.compile(r'<span class="agent-phone">([^<]*)</span>'),
    "broker_name": re.compile(r'<span class="broker">([^<]*)</span>'),
}


def extract_cards(pages: DataFrame) -> DataFrame:
    """S2 — HTML → one raw string row per listing card (mapInPandas; the
    per-field typing happens relationally in ``parse_listings``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("zip", "page", "mls", *_FIELD_RES)}
            for z, p, html in zip(pdf["zip"], pdf["page"], pdf["html"]):
                for m in _CARD_RE.finditer(html or ""):
                    card = m.group(0)
                    out["zip"].append(z)
                    out["page"].append(p)
                    out["mls"].append(m.group("mls"))
                    for field, rx in _FIELD_RES.items():
                        fm = rx.search(card)
                        out[field].append(fm.group(1).strip() if fm else None)
            yield pd.DataFrame(out)

    schema = "zip string, page int, mls string, priceStr string, full_address string, stats string, agent_name string, agent_phone string, broker_name string"
    return pages.mapInPandas(run, schema=schema)


def parse_listings(cards: DataFrame) -> DataFrame:
    """S2 (typed projection) — raw card fields → the listing row model using
    the scalar expression library; every parse failure defaults per the
    reference's lenient semantics (T14)."""
    from realestatedeals_spark.functions.scalars import (
        normalize_phone,
        parse_address,
        parse_price,
        parse_sqft,
        ppsqft,
        split_name_first,
        split_name_last,
    )

    addr = parse_address(F.col("full_address"))
    price = parse_price(F.col("priceStr"))
    sqft = parse_sqft(F.col("stats"))
    return cards.select(
        "mls",
        price.alias("price"),
        "priceStr",
        addr["address"].alias("address"),
        addr["city"].alias("city"),
        addr["state"].alias("state"),
        addr["zip"].alias("zip"),
        sqft.alias("sqft"),
        ppsqft(price, sqft).alias("ppsqft"),
        "stats",
        F.col("agent_name"),
        split_name_first(F.col("agent_name")).alias("agent_first_name"),
        split_name_last(F.col("agent_name")).alias("agent_last_name"),
        normalize_phone(F.col("agent_phone")).alias("agent_phone"),
        "broker_name",
        F.current_timestamp().alias("foundDate"),
    )


def fetch_details(
    listings: DataFrame,
    fetcher_factory: Callable[[], Fetcher] = default_fetcher_factory,
    url_template: str = "https://www.utahrealestate.com/{mls}",
) -> DataFrame:
    """S3 — the reference's N+1 per-row detail GET (ure_scraping.py:213-253)
    as a separate batched fetch keyed on mls; join the result back instead of
    blocking the row pipeline. Returns (mls, detail_html, fetch_error) —
    same retry-then-quarantine contract as ``fetch_pages``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = fetcher_factory()
        for pdf in batches:
            htmls, errs = [], []
            for m in pdf["mls"]:
                html, err = fetch_with_retry(fetch, url_template.format(mls=m))
                htmls.append(html)
                errs.append(err)
            yield pd.DataFrame(
                {"mls": pdf["mls"], "detail_html": htmls, "fetch_error": errs}
            )

    return (
        listings.select("mls")
        .distinct()
        .mapInPandas(run, schema="mls string, detail_html string, fetch_error string")
    )


def parse_details(details: DataFrame) -> DataFrame:
    """S3 typed projection: days-on-market / type / style out of the detail
    page (ure_scraping.py:226-250 semantics via T12)."""
    from realestatedeals_spark.functions.scalars import numeric_tail, strip_label

    days = F.regexp_extract("detail_html", r'<span class="days-on">([^<]*)</span>', 1)
    typ = F.regexp_extract("detail_html", r'<span class="prop-type">([^<]*)</span>', 1)
    style = F.regexp_extract("detail_html", r'<span class="prop-style">([^<]*)</span>', 1)
    return details.select(
        "mls",
        numeric_tail(days).alias("days_on_ure"),
        strip_label(typ, "Type").alias("type"),
        strip_label(style, "Style").alias("style"),
    )


def scrape_pipeline(
    spark: SparkSession,
    zips: list[str],
    fetcher_factory: Callable[[], Fetcher],
    max_pages: int = 10,
    **predicates,
) -> DataFrame:
    """S1+S2+S3 end to end: tasks → fetch → extract → type → detail join."""
    pages = fetch_pages(scrape_tasks(spark, zips, max_pages), fetcher_factory, **predicates)
    listings = parse_listings(extract_cards(pages))
    details = parse_details(fetch_details(listings, fetcher_factory))
    return listings.join(details, on="mls", how="left")
