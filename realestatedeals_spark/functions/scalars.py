"""Scalar column-expression library — the reference's per-field transforms
(SURVEY.md §2a.3 T1-T14) as pure Spark column expressions.

The reference implements every one of these as row-at-a-time Python
(``Series.apply`` lambdas or inline parse code); here each is a built-in
column expression so the whole pipeline stays inside whole-stage codegen —
zero Python UDFs for the reference surface (SURVEY.md §2a.7).

Defaulting semantics (T14): the reference swallows every parse failure into a
per-field default (''/0/0.0/None, e.g. ure_scraping.py:70-80). We reproduce
the default via ``try_cast``/``coalesce`` so oracles can match it, but keep it
explicit at the expression level rather than scattered through parse code.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ppsqft(price: Column, sqft: Column) -> Column:
    """T1 — price per square foot; 0.0 when sqft is 0/null
    (ure_scraping.py:197 guards the divide the same way)."""
    return F.when(sqft > 0, price.cast("double") / sqft.cast("double")).otherwise(F.lit(0.0))


def parse_price(price_str: Column) -> Column:
    """T2 — '$1,234,567' → 1234567L; 0 on unparseable input
    (ure_scraping.py:75-80; Trulia variant trulia_scraper.py:71-73)."""
    digits = F.regexp_replace(price_str, r"[$,]", "")
    return F.coalesce(digits.try_cast("long"), F.lit(0).cast("long"))


def split_name_first(name: Column) -> Column:
    """T3 (first half) — first whitespace token (ure_scraping.py:122-125)."""
    return F.element_at(F.split(F.trim(name), r"\s+"), 1)


def split_name_last(name: Column) -> Column:
    """T3 (second half) — everything after the first token, space-joined;
    '' for single-token names (reference yields '' via join of empty list)."""
    parts = F.split(F.trim(name), r"\s+")
    return F.array_join(F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))), " ")


def parse_address(full: Column) -> dict[str, Column]:
    """T4 — 'addr, city, state zip' → components (ure_scraping.py:171-189).

    The reference splits on ', ' after collapsing double spaces
    (ure_scraping.py:173,180) and takes zip as the last 5 chars.
    Returns a dict of named columns so callers pick what they project.
    """
    cleaned = F.regexp_replace(full, r"\s{2,}", " ")
    parts = F.split(cleaned, r", ")
    return {
        "address": F.element_at(parts, 1),
        "city": F.element_at(parts, 2),
        "state": F.trim(F.substring(F.element_at(parts, -1), 1, 2)),
        "zip": F.substring(F.element_at(parts, -1), -5, 5),
    }


def parse_sqft(stats: Column) -> Column:
    """T5 — sqft out of the stats string. The reference slices fixed offsets
    ``[-12:-8]`` (ure_scraping.py:192); we extract the number before 'sqft'
    robustly and keep the 0-default."""
    num = F.regexp_replace(F.regexp_extract(stats, r"([\d,]+)\s*(?:sq\.?\s*ft|sqft)", 1), ",", "")
    return F.coalesce(num.try_cast("int"), F.lit(0))


def normalize_phone(phone: Column) -> Column:
    """T6 — phone normalization (data_loader.py:16-24, duplicated at
    utils.py:6-14 — one shared expression here).

    digits-only; 10 digits → '+1' + digits; 11 digits starting '1' →
    '+' + digits; anything else passes through unchanged; null → ''.
    """
    digits = F.regexp_replace(F.coalesce(phone, F.lit("")), r"[^0-9]", "")
    return (
        F.when(F.length(digits) == 10, F.concat(F.lit("+1"), digits))
        .when((F.length(digits) == 11) & digits.startswith("1"), F.concat(F.lit("+"), digits))
        .otherwise(F.coalesce(phone, F.lit("")))
    )


def capitalize_names(name: Column) -> Column:
    """T7 — per-word capitalization (data_processing.py:5-6) = initcap."""
    return F.initcap(name)


def city_tags(cities_csv: Column, suffix: str = " Utah Market") -> Column:
    """T8 — split a comma-joined city list, append the market suffix to each
    entry, rejoin (data_processing.py:27). Higher-order function, no UDF."""
    return F.array_join(
        F.transform(F.split(cities_csv, ","), lambda x: F.concat(F.trim(x), F.lit(suffix))),
        ", ",
    )


def tags_concat(city: Column, tag: str = ", realtor") -> Column:
    """T9 — Tags = City + ', realtor' (data_processing.py:30-33)."""
    return F.concat(city, F.lit(tag))


def detail_url(mls: Column, template_prefix: str) -> Column:
    """T10 — detail-URL construction (ure_scraping.py:211)."""
    return F.concat(F.lit(template_prefix), mls.cast("string"))


def numeric_tail(text: Column) -> Column:
    """T12 — last whitespace token as an int (``days_on_ure.split()[-1]``,
    ure_scraping.py:226-231); null-safe with the reference's None default."""
    return F.element_at(F.split(F.trim(text), r"\s+"), -1).try_cast("int")


def strip_label(text: Column, label: str) -> Column:
    """T12 — ``.replace('Type','')``-style label strip + trim
    (ure_scraping.py:236-250)."""
    return F.trim(F.regexp_replace(text, label, ""))


def price_change_pct(new_price: Column, old_price: Column) -> Column:
    """C1 — (new-old)/old*100 (main.py:49). Null when old is 0/null rather
    than the reference's unguarded divide."""
    return F.when(
        old_price.isNotNull() & (old_price != 0),
        (new_price.cast("double") - old_price.cast("double")) / old_price.cast("double") * 100.0,
    )


def days_on_market(found_date: Column) -> Column:
    """C2 — whole days between foundDate and now (hunter.py:343)."""
    return F.datediff(F.current_date(), F.to_date(found_date))
