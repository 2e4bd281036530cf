"""Agent-dedup pipeline — the reference's §3.3 flow as ONE lazy Spark plan.

Reference shape (agent_manager.py:10-38 + data_processing.py:8-40):
scraped listings → non-empty-phone filter (F3, agent_manager.py:55) → name
split + phone normalize (T3/T6) → pandas left-merge + ``_merge=='left_only'``
anti-join vs known contacts (J2, data_processing.py:9-10) → groupby
(first,last,phone) with ``', '.join(set(cities))`` (A1, data_processing.py:11)
→ CSV write → **re-read the CSV** → initcap/tag transforms (T7-T9,
data_processing.py:14-40).

What changes in Spark: the anti-join is one ``left_anti`` (no indicator/suffix
bookkeeping), the CSV write→re-read materialization barrier disappears (the
whole thing is one Catalyst plan), and the contacts side is broadcast — at
100 TB of listings the contacts dim is still tiny, so the anti-join is a
broadcast hash join with no shuffle; the only shuffle is the final groupBy on
(first,last,phone), which partial-aggregates map-side first.

Determinism: the reference's ``set(x)`` iteration order is arbitrary; we sort
the collected set (array_sort) so output is stable and oracle-comparable
(SURVEY.md §2a.5 A1 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realestatedeals_spark.functions.scalars import (
    capitalize_names,
    city_tags,
    normalize_phone,
    tags_concat,
)


def scraped_agents(listings: DataFrame) -> DataFrame:
    """agent_manager.py:40-55 — project agent fields from listings, keep rows
    with a usable phone (F3), normalize the phone (T6)."""
    return (
        listings.filter(F.col("agent_phone").isNotNull() & (F.trim(F.col("agent_phone")) != ""))
        .select(
            F.col("agent_first_name").alias("first_name"),
            F.col("agent_last_name").alias("last_name"),
            normalize_phone(F.col("agent_phone")).alias("phone"),
            F.col("city"),
        )
    )


def unique_new_agents(agents: DataFrame, contacts: DataFrame) -> DataFrame:
    """J2 + A1 (data_processing.py:8-12): agents not already in contacts,
    one row per (first,last,phone) with a deterministic joined city set."""
    new = agents.join(
        F.broadcast(contacts.select("first_name", "last_name").distinct()),
        on=["first_name", "last_name"],
        how="left_anti",
    )
    return new.groupBy("first_name", "last_name", "phone").agg(
        F.array_join(F.array_sort(F.collect_set("city")), ", ").alias("city")
    )


def tag_cities(unique_agents: DataFrame, suffix: str = " Utah Market") -> DataFrame:
    """T7-T9 (data_processing.py:14-40): initcap names, append the market
    suffix to each city, build Tags, drop the city column."""
    return (
        unique_agents.withColumn("first_name", capitalize_names(F.col("first_name")))
        .withColumn("last_name", capitalize_names(F.col("last_name")))
        .withColumn("city", city_tags(F.col("city"), suffix))
        .withColumn("tags", tags_concat(F.col("city")))
        .drop("city")
    )


def agent_dedup_pipeline(listings: DataFrame, contacts: DataFrame) -> DataFrame:
    """The full §3.3 pipeline as one lazy plan (scan→filter→anti-join→agg→
    project). Columns: first_name, last_name, phone, tags."""
    return tag_cities(unique_new_agents(scraped_agents(listings), contacts))
