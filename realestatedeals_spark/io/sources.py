"""Batch sources.

Covers the reference's file sources (SURVEY.md §2a.1 S6/S8/S12/S13) plus the
driver's parquet star schema. All readers take an explicit schema where the
reference relied on dynamic typing (listing.py:48-52 schema drift) — we fix
that, not copy it.

Scale notes: parquet readers get predicate pushdown + column pruning from
Catalyst for free; callers should ``select``/``filter`` as early as possible
so the scan only materializes what the query needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Schema memo keyed by parquet path (round 12): parquet schema INFERENCE
# launches a footer-read job on every bare spark.read.parquet call
# (measured +1 job / ~0.1-0.2 s warm), and the bench re-opens the same
# immutable fixture tables on every query run. A real deployment reads
# table schemas from catalog metadata (Delta/Iceberg/HMS) instead of
# re-inferring per query; this memo is that metadata, scoped per path.
# METADATA ONLY — no rows, plans, or results are ever memoized here.
_SCHEMA_MEMO: dict[str, T.StructType] = {}


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    sch = _SCHEMA_MEMO.get(path)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[path] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from a scale-factor directory."""
    return _read_parquet(spark, f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with a usable TimestampType ``ts``.

    The fixture's ``ts`` encoding has changed across driver regenerations
    (parquet TIMESTAMP(NANOS) originally, timestamp[us] today), so dispatch on
    the dtype Spark actually reads rather than hard-coding one encoding:

    - ``LongType``: nanos read as long via the legacy conf — convert to
      micros ourselves (floor division matches DuckDB's nanos→micros cast
      for positive epochs).
    - ``TimestampNTZType``: plain cast; identity under the UTC session conf.
    - ``TimestampType``: already usable, pass through.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # memoized AFTER the conf is set, so the cached schema is always the
    # one inference under nanosAsLong would produce
    raw = _read_parquet(spark, f"{sf_dir}/events.parquet")
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # integer division: double division would lose micros at epoch-nano scale
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    if isinstance(ts_type, T.TimestampType):
        return raw
    raise TypeError(
        f"events.parquet ts has unsupported dtype {ts_type}; "
        "update load_events dispatch (io/sources.py)"
    )


# ---------------------------------------------------------------------------
# Listing schema — the reference's row model (listing.py:4-41) with explicit
# types (SURVEY.md §1.2). Used by the JSON snapshot source/sink and the CDC
# operators; the Trulia-only drift fields (beds/baths,
# trulia_scraper.py:107-109) are declared nullable instead of appearing ad hoc.
# ---------------------------------------------------------------------------

LISTING_SCHEMA = T.StructType(
    [
        T.StructField("mls", T.StringType(), False),
        T.StructField("price", T.LongType(), True),
        T.StructField("priceStr", T.StringType(), True),
        T.StructField("photoUrl", T.StringType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("zip", T.StringType(), True),
        T.StructField("sqft", T.IntegerType(), True),
        T.StructField("ppsqft", T.DoubleType(), True),
        T.StructField("acres", T.DoubleType(), True),
        T.StructField("foundDate", T.TimestampType(), True),
        T.StructField("stats", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("agent_name", T.StringType(), True),
        T.StructField("agent_first_name", T.StringType(), True),
        T.StructField("agent_last_name", T.StringType(), True),
        T.StructField("agent_phone", T.StringType(), True),
        T.StructField("co_agent_name", T.StringType(), True),
        T.StructField("co_agent_phone", T.StringType(), True),
        T.StructField("broker_name", T.StringType(), True),
        T.StructField("broker_phone", T.StringType(), True),
        T.StructField("expiration_date", T.StringType(), True),
        T.StructField("page_views", T.IntegerType(), True),
        T.StructField("favorited", T.IntegerType(), True),
        T.StructField("days_online", T.IntegerType(), True),
        T.StructField("days_left", T.IntegerType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("property_details", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("price_change_date", T.TimestampType(), True),
        T.StructField("price_change_percentage", T.DoubleType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("style", T.StringType(), True),
        T.StructField("days_on_ure", T.StringType(), True),
        T.StructField("beds", T.IntegerType(), True),
        T.StructField("baths", T.DoubleType(), True),
    ]
)

# Contacts frame (S8): data_loader.py:26-35 reads contacts.csv and projects
# First Name / Last Name / Phone.
CONTACTS_SCHEMA = T.StructType(
    [
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("phone", T.StringType(), True),
    ]
)


def read_listing_snapshot(spark: SparkSession, path: str) -> DataFrame:
    """S6 — JSON snapshot source (main.py:54-76), schema-enforced.

    The reference loads ``SavedListings.json`` into dict[mls -> Listing]; we
    read it as a keyed DataFrame. ``multiLine`` handles the pretty-printed
    dump the reference writes (main.py:161 ``indent=4``).
    """
    return spark.read.schema(LISTING_SCHEMA).option("multiLine", "true").json(path)


def write_listing_snapshot(df: DataFrame, path: str) -> None:
    """S7 — snapshot sink. The reference overwrites one JSON file per cycle
    (main.py:144-171); at scale the snapshot is a partitioned parquet table
    (overwrite by cycle), which is what we write."""
    df.write.mode("overwrite").parquet(path)


def read_contacts_csv(spark: SparkSession, path: str) -> DataFrame:
    """S8 — contacts CSV source (data_loader.py:26-35): header CSV, string
    coercion, phone normalization, 3-column projection."""
    from realestatedeals_spark.functions.scalars import normalize_phone

    raw = spark.read.option("header", "true").csv(path)
    return raw.select(
        F.col("First Name").cast("string").alias("first_name"),
        F.col("Last Name").cast("string").alias("last_name"),
        normalize_phone(F.col("Phone").cast("string")).alias("phone"),
    )


def flatten_zip_config(zips_nested: DataFrame, counties: list[str] | None = None) -> DataFrame:
    """S12 + F4 + F6 — nested county→city→[zip] flatten (config.py:18-49).

    Input schema: ``county string, cities map<string, array<string>>``.
    Output: one row per (county, city, zip), county-filtered when
    ``counties`` is given, keeping only valid 5-digit zips (utahZip.py:39).
    """
    out = (
        zips_nested.select("county", F.explode("cities").alias("city", "zips"))
        .select("county", "city", F.explode("zips").alias("zip"))
        .filter(F.col("zip").rlike("^[0-9]{5}$"))
    )
    if counties:
        out = out.filter(F.col("county").isin(counties))
    return out
