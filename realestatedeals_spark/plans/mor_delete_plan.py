"""io_mor_delete — the merge-on-read DML path as a driver-checked query.

A GDPR-style purge pipeline over ``documents``: commit the corpus into a
``VersionedTable``, DELETE one deterministic slice via a position
deletion vector (data files untouched), MERGE an upsert batch (one
updated doc, one new doc), and return the live table. The oracle states
the surviving set directly from the mutation rules, so a hash match
proves the DV anti-join and the insert-store union return exactly the
right rows — while the physical layout work (no base-file rewrite,
conflict-checked commits) is pinned in tests/test_maintenance.py.

Reference parity: the reference rewrites its whole JSON state file to
drop a listing (main.py:144-171); this is that mutation done as O(k)
metadata on an immutable store.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.io.maintenance import VersionedTable
from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register
from realestatedeals_spark.util import inline_frame

_MOR_ORACLE = """
SELECT doc_id, lang,
       CASE WHEN doc_id % 31 = 1 THEN 'REDACTED' ELSE text END AS text
FROM documents
WHERE doc_id % 17 <> 3
UNION ALL
SELECT -1 AS doc_id, 'en' AS lang, 'appended row' AS text
"""


@register("io_mor_delete", oracle=_MOR_ORACLE, tags=("io", "lakehouse", "dml"), bench=True)
def io_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    work = tempfile.mkdtemp(prefix="mor_delete_")
    try:
        t = VersionedTable(spark, os.path.join(work, "docs"))
        t.commit(docs)
        n = t.delete_where(F.col("doc_id") % 17 == 3)
        assert n > 0
        upd = t.read().filter(F.col("doc_id") % 31 == 1).select(
            "doc_id", "lang", F.lit("REDACTED").alias("text")
        )
        # inline_frame, not createDataFrame (round 12): the parallelized
        # 1-row RDD spanned defaultParallelism partitions, and every
        # downstream checkpoint/write inherited the fan-out (33-task jobs,
        # 33-file writes measured here)
        extra = inline_frame(
            spark, ["doc_id", "lang", "text"], [(-1, "en", "appended row")]
        ).select(F.col("doc_id").cast("long").alias("doc_id"), "lang", "text")
        t.merge_into(upd.unionByName(extra), keys=["doc_id"])
        return t.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# io_cdf_scan (round 7): the change data feed over the same mutation
# history io_mor_delete builds — commit, MoR DELETE, MERGE upsert, then
# OPTIMIZE. ``table_changes`` derives a Delta-CDF-style row-level change
# log after the fact; the oracle states every change row directly from
# the mutation rules, so a hash match proves (a) the first version emits
# exactly the corpus as inserts, (b) the DV delta recovers exactly the
# deleted base rows, (c) the MERGE yields update pre/post pairs plus the
# one true insert, and (d) the compaction rebase emits NOTHING — the
# incremental-consumer contract (refresh an aggregate from changes, never
# rescan the snapshot) that makes downstream maintenance O(changes) at
# 100 TB. Reference parity: the reference diffs consecutive JSON
# snapshots field-by-field to detect price changes (main.py:98-143);
# this is that diff as a first-class versioned-table changelog.
# ---------------------------------------------------------------------------

_CDF_ORACLE = """
SELECT doc_id, lang, text,
       'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
FROM documents
UNION ALL
SELECT doc_id, lang, text, 'delete', CAST(2 AS BIGINT)
FROM documents WHERE doc_id % 17 = 3
UNION ALL
SELECT doc_id, lang, text, 'update_preimage', CAST(3 AS BIGINT)
FROM documents WHERE doc_id % 31 = 1 AND doc_id % 17 <> 3
UNION ALL
SELECT doc_id, lang, 'REDACTED', 'update_postimage', CAST(3 AS BIGINT)
FROM documents WHERE doc_id % 31 = 1 AND doc_id % 17 <> 3
UNION ALL
SELECT -1, 'en', 'appended row', 'insert', CAST(3 AS BIGINT)
"""


@register("io_cdf_scan", oracle=_CDF_ORACLE, tags=("io", "lakehouse", "cdf"))
def io_cdf_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    work = tempfile.mkdtemp(prefix="cdf_scan_")
    try:
        t = VersionedTable(spark, os.path.join(work, "docs"))
        t.commit(docs)  # v1: creation -> all inserts
        t.delete_where(F.col("doc_id") % 17 == 3)  # v2: MoR deletes
        upd = t.read().filter(F.col("doc_id") % 31 == 1).select(
            "doc_id", "lang", F.lit("REDACTED").alias("text")
        )
        # inline_frame, not createDataFrame (round 12): the parallelized
        # 1-row RDD spanned defaultParallelism partitions, and every
        # downstream checkpoint/write inherited the fan-out (33-task jobs,
        # 33-file writes measured here)
        extra = inline_frame(
            spark, ["doc_id", "lang", "text"], [(-1, "en", "appended row")]
        ).select(F.col("doc_id").cast("long").alias("doc_id"), "lang", "text")
        t.merge_into(upd.unionByName(extra), keys=["doc_id"])  # v3: updates + insert
        t.optimize()  # v4: rebase; must emit no change rows
        return t.table_changes(keys=["doc_id"]).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# io_corrupt_scan (round 7): tolerant ingestion. Real crawled feeds carry
# malformed records; a 100 TB load must quarantine them without failing
# the job. Each document becomes one JSONL line, deterministically
# corrupted for doc_id % 7 == 0 (truncated object); the PERMISSIVE read
# with columnNameOfCorruptRecord routes bad lines into a quarantine
# column while good rows parse. The oracle derives both populations from
# the corruption rule, so the hash match proves malformed input is
# neither dropped nor double-counted — per-line fault isolation.
# ---------------------------------------------------------------------------

_CORRUPT_ORACLE = """
SELECT
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
  CAST(sum(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
  CAST(sum(CASE WHEN doc_id % 7 <> 0 THEN n_chars ELSE 0 END) AS BIGINT) AS parsed_chars
FROM documents
"""


@register("io_corrupt_scan", oracle=_CORRUPT_ORACLE, tags=("io", "ingestion", "quarantine"))
def io_corrupt_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    line = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit('{"doc_id": '), F.col("doc_id").cast("string"), F.lit(', "n_chars": ')),
    ).otherwise(
        F.concat(
            F.lit('{"doc_id": '), F.col("doc_id").cast("string"),
            F.lit(', "n_chars": '), F.col("n_chars").cast("string"), F.lit("}"),
        )
    )
    work = tempfile.mkdtemp(prefix="corrupt_scan_")
    try:
        feed = os.path.join(work, "feed")
        docs.select(line.alias("value")).write.text(feed)
        parsed = spark.read.schema(
            "doc_id long, n_chars long, _corrupt_record string"
        ).option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        ).json(feed)
        # caching before splitting corrupt/good is the documented Spark
        # requirement for referencing the corrupt column
        parsed = parsed.cache()
        out = parsed.agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0)).alias(
                "n_quarantined"
            ),
            F.sum(F.when(F.col("_corrupt_record").isNull(), 1).otherwise(0)).alias(
                "n_parsed"
            ),
            F.sum(
                F.when(F.col("_corrupt_record").isNull(), F.col("n_chars")).otherwise(0)
            ).alias("parsed_chars"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# io_warc_scan (round 7): the crawl-interchange format end-to-end. Every
# 50 documents pack into one real WARC/1.0 file (Content-Length framing,
# io/warc.py), the files land as binary rows, and the record parser
# splits them back inside mapInPandas. The oracle recomputes per-document
# byte length and md5 from the source text, so a hash match proves every
# payload byte survives the framing — including payloads that contain
# CRLF sequences, which is why framing must use Content-Length and never
# delimiter splitting.
# ---------------------------------------------------------------------------

_WARC_ORACLE = """
SELECT doc_id,
       'https://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS uri,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
"""


@register("io_warc_scan", oracle=_WARC_ORACLE, tags=("io", "ingestion", "warc"))
def io_warc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    import pandas as pd

    from realestatedeals_spark.io.warc import build_warc, parse_warc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def pack(batches):
        for pdf in batches:
            pdf = pdf.assign(grp=pdf["doc_id"] // 50)
            for gid, g in pdf.groupby("grp"):
                g = g.sort_values("doc_id")
                recs = [
                    (f"https://corpus.example/doc/{int(d)}", t.encode("utf-8"))
                    for d, t in zip(g["doc_id"], g["text"])
                ]
                yield pd.DataFrame({"file_id": [int(gid)], "content": [bytearray(build_warc(recs))]})

    warc_files = docs.repartition(8, "doc_id").mapInPandas(
        pack, schema="file_id long, content binary"
    )

    def unpack(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for headers, payload in parse_warc(bytes(content)):
                    uri = headers["WARC-Target-URI"]
                    rows.append(
                        (
                            int(uri.rsplit("/", 1)[1]),
                            uri,
                            len(payload),
                            hashlib.md5(payload).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "uri", "n_bytes", "payload_md5"])

    return warc_files.mapInPandas(
        unpack, schema="doc_id long, uri string, n_bytes long, payload_md5 string"
    )


# ---------------------------------------------------------------------------
# io_cdf_incremental_view (round 7): the CDF CONSUMER contract. An
# aggregate view (per-language doc count + char sum) is maintained purely
# from ``table_changes`` rows with signed aggregation — insert /
# update_postimage contribute +1, delete / update_preimage contribute -1
# — and the table itself is never rescanned for the answer. The oracle
# states the final table's aggregate directly from the mutation rules, so
# a hash match proves replaying the change log reproduces the snapshot
# aggregate exactly: the O(changes) refresh loop an aggregate view runs
# against a 100 TB fact table. (c6_incremental_agg_view refreshes from
# appended batches; this is the general form that also survives deletes
# and updates.)
# ---------------------------------------------------------------------------

_CDF_VIEW_ORACLE = """
WITH final AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 31 = 1 THEN n_chars + 1000 ELSE n_chars END AS n_chars
  FROM documents
  WHERE doc_id % 17 <> 3
  UNION ALL
  SELECT -1 AS doc_id, 'xx' AS lang, 777 AS n_chars
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM final
GROUP BY lang
"""


@register(
    "io_cdf_incremental_view",
    oracle=_CDF_VIEW_ORACLE,
    tags=("io", "lakehouse", "cdf", "incremental"),
)
def io_cdf_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    work = tempfile.mkdtemp(prefix="cdf_view_")
    try:
        t = VersionedTable(spark, os.path.join(work, "docs"))
        t.commit(docs)  # v1
        t.delete_where(F.col("doc_id") % 17 == 3)  # v2
        upd = t.read().filter(F.col("doc_id") % 31 == 1).select(
            "doc_id", "lang", (F.col("n_chars") + 1000).alias("n_chars")
        )
        extra = inline_frame(  # 1-partition literal row (see io_mor_delete)
            spark, ["doc_id", "lang", "n_chars"], [(-1, "xx", 777)]
        ).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "lang",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
        t.merge_into(upd.unionByName(extra), keys=["doc_id"])  # v3
        changes = t.table_changes(keys=["doc_id"])
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        view = (
            changes.withColumn("sign", sign)
            .groupBy("lang")
            .agg(
                F.sum("sign").alias("n_docs"),
                F.sum(F.col("sign") * F.col("n_chars")).alias("chars_sum"),
            )
            .filter(F.col("n_docs") > 0)
        )
        return view.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# io_orc_scan (round 7): columnar-format breadth. Parquet is the repo
# default; ORC is the other first-class columnar format Spark ships a
# native vectorized reader for (Hive-lineage warehouses are full of it).
# The pipeline writes lineitem to ORC partitioned by l_returnflag with
# zstd compression, reads it back with a partition filter + column
# projection, and aggregates — so partition pruning (only the 'R'
# directory is listed) and ORC predicate pushdown both participate. The
# oracle computes the same aggregate straight from the source table: a
# hash match proves the ORC write→read cycle is lossless for every value
# involved (dates included, which cross the writer's proleptic-calendar
# rebase path).
# ---------------------------------------------------------------------------

_ORC_ORACLE = """
SELECT l_linestatus,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
       CAST(sum(CAST(floor(l_extendedprice * 1000000) AS BIGINT)) AS BIGINT) AS price_micros,
       min(strftime(l_shipdate, '%Y-%m-%d')) AS first_ship
FROM lineitem
WHERE l_returnflag = 'R'
GROUP BY l_linestatus
"""


@register("io_orc_scan", oracle=_ORC_ORACLE, tags=("io", "format", "orc"))
def io_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    work = tempfile.mkdtemp(prefix="orc_scan_")
    try:
        path = os.path.join(work, "li_orc")
        li.write.partitionBy("l_returnflag").option("compression", "zstd").orc(path)
        back = spark.read.orc(path)
        out = (
            back.filter(F.col("l_returnflag") == "R")  # partition-pruned scan
            .groupBy("l_linestatus")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
                F.sum(
                    F.floor(F.col("l_extendedprice") * 1000000).cast("long")
                ).alias("price_micros"),
                F.min(F.date_format("l_shipdate", "yyyy-MM-dd")).alias("first_ship"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# io_cdf_join_view: incremental maintenance of a JOIN view from the
# change feeds of BOTH base tables. The view orders JOIN lineitem GROUP BY
# o_custkey is rebuilt purely from signed change rows using the Z-set
# bilinearity identity (DBSP / differential-dataflow):
#
#     A_final x B_final = (sum of signed dA) x (sum of signed dB)
#                       = sum over all pairs  sign_a * sign_b * (a x b)
#
# so joining the two FULL change logs and aggregating sign_a*sign_b
# reproduces the final join aggregate exactly — deletes retract, updates
# move rows between groups (including o_custkey re-routing, which plain
# aggregate IVM cannot express), and neither snapshot is ever rescanned.
# At 100 TB the same algebra runs per epoch (dA x B + A x dB), joining
# each delta against the opposite side on the join key; this query is
# that contract stated over the whole history so the oracle can check it
# hash-exactly against the final snapshots.
# ---------------------------------------------------------------------------

_CDF_JOIN_VIEW_ORACLE = """
WITH l_base AS (
  SELECT l_orderkey, l_linenumber,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS rev_micros
  FROM lineitem GROUP BY 1, 2),
l_final AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 7 = 1 THEN 2 * rev_micros ELSE rev_micros END AS rev_micros
  FROM l_base WHERE l_linenumber < 5),
o_final AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 2 THEN o_custkey + 1000 ELSE o_custkey END AS o_custkey
  FROM orders WHERE o_orderkey % 13 <> 5)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(rev_micros) AS BIGINT) AS rev_micros
FROM o_final JOIN l_final ON o_orderkey = l_orderkey
GROUP BY o_custkey
"""


@register(
    "io_cdf_join_view",
    oracle=_CDF_JOIN_VIEW_ORACLE,
    tags=("io", "lakehouse", "cdf", "incremental", "join"),
)
def io_cdf_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000
                ).cast("long")
            ).alias("rev_micros")
        )
    )
    work = tempfile.mkdtemp(prefix="cdf_join_view_")
    try:
        ta = VersionedTable(spark, os.path.join(work, "orders"))
        ta.commit(orders)  # v1
        tb = VersionedTable(spark, os.path.join(work, "lineitem"))
        tb.commit(li)  # v1
        # orders mutations: delete a slice, then re-route custkeys (the
        # group-move case aggregate-only IVM cannot handle)
        ta.delete_where(F.col("o_orderkey") % 13 == 5)
        upd_a = ta.read().filter(F.col("o_orderkey") % 11 == 2).select(
            "o_orderkey", (F.col("o_custkey") + 1000).alias("o_custkey")
        )
        ta.merge_into(upd_a, keys=["o_orderkey"])
        # lineitem mutations: delete high line numbers, double a revenue slice
        tb.delete_where(F.col("l_linenumber") >= 5)
        upd_b = tb.read().filter(F.col("l_orderkey") % 7 == 1).select(
            "l_orderkey", "l_linenumber", (2 * F.col("rev_micros")).alias("rev_micros")
        )
        tb.merge_into(upd_b, keys=["l_orderkey", "l_linenumber"])

        sign = lambda: F.when(  # noqa: E731
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1)).cast("long")
        ca = ta.table_changes(keys=["o_orderkey"]).select(
            "o_orderkey", "o_custkey", sign().alias("sa")
        )
        cb = tb.table_changes(keys=["l_orderkey", "l_linenumber"]).select(
            "l_orderkey", "rev_micros", sign().alias("sb")
        )
        view = (
            ca.join(cb, ca["o_orderkey"] == cb["l_orderkey"])
            .groupBy("o_custkey")
            .agg(
                F.sum(F.col("sa") * F.col("sb")).alias("n_items"),
                F.sum(F.col("sa") * F.col("sb") * F.col("rev_micros")).alias(
                    "rev_micros"
                ),
            )
            .filter(F.col("n_items") > 0)
        )
        return view.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# x8_crawl_pipeline: the crawl-ingestion capstone — one lazy plan from
# interchange bytes to a deduplicated clean corpus. Documents are wrapped
# in the deterministic page skeleton (plans/llm_clean.wrap_html), packed
# into real WARC/1.0 files, parsed back out of the binary column, run
# through the generic boilerplate stripper, length-gated, and
# exact-deduplicated on the md5 of the extracted text. Because the
# extractor provably recovers text + planted tail (x4_html_extract), the
# oracle states the final corpus directly from the source table — a hash
# match proves the WHOLE chain (pack -> Content-Length parse -> extract
# -> gate -> dedup) is lossless. Scale shape: two mapInPandas stages and
# one md5 group-by; WARC bytes never leave the executor, and the dedup
# shuffle carries hashes + scalars, not page bodies.
# ---------------------------------------------------------------------------

_CRAWL_ORACLE = """
WITH ext AS (
  SELECT doc_id,
         text || E'\\ntail & id ' || CAST(doc_id % 7 AS VARCHAR) AS x
  FROM documents),
filt AS (SELECT * FROM ext WHERE length(x) >= 100)
SELECT md5(x) AS clean_md5,
       CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(min(length(x)) AS BIGINT) AS n_chars,
       CAST(min(len(string_split(x, ' '))) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_dups
FROM filt GROUP BY 1
"""


@register(
    "x8_crawl_pipeline",
    oracle=_CRAWL_ORACLE,
    tags=("X8", "ingestion", "warc", "pipeline"),
)
def x8_crawl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from realestatedeals_spark.functions.web import extract_main_text
    from realestatedeals_spark.io.warc import build_warc, parse_warc
    from realestatedeals_spark.plans.llm_clean import wrap_html

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", wrap_html(F.col("doc_id")).alias("html")
    )

    def pack(batches):
        for pdf in batches:
            pdf = pdf.assign(grp=pdf["doc_id"] // 50)
            for gid, g in pdf.groupby("grp"):
                g = g.sort_values("doc_id")
                recs = [
                    (f"https://corpus.example/doc/{int(d)}", h.encode("utf-8"))
                    for d, h in zip(g["doc_id"], g["html"])
                ]
                yield pd.DataFrame(
                    {"file_id": [int(gid)], "content": [bytearray(build_warc(recs))]}
                )

    warc_files = docs.select("doc_id", "html").repartition(8, "doc_id").mapInPandas(
        pack, schema="file_id long, content binary"
    )

    def unpack(batches):
        for pdf in batches:
            ids, pages = [], []
            for content in pdf["content"]:
                for headers, payload in parse_warc(bytes(content)):
                    ids.append(int(headers["WARC-Target-URI"].rsplit("/", 1)[1]))
                    pages.append(payload.decode("utf-8"))
            yield pd.DataFrame({"doc_id": ids, "html": pages})

    pages = warc_files.mapInPandas(unpack, schema="doc_id long, html string")
    ext = pages.select("doc_id", extract_main_text(F.col("html")).alias("x"))
    filt = ext.filter(F.length("x") >= 100)
    return filt.groupBy(F.md5("x").alias("clean_md5")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min(F.length("x")).cast("long").alias("n_chars"),
        F.min(F.size(F.split("x", " "))).cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_dups"),
    )


# ---------------------------------------------------------------------------
# io_skipping_scan: manifest-based data skipping. After OPTIMIZE ZORDER BY
# l_orderkey, a one-row-per-file min/max manifest is built and a narrow
# key-range read consults the manifest FIRST — only files whose envelope
# intersects the range are opened (the Iceberg/Delta planning step that
# turns a 100 TB scan into a handful of files). The oracle computes the
# same aggregate from the raw table; the file-count reduction itself is
# pinned in tests/test_maintenance.py (pruned scan must touch a strict
# minority of files on the clustered layout).
# ---------------------------------------------------------------------------

_SKIP_ORACLE = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
       CAST(sum(CAST(floor(l_extendedprice * 1000000) AS BIGINT)) AS BIGINT) AS price_micros
FROM lineitem
WHERE l_orderkey BETWEEN 1000 AND 2000
GROUP BY l_returnflag
"""


@register("io_skipping_scan", oracle=_SKIP_ORACLE, tags=("io", "lakehouse", "skipping"))
def io_skipping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
    )
    work = tempfile.mkdtemp(prefix="skipping_scan_")
    try:
        t = VersionedTable(spark, os.path.join(work, "li"))
        t.commit(li)
        t.optimize(zorder_cols=["l_orderkey"], max_records_per_file=4096)
        t.build_manifest(["l_orderkey"])
        pruned = t.read_pruned("l_orderkey", 1000, 2000)
        out = pruned.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
            F.sum(F.floor(F.col("l_extendedprice") * 1000000).cast("long")).alias(
                "price_micros"
            ),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# io_bloom_point_lookup: per-file BLOOM index point lookup (round 7). The
# min/max manifest prunes ranges but is blind to point probes on
# high-cardinality keys scattered across files; the bloom index answers
# "might this file contain k?" per file with bounded false positives and
# NO false negatives, so the lookup is exact while opening ≈ the files
# that actually hold the key. Oracle: the same point predicate over the
# raw table. File-count reduction pinned in tests/test_maintenance.py.
# ---------------------------------------------------------------------------

_BLOOM_POINT_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_orderpriority,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders WHERE o_orderkey = 4242
"""


@register("io_bloom_point_lookup", oracle=_BLOOM_POINT_ORACLE, tags=("io", "lakehouse", "bloom"))
def io_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit orders as a many-file snapshot, build the per-file bloom
    index on o_orderkey, and answer a point lookup through it."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="bloom_point_")
    try:
        t = VersionedTable(spark, os.path.join(work, "o"))
        t.commit(o.repartition(16))
        t.build_bloom_index("o_orderkey", fpp=0.01)
        hit = t.read_point("o_orderkey", 4242)
        out = hit.select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# io_catalog_txn: MULTI-TABLE atomic commit (round 7 — io/catalog.py). A
# pipeline that maintains a fact table and its aggregate view must never
# let readers see one updated without the other; the catalog publishes one
# manifest pinning {table: version} per transaction (atomic conditional
# link, the POSIX analogue of S3 If-None-Match on the manifest). This
# query runs two transactions — load, then a reprice of urgent orders with
# the view recomputed in the SAME transaction — and answers from the
# catalog-pinned view. The oracle recomputes the post-reprice aggregate
# from raw orders; torn-read impossibility and lost-update freedom under
# concurrent writers are pinned in tests/test_catalog.py.
# ---------------------------------------------------------------------------

_CATALOG_TXN_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                     THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) * 2
                     ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END)
            AS BIGINT) AS total_cents
FROM orders
GROUP BY o_orderpriority
"""


@register("io_catalog_txn", oracle=_CATALOG_TXN_ORACLE, tags=("io", "lakehouse", "catalog", "txn"), bench=True)
def io_catalog_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two multi-table transactions: (facts, view) load, then an urgent-
    order reprice with the view recomputed atomically alongside. Result =
    the catalog-pinned view after txn 2."""
    from realestatedeals_spark.io.catalog import Catalog

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

    def view_of(facts: DataFrame) -> DataFrame:
        return facts.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )

    work = tempfile.mkdtemp(prefix="catalog_txn_")
    try:
        cat = Catalog(spark, os.path.join(work, "cat"))
        cat.commit({"facts": o, "price_view": view_of(o)})
        repriced = o.withColumn(
            "cents",
            F.when(
                F.col("o_orderpriority") == "1-URGENT", F.col("cents") * 2
            ).otherwise(F.col("cents")),
        )
        cat.commit({"facts": repriced, "price_view": view_of(repriced)})
        return cat.read("price_view").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# io_catalog_wap: the write-audit-publish workflow through the driver gate
# (round 7 — io/catalog.py branches). A staging branch takes the risky
# update (repriced urgent orders + recomputed view), an AUDIT runs against
# the BRANCH (row-count conservation + non-negative totals — the kind of
# expectation suite a real pipeline gates merges on; audit failure would
# leave main untouched), and only then does the three-way merge publish
# onto main. Result = main's post-merge view; the oracle recomputes it
# directly. Isolation/conflict/retention semantics are pinned in
# tests/test_catalog.py.
# ---------------------------------------------------------------------------


@register("io_catalog_wap", oracle=_CATALOG_TXN_ORACLE, tags=("io", "lakehouse", "catalog", "branch"))
def io_catalog_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish: stage the reprice on a branch, audit the staged
    view, merge to main; returns main's view (same oracle as the direct
    transaction — the workflow must not change the answer)."""
    from realestatedeals_spark.io.catalog import Catalog

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

    def view_of(facts: DataFrame) -> DataFrame:
        return facts.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )

    work = tempfile.mkdtemp(prefix="catalog_wap_")
    try:
        cat = Catalog(spark, os.path.join(work, "cat"))
        cat.commit({"facts": o, "price_view": view_of(o)})
        cat.create_branch("staging")
        repriced = o.withColumn(
            "cents",
            F.when(
                F.col("o_orderpriority") == "1-URGENT", F.col("cents") * 2
            ).otherwise(F.col("cents")),
        )
        cat.commit(
            {"facts": repriced, "price_view": view_of(repriced)}, branch="staging"
        )
        # AUDIT the branch before anything reaches main
        staged = cat.read("price_view", branch="staging")
        audit = staged.agg(
            F.sum("n_orders").alias("rows"), F.min("total_cents").alias("mn")
        ).first()
        base_rows = cat.read("price_view").agg(F.sum("n_orders")).first()[0]
        if audit["rows"] != base_rows or audit["mn"] < 0:
            raise ValueError("WAP audit failed; main stays untouched")
        cat.merge("staging")
        return cat.read("price_view").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
