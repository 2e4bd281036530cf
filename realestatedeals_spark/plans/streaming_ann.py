"""C19 — STREAMING retrieval against the STORED IVF index, exactly-once
(round 12, verdict task #7).

The stored-ANN story so far builds the index once (x3_ivf_stored_topk)
and answers a batch query set; this closes the loop IN MOTION: the index
is built once batch-side (that premise is the point — the stream never
touches training or the index files), then QUERY batches arrive as
micro-batches and ``foreachBatch`` probes the cell-partitioned index for
each batch — per-epoch cost is nprobe cell-directory reads for ≤|batch|
queries, O(batch), independent of everything previously scored — and
commits that epoch's top-k rows through the same epoch-watermarked CAS
catalog transaction as the LM scoring stream (c16): redelivered epochs
are no-ops, a torn writer cannot interleave with the skip check. One
transactional compaction folds the per-epoch deltas (pure union — query
ids never span batches) and the compacted table must hash-match
x3_ivf_stored_topk's ORACLE verbatim: streamed probes == the batch probe
query, bit-for-bit, because per-query results are independent and the
probe semantics (frozen centroids, nprobe cells, exact BIGINT rerank)
are identical.

This is the 100 TB serving shape: the corpus index is a static artifact,
queries are the stream, and every epoch's answers land atomically next to
the previous ones.

Reference parity: the reference's poll loop re-queries its whole snapshot
per cycle (main.py:98-143); this is the query side of that loop against
an indexed store, at O(batch) per cycle.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.io.catalog import Catalog
from realestatedeals_spark.plans.llm_vectors import (
    _IVF_STORED_ORACLE,
    _ivf_probe_pairs,
    _ivf_queries,
    _ivf_rank_topk,
    _kmeans_micros,
    _micros_vectors,
)
from realestatedeals_spark.plans.registry import register
from realestatedeals_spark.session import apply_session_conf
from realestatedeals_spark.streaming.replay import write_epoch_dirs

_ANN_DELTA_RE = re.compile(r"ann_d\d+")


def apply_ann_probe_batch(
    cat: Catalog,
    batch_df: DataFrame,
    epoch_id: int,
    idx_path: str,
    cents: list[list[int]],
) -> bool:
    """Probe the stored index for ONE query micro-batch and commit the
    epoch's top-k as a delta table, exactly-once (c16's epoch/CAS
    protocol). Probe-pair computation collects ≤|batch|·nprobe metadata
    rows; the index scan reads only this batch's probed cell directories."""
    applied = cat.applied_epoch()
    if applied is not None and epoch_id <= applied:
        return False
    latest = cat.latest_version()
    spark = batch_df.sparkSession
    queries = batch_df.select("qid", "qv")
    probe_pairs, probed_cells = _ivf_probe_pairs(queries, cents)
    idx = spark.read.parquet(idx_path).filter(F.col("cluster").isin(probed_cells))
    cand = (
        idx.join(F.broadcast(probe_pairs), "cluster")
        .filter(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(queries), "qid")
    )
    cat.commit(
        {f"ann_d{epoch_id}": _ivf_rank_topk(cand)},
        expected_latest=latest,
        epoch=epoch_id,
    )
    return True


def compact_ann(cat: Catalog) -> int:
    """Fold the pending per-epoch answer deltas into the compacted ``ann``
    table and retire them in the same transaction — pure union, no
    re-ranking, because query ids never span batches. The epoch-less
    commit preserves the applied-epoch watermark (compaction can race a
    live stream without re-opening the redelivery window)."""
    pins = cat.pins()
    deltas = sorted(n for n in pins if _ANN_DELTA_RE.fullmatch(n))
    parts = [cat.read(n) for n in deltas]
    if "ann" in pins:
        parts.append(cat.read("ann"))
    if not parts:
        raise ValueError("nothing to compact for 'ann': no base and no deltas")
    out = parts[0]
    for extra in parts[1:]:
        out = out.unionByName(extra)
    # No localCheckpoint (round 12): the commit's parquet write
    # materializes the union exactly once from the pinned delta files.
    return cat.commit({"ann": out}, drops=deltas)


@register(
    "c19_stream_ann_score",
    # streamed probes must be indistinguishable from the batch probe
    # query — same oracle, by construction of the shared probe machinery
    oracle=_IVF_STORED_ORACLE,
    tags=("C19", "streaming", "catalog", "ann", "index"),
)
def c19_stream_ann_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The benchmark query set arrives as 3 micro-batches against the
    once-built stored IVF index; per-epoch probes commit exactly-once,
    one compaction folds them, and the result hash-matches
    x3_ivf_stored_topk's oracle. See the module docstring."""
    apply_session_conf(spark)
    emb = _micros_vectors(spark, sf_dir)
    assigned, cents = _kmeans_micros(emb)

    work = tempfile.mkdtemp(prefix="stream_ann_")
    try:
        idx_path = os.path.join(work, "cells")
        assigned.select("vec_id", "v", "cluster").write.partitionBy(
            "cluster"
        ).parquet(idx_path)

        # qids are multiples of 100 below 10000: pmod(qid, 300) splits the
        # query set into exactly three batches (0, 100, 200)
        queries = _ivf_queries(emb)
        in_dir = os.path.join(work, "in")
        os.makedirs(in_dir)
        write_epoch_dirs(
            in_dir,
            [queries.filter(F.pmod(F.col("qid"), 300) == 100 * i) for i in (0, 1, 2)],
        )

        cat = Catalog(spark, os.path.join(work, "cat"))
        stream = (
            spark.readStream.schema("qid bigint, qv array<bigint>")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir + "/*")
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda bdf, eid: apply_ann_probe_batch(cat, bdf, eid, idx_path, cents)
            )
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        compact_ann(cat)
        assert not [n for n in cat.pins() if _ANN_DELTA_RE.fullmatch(n)]
        out = cat.read("ann")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)
