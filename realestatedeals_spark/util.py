"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def inline_frame(spark: SparkSession, names: list[str], rows: list[tuple]) -> DataFrame:
    """A small literal dimension table built as Catalyst expressions.

    ``spark.createDataFrame`` parallelizes through a Python RDD, which costs
    a full job-setup round trip (~1 s on a cold session) — absurd for a
    3-row band table or a 16-row centroid frame, and it arrives with unknown
    stats so Catalyst may mis-pick the broadcast side. Building the rows as
    an exploded array of struct literals keeps everything in the SQL layer:
    no RDD, no serialization job, constant-folded at plan time.

    Values may be scalars or lists (lists become array columns).
    """

    def lit_any(v):
        if isinstance(v, (list, tuple)):
            return F.array(*[F.lit(x) for x in v])
        return F.lit(v)

    structs = [
        F.struct(*[lit_any(v).alias(n) for n, v in zip(names, row)]) for row in rows
    ]
    # range(0, 1, 1, numPartitions=1): the bare range(1) spans
    # defaultParallelism partitions (31 of them empty), and every frame
    # derived from this one inherits that fan-out — measured as 33-task
    # checkpoints and 33-file writes wherever a literal row rode along
    # (round 12, io_mor_delete). One row, one partition.
    return (
        spark.range(0, 1, 1, 1)
        .select(F.explode(F.array(*structs)).alias("_r"))
        .select("_r.*")
    )


def spread_by_id(df: DataFrame, id_col: str) -> DataFrame:
    """Hash-repartition ahead of a compute-bound per-document stage
    (guide §2.5 input skew: a single-row-group parquet file yields ONE
    scan split no matter how many cores the session has, so everything
    narrow downstream of the scan — shingling, 64-way hashing, sign
    folds — runs on one core).

    The exchange is keyed on the document id, so the signature
    aggregations downstream (groupBy on the id, or on (id, token)) are
    already clustered and add NO second exchange — total exchange count
    is unchanged (pinned in tests/test_dedup.py); the shuffle merely
    moves ahead of the heavy compute. Hash partitioning on the id is
    deterministic under task retries (guide §2.5 — never round-robin).

    Partition count derives from INPUT SIZE, not the core count
    (round 13): the r12 blanket defaultParallelism spread oversharded
    tiny inputs — the driver measured x2_minhash_near_dup/incremental
    0.77×/0.87× with 8 cores beating 32, and an interleaved 4-variant A/B
    at sf0.1 confirmed 8-way beats 32-way on the whole minhash/trigram
    family while costing ≲0.1 s on the compute-densest callers (rag,
    winnow). One partition per ``SPARK_GRAFT_SPREAD_SPLIT_BYTES``
    (default 64 KiB) of compressed input, clamped to
    [2, defaultParallelism]: at sf0.1 documents (0.6 MB) that is 10-way;
    at sf1+ the clamp binds and behavior matches r12; the constant only
    matters at tiny scale. The spread is SKIPPED outright when the scan
    already yields at least that many splits (guide §2.4: at warehouse
    scale a multi-file table arrives with ≥ cores splits and the
    repartition would be a pure extra shuffle of full text rows);
    frames whose input files are unknowable (unions, in-memory) keep the
    r12 core-count spread."""
    import math
    import os

    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        files = list(df.inputFiles())
    except Exception:  # noqa: BLE001 — plan without a file scan
        files = []
    n = par
    if files:
        split_bytes = int(
            os.environ.get("SPARK_GRAFT_SPREAD_SPLIT_BYTES", str(64 * 1024))
        )
        # maxPartitionBytes is pinned to 128 MB in session.DEFAULT_CONF;
        # per-file ceil is a (documented) overestimate of scan splits when
        # many small files pack into one split — overestimating only makes
        # the skip MORE likely exactly where inputs are already parallel.
        max_pb = 128 * 1024 * 1024
        total = 0
        est_splits = 0
        for p in files:
            local = p[7:] if p.startswith("file:") else p
            try:
                sz = os.stat(local).st_size
            except OSError:
                total, est_splits = 0, 0
                break
            total += sz
            est_splits += max(1, math.ceil(sz / max_pb))
        if total:
            n = min(par, max(2, math.ceil(total / split_bytes)))
            if est_splits >= n:
                return df
    return df.repartition(n, F.col(id_col))


def unpartitioned_windows(plan: str) -> int:
    """Count ``Window`` operators in a printed physical plan that have an
    ORDER BY but NO partition key — the single-partition WindowExec shape
    ("moving all data to a single partition") that serializes the whole
    frame onto one task. Used by tools/plan_inventory.py and the
    plan-quality gate.

    Parse: WindowExec prints ``Window [exprs], [partitionSpec], [orderSpec]``
    — THREE top-level bracket groups when partitioned-and-ordered, TWO when
    one spec is absent. A two-group line whose second group carries an
    ``ASC``/``DESC`` marker is ordered-but-unpartitioned. (Parsing the
    operator line, not ``windowspecdefinition``: the spec print can elide
    the partition column under projection reuse — olap_lateral_topk's
    rewritten LATERAL does — while the operator's partitionSpec is
    authoritative.)
    """
    import re

    n = 0
    for line in plan.splitlines():
        m = re.search(r"\bWindow\s+\[", line)
        if not m:
            continue
        groups, depth, start = [], 0, None
        for j in range(m.end() - 1, len(line)):
            ch = line[j]
            if ch == "[":
                if depth == 0:
                    start = j
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(line[start + 1 : j])
        if len(groups) == 2 and re.search(r"\b(ASC|DESC)\b", groups[1]):
            n += 1
    return n


# ONE home for the deterministic-trainer session memo (operators/similarity
# kmeans_lite/pq_train and plans/llm_vectors' integer trainers share it).
# Key = session + the frame's analyzed-plan semantic hash + a stat
# fingerprint of its input files + the call params: the semantic hash alone
# would go stale if the parquet under the same path were regenerated
# mid-session, so each file's (path, size, mtime) is folded in (file-less
# frames embed their data in the plan — LocalRelation — or are distinct
# RDD-backed plans per materialization, so the hash suffices there).
# Values are whatever the trainer stores; callers deep-copy on the way out.
TRAINER_CACHE: dict = {}


def trainer_cache_key(df: DataFrame, *params) -> tuple:
    import os

    stats = []
    try:
        for p in sorted(df.inputFiles()):
            local = p[7:] if p.startswith("file:") else p
            try:
                st = os.stat(local)
                stats.append((p, st.st_size, st.st_mtime_ns))
            except OSError:
                stats.append((p, None, None))
    except Exception:  # noqa: BLE001 — plan without inputFiles: hash covers it
        pass
    return (
        df.sparkSession.sparkContext.applicationId,
        df._jdf.queryExecution().analyzed().semanticHash(),
        tuple(stats),
        params,
    )


def checkpoint_owned(df: DataFrame) -> tuple[DataFrame, bool]:
    """``df.localCheckpoint(eager=True)`` plus an ownership flag: True iff
    the checkpoint materialized a NEW RDD that the caller may later release
    with ``free_local_checkpoint``. When ``df`` is ALREADY a local
    checkpoint, Spark's ``Dataset.localCheckpoint`` re-checkpoints the
    SAME underlying RDD (the LogicalRDD's stored rdd), so freeing the
    result would destroy the caller's blocks — an operator that takes a
    caller frame, checkpoints it for its own iterations, and frees it on
    exit (scc_fwbw) must skip the free in that case (ADVICE r11)."""

    def plan_rdd_id(d: DataFrame) -> int | None:
        try:
            return d._jdf.queryExecution().optimizedPlan().rdd().id()
        except Exception:  # noqa: BLE001 — not a LogicalRDD plan
            return None

    before = plan_rdd_id(df)
    ckpt = df.localCheckpoint(eager=True)
    return ckpt, plan_rdd_id(ckpt) != before


def free_local_checkpoint(df: DataFrame) -> None:
    """Release the executor storage held by an eagerly-materialized
    ``localCheckpoint``'ed DataFrame. ``DataFrame.unpersist()`` is a no-op
    for local checkpoints (the persisted entity is the underlying RDD, not
    a cache-manager entry), so iterative operators that checkpoint per
    iteration would otherwise hold every iteration's storage for the
    session's lifetime. Reaches the LogicalRDD's rdd and unpersists it.

    Only call once every downstream consumer has itself materialized:
    local checkpointing TRUNCATES lineage, so a freed RDD cannot be
    recomputed — an un-materialized dependent would fail, not recompute.
    """
    try:
        df._jdf.queryExecution().optimizedPlan().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — plan shape changed: storage leak only
        pass
