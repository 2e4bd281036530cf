"""C19 streaming ANN probes: exactly-once per-epoch commits (redelivery
no-op, watermark preserved across compaction) and stream==batch parity of
the folded answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from realestatedeals_spark.io.catalog import Catalog
from realestatedeals_spark.plans.llm_vectors import (
    _ivf_queries,
    _kmeans_micros,
    _micros_vectors,
)
from realestatedeals_spark.plans.streaming_ann import (
    apply_ann_probe_batch,
    compact_ann,
)


def _setup(spark, sf_dir, tmp_path):
    emb = _micros_vectors(spark, sf_dir)
    assigned, cents = _kmeans_micros(emb)
    idx_path = str(tmp_path / "cells")
    assigned.select("vec_id", "v", "cluster").write.partitionBy("cluster").parquet(
        idx_path
    )
    return emb, cents, idx_path


def test_redelivered_probe_epoch_is_a_noop(spark, sf_dir, tmp_path):
    emb, cents, idx_path = _setup(spark, sf_dir, tmp_path)
    queries = _ivf_queries(emb)
    b0 = queries.filter(F.pmod(F.col("qid"), 300) == 0)
    b1 = queries.filter(F.pmod(F.col("qid"), 300) == 100)
    cat = Catalog(spark, str(tmp_path / "cat"))
    assert apply_ann_probe_batch(cat, b0, 0, idx_path, cents) is True
    v_after_0 = cat.latest_version()
    # crash-after-publish: the engine redelivers epoch 0 — no new version
    assert apply_ann_probe_batch(cat, b0, 0, idx_path, cents) is False
    assert cat.latest_version() == v_after_0
    assert apply_ann_probe_batch(cat, b1, 1, idx_path, cents) is True
    compact_ann(cat)
    # redelivery AFTER compaction still skips (watermark carried forward)
    assert apply_ann_probe_batch(cat, b1, 1, idx_path, cents) is False
    # and the folded answers equal probing both batches at once
    folded = {
        (r["query_id"], r["rk"]): (r["neighbor_id"], r["dist_sq"])
        for r in cat.read("ann").collect()
    }
    cat2 = Catalog(spark, str(tmp_path / "cat2"))
    both = queries.filter(F.pmod(F.col("qid"), 300).isin(0, 100))
    apply_ann_probe_batch(cat2, both, 0, idx_path, cents)
    compact_ann(cat2)
    want = {
        (r["query_id"], r["rk"]): (r["neighbor_id"], r["dist_sq"])
        for r in cat2.read("ann").collect()
    }
    assert folded == want
