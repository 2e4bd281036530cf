"""Engine-wide physical-plan inventory → bench_results/plan_inventory.json.

For every registered query whose plan can be built without side effects,
record Exchange / Sort / BroadcastExchange / BNLJ / ArrowEval counts plus
the scan ReadSchema widths — the mechanical evidence behind SCALE.md's
shuffle-inventory claims (a reviewer can diff this artifact instead of
re-deriving every plan by hand).

Counts are over the PRINTED plan tree: reused subtrees (self-joins,
iterative unions) print once per consumer, so absolute numbers can exceed
the number of runtime exchanges (g4's wedge join prints its exchange per
union branch); zeros and the row-Python column are exact either way.

Skipped: queries that execute work at plan-build time (streaming replays,
model training, managed-table writes) — each is listed with its reason.

Usage: python tools/plan_inventory.py [sf_dir]
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

# plan build executes real work (streaming replay / k-means / table write /
# driver-side GEMM batching); their scale stories are documented in SCALE.md
SKIP = {
    "c3_streaming_cdc": "streaming replay",
    "c4_stateful_user_stats": "streaming replay",
    "c5_stream_dedup": "streaming replay",
    "c6_incremental_agg_view": "streaming replay",
    "c7_streaming_sessions": "streaming replay",
    "c8_stream_static_enrich": "streaming replay",
    "c13_stream_transition_matrix": "streaming replay",
    "c14_stream_catalog_txn": "streaming replay",
    "c15_stream_lm_counts": "streaming replay",
    "c16_stream_lm_score": "streaming replay",
    "c15b_stream_lm_delta_fold": "streaming replay",
    "c17_stream_media_dedup": "streaming replay",
    "io_bucketed_join": "managed-table write at plan build",
    "x3_pq_topk": "k-means training at plan build",
    "x3_ivf_topk": "k-means training at plan build",
    "x3_ivf_stored_topk": "k-means training + index write at plan build",
    "x3_ivfpq_stored_topk": "k-means + PQ training + index write at plan build",
    "x2_semdedup": "k-means training at plan build",
    "x3_cosine_topk_gemm": "driver-side chunked GEMM at plan build",
    "x4_bpe_encode": "BPE training at plan build",
    "x4_bpe_train_merges": "BPE training at plan build",
    "x4_unigram_train": "unigram EM training at plan build",
    "x4_unigram_encode": "unigram EM training at plan build",
    "x4_unigram_lattice_counts": "seed-vocab collect at plan build",
    "g3_pagerank": "power iterations at plan build",
    "g5_kcore_parts": "peel iterations at plan build",
    "x6_heavy_hitters": "two-pass summary materialization",
    "x6_cms_heavy_hitters": "two-pass summary materialization",
    "x6_hll_mergeable": "sketch materialization",
    "x7_temperature_mix": "derived-rate subplan at build",
    "x2_minhash_incremental": "VersionedTable index commits at plan build",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from realestatedeals_spark.plans import QUERIES
    from realestatedeals_spark.session import get_spark
    from realestatedeals_spark.util import unpartitioned_windows

    spark = get_spark("plan-inventory", master="local[4]", shuffle_partitions=4)
    out: dict[str, dict] = {}
    for name, q in QUERIES.items():
        if name in SKIP:
            out[name] = {"skipped": SKIP[name]}
            continue
        try:
            plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        out[name] = {
            "shuffle_exchanges": plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning"),
            "broadcast_exchanges": plan.count("BroadcastExchange"),
            "sorts": plan.count("Sort ["),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "arrow_python": plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas"),
            "row_python": plan.count("BatchEvalPython"),
            "scans": len(re.findall(r"FileScan parquet", plan)),
            "unpartitioned_windows": unpartitioned_windows(plan),
        }
    spark.stop()
    path = "bench_results/plan_inventory.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    n_ok = sum(1 for v in out.values() if "shuffle_exchanges" in v)
    n_row = sum(v.get("row_python", 0) for v in out.values() if isinstance(v, dict))
    print(f"{path}: {n_ok} plans recorded, {len(SKIP)} documented skips, "
          f"row-at-a-time Python ops total: {n_row}")


if __name__ == "__main__":
    main()
