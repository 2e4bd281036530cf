"""Scale-data generator for slope benchmarking (SCALE.md).

The driver ships fixtures only up to sf0.1; the 100 TB story needs measured
evidence that per-query runtime scales ~linearly in data size. This generator
reproduces the driver fixtures' schemas and distributions (characterized from
/root/testdata/sf0.1 — row counts, key ranges, category weights, lines-per-
order fan-out, token vocab, embedding cluster structure) at arbitrary SF so we
can measure t(sf1)/t(sf0.1) on a like-for-like pair produced by the SAME
generator at both scales.

Output goes under .scaledata/ (gitignored — ~1 GB at sf1.0). Never writes to
/root/testdata.

Usage: python tools/gen_scale.py 1.0 [outdir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PNAME_ADJ = ["large", "hot", "small", "cold", "dim", "bright", "new", "old"]
PNAME_NOUN = ["ring", "bolt", "nut", "gear", "plate", "rod", "cap", "pin"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
# 31-term vocab observed in the driver's documents fixture
VOCAB = [
    "spark", "batch", "part", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "vector", "query", "agg", "table", "hash",
    "key", "group", "slow", "filter", "customer", "stream", "the", "join",
    "shuffle", "row", "index", "merge", "cache", "disk",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.14, 0.15, 0.15, 0.15]


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def generate(
    sf: float,
    outdir: str,
    seed: int = 42,
    boilerplate: bool = False,
    zipf: bool = False,
    tables: set[str] | None = None,
) -> None:
    """``boilerplate=True`` (round-7 verdict task #8) contaminates ~30% of
    documents with one of three shared 28-token site templates (header AND
    footer) — the corpus shape real web scrapes have and the plain
    generator lacks. On such a corpus the winnowing fingerprints of the
    templates are held by ~10% of all documents, far past the 2% MOSS cap,
    making ``x2_winnow_overlap_capped``'s stop-fingerprint prune
    load-bearing: the uncapped overlap self-join explodes on the template
    posting lists while the capped form prunes them before the shuffle.

    ``tables`` (round 13): generate only the named tables — at sf100 the
    full set is dominated by ~600M lineitem rows no sf100 sweep target
    reads, and the single-process numpy build of them is the binding cost.
    Subset runs draw each table from its OWN (seed, table)-derived rng so
    the output is deterministic regardless of which other tables are
    requested; full runs keep the original single sequential rng stream so
    previously generated corpora remain byte-reproducible."""
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)

    _TABLE_IDX = {
        "region": 0, "nation": 1, "customer": 2, "supplier": 3, "part": 4,
        "orders": 5, "lineitem": 6, "events": 7, "documents": 8,
        "embeddings": 9,
    }

    def want(name: str) -> bool:
        nonlocal rng
        if tables is None:
            return True
        if name not in tables:
            return False
        rng = np.random.default_rng((seed, _TABLE_IDX[name]))
        return True
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    if want("region"):
        _write(outdir, "region", pa.table({
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": REGIONS,
        }))
    if want("nation"):
        _write(outdir, "nation", pa.table({
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i:02d}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }))
    if want("customer"):
        _write(outdir, "customer", pa.table({
            "c_custkey": pa.array(range(n_cust), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
        }))
    if want("supplier"):
        _write(outdir, "supplier", pa.table({
            "s_suppkey": pa.array(range(n_supp), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
        }))
    if want("part"):
        _write(outdir, "part", pa.table({
            "p_partkey": pa.array(range(n_part), pa.int64()),
            "p_name": [
                f"{PNAME_ADJ[i % 8]} {PNAME_NOUN[(i // 8) % 8]}" for i in range(n_part)
            ],
            "p_brand": [f"Brand#{i % 25 + 1}" for i in range(n_part)],
            "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
            "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
            "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 1),
        }))

    day_us = 86_400_000_000
    if want("orders"):
        o_dates = (
            np.datetime64("1995-01-01", "us")
            + (rng.integers(0, 2404, n_ord) * day_us).astype("timedelta64[us]")
        )
        _write(outdir, "orders", pa.table({
            "o_orderkey": pa.array(range(n_ord), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
            "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
            "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
            "o_orderdate": o_dates,
            "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
        }))

    if want("lineitem"):
        # lineitem: lines-per-order ~ 1 + Poisson(3) (matches observed fan-out
        # peaking at 3-4 lines/order), l_extendedprice ~ qty * unit price
        lines_per = 1 + rng.poisson(3.0, n_ord)
        n_li = int(lines_per.sum())
        l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
        l_linenumber = np.concatenate([np.arange(1, c + 1) for c in lines_per]).astype(
            np.int32
        )
        qty = rng.integers(1, 51, n_li).astype(np.float64)
        _write(outdir, "lineitem", pa.table({
            "l_orderkey": l_orderkey,
            "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
            "l_linenumber": l_linenumber,
            "l_quantity": qty,
            "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
            "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
            "l_shipdate": (
                np.datetime64("1995-01-01", "us")
                + (rng.integers(0, 2500, n_li) * day_us).astype("timedelta64[us]")
            ),
        }))

    if want("events"):
        # events: uniform over 30 days of 2024-01, sorted by ts (matches
        # fixture: event_id ascends with ts); per-user density constant per SF
        ts_us = np.sort(rng.integers(0, 30 * day_us, n_events))
        _write(outdir, "events", pa.table({
            "event_id": pa.array(range(n_events), pa.int64()),
            "ts": np.datetime64("2024-01-01", "us") + ts_us.astype("timedelta64[us]"),
            "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
            "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_events)],
            "value": np.round(np.minimum(rng.exponential(80, n_events), 600), 2),
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_events)],
        }))

    if want("documents"):
        # documents: 31-term vocab, ~8-105 tokens/doc, lang/source mix as observed;
        # ~2% mutated near-dups + ~0.2% exact dups so dedup workloads stay realistic.
        # ``zipf=True`` (round-8 verdict task #4) draws tokens with power-law
        # weights p(rank r) ∝ 1/r instead of uniformly — the head token carries
        # ~25% of all positions (natural language is Zipf; the uniform draw hides
        # hot-key skew from every token-keyed join). Used to stress the LM
        # scorer's n-gram joins.
        n_tok = rng.integers(8, 106, n_docs)
        if zipf:
            w = 1.0 / np.arange(1, len(VOCAB) + 1)
            tok_p = w / w.sum()
            texts = [
                " ".join(np.array(VOCAB)[rng.choice(len(VOCAB), k, p=tok_p)])
                for k in n_tok
            ]
        else:  # keep the exact uniform stream earlier rounds measured against
            texts = [
                " ".join(np.array(VOCAB)[rng.integers(0, len(VOCAB), k)]) for k in n_tok
            ]
        for i in rng.integers(0, n_docs, int(n_docs * 0.02)):
            if i + 1 < n_docs:
                toks = texts[i].split(" ")
                j = rng.integers(0, len(toks))
                toks[j] = VOCAB[rng.integers(0, len(VOCAB))]
                texts[i + 1] = " ".join(toks)
        for i in rng.integers(0, n_docs - 1, int(n_docs * 0.002)):
            texts[i + 1] = texts[i]
        if boilerplate:
            tmpl_rng = np.random.default_rng(7)
            templates = [
                " ".join(np.array(VOCAB)[tmpl_rng.integers(0, len(VOCAB), 28)])
                for _ in range(3)
            ]
            for i in range(n_docs):
                if i % 10 < 3:  # 30% of docs carry a shared header+footer
                    t = templates[i % 3]
                    texts[i] = f"{t} {texts[i]} {t}"
        _write(outdir, "documents", pa.table({
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": texts,
            "lang": np.array(LANGS)[rng.choice(5, n_docs, p=LANG_W)],
            "source": [f"src{i % 20}" for i in range(n_docs)],
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }))

    if want("embeddings"):
        # embeddings: 10 gaussian clusters in 64-dim. Noise std 1.0 matches the
        # driver fixture's profile (natural pairwise cosine tops out ~0.5; mean
        # within-cluster cosine = sigma_c^2/(sigma_c^2+sigma_n^2) = 0.5) so
        # threshold-0.9 queries see realistic selectivity, plus ~1% planted
        # near-identical pairs so they still have real work
        centers = rng.normal(0, 1, (10, 64))
        labels = rng.integers(0, 10, n_emb)
        vecs = centers[labels] + rng.normal(0, 1.0, (n_emb, 64))
        for i in rng.integers(0, n_emb - 1, int(n_emb * 0.01)):
            vecs[i + 1] = vecs[i] + rng.normal(0, 0.01, 64)
            labels[i + 1] = labels[i]
        _write(outdir, "embeddings", pa.table({
            "vec_id": pa.array(range(n_emb), pa.int64()),
            "embedding": pa.array(
                vecs.astype(np.float32).tolist(), pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }))


if __name__ == "__main__":
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    boiler = "--boilerplate" in flags
    zipf = "--zipf" in flags
    tables = None
    for a in list(flags):
        if a.startswith("--tables="):
            tables = set(a.split("=", 1)[1].split(","))
    sf = float(args[0]) if args else 1.0
    out = (
        args[1]
        if len(args) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scaledata",
            f"sf{sf}" + ("-boiler" if boiler else "") + ("-zipf" if zipf else ""),
        )
    )
    print(f"generating sf={sf} boilerplate={boiler} zipf={zipf} tables={sorted(tables) if tables else 'ALL'} -> {out}")
    generate(sf, out, boilerplate=boiler, zipf=zipf, tables=tables)
