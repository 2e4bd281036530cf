"""Content-defined chunking: insertion locality — an edit near the front
of a document must not change chunk hashes far from the edit (the exact
property fixed-size chunking lacks, and the reason CDC chunk hashes
dedupe across document revisions)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest


def _chunks_py(tokens: list[str]) -> list[str]:
    """Pure-Python replica of the x2_cdc_chunks boundary rule."""
    chunks, cur = [], []
    for i, tok in enumerate(tokens):
        if i > 0:
            h = hashlib.md5(f"{tokens[i - 1]}|{tok}".encode()).hexdigest()
            if h[:2] < "10":
                chunks.append(cur)
                cur = []
        cur.append(tok)
    chunks.append(cur)
    return [hashlib.md5(" ".join(c).encode()).hexdigest() for c in chunks]


def test_insertion_only_redraws_local_boundaries():
    base = [f"w{i * 37 % 101}" for i in range(400)]
    edited = base[:5] + ["INSERTED"] + base[5:]
    a, b = _chunks_py(base), _chunks_py(edited)
    # fixed-size chunking would shift every chunk after token 5; CDC must
    # keep the whole tail identical
    shared_tail = 0
    while (
        shared_tail < min(len(a), len(b))
        and a[-1 - shared_tail] == b[-1 - shared_tail]
    ):
        shared_tail += 1
    assert shared_tail >= len(a) - 3, (len(a), len(b), shared_tail)
    # and fixed-size chunking on the same input really does lose the tail
    fixed_a = [
        hashlib.md5(" ".join(base[i : i + 16]).encode()).hexdigest()
        for i in range(0, len(base), 16)
    ]
    fixed_b = [
        hashlib.md5(" ".join(edited[i : i + 16]).encode()).hexdigest()
        for i in range(0, len(edited), 16)
    ]
    assert sum(x == y for x, y in zip(fixed_a, fixed_b)) == 0


def test_engine_matches_python_replica(spark, tmp_path):
    from pyspark.sql import functions as F

    from realestatedeals_spark.plans.llm_dedup import x2_cdc_chunks

    texts = [
        " ".join(f"t{(i * j) % 53}" for j in range(40 + i * 7)) for i in range(6)
    ]
    pd.DataFrame(
        {
            "doc_id": range(6),
            "text": texts,
            "lang": ["en"] * 6,
            "source": ["s"] * 6,
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_md5"])
        for r in x2_cdc_chunks(spark, str(tmp_path)).collect()
    }
    for did, text in enumerate(texts):
        toks = text.split(" ")
        hashes = _chunks_py(toks)
        for ci, h in enumerate(hashes):
            assert got[(did, ci)][1] == h
        assert sum(got[(did, ci)][0] for ci in range(len(hashes))) == len(toks)
