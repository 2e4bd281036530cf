"""Classifier training determinism + exact cross-engine parity.

The training loop claims bit-determinism (integer-micros gradient sums,
exp-free link, fixed driver op order). These tests hold it to that: the
independent pandas implementation below must reproduce the Spark-trained
weights and every score EXACTLY (== on doubles, no tolerance), and
training must be invariant to repartitioning. A learning test asserts the
GD genuinely recovers the planted weak-supervision concept."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from realestatedeals_spark.operators.classifier import (
    FEATURES,
    quality_features,
    score_quality,
    standardize,
    train_logreg_gd,
)

SW = {"the", "a", "of", "and", "to", "in", "is", "it"}
SF_DIR = "/root/testdata/sf0.001"


def _pandas_features(path: str) -> pd.DataFrame:
    """Independent pandas re-derivation of quality_features + the weak
    label — same arithmetic sequence, none of the Spark code."""
    docs = pd.read_parquet(f"{path}/documents.parquet")
    rows = []
    for _, r in docs.iterrows():
        toks = r["text"].split(" ")
        if len(toks) == 0:
            continue
        nch = float(r["n_chars"])
        nt = float(len(toks))
        f_stop = sum(t in SW for t in toks) / nt
        f_cpt = min(nch / nt, 12.0) / 12.0
        f_len = min(nch, 1000.0) / 1000.0
        f_digit = sum(c.isdigit() for c in r["text"]) / nch
        f_space = r["text"].count(" ") / nch
        u = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16) / 4294967296.0
        z = (8.0 * f_stop - 1.5 * f_len) + 0.2 * (u - 0.5)
        rows.append((r["doc_id"], f_stop, f_cpt, f_len, f_digit, f_space, float(z > 0.02)))
    return pd.DataFrame(rows, columns=["doc_id", *FEATURES, "y"])


def _pandas_train(pdf: pd.DataFrame, iters: int, lr: float, l2: float):
    """Reference standardize + GD with the identical op sequence."""
    X = pdf[list(FEATURES)].to_numpy(dtype=np.float64)
    y = pdf["y"].to_numpy(dtype=np.float64)
    n = len(y)
    mus, sds = [], []
    for j in range(X.shape[1]):
        mu = (np.floor(X[:, j] * 1e6).sum() / 1e6) / n
        var = (np.floor((X[:, j] * X[:, j]) * 1e6).sum() / 1e6) / n - mu * mu
        sds.append(var**0.5 if var > 1e-12 else 1.0)
        mus.append(mu)
    G = np.empty_like(X)
    for j in range(X.shape[1]):
        G[:, j] = (X[:, j] - mus[j]) / sds[j]
    w = [0.0] * (X.shape[1] + 1)
    for _ in range(iters):
        z = np.full(n, w[0])
        for j in range(X.shape[1]):
            z = z + w[j + 1] * G[:, j]
        p = (1.0 + z / (1.0 + np.abs(z))) / 2.0
        r = p - y
        g = [int(np.floor(r * 1e6).sum())]
        g += [int(np.floor((r * G[:, j]) * 1e6).sum()) for j in range(X.shape[1])]
        for j in range(len(w)):
            w[j] = w[j] - lr * ((g[j] / 1e6) / n + l2 * w[j])
    return w, G, y


@pytest.fixture(scope="module")
def trained(spark):
    from realestatedeals_spark.io.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    std, mus, sds, n = standardize(quality_features(docs))
    w = train_logreg_gd(std, iters=12, lr=6.0, l2=1e-4)
    return docs, std, mus, sds, n, w


def test_training_matches_pandas_reference_exactly(trained):
    _, _, mus, sds, n, w = trained
    pdf = _pandas_features(SF_DIR)
    w_ref, _, _ = _pandas_train(pdf, iters=12, lr=6.0, l2=1e-4)
    assert len(pdf) == n
    assert w == w_ref  # bit-exact doubles, no tolerance


def test_scores_match_pandas_reference_exactly(trained):
    _, std, _, _, _, w = trained
    got = {
        r["doc_id"]: (r["score_micros"], r["keep"], r["label"])
        for r in score_quality(std, w).collect()
    }
    pdf = _pandas_features(SF_DIR)
    w_ref, G, y = _pandas_train(pdf, iters=12, lr=6.0, l2=1e-4)
    z = np.full(len(G), w_ref[0])
    for j in range(G.shape[1]):
        z = z + w_ref[j + 1] * G[:, j]
    p = (1.0 + z / (1.0 + np.abs(z))) / 2.0
    assert len(got) == len(pdf)
    for i, did in enumerate(pdf["doc_id"]):
        sm, keep, label = got[did]
        assert sm == int(np.floor(p[i] * 1e6)), did
        assert keep == bool(p[i] >= 0.5) and label == int(y[i]), did


def test_training_is_partition_invariant(trained):
    _, std, _, _, _, w = trained
    w17 = train_logreg_gd(std.repartition(17), iters=12, lr=6.0, l2=1e-4)
    w1 = train_logreg_gd(std.coalesce(1), iters=12, lr=6.0, l2=1e-4)
    assert w == w17 == w1


def test_classifier_recovers_planted_concept(trained):
    _, std, _, _, _, w = trained
    rows = score_quality(std, w).collect()
    acc = sum((r["score_micros"] >= 500000) == (r["label"] == 1) for r in rows) / len(rows)
    labels = [r["label"] for r in rows]
    majority = max(sum(labels), len(labels) - sum(labels)) / len(labels)
    # planted concept has ~0.2-amplitude label noise: well-separated from
    # the majority baseline but never 100%
    assert acc >= majority + 0.15, (acc, majority)
    assert acc < 1.0
    # learned direction: + on f_stop, - on f_len (the planted signs)
    assert w[1] > 0 and w[3] < 0


def test_standardize_handles_constant_feature(spark):
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "f_stop": [0.5, 0.5, 0.5], "f_cpt": [0.1, 0.2, 0.3],
         "f_len": [0.3, 0.6, 0.9], "f_digit": [0.0, 0.0, 0.0],
         "f_space": [0.1, 0.1, 0.2], "y": [0.0, 1.0, 1.0]}
    )
    std, mus, sds, n = standardize(spark.createDataFrame(pdf))
    assert n == 3
    assert sds[0] == 1.0 and sds[3] == 1.0  # degenerate features don't blow up
    got = std.collect()
    assert all(abs(r["f_digit"]) < 1e-9 for r in got)


def test_frozen_model_scores_match_pandas_exactly(spark):
    """The frozen-weights scorer must reproduce an independent pandas
    evaluation bit-exactly (same fast-sigmoid, same fold order) on a
    synthetic corpus — the deploy-path analog of the training parity pin."""
    from realestatedeals_spark.operators.classifier import (
        FROZEN_MUS,
        FROZEN_SDS,
        FROZEN_W,
        score_frozen,
    )

    rows = [
        (1, "the cat sat on the mat", 22),
        (2, "zz " * 40 + "zz", 122),
        (3, "a b c d e 123 456", 17),
        (4, "x" * 900, 900),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", n) for i, t, n in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: (r["score_micros"], r["keep"]) for r in score_frozen(docs).collect()}
    for i, t, n in rows:
        toks = t.split(" ")
        f = [
            sum(x in SW for x in toks) / len(toks),
            min(float(n) / len(toks), 12.0) / 12.0,
            min(float(n), 1000.0) / 1000.0,
            sum(c.isdigit() for c in t) / float(n),
            t.count(" ") / float(n),
        ]
        z = FROZEN_W[0]
        for j in range(5):
            z = z + FROZEN_W[j + 1] * ((f[j] - FROZEN_MUS[j]) / FROZEN_SDS[j])
        p = (1.0 + z / (1.0 + abs(z))) / 2.0
        import math

        assert got[i] == (math.floor(p * 1e6), p >= 0.5), i
