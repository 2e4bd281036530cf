"""In-engine trained quality classifier — model-based corpus filtering as
a pipeline stage (the fasttext/CCNet-style "train a cheap classifier, then
filter the corpus with it" step), built so distributed training is
BIT-DETERMINISTIC:

- The link function is the rational "fast sigmoid" p = (1 + z/(1+|z|))/2,
  not exp-based logistic: add/abs/divide are correctly-rounded IEEE-754
  ops, so every engine (Spark JVM, pandas) computes the identical double
  for the identical input — no libm exp() ulp drift.
- Feature standardization and every gradient are computed from per-row
  contributions floored to integer micros and summed as BIGINTs. Integer
  addition is associative/commutative, so the statistics are EXACTLY the
  same under any partitioning, shuffle order, or AQE re-plan.
- Weight updates are a fixed sequence of driver-side float ops.

Training is full-batch GD: each iteration is ONE map-side-combinable
aggregation over the (cached) feature frame; the driver holds d+1 longs
and d+1 doubles. At 100 TB that is T sequential scan+agg jobs — the same
shape as any iterative MLlib solver, with exact reproducibility MLlib
does not give (its double tree-aggregates are order-dependent).

Labels: the synthetic documents corpus is random-vocabulary text, so no
natural label is learnable from it by construction. The query therefore
distills a NOISY WEAK-SUPERVISION rule (a hash-noised linear concept on
held-out arithmetic — ``weak_quality_label``) into the model, which is
the honest version of what model-based quality filtering does in
production: turn heuristic label functions into a smooth reusable scorer.
tests/test_classifier.py pins training + scoring EXACTLY (== on doubles)
against an independent pandas implementation, asserts partition
invariance, and asserts the GD actually recovers the planted concept
(accuracy well above the majority baseline).

Reference parity: the RealEstateDeals reference has no ML surface; this
implements the quality-filter stage of the mandated LLM-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared with plans/llm_text.py's quality query family
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

FEATURES = ("f_stop", "f_cpt", "f_len", "f_digit", "f_space")


def weak_quality_label() -> Column:
    """Noisy weak-supervision labeling rule: a linear concept over two
    surface statistics plus md5-derived noise (deterministic per doc_id).
    The noise term bounds achievable accuracy below 100%, so a classifier
    that scores ~0.9 has genuinely learned the direction, not memorized."""
    tokens = F.split("text", " ")
    n_tokens = F.size(tokens).cast("double")
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    f_stop = F.size(F.filter(tokens, lambda x: F.array_contains(sw, x))).cast("double") / n_tokens
    f_len = F.least(F.col("n_chars").cast("double"), F.lit(1000.0)) / F.lit(1000.0)
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ).cast("double") / F.lit(4294967296.0)
    z = (F.lit(8.0) * f_stop - F.lit(1.5) * f_len) + F.lit(0.2) * (u - F.lit(0.5))
    return z > F.lit(0.02)


def quality_features(docs: DataFrame, label: Column | None = None) -> DataFrame:
    """Surface-statistics features, all JVM column expressions, all scaled
    into [0, 1]:

    - f_stop: English-stopword token ratio
    - f_cpt: mean chars per whitespace token, capped at 12
    - f_len: document length, capped at 1000 chars
    - f_digit: digit-character fraction
    - f_space: space-character fraction

    ``label`` defaults to the weak-supervision rule above.
    """
    tokens = F.split("text", " ")
    n_tokens = F.size(tokens)
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(tokens, lambda x: F.array_contains(sw, x)))
    n_chars = F.col("n_chars").cast("double")
    n_digit = F.length(F.regexp_replace("text", "[^0-9]", "")).cast("double")
    n_space = F.length(F.regexp_replace("text", "[^ ]", "")).cast("double")
    y = weak_quality_label() if label is None else label
    return docs.filter(n_tokens > 0).select(
        "doc_id",
        (n_stop.cast("double") / n_tokens.cast("double")).alias("f_stop"),
        (F.least(n_chars / n_tokens.cast("double"), F.lit(12.0)) / F.lit(12.0)).alias("f_cpt"),
        (F.least(n_chars, F.lit(1000.0)) / F.lit(1000.0)).alias("f_len"),
        (n_digit / n_chars).alias("f_digit"),
        (n_space / n_chars).alias("f_space"),
        y.cast("double").alias("y"),
    )


def standardize(feats: DataFrame) -> tuple[DataFrame, list[float], list[float], int]:
    """Global z-score standardization in ONE aggregation: per-feature
    micros-floored sums and sums of squares (BIGINT, order-independent),
    mean/std finished on the driver with a fixed op sequence. Degenerate
    (constant) features get std=1 so they standardize to ~0 instead of
    blowing up. Returns (standardized frame, means, stds, n)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for name in FEATURES:
        aggs.append(F.sum(F.floor(F.col(name) * F.lit(1e6)).cast("long")).alias(f"s_{name}"))
        aggs.append(
            F.sum(F.floor((F.col(name) * F.col(name)) * F.lit(1e6)).cast("long")).alias(
                f"q_{name}"
            )
        )
    row = feats.agg(*aggs).collect()[0]
    n = row["n"]
    if n == 0:
        raise ValueError("empty training frame")
    mus, sds = [], []
    for name in FEATURES:
        mu = (row[f"s_{name}"] / 1e6) / n
        var = (row[f"q_{name}"] / 1e6) / n - mu * mu
        sd = var**0.5 if var > 1e-12 else 1.0
        mus.append(mu)
        sds.append(sd)
    cols = ["doc_id"]
    for j, name in enumerate(FEATURES):
        cols.append(((F.col(name) - F.lit(mus[j])) / F.lit(sds[j])).alias(name))
    cols.append(F.col("y"))
    return feats.select(*cols), mus, sds, n


def _linear(feats: DataFrame, w: list[float]) -> Column:
    """z = w0 + w1*f1 + ... as a LEFT-NESTED fold — the add order is part
    of the model definition so every engine reproduces the same double."""
    z = F.lit(float(w[0]))
    for j, name in enumerate(FEATURES):
        z = z + F.lit(float(w[j + 1])) * F.col(name)
    return z


def fast_sigmoid(z: Column) -> Column:
    """p = (1 + z/(1+|z|)) / 2 — exp-free logistic link; add/abs/divide are
    correctly-rounded IEEE-754, hence bit-portable across engines."""
    return (F.lit(1.0) + z / (F.lit(1.0) + F.abs(z))) / F.lit(2.0)


def train_logreg_gd(
    feats: DataFrame,
    iters: int = 20,
    lr: float = 3.0,
    l2: float = 1e-4,
) -> list[float]:
    """Full-batch gradient descent on (already standardized) features;
    each iteration is ONE distributed aggregation. Per-row contribution
    floor((p - y) * f_j * 1e6) is summed as BIGINT (order-independent), so
    the trained weights are identical on 1 partition or 10,000."""
    feats = feats.persist()
    n = feats.count()
    if n == 0:
        raise ValueError("empty training frame")
    w = [0.0] * (len(FEATURES) + 1)
    for _ in range(iters):
        r = fast_sigmoid(_linear(feats, w)) - F.col("y")
        aggs = [F.sum(F.floor(r * F.lit(1e6)).cast("long")).alias("g0")]
        aggs += [
            F.sum(F.floor((r * F.col(name)) * F.lit(1e6)).cast("long")).alias(f"g{j + 1}")
            for j, name in enumerate(FEATURES)
        ]
        g = feats.agg(*aggs).collect()[0]
        for j in range(len(w)):
            w[j] = w[j] - lr * ((g[f"g{j}"] / 1e6) / n + l2 * w[j])
    feats.unpersist()
    return w


def score_quality(feats: DataFrame, w: list[float], threshold: float = 0.5) -> DataFrame:
    """Score + filter decision with the trained weights. score_micros is
    the floored-micros probability (integer, hash-stable)."""
    p = fast_sigmoid(_linear(feats, w))
    return feats.select(
        "doc_id",
        F.floor(p * F.lit(1e6)).cast("long").alias("score_micros"),
        (p >= F.lit(float(threshold))).alias("keep"),
        F.col("y").cast("long").alias("label"),
    )


# Frozen model: the deploy artifact of `train_logreg_gd` (12 iters, lr=6,
# l2=1e-4, sf0.001 documents fixture — reproduce with the same call; the
# training is bit-deterministic so these constants are too). Scoring with
# frozen weights uses only add/abs/divide/multiply, so it is exactly
# SQL-expressible — x4_quality_score_model carries a hash-exact oracle.
FROZEN_MUS = (0.066084696, 0.455951166, 0.30631200000000003, 0.0, 0.178362348)
FROZEN_SDS = (
    0.03890767218155803,
    0.017019994807297694,
    0.14334028274005872,
    1.0,
    0.006876977237630854,
)
FROZEN_W = (
    0.5259294522038683,
    5.336705181113764,
    -0.490131538819243,
    -3.988452936382624,
    0.0,
    -0.18072410950361809,
)


def score_frozen(docs: DataFrame) -> DataFrame:
    """Score any corpus with the frozen model: features → frozen
    standardization → frozen linear → fast sigmoid → micros + keep flag.
    Pure column expressions; no training pass, no aggregation."""
    feats = quality_features(docs)
    z = F.lit(float(FROZEN_W[0]))
    for j, name in enumerate(FEATURES):
        g = (F.col(name) - F.lit(float(FROZEN_MUS[j]))) / F.lit(float(FROZEN_SDS[j]))
        z = z + F.lit(float(FROZEN_W[j + 1])) * g
    p = fast_sigmoid(z)
    return feats.select(
        "doc_id",
        F.floor(p * F.lit(1e6)).cast("long").alias("score_micros"),
        (p >= F.lit(0.5)).alias("keep"),
    )
