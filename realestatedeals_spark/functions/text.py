"""Text-analysis column expressions (SURVEY.md §2b X4).

All pure built-in expressions (no UDFs): rolling-hash fingerprints,
regex tokenization, heuristic language scoring. Each has an exact ANSI
mirror so the oracles stay bit-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over characters: fold(acc*31 + codepoint) mod p.

    Order-dependent by design (it is a content fingerprint); the left fold is
    evaluated in index order, so the value is engine-portable.
    """
    return F.aggregate(
        F.split(text, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FINGERPRINT_BASE + F.ascii(ch)) % FINGERPRINT_MOD,
    )


# "BPE-ish" tokenizer: word pieces = runs of letters/digits, plus standalone
# punctuation — the pre-tokenization regex most BPE vocab builders apply.
BPE_TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0))


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: t != ""))


# Tiny per-language marker vocabularies for the heuristic language scorer.
# (Real LID uses char-ngram profiles; the *dataflow* — explode → marker join
# → per-doc argmax — is identical, and this variant is oracle-exact.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("de", "shi", "le", "bu"),
}


def lang_scores(text: Column) -> Column:
    """Map of lang → marker-hit count for the text (higher = likelier)."""
    toks = F.split(F.lower(text), r"\s+")
    entries = [
        F.struct(
            F.lit(lang).alias("key"),
            F.size(F.filter(toks, lambda t: t.isin(*markers))).alias("value"),
        )
        for lang, markers in LANG_MARKERS.items()
    ]
    return F.map_from_entries(F.array(*entries))


def predict_lang(text: Column) -> Column:
    """argmax of lang_scores with lexicographic tie-break; null text → null."""
    scores = lang_scores(text)
    # sort entries by (-count, lang) and take the first key
    arr = F.array_sort(
        F.transform(
            F.map_entries(scores),
            lambda e: F.struct((-e["value"]).alias("neg"), e["key"].alias("lang")),
        )
    )
    return F.element_at(arr, 1)["lang"]
