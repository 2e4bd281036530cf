"""Deterministic corpus-size-adaptive subsampling for brute-force ORACLE
ANCHORS (round 12, verdict task #6).

Three registry queries exist purely as exactness anchors beside their
production-scale twins (all-pairs n-gram Jaccard vs MinHash/winnowing,
all-pairs GEMM cosine vs banded LSH, brute-force top-k vs IVF/PQ). Their
all-pairs cost is the POINT at fixture scale — but on the generated
sweep corpora it is ~80% of the whole engine tail (304 + 182 + 85 s at
gen sf1.0) while proving nothing the fixture-scale run didn't. The fix
that keeps them exact: a hash-threshold subsample that is part of the
QUERY STATEMENT on both engines — identity below ``cap`` rows (driver
fixtures are unchanged, bit-for-bit), and a deterministic ~``cap``-row
subset above it, so the all-pairs volume stays ~sf0.1-sized at any SF
and the anchor keeps its hash-exact role over the subsample.

The per-row uniform value is the same two-round multiply/xor-fold integer
mixer the Rademacher sign-LSH uses (operators/similarity.rademacher_planes)
— chosen because it is restatable in portable SQL integer arithmetic, so
DuckDB replays the exact membership. Keep iff ``mix31(id) * n < cap·2³¹``
(n = corpus row count): pure BIGINT, no float thresholds. Bounds:
mix31 < 2³¹ and n < 2³² keeps the product under 2⁶³.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MULT = 2654435761      # Knuth multiplicative-hash constant (same as sign-LSH)
_ADD = 3266489917       # xxhash prime #3
_FOLD = 2147483648      # 2^31 high/low fold boundary


def mix31(col: Column) -> Column:
    """Two multiply + xor-fold rounds of a non-negative BIGINT id → a
    uniform-ish value in [0, 2³¹), bit-identical to :func:`mix31_sql`.
    The fold uses mask/shift (not ``/``): a Column ``/`` is DOUBLE
    division, which loses exactness past 2⁵³ — x0 reaches ~10¹⁶ already at
    a 5M-row corpus. For non-negative x, ``x & (2³¹−1)`` == ``x % 2³¹``
    and ``x >> 31`` == ``x // 2³¹``, matching the SQL twin exactly."""
    x0 = col.cast("long") * F.lit(_MULT) + F.lit(_ADD)
    x1 = x0.bitwiseAND(F.lit(_FOLD - 1)).bitwiseXOR(F.shiftright(x0, 31))
    x2 = x1 * F.lit(_MULT)
    x3 = x2.bitwiseAND(F.lit(_FOLD - 1)).bitwiseXOR(F.shiftright(x2, 31))
    # the second-round high part reaches ~2^31.3, so the xor can exceed the
    # fold boundary — one closing mask pins the documented [0, 2^31) range
    return x3.bitwiseAND(F.lit(_FOLD - 1))


def mix31_sql(expr: str) -> str:
    """DuckDB restatement of :func:`mix31` (BIGINT in, BIGINT out)."""
    x0 = f"({expr} * {_MULT} + {_ADD})"
    x1 = f"xor({x0} % {_FOLD}, {x0} // {_FOLD})"
    x2 = f"({x1} * {_MULT})"
    return f"(xor({x2} % {_FOLD}, {x2} // {_FOLD}) % {_FOLD})"


def anchor_subsample(df: DataFrame, id_col: str, cap: int) -> DataFrame:
    """Identity while ``df`` has ≤ ``cap`` rows; above that, the
    deterministic ~``cap``-row hash-threshold subset. One metadata-cheap
    count of the input (anchor inputs are single-table scans), then a
    narrow filter — the subsample SCAN stays linear; only the downstream
    all-pairs volume is capped."""
    n = df.count()
    if n <= cap:
        return df
    return df.filter(mix31(F.col(id_col)) * F.lit(n) < F.lit(cap * _FOLD))


def anchor_subsample_sql(table: str, id_col: str, cap: int) -> str:
    """The matching DuckDB derived-table expression (self-contained; usable
    as ``FROM (...) name``). States the SAME rule: identity at ≤ cap rows,
    else the mix31-threshold subset."""
    return (
        f"(SELECT t.* FROM {table} t, (SELECT count(*) AS _n FROM {table}) c\n"
        f"   WHERE c._n <= {cap} OR {mix31_sql(f't.{id_col}')} * c._n < {cap} * {_FOLD})"
    )
