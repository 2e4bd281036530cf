"""Skew-aware join: explicit key salting.

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime by splitting oversized shuffle blocks, but it only applies to
sort-merge joins and only after the skewed shuffle files exist. Salting
attacks the problem before the shuffle: the big side scatters each hot key
across ``salt`` sub-keys, the small side replicates each row ``salt`` times,
and the join runs on (key, salt) with uniform partition sizes by
construction. Cost: small side × salt replication — use for joins where the
small side is modest but too big (or too skew-correlated) to broadcast.

Salt assignment is deterministic (hash of the whole big-side row, not
rand()), so retried tasks and re-runs produce identical partitioning —
required for exactly-once sinks and for oracle comparisons.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with ``salt``-way key salting.

    Result equals ``big.join(small, on, how)`` row-for-row; only the
    physical partitioning differs. Supported ``how``: inner / left /
    left_outer / left_semi / left_anti (right-side variants would need the
    salting mirrored, which defeats the purpose — put the big table on the
    left).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(f"salted_join supports {sorted(allowed)}, got {how!r}")
    on = list(on)
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in big.columns])), F.lit(salt))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
    )
    return big_s.join(small_s, on=on + ["_salt"], how=how).drop("_salt")
