"""Registry mapping query names → (Spark callable, DuckDB oracle SQL).

Every operator claimed in SURVEY.md §2 registers here; the driver compares
each Spark result against its oracle at sf0.01 (row-count + schema +
order-insensitive value-hash). Column names are aliased identically on both
sides — the driver sorts columns by name before hashing.

Float discipline (see tools/check.py): double SUM/AVG are order-dependent, so
aggregates that sum doubles go through ``decimal`` (exact, order-independent)
and cast back to double; mirror expressions are written in the same
evaluation order on both sides so scalar doubles match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QueryDef(name, fn, oracle, tags, bench)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in QUERIES.items() if q.bench}
