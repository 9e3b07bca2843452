"""Named-query registry.

Every judged operator (SURVEY.md §2) registers here as a named query:
a Spark implementation ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, the exact DuckDB oracle SQL the
driver diffs it against. Keeping impl + oracle side-by-side in the same
decorator call is what keeps column names / types / tiebreakers in sync
— the driver hash-compares values after sorting columns by name, so
drift between the two is an instant failure.

Float-determinism contract used throughout the registered queries:
sums/avgs over double columns are computed by casting to DECIMAL first
(exact, order-independent) and casting the final result back to DOUBLE,
so Spark's parallel partial aggregates and DuckDB's single-threaded
fold produce bit-identical values. Top-k queries always carry a total
ordering (explicit tiebreaker keys).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


_loaded = False


def _ensure_loaded() -> None:
    """Import every operator module so decorators run."""
    global _loaded
    if _loaded:
        return
    from master_airflow_spark import operators  # noqa: F401  (imports all submodules)

    _loaded = True
