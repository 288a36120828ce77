"""Registry of the engine's declared query surface (SURVEY.md §2.3).

Each entry pairs a Spark DataFrame builder with (when SQL-expressible) an
equivalent DuckDB oracle SQL. Column names/aliases are kept identical on both
sides — the driver's correctness gate sorts columns by name and hashes values.

Determinism contract (FIXTURES.md §C): every query has a total ORDER BY;
doubles are rounded in-query to a fixed precision; timestamps that could differ
in sub-second representation across engines are rendered explicitly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "EngineQuery"] = {}


@dataclass
class EngineQuery:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL over views region/nation/.../embeddings; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def query(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = EngineQuery(name=name, builder=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Builder]:
    return {n: q.builder for n, q in REGISTRY.items()}


def oracle_map() -> dict[str, str]:
    return {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}
