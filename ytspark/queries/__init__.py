"""Query registry — the engine's user-facing query surface.

Every entry pairs a DataFrame-API implementation with (where
SQL-expressible) an ANSI-SQL oracle that DuckDB can run on the same
parquet tables. The driver cross-checks them (row-count + schema +
order-insensitive value-hash) at sf=0.01; ``tools/oracle_check.py``
runs the same comparison locally.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One registered query: Spark impl + optional DuckDB oracle SQL."""

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
):
    """Decorator registering a (spark, sf_dir) -> DataFrame callable."""

    def wrap(fn):
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return wrap


def registry() -> dict[str, Query]:
    # import for side effects: module bodies register their queries
    from ytspark.queries import decision_support, pipeline, relational  # noqa: F401
    from ytspark.operators import (  # noqa: F401
        batchmap,
        dedup,
        multimodal,
        similarity,
        temporal,
        text,
    )
    from ytspark.streaming import queries as streaming_queries  # noqa: F401

    return dict(_REGISTRY)
