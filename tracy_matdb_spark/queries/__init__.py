"""Query registry: every operator's demo query + its DuckDB oracle SQL.

Each entry registered here is surfaced through ``__spark_entry__.py``:
``queries()[name]`` runs the Spark implementation, ``oracle_sql()[name]``
is the ANSI-SQL equivalent DuckDB runs on the same parquet tables. The
driver hash-compares both at sf0.01 (CORRECTNESS gate); names/aliases of
output columns must match exactly on both sides.

Entries with ``oracle=None`` are genuinely non-SQL-expressible (e.g.
eigendecomposition UDTFs) and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    headline: bool = False  # included in bench.py's timed set
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, headline: bool = False, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, headline=headline, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all query modules (side effect: fills REGISTRY) and return it."""
    from tracy_matdb_spark.queries import (  # noqa: F401
        corpus,
        coverage,
        crystalq,
        domain,
        events,
        ingest,
        llm,
        relational,
    )

    return REGISTRY
