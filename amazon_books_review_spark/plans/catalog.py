"""Query catalog — the driver-facing registry behind __spark_entry__.

Each entry couples a Spark implementation (``(spark, sf_dir) ->
DataFrame``) with its ANSI-SQL oracle for DuckDB.  Column names and
types are aligned on both sides because the driver's comparator sorts
columns by name and hashes values.

Registration happens via the ``@query`` decorator; modules across the
package register their public operators here as they are implemented
(SURVEY.md §2 is the checklist).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from amazon_books_review_spark.session import ensure_session_confs

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    doc: str = ""


_REGISTRY: dict[str, CatalogEntry] = {}


def query(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = CatalogEntry(name=name, fn=wrapped, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: e.fn for name, e in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: e.oracle for name, e in sorted(_REGISTRY.items()) if e.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every module that registers catalog entries."""
    global _LOADED
    if _LOADED:
        return
    # Imports are side-effectful (each module's @query calls register).
    from amazon_books_review_spark.plans import registry  # noqa: F401

    _LOADED = True
