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


# --- Driver verification window -------------------------------------------
#
# The round driver records hard CORRECTNESS rows for only the first 50
# catalog names in alphabetical order.  The catalog is larger than that,
# so without intervention a third of it never receives a hard driver
# signal (VERDICT r2 "do this" #1).  ``DRIVER_VERIFIED`` records, for
# every query that has already earned a green driver row, the last round
# whose CORRECTNESS_r{N}.json contains it.  ``driver_queries()`` /
# ``driver_oracles()`` (used by __spark_entry__) prefix those names with
# ``zz_`` so the still-unverified queries sort into the 50-row window
# under their canonical names, while the already-verified ones rotate to
# the back of the alphabet.  The mapping is purely a registration-name
# transform: implementations, oracles, tests, and bench all keep using
# canonical names.

DRIVER_VERIFIED: dict[str, int] = {
    # round 1 ∪ round 2 green rows (CORRECTNESS_r01.json / _r02.json);
    # value = most recent round with a row for the name.
    "approx_distinct_users": 2,
    "asof_join_events_orders": 2,
    "cast_garbage_to_null": 2,
    "catalog_persisted_rollup": 2,
    "clean_listish_strings": 2,
    "corpus_prep_pipeline": 2,
    "cube_order_stats": 2,
    "customer_set_ops": 2,
    "data_quality_report": 2,
    "dedup_clusters": 2,
    "dedup_exact_docs": 2,
    "dedup_incremental_exact": 2,
    "dedup_incremental_neardup": 2,
    "dedup_minhash_lsh": 2,
    "dedup_neardup_lsh_verified": 2,
    "dedup_ngram_jaccard": 2,
    "dedup_simhash": 2,
    "distinct_rows": 2,
    "distinct_suppliers_per_flag": 2,
    "doc_fingerprints": 2,
    "embedding_neardup_lsh_verified": 2,
    "embedding_neardup_pairs": 2,
    "explode_cross_product": 2,
    "filter_prefix_or_null": 2,
    "flagship_gold_rollup": 2,
    "flagship_via_sql": 2,
    "global_top_orders": 2,
    "grouping_sets_revenue": 2,
    "helpfulness_ratio": 2,
    "impute_and_fill": 2,
    "json_extract_props": 2,
    "json_struct_extract": 2,
    "multimodal_audio_chunks": 2,
    "multimodal_binary_meta": 2,
    "multimodal_decode_meta": 2,
    "multimodal_frame_samples": 2,
    "null_audit": 2,
    "orders_rollup": 2,
    "outer_join_audit": 2,
    "pack_token_budget": 2,
    "pivot_event_counts": 2,
    "range_join_value_bands": 2,
    "scalar_functions_showcase": 2,
    "semi_anti_customers": 2,
    "session_window_counts": 2,
    "sessionize_events": 2,
    "sessionize_events_stateful": 2,
    "similarity_cosine_topk": 2,
    "similarity_cosine_topk_arrow": 2,
    "similarity_ivf_topk": 2,
    "similarity_lsh_topk": 1,
    "sliding_window_counts": 1,
    "stats_moments": 1,
    "streaming_stream_static_join": 1,
    "streaming_stream_stream_join": 1,
    "streaming_windowed_counts": 1,
    "temporal_roundtrip": 1,
    "text_lang_id": 1,
    "text_quality_scores": 1,
}

_WINDOW_PREFIX = "zz_"


def driver_name(name: str) -> str:
    """Registration name as exposed to the driver for this round."""
    return _WINDOW_PREFIX + name if name in DRIVER_VERIFIED else name


def canonical_name(driver_key: str) -> str:
    """Inverse of :func:`driver_name`."""
    if driver_key.startswith(_WINDOW_PREFIX):
        base = driver_key[len(_WINDOW_PREFIX):]
        if base in DRIVER_VERIFIED:
            return base
    return driver_key


def driver_queries() -> dict[str, QueryFn]:
    return {driver_name(n): fn for n, fn in sorted(all_queries().items())}


def driver_oracles() -> dict[str, str]:
    return {driver_name(n): sql for n, sql in sorted(all_oracles().items())}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers catalog entries."""
    global _LOADED
    if _LOADED:
        return
    # Imports are side-effectful (each module's @query calls register).
    from amazon_books_review_spark.plans import registry  # noqa: F401

    _LOADED = True
