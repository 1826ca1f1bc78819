"""SparkSession construction and semantic-conf pinning.

The reference mutates session confs mid-notebook
(``spark.conf.set("spark.sql.legacy.timeParserPolicy","LEGACY")`` at
Amazon-book-review_books_details.py:111) and implicitly relies on
non-ANSI cast-invalid-to-NULL semantics (the float casts at
Amazon-book-review_books_details.py:99 and
Amazon-book-review_books_reviews.py:47-67 exist precisely to null out
garbage rows).  Spark 4 defaults ANSI mode ON, so those semantics must
be pinned explicitly.  We centralise every semantic conf here: one
builder for library users, plus :func:`ensure_session_confs` for when
the session is handed to us (the driver harness creates its own).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Runtime-settable SQL confs that define this engine's semantics.
#: All of these are session-scoped (safe to set on a borrowed session).
SEMANTIC_CONFS: dict[str, str] = {
    # Reference sets this mid-pipeline (BD:111) to parse "yyyy"-only
    # dates; we pin it up front.
    "spark.sql.legacy.timeParserPolicy": "LEGACY",
    # Reference relies on CAST(bad-string AS float) -> NULL
    # (BD:99, BR:47-48, BR:67).  Spark 4 turned ANSI on by default.
    "spark.sql.ansi.enabled": "false",
    # Deterministic wall-clock semantics: all timestamp <-> string and
    # epoch conversions happen in UTC so results are reproducible and
    # match the DuckDB oracle regardless of host timezone.
    "spark.sql.session.timeZone": "UTC",
    # Spark rejects parquet TIMESTAMP(NANOS) columns (the events test
    # table uses them); read them as raw nanos longs instead and let
    # sources.io.load_table convert to TimestampType (micros).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

#: Performance confs (builder-time; some also settable at runtime).
PERFORMANCE_CONFS: dict[str, str] = {
    # AQE: runtime partition coalescing + skew-join splitting. At 100 TB
    # the silver join (skewed popular titles) depends on this.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas interchange (Pandas UDFs in functions/).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Let Python Data Sources receive pushed filters (sources/warcish
    # implements pushFilters for manifest-based file pruning); off by
    # default in Spark 4.1.
    "spark.sql.python.filterPushdown.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Pin the engine's semantic confs on an existing session.

    Idempotent and cheap; every public query entry point calls this so
    semantics don't depend on who built the session.
    """
    for key, value in SEMANTIC_CONFS.items():
        spark.conf.set(key, value)
    # Runtime-settable perf confs (ignore any that are builder-only).
    for key, value in PERFORMANCE_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - builder-only conf
            pass
    # A borrowed session still on Spark's stock 200 shuffle partitions
    # gets a local-mode-sane default (AQE coalesces the rest); an
    # explicitly configured value is respected.
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:  # pragma: no cover
        pass
    return spark


def delta_session_confs() -> dict[str, str]:
    """Builder-time confs that enable Delta Lake when ``delta-spark``
    is importable (the reference's table format, MA:34-39); empty when
    it isn't.  Builder-only: the SQL extension cannot be injected into
    an already-running session, so pass these to :func:`get_session`'s
    ``extra_confs`` (or merge into your own builder) before the first
    ``getOrCreate``."""
    import importlib.util

    if importlib.util.find_spec("delta") is None:
        return {}
    return {
        "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
        "spark.sql.catalog.spark_catalog": (
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        ),
    }


#: Streaming state-store confs for large-state jobs.  The default
#: HDFS-backed provider keeps all state on the JVM heap — fine for
#: tests, fatal for 100 TB key cardinalities.  RocksDB (bundled with
#: OSS Spark since 3.2) spills state to local disk with changelog
#: checkpointing.  Session-scoped: set BEFORE starting the streaming
#: query (safe to flip per query).
STREAMING_SCALE_CONFS: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    # bound memory: let RocksDB use its own block cache, not the heap
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
}


def get_session(
    app_name: str = "amazon_books_review_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``shuffle_partitions`` defaults to Spark's own default; tests and
    local runs pass a small value, a real cluster would size it to
    ~2-3x total cores (and rely on AQE coalescing afterwards).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    for key, value in {**SEMANTIC_CONFS, **PERFORMANCE_CONFS}.items():
        builder = builder.config(key, value)
    for key, value in (extra_confs or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return ensure_session_confs(spark)
