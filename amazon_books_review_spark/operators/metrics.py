"""Single-pass pipeline metrics via ``observe`` — the fix for the
reference's repeated-count anti-pattern.

The reference runs ``.count()`` seven times through one cleaning chain
(BD:55,100,129,136,143,178,208), each a full recompute of the CSV
lineage (SURVEY §4.2.1).  ``Observation`` attaches aggregate metrics
to a SINGLE pass: the pipeline's one real action also yields every
row-count / null-count probe for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_observation(
    df: DataFrame, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named metrics to the next action over ``df``.

    Returns (observed_df, observation); after any action on
    observed_df (write, count, collect), ``observation.get`` holds the
    metric values — no extra job, no extra scan.

    Example (the BD chain's probes in one pass)::

        df, obs = with_observation(cleaned, {
            "rows": F.count(F.lit(1)),
            "null_images": F.sum(F.col("image").isNull().cast("long")),
        })
        df.write.parquet(out)
        stats = obs.get
    """
    obs = Observation()
    named = [col.alias(name) for name, col in metrics.items()]
    return df.observe(obs, *named), obs


def row_count_metric() -> Column:
    return F.count(F.lit(1))


def null_count_metric(col: str) -> Column:
    return F.sum(F.col(col).isNull().cast("long"))


def observe_stream(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> DataFrame:
    """Streaming form of :func:`with_observation`: attach named
    aggregate metrics to a STREAMING DataFrame.  ``Observation``
    objects are batch-only; streams use the string-name overload and
    surface one metric row PER MICRO-BATCH in
    ``StreamingQueryProgress.observedMetrics[name]`` — the hook
    monitoring pipelines poll (or receive via StreamingQueryListener)
    for per-batch quality gates without a second aggregation.
    """
    named = [col.alias(n) for n, col in metrics.items()]
    return df.observe(name, *named)


def corpus_ingest_audit(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, Observation]:
    """The standard ingest telemetry set for a document batch: row
    count, null/empty text count, and char-length bounds — measured
    during whatever job consumes the returned frame (the CollectMetrics
    node rides the existing pass; zero extra scan or shuffle,
    plan-asserted in tests/test_observability.py)."""
    c = F.col(text_col)
    return with_observation(
        df,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_or_empty": F.sum(
                (c.isNull() | (F.length(F.trim(c)) == 0)).cast("long")
            ),
            "min_chars": F.min(F.length(c)),
            "max_chars": F.max(F.length(c)),
        },
    )
