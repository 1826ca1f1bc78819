"""In-flight pipeline metrics via ``DataFrame.observe`` (the
CollectMetrics plan node).

The 100 TB rationale: audit counts computed as a SEPARATE aggregation
re-scan the input — at scale that doubles the pipeline's I/O.  An
observation rides the existing pass: the metric expressions evaluate
per-batch inside the job that materializes the DataFrame and merge on
the driver, so quality telemetry (row counts, null rates, bounds) is
free.  This is the mechanism behind Delta Live Tables-style
expectations dashboards; `operators/validation.py` keeps the
*blocking* gate (a deliberate second aggregation whose VALUES are
oracle-checked); this module is the non-blocking twin.

Only aggregate expressions are allowed by the API, and the metrics
become available AFTER an action completes (``Observation.get``
blocks until then) — both constraints documented by upstream Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_observation(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate ``metrics`` to ``df``'s next execution.

    Returns the observed frame (plan-identical but for the
    CollectMetrics node — zero extra shuffle or scan) and the
    :class:`Observation` whose ``.get`` yields the metric dict once
    an action on the returned frame completes.
    """
    obs = Observation(name)
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return observed, obs


def corpus_ingest_audit(df: DataFrame, text_col: str = "text") -> tuple[DataFrame, Observation]:
    """The standard ingest telemetry set for a document batch: row
    count, null/empty text count, and char-length bounds — measured
    during whatever job consumes the returned frame."""
    c = F.col(text_col)
    return with_observation(
        df,
        "corpus_ingest_audit",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_or_empty": F.sum(
                (c.isNull() | (F.length(F.trim(c)) == 0)).cast("long")
            ),
            "min_chars": F.min(F.length(c)),
            "max_chars": F.max(F.length(c)),
        },
    )
