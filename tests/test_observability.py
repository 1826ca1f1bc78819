"""DataFrame.observe metrics: values exact, plan free of extra scans."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from amazon_books_review_spark.operators import metrics
from amazon_books_review_spark.sources.io import load_table


def test_corpus_ingest_audit_metrics_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    observed, obs = metrics.corpus_ingest_audit(docs)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    expect = docs.select(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (F.col("text").isNull() | (F.length(F.trim("text")) == 0)).cast(
                "long"
            )
        ).alias("n_null_or_empty"),
        F.min(F.length("text")).alias("min_chars"),
        F.max(F.length("text")).alias("max_chars"),
    ).first()
    assert got["n_rows"] == expect["n_rows"] > 0
    assert got["n_null_or_empty"] == expect["n_null_or_empty"]
    assert got["min_chars"] == expect["min_chars"]
    assert got["max_chars"] == expect["max_chars"]


def test_streaming_observe_per_batch_metrics(spark, sf_dir, tmp_path):
    """Streaming observe: per-micro-batch metrics must appear in
    observedMetrics and sum to the exact input totals across the
    availableNow drain."""
    from amazon_books_review_spark.streaming.queries import _events_stream

    stream = metrics.observe_stream(
        _events_stream(spark, sf_dir),
        "ingest",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_user": F.sum(F.col("user_id").isNull().cast("long")),
        },
    )
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    seen_rows = 0
    seen_nulls = 0
    for p in q.recentProgress:
        om = p["observedMetrics"].get("ingest") if p.get("observedMetrics") else None
        if om:
            seen_rows += om["n_rows"]
            seen_nulls += om["n_null_user"]
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert seen_rows == batch.count()
    assert seen_nulls == batch.filter(F.col("user_id").isNull()).count()


def test_observation_adds_no_scan_or_shuffle(spark, sf_dir):
    """The whole point: telemetry must ride the existing pass.  The
    observed plan gets a CollectMetrics node and NOTHING else — same
    single scan, zero Exchanges for a pure projection pipeline."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    observed, _ = metrics.with_observation(
        docs, {"n": F.count(F.lit(1))}
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        observed.explain("formatted")
    plan = buf.getvalue()
    assert "CollectMetrics" in plan
    # formatted output prints each node twice (tree + detail section):
    # one scan node == two occurrences
    assert plan.count("Scan parquet") == 2
    assert "Exchange" not in plan
