#!/usr/bin/env python3
"""Measure the availableNow micro-batch machinery floor (VERDICT r11
#8): how much of a streaming_* bench entry is Structured Streaming
overhead (offset log, file listing, checkpoint commits, sink
bookkeeping) rather than operator cost.

Three timed points, each a full write_stream drain on a 1-row parquet
input:

- cold_drain: fresh checkpoint, the single input file is processed —
  floor for any first drain (includes one real micro-batch).
- empty_drain: SAME checkpoint re-drained with no new files — the
  pure machinery floor (zero data processed; one no-op trigger).
- second_query_cold: a second fresh-checkpoint drain in the same
  session — cold_drain minus first-query session costs (stream
  codegen warm-up), the steady-state per-query floor bench entries
  actually pay.

Prints one JSON line; PERF.md records the numbers so verdicts can
separate machinery floor from operator cost without solo re-times.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    from amazon_books_review_spark.session import get_session
    from amazon_books_review_spark.sources.io import (
        read_stream_parquet,
        write_stream,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(
        app_name="abr-streaming-floor",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="abr_floor_")
    src = os.path.join(root, "src")
    spark.range(1).selectExpr("id", "CAST(id AS STRING) AS v").write.parquet(src)
    schema = spark.read.parquet(src).schema

    def drain(tag: str) -> float:
        t0 = time.perf_counter()
        q = write_stream(
            read_stream_parquet(spark, src, schema),
            os.path.join(root, f"sink_{tag}"),
            os.path.join(root, f"ckpt_{tag}"),
            query_name=f"floor_{tag}",
        )
        q.awaitTermination()
        return round(time.perf_counter() - t0, 3)

    cold = drain("a")

    t0 = time.perf_counter()
    q = write_stream(
        read_stream_parquet(spark, src, schema),
        os.path.join(root, "sink_a"),
        os.path.join(root, "ckpt_a"),  # same checkpoint: no new files
        query_name="floor_empty",
    )
    q.awaitTermination()
    empty = round(time.perf_counter() - t0, 3)

    second = drain("b")

    print(json.dumps({
        "cold_drain_sec": cold,
        "empty_drain_sec": empty,
        "second_query_cold_sec": second,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
