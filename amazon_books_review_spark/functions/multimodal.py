"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (the part that must be right at 100 TB):
- media is an opaque ``binary`` column plus a typed metadata struct —
  never strings, never base64 (2x size), never exploded per-pixel.
- decode / feature-extraction runs via ``mapInPandas`` (Arrow batch
  transfer, one Python worker per partition, batch-shaped) — the ONLY
  sanctioned Python boundary in the engine.
- partitioning: payload rows are large; writers should cap
  ``maxRecordsPerFile`` and partition by a coarse key so a single
  task's Arrow batches stay in memory (see sources/io.write_parquet).

The actual image/audio decode is STUBBED — the container has no
imaging libs.  :func:`decode_image_meta` raises NotImplementedError
when ``strict=True``; by default it produces a clearly-fake but
deterministic decode (derived from the payload bytes) so the full
Spark plumbing — schema, batching, UDF signature — is real and
tested end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the decode stage (what a real decoder would emit).
DECODE_META_SCHEMA = (
    "doc_id bigint, media_type string, payload_bytes bigint, "
    "fake_width int, fake_height int, checksum string"
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a media column: utf-8 payload bytes + media metadata.
    (In production this column arrives from the lakehouse as real
    image/audio bytes; everything downstream is shape-identical.)"""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def binary_meta(df: DataFrame, id_col: str) -> DataFrame:
    """Catalyst-native payload metadata: size + checksum.  No Python —
    metadata extraction that doesn't need decoding must never pay the
    Arrow boundary cost."""
    return df.select(
        F.col(id_col),
        F.col("media_type"),
        F.length(F.col("payload")).cast("long").alias("payload_bytes"),
        F.md5(F.col("payload")).alias("checksum"),
    )


def decode_image_meta(df: DataFrame, id_col: str = "doc_id", strict: bool = False) -> DataFrame:
    """The decode stage: mapInPandas over (id, payload, media_type).

    ``strict=True`` is the production wiring — it raises
    NotImplementedError until a real decoder (PIL/ffmpeg/torchcodec)
    is dropped into ``_decode_batch``.  The default produces
    deterministic fake dimensions derived from the payload so the
    batch shape, schema and partition behavior are fully exercised.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decode requires an imaging library; "
                    "install one and replace this branch"
                )
            payloads = pdf["payload"]
            sizes = payloads.map(len)
            digests = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf["media_type"],
                    "payload_bytes": sizes.astype("int64"),
                    # deterministic fake decode: dims derived from size
                    "fake_width": (sizes % 640 + 1).astype("int32"),
                    "fake_height": (sizes % 480 + 1).astype("int32"),
                    "checksum": digests,
                }
            )

    return df.mapInPandas(_decode_batch, schema=DECODE_META_SCHEMA)
