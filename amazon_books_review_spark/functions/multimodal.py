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


#: Output schema of the frame-sampling stage.
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_md5 string"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    stride: int = 10,
    strict: bool = False,
) -> DataFrame:
    """Video-style frame sampling: ``mapInPandas`` with per-row
    FAN-OUT — each payload emits one row per sampled frame (every
    ``stride``-th of its frames).  This is the variable-output batch
    shape a real video pipeline needs (a fixed-rate sampler over
    ffmpeg-decoded frames); the codec itself is stubbed exactly like
    :func:`decode_image_meta`.

    Deterministic fake: frame count = payload_bytes % 240 + 1; a
    frame's content hash = md5(md5(payload) + ':' + idx) — cheap (the
    payload is hashed once, not per frame) and reproducible in any
    engine, so the full fan-out mechanics are oracle-checkable.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real frame sampling requires a video codec; "
                    "install one and replace this branch"
                )
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                base = hashlib.md5(bytes(payload)).hexdigest()
                n_frames = len(payload) % 240 + 1
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(f"{base}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(hashes, dtype="object"),
                }
            )

    return df.mapInPandas(_sample, schema=FRAME_SCHEMA)


def chunk_payload(df: DataFrame, id_col: str, chunk_bytes: int = 1024) -> DataFrame:
    """Audio-style fixed-size chunking — Catalyst-NATIVE (sequence +
    explode + substring on the binary column): splitting bytes needs
    no decoding, so it must not pay the Python/Arrow boundary.  The
    contrast with :func:`sample_frames` is deliberate: chunking is
    pure byte arithmetic (JVM), sampling needs a codec (Pandas UDF).

    Emits (id, chunk_idx, chunk_len, chunk_md5); chunk boundaries are
    deterministic byte offsets, so downstream (e.g. per-chunk feature
    extraction, resumable ingest) can re-derive any chunk.
    """
    n_chunks = F.ceil(F.length("payload") / F.lit(chunk_bytes)).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx")
    chunked = df.select(F.col(id_col), F.col("payload"), idx)
    chunk = F.substring(
        F.col("payload"), F.col("chunk_idx") * chunk_bytes + 1, chunk_bytes
    )
    return chunked.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )
