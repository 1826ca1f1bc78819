"""A WARC-flavored corpus container as a Spark 4 Python Data Source.

LLM corpora arrive in record-container formats (WARC from Common
Crawl being the canonical one) that Spark has no built-in reader for.
This module implements a minimal such container — header-framed text
records — through the ``pyspark.sql.datasource`` extension API, with
the three properties a 100 TB ingest actually needs:

* **parallel scan**: one input partition per container file (the WARC
  pattern — files are the unit of parallelism because records are not
  byte-splittable), so a 10 000-file corpus fans out to 10 000 tasks;
* **stats-based file pruning**: the writer's ``commit`` records per-
  file ``doc_id`` min/max in a ``_MANIFEST.json`` sidecar (the
  parquet-footer trick), and the reader's ``pushFilters`` accepts
  ``doc_id`` range predicates so ``partitions()`` can skip whole
  files before any task launches;
* **residual record-level pushdown**: accepted filters are ALSO
  applied while parsing, so a partially-overlapping file ships only
  matching rows across the Python->JVM Arrow boundary.

Record layout (one record; text payload must be newline-free, which
the writer enforces — real WARC frames payloads by byte length
instead, a deliberate simplification here):

    ---WARCISH/1.0---
    doc-id: 17
    lang: en
    source: src3
    length: 128

    <single line of text>

The format is intentionally NOT expressible by ``spark.read.text`` +
parsing: records span a variable number of lines, so correctness of
the custom source is checked by round-trip value hash against the
parquet original (plans/pyds_queries.py).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

FORMAT_NAME = "warcish"
RECORD_MARK = "---WARCISH/1.0---"
MANIFEST = "_MANIFEST.json"
DATA_EXT = ".warcish"

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
        StructField("text", StringType()),
    ]
)


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


@dataclass
class _FileStats(WriterCommitMessage):
    filename: str
    min_id: int | None
    max_id: int | None
    n_records: int


class WarcishWriter(DataSourceWriter):
    """One container file per write task; ``commit`` assembles the
    stats manifest driver-side (the cheap analogue of parquet footers
    + ``_metadata``)."""

    def __init__(self, path: str, overwrite: bool) -> None:
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> _FileStats:
        os.makedirs(self.path, exist_ok=True)
        filename = f"part-{uuid.uuid4().hex}{DATA_EXT}"
        lo: int | None = None
        hi: int | None = None
        n = 0
        with open(os.path.join(self.path, filename), "w", encoding="utf-8") as fh:
            for row in iterator:
                text = row.text or ""
                if "\n" in text:
                    raise ValueError(
                        "warcish payloads are single-line; got embedded newline "
                        f"in doc_id={row.doc_id}"
                    )
                fh.write(
                    f"{RECORD_MARK}\n"
                    f"doc-id: {row.doc_id}\n"
                    f"lang: {row.lang}\n"
                    f"source: {row.source}\n"
                    f"length: {row.n_chars}\n"
                    f"\n"
                    f"{text}\n"
                )
                n += 1
                did = int(row.doc_id)
                lo = did if lo is None or did < lo else lo
                hi = did if hi is None or did > hi else hi
        return _FileStats(filename=filename, min_id=lo, max_id=hi, n_records=n)

    def commit(self, messages) -> None:  # noqa: ANN001 - SDK signature
        written = {m.filename for m in messages}
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.endswith(DATA_EXT) and name not in written:
                    os.remove(os.path.join(self.path, name))
        manifest = {
            m.filename: {
                "min_id": m.min_id,
                "max_id": m.max_id,
                "n_records": m.n_records,
            }
            for m in messages
        }
        with open(os.path.join(self.path, MANIFEST), "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)

    def abort(self, messages) -> None:  # noqa: ANN001 - SDK signature
        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def _bounds(pushed: list[Filter]) -> tuple[float, float]:
    """Collapse pushed doc_id predicates to one [lo, hi] interval."""
    lo, hi = float("-inf"), float("inf")
    for f in pushed:
        v = f.value
        if isinstance(f, EqualTo):
            lo, hi = max(lo, v), min(hi, v)
        elif isinstance(f, GreaterThan):
            lo = max(lo, v + 1)
        elif isinstance(f, GreaterThanOrEqual):
            lo = max(lo, v)
        elif isinstance(f, LessThan):
            hi = min(hi, v - 1)
        elif isinstance(f, LessThanOrEqual):
            hi = min(hi, v)
    return lo, hi


class WarcishReader(DataSourceReader):
    def __init__(self, options) -> None:  # noqa: ANN001 - CaseInsensitiveDict
        path = options.get("path")
        if not path:
            raise ValueError("warcish reader requires a path")
        self.path = path
        self.pushed: list[Filter] = []

    # -- planning ----------------------------------------------------------
    def pushFilters(self, filters):  # noqa: ANN001 - SDK signature
        """Accept doc_id range predicates; everything else stays with
        Spark.  Accepted filters are re-applied record-level in
        ``read`` (the manifest prune is necessary-not-sufficient), so
        they are fully handled and NOT yielded back."""
        for f in filters:
            if (
                isinstance(
                    f,
                    (EqualTo, GreaterThan, GreaterThanOrEqual,
                     LessThan, LessThanOrEqual),
                )
                and tuple(f.attribute) == ("doc_id",)
                and isinstance(f.value, int)
            ):
                self.pushed.append(f)
            else:
                yield f

    def _manifest(self) -> dict | None:
        try:
            with open(os.path.join(self.path, MANIFEST), encoding="utf-8") as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None

    def partitions(self):
        files = sorted(
            n for n in os.listdir(self.path) if n.endswith(DATA_EXT)
        )
        manifest = self._manifest()
        if manifest is not None and self.pushed:
            lo, hi = _bounds(self.pushed)
            files = [
                n
                for n in files
                if n not in manifest
                or manifest[n]["min_id"] is None
                or not (manifest[n]["max_id"] < lo or manifest[n]["min_id"] > hi)
            ]
        # No surviving file still needs one (empty) partition: Spark
        # requires at least one.
        return [InputPartition(n) for n in files] or [InputPartition(None)]

    # -- execution ---------------------------------------------------------
    def read(self, partition: InputPartition):
        if partition.value is None:
            return
        lo, hi = _bounds(self.pushed)
        for rec in _parse_file(os.path.join(self.path, partition.value)):
            if lo <= rec[0] <= hi:
                yield rec


def _parse_file(path: str):
    """Yield (doc_id, lang, source, n_chars, text) tuples from one
    container file (shared by the batch and stream readers)."""
    with open(path, encoding="utf-8") as fh:
        line = fh.readline()
        while line:
            if line.rstrip("\n") != RECORD_MARK:
                line = fh.readline()
                continue
            headers: dict[str, str] = {}
            while True:
                line = fh.readline()
                if not line or line == "\n":
                    break
                key, _, val = line.rstrip("\n").partition(": ")
                headers[key] = val
            text = fh.readline().rstrip("\n")
            yield (
                int(headers["doc-id"]),
                headers.get("lang"),
                headers.get("source"),
                int(headers["length"]),
                text,
            )
            line = fh.readline()


# ---------------------------------------------------------------------------
# Stream reader (Auto Loader pattern: new container files = new data)
# ---------------------------------------------------------------------------


class WarcishStreamReader(DataSourceStreamReader):
    """Continuous ingest of a growing container directory: the offset
    is a position in the lexicographically-sorted file list, each
    micro-batch covers the files that arrived since the last one, and
    each covered file is one input partition (task).

    This is the Auto Loader/file-source discipline reproduced through
    the Python streaming API, with the same operational contract:
    files are immutable once written and names never re-sort earlier
    than consumed ones (the writer's uuid names + manifest commit give
    atomic visibility).  Exactly-once delivery comes from the offset
    log: a failed batch replays the same [start, end) file span.
    """

    def __init__(self, options) -> None:  # noqa: ANN001 - CaseInsensitiveDict
        path = options.get("path")
        if not path:
            raise ValueError("warcish stream reader requires a path")
        self.path = path

    def _files(self) -> list[str]:
        try:
            return sorted(
                n for n in os.listdir(self.path) if n.endswith(DATA_EXT)
            )
        except OSError:
            return []

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def latestOffset(self) -> dict:
        return {"idx": len(self._files())}

    def partitions(self, start: dict, end: dict):
        files = self._files()[start["idx"]:end["idx"]]
        return [InputPartition(n) for n in files]

    def read(self, partition: InputPartition):
        yield from _parse_file(os.path.join(self.path, partition.value))

    def commit(self, end: dict) -> None:
        # Offsets are tracked by the engine's offset log; nothing to
        # garbage-collect source-side (files are the durable record).
        pass


class WarcishDataSource(DataSource):
    """``spark.read.format("warcish")`` / ``df.write.format("warcish")``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> WarcishReader:
        return WarcishReader(self.options)

    def streamReader(self, schema: StructType) -> WarcishStreamReader:
        return WarcishStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> WarcishWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("warcish writer requires a path")
        return WarcishWriter(path, overwrite)


def register(spark) -> None:  # noqa: ANN001
    """Idempotent per-session registration."""
    spark.dataSource.register(WarcishDataSource)
