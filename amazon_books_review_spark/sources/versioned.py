"""Versioned table snapshots — time travel without Delta.

The reference's platform gets ``VERSION AS OF`` / ``DESCRIBE
HISTORY`` from Delta's transaction log (delta-spark is absent here,
COVERAGE.md §2.11).  This module supplies the same read contract over
plain parquet:

* each write lands under ``<table>/v=N/`` (N monotonically
  increasing) and appends one entry to ``<table>/_versions.json`` —
  the manifest is the commit point, so a crashed write that never
  reached the manifest is invisible to readers (write-ordering gives
  the same reader guarantee a Delta log provides for this
  single-writer layout);
* ``read_versioned(..., version=N)`` is ``VERSION AS OF N``;
  ``version=None`` reads the latest committed snapshot;
* ``history()`` is ``DESCRIBE HISTORY`` (version, timestamp, row
  count, operation note);
* ``vacuum(keep_last=K)`` drops data directories of expired versions
  while keeping their history rows — the storage/time-travel trade
  made explicit.

Scale notes: a snapshot write is a normal parquet write (full
parallelism); the manifest is O(versions) JSON — metadata, never
data.  Partition-scoped evolution composes via
``maintenance.backfill_partitions`` INSIDE a version directory;
cross-version dedup of unchanged files (Delta's real trick) is out of
scope — the contract here is correctness of time travel, priced at
full-copy storage per snapshot, reclaimed by ``vacuum``.
"""

from __future__ import annotations

import json
import shutil
import time
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_versions.json"


class VersionNotFoundError(LookupError):
    """Requested version absent from the manifest (never written, or
    its data was vacuumed)."""


@dataclass
class VersionedTable:
    """Single-writer versioned parquet table rooted at ``path``."""

    path: str

    # -- manifest -----------------------------------------------------------
    def _manifest_path(self) -> Path:
        return Path(self.path) / _MANIFEST

    def history(self) -> list[dict]:
        p = self._manifest_path()
        if not p.exists():
            return []
        return json.loads(p.read_text())

    def latest_version(self) -> int | None:
        hist = self.history()
        return hist[-1]["version"] if hist else None

    # -- write --------------------------------------------------------------
    def write(self, df: DataFrame, note: str = "") -> int:
        """Write ``df`` as the next snapshot; returns its version.

        The data directory is written FIRST, the manifest entry
        appended LAST — readers resolve versions through the manifest,
        so a failure between the two leaves an orphan directory (noise
        for vacuum), never a readable half-snapshot.
        """
        hist = self.history()
        version = (hist[-1]["version"] + 1) if hist else 0
        data_dir = Path(self.path) / f"v={version}"
        df.write.mode("errorifexists").parquet(str(data_dir))
        n_rows = df.sparkSession.read.parquet(str(data_dir)).count()
        hist.append(
            {
                "version": version,
                "committed_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
                "n_rows": n_rows,
                "note": note,
                "vacuumed": False,
            }
        )
        tmp = self._manifest_path().with_suffix(".json.tmp")
        tmp.write_text(json.dumps(hist, indent=2))
        tmp.replace(self._manifest_path())  # atomic manifest swap
        return version

    # -- read ---------------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """``VERSION AS OF version`` (latest committed when None)."""
        hist = self.history()
        if not hist:
            raise VersionNotFoundError(f"{self.path}: no committed versions")
        by_v = {h["version"]: h for h in hist}
        if version is None:
            version = hist[-1]["version"]
        entry = by_v.get(version)
        if entry is None:
            raise VersionNotFoundError(
                f"{self.path}: version {version} was never committed "
                f"(have {sorted(by_v)})"
            )
        if entry.get("vacuumed"):
            raise VersionNotFoundError(
                f"{self.path}: version {version} was vacuumed — history "
                f"retains its metadata only"
            )
        return spark.read.parquet(str(Path(self.path) / f"v={version}"))

    # -- retention ----------------------------------------------------------
    def vacuum(self, keep_last: int) -> list[int]:
        """Drop data for all but the last ``keep_last`` committed
        versions (history rows survive, marked ``vacuumed``).  Also
        removes orphan ``v=*`` directories no manifest entry claims.
        Returns the versions whose data was removed."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        hist = self.history()
        keep = {h["version"] for h in hist[-keep_last:]}
        removed: list[int] = []
        for h in hist[:-keep_last] if len(hist) > keep_last else []:
            if h["vacuumed"] or h["version"] in keep:
                continue
            shutil.rmtree(Path(self.path) / f"v={h['version']}", ignore_errors=True)
            h["vacuumed"] = True
            removed.append(h["version"])
        claimed = {h["version"] for h in hist}
        for d in Path(self.path).glob("v=*"):
            try:
                v = int(d.name.split("=", 1)[1])
            except ValueError:
                continue
            if v not in claimed:
                shutil.rmtree(d, ignore_errors=True)  # orphan of a failed write
        tmp = self._manifest_path().with_suffix(".json.tmp")
        tmp.write_text(json.dumps(hist, indent=2))
        tmp.replace(self._manifest_path())
        return removed
