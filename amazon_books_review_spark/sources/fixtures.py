"""Fixture-directory lifecycle for queries that materialize an
intermediate on local disk (CSV/JSONL/ORC round-trips, streaming
sinks, bucketed tables).

The leak this module closes (ADVICE r4 #2): fixture paths carry a PID
suffix for cross-process race-freedom, so every driver / pytest / bench
process mints fresh directories — and nothing ever removed the old
ones, growing /tmp and spark-warehouse across runs.  Policy:

- **own-process cleanup**: every path this process creates is
  registered and removed at interpreter exit (atexit — safe for
  batch-materializing queries because the DataFrame returned to the
  caller is always re-read-and-collected before exit).
- **stale sweep**: before minting a path, same-prefix siblings whose
  PID suffix is no longer a live process are removed — so even
  SIGKILLed runs (no atexit) are cleaned by the NEXT run, while a
  concurrently-running process's fixtures are never touched.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
import tempfile
import time

_OWNED: set[str] = set()

_PID_SUFFIX = re.compile(r"_(\d+)$")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else — leave it alone
    except OSError:
        return False
    return True


def _remove(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)


@atexit.register
def _cleanup_owned() -> None:
    for path in list(_OWNED):
        _remove(path)


def register_owned(path: str) -> str:
    """Mark ``path`` for removal at this process's exit."""
    _OWNED.add(path)
    return path


def sweep_stale(parent: str, prefix: str) -> None:
    """Remove ``{parent}/{prefix}*_{pid}`` entries whose pid is dead."""
    try:
        names = os.listdir(parent)
    except OSError:
        return
    for name in names:
        if not name.startswith(prefix):
            continue
        m = _PID_SUFFIX.search(name)
        if m and int(m.group(1)) != os.getpid() and not _pid_alive(int(m.group(1))):
            _remove(os.path.join(parent, name))


def pid_fixture_path(prefix: str, tag: str) -> str:
    """Deterministic per-(prefix, tag, pid) path under the system temp
    dir: idempotent within a process (callers overwrite), race-free
    across processes, swept + atexit-cleaned by the policy above."""
    tmp = tempfile.gettempdir()
    sweep_stale(tmp, prefix)
    return register_owned(os.path.join(tmp, f"{prefix}{tag}_{os.getpid()}"))


_STAGED: dict[str, str] = {}


def safe_tag(*parts: str) -> str:
    """Filesystem-safe tag from path-ish parts (joins, strips seps)."""
    return "_".join(
        p.strip("/").replace("/", "_").replace(".", "_") for p in parts
    )


def staged_input(tag: str, build) -> str:
    """Process-cached INPUT fixture: ``build(path)`` materializes the
    dataset on the first call for ``tag``; every later call in this
    process returns the same path without rebuilding.

    Why (VERDICT r10 #2): streaming catalog queries used to stage
    their source feed (a full Spark write of the events/orders table)
    inside the region the bench times, so the recorded number measured
    fixture I/O as much as the operator — 15.6 s recorded vs 5.6 s
    solo for the outer stream-stream join.  Staging is now once per
    (tag, process); bench pre-stages before its timed pass so the
    timed region is drain + operator only.  Callers must treat the
    returned directory as READ-ONLY — anything per-run (sentinel
    appends, checkpoints, sinks) belongs in its own ephemeral dir
    (see :func:`hardlink_clone` for cheap per-run mutable copies).
    """
    path = _STAGED.get(tag)
    if path is None:
        path = pid_fixture_path("abr_staged_", tag)
        _remove(path)  # same-pid leftover from a crashed prior import
        build(path)
        _STAGED[tag] = path
    return path


def hardlink_clone(src: str, dst: str) -> None:
    """Populate ``dst`` with hard links to ``src``'s files — an O(files)
    mutable snapshot of an immutable staged input (parquet part files
    are never rewritten, so link-sharing the bytes is safe).  Falls
    back to copying if the tmp dir spans filesystems.

    Recurses into subdirectories (ADVICE r11): a staged input written
    with ``partitionBy`` is a directory tree, and a clone that
    silently skipped directories would hand downstream a dataset with
    every partitioned row missing — wrong results, no error.
    Non-file, non-directory entries (sockets, devices) raise instead
    of being dropped."""
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        s, d = os.path.join(src, name), os.path.join(dst, name)
        if os.path.isdir(s):
            hardlink_clone(s, d)
        elif os.path.isfile(s):
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)
        else:
            raise ValueError(
                f"hardlink_clone: unsupported entry type at {s!r} — "
                "staged inputs must contain only files and directories"
            )


def ephemeral_dir(prefix: str) -> str:
    """mkdtemp that is swept at exit (and stale siblings now) — for
    streaming sink/checkpoint dirs that are re-read before returning."""
    tmp = tempfile.gettempdir()
    # mkdtemp names end in a random token, not a pid — sweep only our
    # registered ones at exit; stale ones have no liveness marker, so
    # age them out: anything older than a day is from a dead run.
    for name in os.listdir(tmp):
        if name.startswith(prefix):
            path = os.path.join(tmp, name)
            try:
                if (os.path.getmtime(path) < time.time() - 86400
                        and path not in _OWNED):
                    _remove(path)
            except OSError:
                pass
    return register_owned(tempfile.mkdtemp(prefix=prefix))
