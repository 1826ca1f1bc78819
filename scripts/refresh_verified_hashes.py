"""Regenerate plans/verified_hashes.json — the change-aware ledger.

For every query with a green driver row, record the `src_hash` of the
implementation + oracle AS OF THE TREE THE DRIVER VERIFIED — i.e. the
commit of that round's "round N: verdict/advice/correctness/bench"
driver commit (the driver runs against round-final code and commits
the artifacts directly on top, so that commit's package tree is the
verified code).  A query whose current source hash differs from its
recorded one is treated as unverified by `catalog.driver_name` and
re-enters the driver window under its canonical name.

Fully idempotent: the ledger is rebuilt from scratch on every run, so
it is always exactly "hash of each name's green-round tree" no matter
when or how often this runs.  Run it at round start (after the driver
commits the previous round's artifacts) and commit the result.

Mechanics per distinct green round R:

* resolve the driver commit via ``git log --grep '^round R: '``;
* materialize it in a temporary ``git worktree``;
* run a subprocess there that monkeypatches ``catalog.query`` to
  capture (name, raw fn, oracle) before importing the registry — this
  sees the ORIGINAL functions (the registry stores wrapped closures),
  works across every historical tree layout, and never starts Spark;
* hash the dumped sources with the same `hash_parts` the live
  catalog uses.

Names whose round's commit or source cannot be resolved are simply
left out of the ledger — which evicts them into the window, the safe
direction.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from amazon_books_review_spark.plans.catalog import (  # noqa: E402
    DRIVER_VERIFIED,
    _HASH_LEDGER_PATH,
    _LEDGER_ROUND_KEY,
    hash_parts,
)

# Runs inside the historical worktree: dump {name: [source, oracle]}
# for every registered query, without executing any of them.
_DUMP_SNIPPET = r"""
import inspect, json, sys

import amazon_books_review_spark.plans.catalog as cat

captured = {}
_real_query = cat.query

# One-level helper-source expansion, applied IN the historical tree.
# Newer trees carry cat.helper_sources; older ones predate it, so a
# self-contained copy of the same rule runs here — the hash of a
# historical green row must be computed under the CURRENT rule or
# every entry would spuriously evict after a rule change.
def _helper_sources(fn):
    import ast, textwrap
    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    except (OSError, SyntaxError, TypeError):
        return ""
    names = sorted({n.id for n in ast.walk(tree) if isinstance(n, ast.Name)})
    attrs = sorted({
        (n.value.id, n.attr) for n in ast.walk(tree)
        if isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name)})
    g = getattr(fn, "__globals__", {})
    targets = [g.get(nm) for nm in names]
    for mod_nm, attr in attrs:
        mod = g.get(mod_nm)
        if mod is not None:
            targets.append(getattr(mod, attr, None))
    parts, seen = [], set()
    for obj in targets:
        if obj is None or not callable(obj):
            continue
        mod = getattr(obj, "__module__", "") or ""
        if not mod.startswith("amazon_books_review_spark"):
            continue
        key = (mod, getattr(obj, "__qualname__", repr(obj)))
        if key in seen or obj is fn:
            continue
        seen.add(key)
        try:
            parts.append((key[0], key[1], inspect.getsource(obj)))
        except (OSError, TypeError):
            continue
    return "".join(src for _m, _q, src in sorted(parts))

def _recording_query(name, oracle, doc=""):
    def deco(fn):
        captured[name] = [inspect.getsource(fn) + _helper_sources(fn), oracle]
        return _real_query(name, oracle, doc=doc)(fn)
    return deco

cat.query = _recording_query
import amazon_books_review_spark.plans.registry  # noqa: F401  (side-effect registration)

json.dump(captured, sys.stdout)
"""


def _driver_commit(round_no: int) -> str | None:
    out = subprocess.run(
        ["git", "log", "--format=%H", "-n", "1",
         "--grep", f"^round {round_no}: "],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    return out or None


def _dump_round_sources(commit: str) -> dict[str, list]:
    with tempfile.TemporaryDirectory(prefix="vh_tree_") as tmp:
        tree = Path(tmp) / "tree"
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(tree), commit],
            cwd=REPO, capture_output=True, text=True, check=True,
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _DUMP_SNIPPET],
                cwd=tree, capture_output=True, text=True, timeout=300,
            )
            if proc.returncode != 0:
                print(f"  dump failed at {commit[:10]}: {proc.stderr[-500:]}",
                      file=sys.stderr)
                return {}
            return json.loads(proc.stdout)
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", str(tree)],
                cwd=REPO, capture_output=True, text=True,
            )


def main() -> int:
    by_round: dict[int, list[str]] = {}
    for name, rnd in DRIVER_VERIFIED.items():
        by_round.setdefault(rnd, []).append(name)

    ledger: dict[str, str] = {}
    for rnd in sorted(by_round):
        commit = _driver_commit(rnd)
        if commit is None:
            print(f"round {rnd}: no driver commit found — "
                  f"{len(by_round[rnd])} names left evicted", file=sys.stderr)
            continue
        sources = _dump_round_sources(commit)
        missing = [n for n in by_round[rnd] if n not in sources]
        if missing:
            print(f"round {rnd}: {len(missing)} green names absent from its "
                  f"tree (left evicted): {missing[:5]}...", file=sys.stderr)
        for name in by_round[rnd]:
            if name in sources:
                src, oracle = sources[name]
                ledger[name] = hash_parts(src, oracle)
        print(f"round {rnd} @ {commit[:10]}: hashed "
              f"{len(by_round[rnd]) - len(missing)}/{len(by_round[rnd])} names")

    # Stamp the coverage horizon: green rows from LATER rounds postdate
    # this ledger and are trusted by `catalog.change_evicted` until the
    # next refresh folds them in (prevents a whole fresh round's names
    # from being spuriously evicted before the refresh runs).
    out = dict(sorted(ledger.items()))
    out[_LEDGER_ROUND_KEY] = max(by_round) if by_round else -1
    _HASH_LEDGER_PATH.write_text(json.dumps(out, indent=1) + "\n")
    print(
        f"wrote {len(ledger)} entries (ledger round "
        f"{out[_LEDGER_ROUND_KEY]}) -> {_HASH_LEDGER_PATH}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
