"""MERGE INTO semantics as a pure DataFrame operator.

The reference's lakehouse layer leans on Delta for upserts (MA:194-207
reruns overwrite whole tables because notebook-era Delta was the only
MERGE carrier); delta-spark is absent from this runtime (COVERAGE.md
§2.11), so the engine carries the semantics itself: one FULL OUTER
join on the merge key plus row-level CASE resolution — the exact
relational content of

    MERGE INTO target t USING source s ON t.k = s.k
    WHEN MATCHED [AND cond]            THEN UPDATE SET ...
    WHEN NOT MATCHED [AND cond]        THEN INSERT ...
    WHEN NOT MATCHED BY SOURCE [AND c] THEN DELETE

Scale shape: ONE shuffle per side on the merge key (the same cost a
Delta MERGE's inner join pays before its file rewrite), no driver
participation, and the result streams — callers rewrite the target
path/partition from it (`sources/maintenance.backfill_partitions`
pairs with this for partition-scoped rewrites).  Keys must be unique
per side — enforce upstream or the matched-update becomes ambiguous
(same precondition Delta MERGE errors on at runtime).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_dataframes(
    target: DataFrame,
    source: DataFrame,
    key: str | list[str],
    update_set: Mapping[str, Column] | None = None,
    matched_condition: Column | None = None,
    insert_when: Column | None = None,
    delete_when: Column | None = None,
) -> DataFrame:
    """Relational MERGE: returns the post-merge target row set.

    * matched rows (key in both): updated via ``update_set`` (column
      name -> expression over ``t``/``s``-prefixed columns) when
      ``matched_condition`` holds (default: always); otherwise kept.
    * source-only rows: inserted when ``insert_when`` holds (default:
      always) — the source must carry the target's columns.
    * target-only rows: deleted when ``delete_when`` holds (default:
      never — plain upsert).

    ``update_set`` semantics (matches SQL/Delta MERGE):

    * ``update_set=None`` — ``WHEN MATCHED THEN UPDATE SET *``:
      every column of a matched row is replaced by the SOURCE value
      (full-row replace, Delta's star form).
    * ``update_set={...}`` (possibly partial) — ``WHEN MATCHED THEN
      UPDATE SET a = expr, ...``: listed columns take their
      expression; UNLISTED columns keep their TARGET value, exactly
      as a partial ``SET`` list does in SQL MERGE.

    Column references inside the condition/update expressions use the
    prefixed names ``t_<col>`` / ``s_<col>`` (both sides survive into
    the join row).  Output columns are exactly the target's.
    """
    keys = [key] if isinstance(key, str) else list(key)
    t = target.select(
        *[F.col(c).alias(f"t_{c}") for c in target.columns]
    )
    s = source.select(
        *[F.col(c).alias(f"s_{c}") for c in source.columns]
    )
    cond = None
    for k in keys:
        c = F.col(f"t_{k}") == F.col(f"s_{k}")
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, "full_outer")

    in_target = F.col(f"t_{keys[0]}").isNotNull()
    in_source = F.col(f"s_{keys[0]}").isNotNull()
    matched = in_target & in_source
    do_update = matched & (
        matched_condition if matched_condition is not None else F.lit(True)
    )
    do_insert = (~in_target) & in_source & (
        insert_when if insert_when is not None else F.lit(True)
    )
    do_delete = in_target & (~in_source) & (
        delete_when if delete_when is not None else F.lit(False)
    )
    # None => UPDATE SET * (source wins every column); a partial dict
    # leaves unlisted columns at the TARGET value, like SQL MERGE.
    update_default = "s" if update_set is None else "t"
    update_set = dict(update_set or {})

    out_cols = []
    for c in target.columns:
        upd = update_set.get(c, F.col(f"{update_default}_{c}"))
        expr = (
            F.when(do_update, upd)
            .when(do_insert, F.col(f"s_{c}"))
            .otherwise(F.col(f"t_{c}"))
            .alias(c)
        )
        out_cols.append(expr)
    kept = joined.filter(in_source | ~do_delete)
    return kept.filter(in_target | do_insert).select(*out_cols)
