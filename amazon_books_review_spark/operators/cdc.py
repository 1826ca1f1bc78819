"""Change-data-capture between table snapshots — the read side of the
lakehouse upsert story (`operators/merge.py` is the write side).

Delta's Change Data Feed (the reference's platform would expose it as
``table_changes(...)``) emits, for a pair of table versions, the rows
that changed and how: ``insert``, ``delete``,
``update_preimage``/``update_postimage``.  Without Delta in this
runtime the engine derives the same feed from any two snapshots with
ONE full-outer join on the key — which is also the general tool for
"diff yesterday's build against today's" data-quality checks at
100 TB (both sides shuffle once on the key; the change classification
is row-local).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Delta CDF change-type vocabulary, reused verbatim.
INSERT = "insert"
DELETE = "delete"
UPDATE_PRE = "update_preimage"
UPDATE_POST = "update_postimage"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change feed from ``old`` -> ``new``.

    Emits only changed rows, with a ``_change_type`` column:

    * key only in ``new``            -> one ``insert`` row (new values)
    * key only in ``old``            -> one ``delete`` row (old values)
    * key in both, any compared
      column differs (null-safe)     -> ``update_preimage`` (old values)
                                        + ``update_postimage`` (new values)

    Unchanged rows are dropped.  ``compare_cols`` defaults to every
    non-key column (both snapshots must share the schema).  Output
    columns: key + compared columns + ``_change_type``.

    Scale shape: one Exchange per snapshot on the key, then the
    classification and the pre/post fan-out are projection-local (the
    2x update fan-out is an in-row ``explode`` of a 2-element array,
    no extra shuffle).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    cols = keys + compare_cols
    o = old.select(*[F.col(c).alias(f"o_{c}") for c in cols])
    n = new.select(*[F.col(c).alias(f"n_{c}") for c in cols])
    cond = None
    for k in keys:
        c = F.col(f"o_{k}") == F.col(f"n_{k}")
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")

    in_old = F.col(f"o_{keys[0]}").isNotNull()
    in_new = F.col(f"n_{keys[0]}").isNotNull()
    differs = None
    for c in compare_cols:
        d = ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}"))
        differs = d if differs is None else (differs | d)
    if differs is None:  # key-only table: presence IS the content
        differs = F.lit(False)

    def image(prefix: str, change: str):
        return F.struct(
            *[F.col(f"{prefix}_{c}").alias(c) for c in cols],
            F.lit(change).alias("_change_type"),
        )

    images = (
        F.when(in_new & ~in_old, F.array(image("n", INSERT)))
        .when(in_old & ~in_new, F.array(image("o", DELETE)))
        .when(differs, F.array(image("o", UPDATE_PRE), image("n", UPDATE_POST)))
        .otherwise(F.array().cast("array<void>"))
    )
    exploded = j.select(F.explode(images).alias("ch"))
    return exploded.select(
        *[F.col(f"ch.{c}").alias(c) for c in cols],
        F.col("ch._change_type").alias("_change_type"),
    )
