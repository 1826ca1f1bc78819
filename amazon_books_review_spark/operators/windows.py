"""Window operators — extension surface (none exist in the reference,
SURVEY.md §2.5); required by the similarity top-k and dedup canonical-
row selection.

Scale note: a window partitioned by a key shuffles once on that key —
same cost class as a groupBy.  The trap is ``Window.orderBy`` with NO
partition key: that collapses everything to one task.  Every helper
here requires a partition key for exactly that reason; global top-k is
provided separately via sort+limit (which Spark executes as a
distributed TakeOrdered, not a single-task sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_key(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_alias: str = "rank",
) -> DataFrame:
    """Top-k rows per key via row_number.

    ``order_by`` must be a deterministic total order (include a
    tiebreaker column!) or the selected rows are run-dependent.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= k)
    )


def lag_lead(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    col: str,
    offsets: Sequence[int] = (-1, 1),
) -> DataFrame:
    """Previous/next values within a key (sessionization building
    block; the streaming analog is applyInPandasWithState)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df
    for off in offsets:
        fn = F.lag(col, -off) if off < 0 else F.lead(col, off)
        out = out.withColumn(f"{col}_{'prev' if off < 0 else 'next'}{abs(off)}", fn.over(w))
    return out


def global_top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k — sort+limit, which Spark runs as TakeOrdered
    (per-partition top-k, then a k-row merge on the driver-side
    single reducer).  No full global sort happens; this is safe at
    any scale for small k."""
    return df.orderBy(*order_by).limit(k)


def salted_top_k_per_key(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    salt_col: Column,
    n_salts: int = 8,
    rank_alias: str = "rank",
) -> DataFrame:
    """Skew-proof per-key top-k in two phases.

    :func:`top_k_per_key` shuffles the WHOLE table on the key — one
    pathologically hot key (a group holding more rows than a task's
    memory) lands in one reducer and dominates the stage.  Phase 1
    here ranks within ``(key, salt)`` — any key's largest partition is
    bounded at ~1/n_salts of the key — and keeps ``k`` rows per salt,
    because the true top-k must survive in SOME salt's local top-k
    (each row's salt is fixed, so the global i-th best is at worst
    the k-th best within its own salt for i <= k).  Phase 2 re-ranks
    the ≤ n_salts*k survivors per key: a shuffle of
    O(keys * n_salts * k) rows, independent of data size.

    ``salt_col`` must be a DETERMINISTIC function of the row (an id
    mod, a hash bucket) — ``rand()`` would re-assign on retries and
    both phases assume a row's salt is stable.  Same determinism
    contract as :func:`top_k_per_key`: ``order_by`` must be a total
    order.
    """
    w1 = Window.partitionBy(*partition_by, "_salt").orderBy(*order_by)
    local = (
        df.withColumn("_salt", salt_col)
        .withColumn("_lrank", F.row_number().over(w1))
        .filter(F.col("_lrank") <= k)
    )
    w2 = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        local.drop("_salt", "_lrank")
        .withColumn(rank_alias, F.row_number().over(w2))
        .filter(F.col(rank_alias) <= k)
    )
