"""Deterministic sampling/splitting for training-data pipelines.

Every decision here is a pure function of (salt, id) via md5 — no
``rand()`` anywhere, so assignments are reproducible across runs,
partitionings, engines and retries (``rand()`` breaks task-retry
determinism and can't be oracle-checked).  All operators are linear
map/filter stages: zero shuffle, trivially scalable.

The md5 hash family matches the engine's dedup/LSH machinery (md5 is
md5 everywhere), so the DuckDB oracle can reproduce every bucket
assignment with hex-digit arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 100


def hash_bucket(id_col: Column, salt: str, buckets: int = HASH_BUCKETS) -> Column:
    """Deterministic [0, buckets) assignment: the first 7 hex chars of
    ``md5(salt|id)`` (28 bits — exact in a long) mod ``buckets``.
    The primitive under :func:`train_val_test_split` and
    :func:`stratified_sample`; different salts give independent
    assignments (split membership never correlates with sampling)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit("|"), id_col.cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("long")
    return h % buckets


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Reproducible train/val/test assignment (80/10/10 default).

    Output: input columns + ``bucket`` (0-99) + ``split``.  Being
    hash-of-id based, the split is stable under any re-partitioning,
    re-ordering, incremental append, or engine change — the property
    a 100 TB corpus needs so that later data drops never shuffle
    examples across splits.
    """
    b = hash_bucket(F.col(id_col), salt)
    split = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select("*", b.alias("bucket"), split.alias("split"))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Sequence packing: assign each document to a fixed-token-budget
    bin (the pretraining dataset-assembly step that concatenates
    documents into ~`budget`-token training sequences).

    Relational first-fit-in-order: within each group (ordered by id),
    ``seq_bin = floor(exclusive-running-token-sum / budget)``.  One
    window pass — a single shuffle on the group key.  Bins can
    overflow by at most one document (exact greedy packing is
    inherently sequential state; this is the standard streaming
    approximation, and a doc longer than ``budget`` occupies its own
    bin(s) boundary).

    At 100 TB: ``group_cols`` should include a hash bucket (e.g.
    :func:`hash_bucket` of the id) so no single window partition
    holds the whole corpus; packing is embarrassingly parallel across
    groups by construction.
    """
    from pyspark.sql.window import Window

    keys = [F.col(c) for c in (group_cols or [])]
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_tokens = F.coalesce(
        F.sum(F.col(tokens_col)).over(w), F.lit(0).cast("long")
    )
    return df.select(
        "*", F.floor(prev_tokens / F.lit(budget)).cast("long").alias("seq_bin")
    )


def pack_sequences_greedy(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    group_cols: list[str],
) -> DataFrame:
    """EXACT greedy first-fit packing (no bin ever exceeds ``budget``
    unless a single document alone does) — the sequential-state
    complement of :func:`pack_sequences`.

    Greedy packing is inherently order-dependent state, which is
    precisely what ``applyInPandas`` is for: each group arrives as
    one Arrow batch, the Python loop packs it in id order, and groups
    pack in parallel across the cluster.  Same schema contract as
    the relational variant (input + seq_bin).

    Use the relational form when overflow-by-one-doc is tolerable
    (zero Python); use this when the budget is a hard cap.
    """
    import pandas as pd

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, seq_bin long"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins, cur_bin, cur_tokens = [], 0, 0
        for t in pdf[tokens_col]:
            t = int(t)
            if cur_tokens > 0 and cur_tokens + t > budget:
                cur_bin += 1
                cur_tokens = 0
            bins.append(cur_bin)
            cur_tokens += t
        pdf["seq_bin"] = pd.Series(bins, dtype="int64")
        return pdf

    return df.groupBy(*group_cols).applyInPandas(_pack, schema=schema)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its hash
    bucket falls below the stratum's percentage rate.

    The training-mixture primitive (e.g. keep 50% of English, 10% of
    everything else): rates are exact in expectation and, because the
    bucket is a pure hash of the id, the SAME rows are kept on every
    run — resumable pipelines sample identically after a crash.
    """
    b = hash_bucket(F.col(id_col), salt)
    rate = None
    for value, pct in sorted(rates_pct.items()):
        cond = F.col(stratum_col) == value
        rate = F.when(cond, pct) if rate is None else rate.when(cond, pct)
    rate = F.lit(default_pct) if rate is None else rate.otherwise(default_pct)
    return df.filter(b < rate)


def shuffled_shard_manifest(
    df: DataFrame, id_col: str, shards: int = 16, salt: str = "shard"
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    export: every row gets a ``shard`` (which output file) and a
    ``pos`` (its order within that file), both pure functions of
    (salt, id).

    Trainers need examples in an order uncorrelated with ingest order
    (no topical runs within a batch), and they need it REPRODUCIBLY —
    ``df.orderBy(rand())`` changes on every run/retry.  Ordering by
    ``md5(salt|id)`` is a shuffle that any engine can replay bit-for-
    bit, and a different salt is a fresh, independent permutation
    (epoch reshuffles without touching the data).

    Scale shape: one hash partition on ``shard`` + an in-shard sort —
    exactly the clustering the shard-file write needs anyway, so the
    manifest costs nothing extra.  ``shards`` is the skew/size bound:
    size it so one shard fits one task (100 TB at 100k shards = ~1 GB
    files); the per-shard ``row_number`` is then a per-task sort, never
    a global one.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
    shard = hash_bucket(F.col(id_col), salt, buckets=shards)
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        df.select(
            F.col(id_col),
            key.alias("shuffle_key"),
            shard.alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
    )
