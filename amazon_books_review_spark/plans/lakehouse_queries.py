"""Lakehouse-semantics queries, round 7.

The reference's medallion layer gets row-level upserts from Delta
MERGE (environment-gated here, COVERAGE.md §2.11); these queries pin
the engine's own MERGE carrier (`operators/merge.py`) against an
exact DuckDB replay — all three clauses in one statement:

    WHEN MATCHED              THEN UPDATE (full-row replace)
    WHEN NOT MATCHED          THEN INSERT
    WHEN NOT MATCHED BY SOURCE AND <cond> THEN DELETE

Money rides as integer cents and dates as formatted strings so every
hashed column is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_books_review_spark.operators.merge import merge_dataframes
from amazon_books_review_spark.sources.io import load_table

#: deterministic partitioning of the key space into merge behaviors
MERGE_UPD_MOD = 97  # keys % 97 == 0 arrive as source updates (+10% price)
MERGE_INS_MOD = 101  # keys % 101 == 0 spawn an insert under key + OFFSET
MERGE_DEL_MOD = 103  # target-only 'F' keys % 103 == 0 are deleted
MERGE_KEY_OFFSET = 10_000_000  # insert-key offset; above max o_orderkey at test SFs


def _orders_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_day"),
    )


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO orders: one FULL OUTER join resolves updates,
    inserts, and conditional deletes in a single pass.

    Source = 10%-price-bumped copies of keys % {u} (updates) plus new
    rows under key + {off} for keys % {i} (inserts); target-only 'F'
    orders with key % {d} are deleted.  Update arithmetic is integer
    (cents + cents div 10) so the merged row set hash-matches DuckDB
    exactly.

    Scale: one shuffle per side on the merge key — the identical join
    a Delta MERGE plans before its file rewrite; pair with
    `maintenance.backfill_partitions` to scope the rewrite to touched
    partitions instead of the whole table.
    """
    target = _orders_cents(spark, sf_dir)
    updates = target.filter(F.col("o_orderkey") % MERGE_UPD_MOD == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("price_cents") + F.expr("price_cents div 10")).alias("price_cents"),
        "o_day",
    )
    inserts = target.filter(F.col("o_orderkey") % MERGE_INS_MOD == 0).select(
        (F.col("o_orderkey") + F.lit(MERGE_KEY_OFFSET)).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        F.lit(10_000).cast("long").alias("price_cents"),
        "o_day",
    )
    return merge_dataframes(
        target,
        updates.unionByName(inserts),
        "o_orderkey",
        delete_when=(
            (F.col("t_o_orderstatus") == "F")
            & (F.col("t_o_orderkey") % MERGE_DEL_MOD == 0)
        ),
    )


# A formatted literal as the first statement is not a docstring —
# bind the mod constants into __doc__ after definition instead.
if merge_upsert_orders.__doc__:  # stripped to None under -OO
    merge_upsert_orders.__doc__ = merge_upsert_orders.__doc__.format(
        u=MERGE_UPD_MOD, i=MERGE_INS_MOD, d=MERGE_DEL_MOD, off=MERGE_KEY_OFFSET
    )


MERGE_UPSERT_ORACLE = f"""
WITH t AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
           strftime(o_orderdate, '%Y-%m-%d') AS o_day
    FROM orders
), s AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           price_cents + price_cents // 10 AS price_cents, o_day
    FROM t WHERE o_orderkey % {MERGE_UPD_MOD} = 0
    UNION ALL
    SELECT o_orderkey + {MERGE_KEY_OFFSET}, o_custkey, 'N',
           CAST(10000 AS BIGINT), o_day
    FROM t WHERE o_orderkey % {MERGE_INS_MOD} = 0
)
SELECT CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderkey
            ELSE t.o_orderkey END AS o_orderkey,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
            ELSE t.o_custkey END AS o_custkey,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
            ELSE t.o_orderstatus END AS o_orderstatus,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.price_cents
            ELSE t.price_cents END AS price_cents,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_day
            ELSE t.o_day END AS o_day
FROM t FULL JOIN s ON t.o_orderkey = s.o_orderkey
WHERE s.o_orderkey IS NOT NULL
   OR NOT (t.o_orderstatus = 'F' AND t.o_orderkey % {MERGE_DEL_MOD} = 0)
"""


def cdc_orders_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed between two snapshots: the pre-merge orders
    table vs the post-``merge_upsert_orders`` result.

    Exactly Delta CDF's row vocabulary (insert / delete /
    update_preimage / update_postimage), derived engine-side with one
    full-outer key join (`operators/cdc.py`).  CDF is MERGE's inverse,
    so the oracle can state the expected feed in closed form from the
    merge's own key-partitioning rules — a diff bug OR a merge bug
    breaks the hash.
    """
    from amazon_books_review_spark.operators.cdc import snapshot_diff

    old = _orders_cents(spark, sf_dir)
    new = merge_upsert_orders(spark, sf_dir)
    return snapshot_diff(old, new, "o_orderkey")


CDC_ORACLE = f"""
WITH t AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
           strftime(o_orderdate, '%Y-%m-%d') AS o_day
    FROM orders
)
-- inserts: the spawned keys (never collide with existing keys)
SELECT o_orderkey + {MERGE_KEY_OFFSET} AS o_orderkey, o_custkey,
       'N' AS o_orderstatus, CAST(10000 AS BIGINT) AS price_cents, o_day,
       'insert' AS _change_type
FROM t WHERE o_orderkey % {MERGE_INS_MOD} = 0
UNION ALL
-- deletes: target-only 'F' keys on the delete modulus
SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, o_day, 'delete'
FROM t WHERE o_orderstatus = 'F' AND o_orderkey % {MERGE_DEL_MOD} = 0
      AND o_orderkey % {MERGE_UPD_MOD} <> 0
UNION ALL
-- updates with an actual value change (cents div 10 > 0): pre + post
SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, o_day,
       'update_preimage'
FROM t WHERE o_orderkey % {MERGE_UPD_MOD} = 0 AND price_cents // 10 > 0
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus,
       price_cents + price_cents // 10, o_day, 'update_postimage'
FROM t WHERE o_orderkey % {MERGE_UPD_MOD} = 0 AND price_cents // 10 > 0
"""


def incremental_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: apply the CDC change feed to a
    materialized per-customer rollup WITHOUT rescanning the base.

    The per-customer aggregate (n_orders, total_cents) is maintained
    as base (+) delta, where delta folds the change feed with signed
    weights: insert/update_postimage count +1/+price,
    delete/update_preimage count -1/-price.  The result must equal a
    full re-aggregation of the merged table — which is exactly what
    the oracle computes, so a sign error, a missed change type, or a
    double-counted update breaks the hash.

    Scale shape: the base aggregate is customer-grain (never the fact
    table — at 100 TB it is the stored materialization), the delta
    aggregate is FEED-sized, and the combine is one full-outer join
    on the customer key between two customer-grain frames.  Nothing
    rescans the base fact data: that is the entire point of IVM.
    COUNT and SUM are self-maintainable under inserts+deletes; MIN or
    MAX would need the per-group heavy hitters retained (the standard
    IVM caveat) — only self-maintainable aggregates are used here.
    """
    from amazon_books_review_spark.operators.cdc import (
        DELETE,
        INSERT,
        UPDATE_POST,
        UPDATE_PRE,
    )

    base = (
        _orders_cents(spark, sf_dir)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price_cents").alias("total_cents"),
        )
    )
    sign = (
        F.when(F.col("_change_type").isin(INSERT, UPDATE_POST), F.lit(1))
        .when(F.col("_change_type").isin(DELETE, UPDATE_PRE), F.lit(-1))
    )
    delta = (
        cdc_orders_changes(spark, sf_dir)
        .select("o_custkey", "price_cents", sign.alias("w"))
        .groupBy("o_custkey")
        .agg(
            F.sum("w").alias("d_n"),
            F.sum(F.col("w") * F.col("price_cents")).alias("d_cents"),
        )
    )
    b = base.select(
        F.col("o_custkey"), F.col("n_orders").alias("b_n"), F.col("total_cents").alias("b_cents")
    )
    return (
        b.join(delta, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            (F.coalesce("b_n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias("n_orders"),
            (F.coalesce("b_cents", F.lit(0)) + F.coalesce("d_cents", F.lit(0))).alias(
                "total_cents"
            ),
        )
        .filter(F.col("n_orders") > 0)
    )


#: full recompute over the merged table — the IVM acceptance oracle.
INCREMENTAL_AGG_ORACLE = f"""
WITH merged AS ({MERGE_UPSERT_ORACLE})
SELECT o_custkey,
       count(*) AS n_orders,
       CAST(sum(price_cents) AS BIGINT) AS total_cents
FROM merged
GROUP BY o_custkey
"""


# deterministic synthetic v2 of the documents table (the CDC-mod style)
DOCV_UPD_MOD = 7    # text gets ' updated' appended
DOCV_INS_MOD = 11   # spawns a new doc at doc_id + DOCV_ID_OFFSET
DOCV_DEL_MOD = 13   # dropped from v2 (delete wins over update)
DOCV_ID_OFFSET = 1_000_000


def corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-release diff: what changed between corpus v1 and v2,
    summarized per Delta-CDF change type with document and character
    accounting — the "diff the new crawl against the last release"
    report a data curator signs off before retraining.

    v2 derives deterministically from v1 (modulus rules, the MERGE
    fixture style): deletes win over updates; inserts spawn under
    offset ids.  The diff is ONE full-outer key join
    (`operators/cdc.snapshot_diff`), then a change-type-grain
    aggregate — at 100 TB both snapshots shuffle once on doc_id and
    the report is 4 rows.  The oracle states the expected feed in
    closed form from the same rules, so a diff bug or a rule bug
    breaks the hash.
    """
    from amazon_books_review_spark.operators.cdc import snapshot_diff

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    survivors = docs.filter(F.col("doc_id") % DOCV_DEL_MOD != 0)
    v2 = (
        survivors.select(
            "doc_id",
            F.when(
                F.col("doc_id") % DOCV_UPD_MOD == 0,
                F.concat(F.col("text"), F.lit(" updated")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % DOCV_INS_MOD == 0).select(
                (F.col("doc_id") + DOCV_ID_OFFSET).alias("doc_id"), "text"
            )
        )
    )
    feed = snapshot_diff(docs, v2, "doc_id")
    return (
        feed.groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        .select(
            F.col("_change_type").alias("change_type"), "n_docs", "total_chars"
        )
    )


CORPUS_VERSION_DIFF_ORACLE = f"""
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents)
SELECT * FROM (
  SELECT 'insert' AS change_type,
         count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS total_chars
  FROM d WHERE doc_id % {DOCV_INS_MOD} = 0
  UNION ALL
  SELECT 'delete', count(*), CAST(sum(n) AS BIGINT)
  FROM d WHERE doc_id % {DOCV_DEL_MOD} = 0
  UNION ALL
  SELECT 'update_preimage', count(*), CAST(sum(n) AS BIGINT)
  FROM d WHERE doc_id % {DOCV_UPD_MOD} = 0 AND doc_id % {DOCV_DEL_MOD} <> 0
  UNION ALL
  SELECT 'update_postimage', count(*), CAST(sum(n + 8) AS BIGINT)
  FROM d WHERE doc_id % {DOCV_UPD_MOD} = 0 AND doc_id % {DOCV_DEL_MOD} <> 0
) WHERE n_docs > 0
"""


# ---------------------------------------------------------------------------
# Compaction bin-packing (the OPTIMIZE planner)
# ---------------------------------------------------------------------------

#: target compacted-file size, in characters of document payload (the
#: fixture's proxy for bytes; real deployments target 128 MB-1 GB).
COMPACT_TARGET_CHARS = 60_000


def compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the core of every lakehouse
    OPTIMIZE: group input files into target-size output bins so the
    rewrite produces few large files instead of many small ones.
    Input "files" here are the (source, lang) document groups with
    their payload size; one row per file with its assigned bin plus
    the bin's rollup.

    The packer is NEXT-FIT BY OFFSET: files in a stable name order, a
    running cumulative size, and ``bin = (cumsum - size) div target``
    — each file lands in the bin its STARTING offset falls in, so a
    boundary-straddling file overshoots its bin by at most one file
    (the same guarantee next-fit gives, and the standard trade against
    first-fit-decreasing, whose sequential bin state cannot be
    expressed as a scan).

    Scale shape: the packing input is the FILE MANIFEST, not data —
    thousands of rows per table at 100 TB.  The cumulative sum is one
    ordered window over that manifest; a single-partition window over
    a manifest-sized frame is the correct plan (the data-sized work
    was the upstream size rollup, one shuffle with map-side partials).
    """
    docs = load_table(spark, sf_dir, "documents")
    files = (
        docs.groupBy("source", "lang")
        .agg(F.sum("n_chars").cast("long").alias("size_chars"))
        .select(
            F.concat_ws("/", "source", "lang").alias("file_name"), "size_chars"
        )
    )
    from pyspark.sql import Window

    planned = files.withColumn(
        "bin_id",
        F.expr(
            f"(sum(size_chars) OVER (ORDER BY file_name "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - size_chars) "
            f"div {COMPACT_TARGET_CHARS}"
        ).cast("long"),
    )
    wb = Window.partitionBy("bin_id")
    return planned.select(
        "file_name",
        "size_chars",
        "bin_id",
        F.sum("size_chars").over(wb).cast("long").alias("bin_total_chars"),
        F.count(F.lit(1)).over(wb).cast("long").alias("n_files_in_bin"),
    )


COMPACTION_ORACLE = f"""
WITH files AS (
    SELECT source || '/' || lang AS file_name,
           CAST(sum(n_chars) AS BIGINT) AS size_chars
    FROM documents GROUP BY source, lang
), planned AS (
    SELECT file_name, size_chars,
           CAST((sum(size_chars) OVER (ORDER BY file_name
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - size_chars) // {COMPACT_TARGET_CHARS} AS BIGINT) AS bin_id
    FROM files
)
SELECT file_name, size_chars, bin_id,
       CAST(sum(size_chars) OVER (PARTITION BY bin_id) AS BIGINT)
           AS bin_total_chars,
       CAST(count(*) OVER (PARTITION BY bin_id) AS BIGINT) AS n_files_in_bin
FROM planned
"""


LAKEHOUSE_QUERIES = [
    ("compaction_bin_packing", compaction_bin_packing, COMPACTION_ORACLE,
     "OPTIMIZE-style small-file compaction planner: next-fit-by-offset bins over the manifest"),
    ("merge_upsert_orders", merge_upsert_orders, MERGE_UPSERT_ORACLE,
     "MERGE INTO semantics (update + insert + conditional delete) in one full-outer pass"),
    ("cdc_orders_changes", cdc_orders_changes, CDC_ORACLE,
     "Change Data Feed between snapshots (Delta CDF vocabulary) via one key diff join"),
    ("incremental_agg_orders", incremental_agg_orders, INCREMENTAL_AGG_ORACLE,
     "incremental view maintenance: base rollup (+) signed CDC delta == full recompute"),
    ("corpus_version_diff", corpus_version_diff, CORPUS_VERSION_DIFF_ORACLE,
     "dataset-release diff per change type with doc + char accounting, one key diff join"),
]
