"""Training-data hygiene queries: benchmark decontamination and the
deterministic shuffled-shard export manifest.

Both are standard large-corpus pipeline stages the reference's surface
doesn't have but a 100 TB training pipeline cannot ship without; both
are pure functions of the data (no rand(), md5-only hashing), so each
carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_books_review_spark.functions import decontam, sampling
from amazon_books_review_spark.sources.io import load_table

# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

#: Stand-in benchmark: every EVAL_MOD-th document plays the eval set
#: (real pipelines read the actual benchmark corpora here).  The sf0.01
#: documents table plants near-duplicate pairs, so eval/train leakage
#: genuinely occurs and the flag is exercised on both values.
EVAL_MOD = 50
DECONTAM_N = decontam.DECONTAM_NGRAM


def decontam_against_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-gram overlap decontamination of the training split against the
    held-out stand-in benchmark (broadcast eval-gram probe; the corpus
    side stays a linear pass + doc_id aggregation)."""
    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % EVAL_MOD == 0)
    train_docs = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
    grams = decontam.eval_ngram_set(eval_docs, "doc_id", "text", n=DECONTAM_N)
    return decontam.flag_contaminated(train_docs, grams, "doc_id", "text", n=DECONTAM_N)


def decontam_hashed_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The large-eval-suite shape of decontam_against_eval (r13):
    broadcast the 8-byte xxhash64 set of the eval grams instead of the
    ~50-byte strings (what keeps a 1e8-gram benchmark battery
    broadcastable), then exact-verify the surviving candidates against
    the true strings in a candidate-bounded shuffle join — output is
    IDENTICAL to the exact tier, so this entry shares its oracle
    (`functions.decontam.flag_contaminated_hashed`)."""
    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % EVAL_MOD == 0)
    train_docs = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
    return decontam.flag_contaminated_hashed(
        train_docs, eval_docs, "doc_id", "text", n=DECONTAM_N
    )


DECONTAM_ORACLE = f"""
WITH docs AS (
    SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents
), sh AS (
    SELECT doc_id, unnest(list_distinct(
        [array_to_string(words[i:i+{DECONTAM_N - 1}], ' ')
         for i in range(1, len(words) - {DECONTAM_N - 2})]
    )) AS shingle
    FROM docs
    WHERE len(words) >= {DECONTAM_N}
), eval_grams AS (
    SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0
), hits AS (
    SELECT s.doc_id, count(*) AS n_eval_grams_hit
    FROM sh s JOIN eval_grams e USING (shingle)
    WHERE s.doc_id % {EVAL_MOD} <> 0
    GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_eval_grams_hit, 0) AS BIGINT) AS n_eval_grams_hit,
       CAST(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
           AS contaminated
FROM docs d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {EVAL_MOD} <> 0
"""


# ---------------------------------------------------------------------------
# Shuffled shard manifest
# ---------------------------------------------------------------------------

N_SHARDS = 16


def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training export: md5(salt|id)
    ordering, ``shard`` = which output file, ``pos`` = position within
    it (sampling.shuffled_shard_manifest)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.shuffled_shard_manifest(docs, "doc_id", shards=N_SHARDS)


def _shard_oracle() -> str:
    # hash_bucket twin: first 7 hex chars of md5('shard|'||id) as an
    # int (hex-digit arithmetic, no conv() in DuckDB) mod N_SHARDS.
    digit = lambda i: f"(strpos('0123456789abcdef', substr(shuffle_key, {i}, 1)) - 1)"  # noqa: E731
    val = digit(1)
    for i in range(2, 8):
        val = f"({val} * 16 + {digit(i)})"
    return f"""
WITH k AS (
    SELECT doc_id,
           md5('shard|' || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
), s AS (
    SELECT doc_id, shuffle_key, ({val}) % {N_SHARDS} AS shard FROM k
)
SELECT doc_id, shuffle_key, CAST(shard AS BIGINT) AS shard,
       row_number() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id)
           AS pos
FROM s
"""


# ---------------------------------------------------------------------------
# Epoch reshuffles
# ---------------------------------------------------------------------------

N_EPOCHS = 3
EPOCH_SHARDS = 8


def epoch_shuffle_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch training order: :func:`sampling.shuffled_shard_manifest`
    once per epoch with an epoch-salted key, unioned with an ``epoch``
    column.  Multi-epoch training needs a DIFFERENT example order each
    epoch (repeating one order overfits the schedule) that is still
    bit-reproducible on retry/resume — a fresh salt is a fresh
    independent md5 permutation, no RNG state to checkpoint.

    Scale shape: ONE corpus scan fans out to (epoch, doc) rows via an
    exploded epoch sequence (a per-epoch union would re-scan the
    corpus N_EPOCHS times), then one hash partition on (epoch, shard)
    + in-shard sort — the same clustering the per-epoch shard write
    needs anyway.  The epoch count multiplies MANIFEST size, never
    data reads — the manifest is (epoch, id, shard, pos), data stays
    in place.  The key/shard construction is
    :func:`sampling.shuffled_shard_manifest`'s, with the salt column-
    ized so one expression serves all epochs.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    fanned = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(N_EPOCHS - 1))).alias("_e"),
        "doc_id",
    ).select(F.col("_e").cast("int").alias("epoch"), "doc_id")
    # md5('epoch{e}|' || id): the shuffled_shard_manifest key with the
    # epoch folded into the salt (same construction, column-ized).
    key = F.md5(
        F.concat(
            F.lit("epoch"),
            F.col("epoch").cast("string"),
            F.lit("|"),
            F.col("doc_id").cast("string"),
        )
    )
    shard = (
        F.conv(F.substring(key, 1, 7), 16, 10).cast("long") % EPOCH_SHARDS
    )
    w = Window.partitionBy("epoch", "shard").orderBy("shuffle_key", "doc_id")
    return (
        fanned.select(
            "epoch", "doc_id", key.alias("shuffle_key"), shard.alias("shard")
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
    )


def _epoch_shuffle_oracle() -> str:
    # md5-hex -> int via hex-digit arithmetic (no conv() in DuckDB),
    # the hash_bucket twin — same construction as the shard manifest
    # oracle, once per epoch salt.
    def bucket(expr: str) -> str:
        digit = lambda i: f"(strpos('0123456789abcdef', substr({expr}, {i}, 1)) - 1)"  # noqa: E731
        val = digit(1)
        for i in range(2, 8):
            val = f"({val} * 16 + {digit(i)})"
        return f"({val}) % {EPOCH_SHARDS}"

    epochs = "\nUNION ALL\n".join(
        f"""SELECT {e} AS epoch, doc_id,
       md5('epoch{e}|' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
       {bucket(f"md5('epoch{e}|' || CAST(doc_id AS VARCHAR))")} AS bkey
FROM documents"""
        for e in range(N_EPOCHS)
    )
    return f"""
WITH k AS (
{epochs}
)
SELECT CAST(epoch AS INTEGER) AS epoch, doc_id, shuffle_key,
       CAST(bkey AS BIGINT) AS shard,
       row_number() OVER (PARTITION BY epoch, bkey
                          ORDER BY shuffle_key, doc_id) AS pos
FROM k
"""


TRAINDATA_QUERIES = [
    ("epoch_shuffle_assignment", epoch_shuffle_assignment,
     _epoch_shuffle_oracle(),
     "per-epoch deterministic reshuffle: epoch-salted md5 manifests, unioned"),
    ("decontam_against_eval", decontam_against_eval, DECONTAM_ORACLE,
     "benchmark decontamination: 8-gram overlap vs broadcast eval-gram set"),
    ("decontam_hashed_prefilter", decontam_hashed_prefilter, DECONTAM_ORACLE,
     "decontam at large-eval scale: broadcast 8-byte gram hashes + exact verify"),
    ("training_shard_manifest", training_shard_manifest, _shard_oracle(),
     "deterministic md5 global shuffle -> (shard, pos) export manifest"),
]
