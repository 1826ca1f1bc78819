"""Retrieval queries: BM25 term-at-a-time scoring, MinHash
containment (doc-inside-doc detection), and the LSH recall audit.

All are corpus-scale retrieval/dedup primitives a training-data
platform runs constantly — BM25 for quality-targeted selection and
eval-set construction (the lexical retriever behind most RAG/decontam
probes), containment for quotation/inclusion relationships that
symmetric Jaccard misses (a 100-word doc pasted inside a 10k-word doc
has low Jaccard but containment ~1), and the recall audit as the
acceptance test certifying a band configuration before a full-corpus
dedup run.

Determinism discipline: BM25's floats derive from exact integer
counts through a fixed expression tree (one ln, a handful of IEEE
ops — identical in any engine, rounded at 6); containment and the
audit's recall/precision are integer ratios.  All hash-check exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from amazon_books_review_spark.functions import dedup
from amazon_books_review_spark.functions.text import tokens
from amazon_books_review_spark.operators.windows import global_top_k
from amazon_books_review_spark.sources.io import load_table

# --- BM25 -------------------------------------------------------------------

#: Okapi BM25 shape parameters (the Robertson defaults).
BM25_K1 = 1.2
BM25_B = 0.75
#: documents returned per probe term.
BM25_TOP_K = 10
#: the probe "query set" — fixed terms so the operator is a pure
#: function of the corpus.  At scale this is the broadcast side: a
#: query workload is always tiny relative to the corpus.
BM25_PROBE_TERMS = ("spark", "merge", "window", "stream", "filter")


def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-``BM25_TOP_K`` documents per probe term.

    score(t, d) = ln(1 + (N - df + 0.5)/(df + 0.5))
                  * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    (the Lucene-style non-negative idf).  Scale shape:

    * doc lengths are a zero-shuffle projection off the token array;
      corpus stats (N, total length) one scalar aggregate, broadcast;
    * the probe-term filter lands directly under the explode, so only
      matching postings ever enter the (term, doc) shuffle — the
      shuffled volume is the POSTINGS LISTS OF THE QUERY TERMS, not
      the corpus (mirrors the capped inverted-index build,
      plans/corpus_stats_queries.py);
    * document frequency is a term-grain aggregate of that same
      frame, broadcast back (vocabulary-of-query-size);
    * the per-term top-k window carries the WindowGroupLimit pushdown
      (rank <= k filters before the final shuffle).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("_toks")
    ).select("doc_id", F.size("_toks").alias("dl"), "_toks")
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    tf = (
        toks.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(*BM25_PROBE_TERMS))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dft") + F.lit(0.5)) / (F.col("dft") + F.lit(0.5))
    )
    tfnorm = (F.col("tf") * F.lit(BM25_K1 + 1)) / (
        F.col("tf")
        + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl)
    )
    scored = (
        tf.join(F.broadcast(dft), "term")
        .join(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            "tf",
            "dl",
            "dft",
            F.round(idf * tfnorm, 6).alias("score"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("term", "doc_id", "tf", "dl", "dft", "score", F.col("rank").cast("long").alias("rank"))
    )


_PROBES_SQL = ", ".join(f"'{t}'" for t in BM25_PROBE_TERMS)

BM25_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
    FROM documents
), dl AS (
    SELECT doc_id, len(ws) AS dl FROM tok
), stats AS (
    SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl FROM dl
), tf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM (SELECT doc_id, unnest(ws) AS term FROM tok)
    WHERE term IN ({_PROBES_SQL})
    GROUP BY doc_id, term
), dft AS (
    SELECT term, count(*) AS dft FROM tf GROUP BY term
), scored AS (
    SELECT tf.term, tf.doc_id, tf.tf, d.dl, dft.dft,
           round(
             ln(1.0 + (s.n_docs - dft.dft + 0.5) / (dft.dft + 0.5))
             * ((tf.tf * {BM25_K1 + 1!r})
                / (tf.tf + {BM25_K1!r} * ({1.0 - BM25_B!r}
                   + {BM25_B!r} * d.dl
                     / (CAST(s.total_dl AS DOUBLE) / s.n_docs)))),
             6) AS score
    FROM tf
    JOIN dl d USING (doc_id)
    JOIN dft USING (term)
    CROSS JOIN stats s
)
SELECT term, doc_id, tf, dl, dft, score,
       row_number() OVER (PARTITION BY term
                          ORDER BY score DESC, doc_id ASC) AS rank
FROM scored
QUALIFY rank <= {BM25_TOP_K}
"""


# --- MinHash containment -----------------------------------------------------

#: containment = |A ∩ B| / min(|A|, |B|): a small doc fully quoted
#: inside a large one scores ~1 here while its Jaccard is tiny.
CONTAINMENT_THRESHOLD = 0.6


def minhash_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-inside-doc detection: LSH candidate pairs verified with the
    CONTAINMENT coefficient instead of Jaccard.

    Same two-stage scale path as ``dedup_neardup_lsh_verified``
    (functions/dedup.py:239): banded-MinHash equi-join candidates,
    then per-pair exact set intersection over the shingle arrays.
    Only the acceptance metric differs — n_common / min(|A|, |B|) —
    which is what catches quotation/inclusion pairs whose symmetric
    Jaccard falls under any dedup threshold.

    Caveat stated honestly: MinHash bands recall pairs by JACCARD
    similarity, so an extreme size-ratio pair can have high
    containment yet low collision probability — the standard fix at
    100 TB is bucketing by size band before LSH; at the catalog's
    near-dup shapes the Jaccard floor the bands provide is sufficient
    and the operator documents the recall contract it inherits.
    """
    from amazon_books_review_spark.plans.northstar_queries import (
        BANDS,
        N_HASHES,
        NGRAM_N,
    )

    docs = load_table(spark, sf_dir, "documents")
    cand = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=NGRAM_N, n_hashes=N_HASHES, bands=BANDS
    )
    sets = dedup.shingle_sets(docs, "doc_id", "text", n=NGRAM_N)
    a = sets.select(F.col("doc_id").alias("id_a"), F.col("shingle_set").alias("_sa"))
    b = sets.select(F.col("doc_id").alias("id_b"), F.col("shingle_set").alias("_sb"))
    scored = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_sa", "_sb")).alias("n_common"),
            F.size("_sa").alias("size_a"),
            F.size("_sb").alias("size_b"),
        )
        .withColumn(
            "containment",
            F.round(F.col("n_common") / F.least("size_a", "size_b"), 6),
        )
    )
    return scored.filter(F.col("containment") >= CONTAINMENT_THRESHOLD)


def _containment_oracle() -> str:
    """Candidates from the MinHash band oracle, verified with exact
    containment — scaffolding mirrors northstar's `_lsh_verified_oracle`."""
    from amazon_books_review_spark.plans.northstar_queries import (
        BANDS,
        N_HASHES,
        _ROWS_PER_BAND,
    )

    mh_exprs = ",\n           ".join(
        f"min(md5('{i}|' || shingle)) AS mh_{i}" for i in range(N_HASHES)
    )
    band_selects = []
    for b in range(BANDS):
        cols = " || '|' || ".join(
            f"mh_{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({cols}) AS band_hash FROM sig"
        )
    bands_sql = "\n    UNION ALL\n    ".join(band_selects)
    return f"""
WITH docs AS (
    SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents
), sets AS (
    SELECT doc_id, list_distinct(
        [words[i] || ' ' || words[i+1] for i in range(1, len(words))]
    ) AS shingle_set
    FROM docs
), sh AS (
    SELECT doc_id, unnest(shingle_set) AS shingle FROM sets
), sig AS (
    SELECT doc_id,
           {mh_exprs}
    FROM sh GROUP BY doc_id
), banded AS (
    {bands_sql}
), cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a
    JOIN banded b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
    WHERE a.doc_id < b.doc_id
), verified AS (
    SELECT id_a, id_b,
           len(list_intersect(sa.shingle_set, sb.shingle_set)) AS n_common,
           len(sa.shingle_set) AS size_a,
           len(sb.shingle_set) AS size_b
    FROM cand
    JOIN sets sa ON sa.doc_id = id_a
    JOIN sets sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, n_common, size_a, size_b,
       round(n_common * 1.0 / least(size_a, size_b), 6) AS containment
FROM verified
WHERE round(n_common * 1.0 / least(size_a, size_b), 6)
      >= {CONTAINMENT_THRESHOLD}
"""


# --- LSH recall audit ---------------------------------------------------------

#: band widths under audit: the catalog's default (2 bands of 4 rows —
#: precision-leaning) and the recall-leaning split (4 bands of 2 rows).
LSH_AUDIT_BANDS = (2, 4)


def lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision of the banded-MinHash near-dup path against
    exact all-pairs Jaccard — the text-dedup twin of the ANN recall
    audit (northstar_queries.py): the acceptance test you run on a
    SAMPLE to certify the band configuration before a 100 TB dedup.

    One row per band width: exact pair count, LSH-verified pair
    count, hits, recall and precision.  Verified pairs re-check exact
    Jaccard, so precision is 1.0 by construction — reporting it pins
    the verify stage end-to-end; recall is the real signal (a pair
    with Jaccard s survives banding with prob 1-(1-s^r)^b).

    Scale shape: the EXACT arm is the audit harness, not the
    operator — it is the quadratic shingle self-join, run on the
    probe sample only (same discipline as the ANN audit's exact
    top-k arm).  The LSH arms are the production linear path.
    """
    from amazon_books_review_spark.plans.northstar_queries import (
        JACCARD_THRESHOLD,
        N_HASHES,
        NGRAM_N,
    )

    docs = load_table(spark, sf_dir, "documents")
    exact = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=NGRAM_N, threshold=JACCARD_THRESHOLD
    ).select("id_a", "id_b")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    out = None
    for bands in LSH_AUDIT_BANDS:
        ver = dedup.lsh_verified_pairs(
            docs, "doc_id", "text",
            n=NGRAM_N, n_hashes=N_HASHES, bands=bands,
            threshold=JACCARD_THRESHOLD,
        ).select("id_a", "id_b")
        hits = ver.join(exact, ["id_a", "id_b"], "left_semi")
        row = (
            n_exact.crossJoin(F.broadcast(ver.agg(F.count(F.lit(1)).alias("n_lsh"))))
            .crossJoin(F.broadcast(hits.agg(F.count(F.lit(1)).alias("n_hit"))))
            .select(
                F.lit(bands).cast("long").alias("bands"),
                F.lit(N_HASHES // bands).cast("long").alias("rows_per_band"),
                "n_exact",
                "n_lsh",
                "n_hit",
                F.round(
                    F.when(F.col("n_exact") > 0, F.col("n_hit") / F.col("n_exact")),
                    6,
                ).alias("recall"),
                F.round(
                    F.when(F.col("n_lsh") > 0, F.col("n_hit") / F.col("n_lsh")), 6
                ).alias("precision"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _lsh_recall_oracle() -> str:
    from amazon_books_review_spark.plans.northstar_queries import (
        JACCARD_THRESHOLD,
        N_HASHES,
    )

    mh_exprs = ",\n           ".join(
        f"min(md5('{i}|' || shingle)) AS mh_{i}" for i in range(N_HASHES)
    )

    def band_cte(bands: int) -> str:
        rpb = N_HASHES // bands
        selects = []
        for b in range(bands):
            cols = " || '|' || ".join(f"mh_{b * rpb + r}" for r in range(rpb))
            selects.append(
                f"SELECT doc_id, {b} AS band_id, md5({cols}) AS band_hash FROM sig"
            )
        return "\n    UNION ALL\n    ".join(selects)

    def verified_cte(bands: int) -> str:
        return f"""
    SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
               len(list_intersect(sa.shingle_set, sb.shingle_set)) AS n_common,
               len(sa.shingle_set) AS size_a,
               len(sb.shingle_set) AS size_b
        FROM (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM banded{bands} a
              JOIN banded{bands} b
                ON a.band_id = b.band_id AND a.band_hash = b.band_hash
              WHERE a.doc_id < b.doc_id)
        JOIN sets sa ON sa.doc_id = id_a
        JOIN sets sb ON sb.doc_id = id_b)
    WHERE round(n_common * 1.0 / (size_a + size_b - n_common), 6)
          >= {JACCARD_THRESHOLD}
"""

    def audit_row(bands: int) -> str:
        rpb = N_HASHES // bands
        return f"""
SELECT CAST({bands} AS BIGINT) AS bands, CAST({rpb} AS BIGINT) AS rows_per_band,
       (SELECT count(*) FROM exact) AS n_exact,
       (SELECT count(*) FROM ver{bands}) AS n_lsh,
       (SELECT count(*) FROM ver{bands} v JOIN exact e
          ON v.id_a = e.id_a AND v.id_b = e.id_b) AS n_hit,
       round(CASE WHEN (SELECT count(*) FROM exact) > 0 THEN
           (SELECT count(*) FROM ver{bands} v JOIN exact e
              ON v.id_a = e.id_a AND v.id_b = e.id_b)
           * 1.0 / (SELECT count(*) FROM exact) END, 6) AS recall,
       round(CASE WHEN (SELECT count(*) FROM ver{bands}) > 0 THEN
           (SELECT count(*) FROM ver{bands} v JOIN exact e
              ON v.id_a = e.id_a AND v.id_b = e.id_b)
           * 1.0 / (SELECT count(*) FROM ver{bands}) END, 6) AS precision
"""

    banded_ctes = ",\n".join(
        f"banded{b} AS (\n    {band_cte(b)}\n)" for b in LSH_AUDIT_BANDS
    )
    ver_ctes = ",\n".join(f"ver{b} AS ({verified_cte(b)})" for b in LSH_AUDIT_BANDS)
    rows = "\nUNION ALL\n".join(audit_row(b) for b in LSH_AUDIT_BANDS)
    return f"""
WITH docs AS (
    SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents
), sets AS (
    SELECT doc_id, list_distinct(
        [words[i] || ' ' || words[i+1] for i in range(1, len(words))]
    ) AS shingle_set
    FROM docs
), sh AS (
    SELECT doc_id, unnest(shingle_set) AS shingle FROM sets
), sig AS (
    SELECT doc_id,
           {mh_exprs}
    FROM sh GROUP BY doc_id
),
{banded_ctes},
{ver_ctes},
exact AS (
    SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    JOIN (SELECT doc_id, len(shingle_set) AS s FROM sets) sa ON id_a = sa.doc_id
    JOIN (SELECT doc_id, len(shingle_set) AS s FROM sets) sb ON id_b = sb.doc_id
    WHERE round(n_common * 1.0 / (sa.s + sb.s - n_common), 6)
          >= {JACCARD_THRESHOLD}
)
{rows}
"""


# --- Reciprocal-rank fusion -------------------------------------------------

#: the standard RRF smoothing constant (Cormack et al. 2009).
RRF_K = 60
#: fused results returned per probe term.
RRF_TOP = 5
#: candidates contributed by the non-lexical ranker per term.
RRF_PRIOR_K = 10


def rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: per probe term,
    fuse the BM25 lexical top-k with a document-prior ranking using
    ``score = Σ 1/(RRF_K + rank)`` over the union of candidates
    (Cormack et al. 2009 — the fusion every hybrid lexical+dense
    stack runs; the prior slot here is a corpus-global length
    ranking, standing in for whatever dense/quality ranker production
    pairs with BM25, which keeps the operator a pure function of the
    corpus).

    Scale shape: rankings are top-k-bounded BEFORE fusion, so the
    fusion input is O(#queries * k) rows regardless of corpus size —
    the full-outer rank join, the score sum, and the final per-term
    window all run on that bounded frame.  The only corpus-scale work
    is inside the upstream rankers (BM25's postings-of-query shuffle;
    the prior's TakeOrdered top-k).

    Determinism: ranks are small exact integers; ``1/(60+r)`` and the
    two-term sum are single IEEE ops identical in any engine, rounded
    at 6 before the fused ordering (ties break on doc_id).
    """
    lex = bm25_topk_docs(spark, sf_dir).select(
        "term", "doc_id", F.col("rank").alias("lex_rank")
    )
    docs = load_table(spark, sf_dir, "documents")
    top_prior = global_top_k(
        docs.select("doc_id", "n_chars"),
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        RRF_PRIOR_K,
    )
    w_prior = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    prior = top_prior.select(
        "doc_id", F.row_number().over(w_prior).cast("long").alias("prior_rank")
    )
    per_term_prior = (
        lex.select("term").distinct().crossJoin(F.broadcast(prior))
    )
    fused = (
        lex.join(per_term_prior, ["term", "doc_id"], "full_outer")
        .withColumn(
            "rrf_score",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("prior_rank")), F.lit(0.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("term").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= RRF_TOP)
        .select("term", "doc_id", "lex_rank", "prior_rank", "rrf_score", "fused_rank")
    )


RRF_ORACLE = f"""
WITH lex AS (
    SELECT term, doc_id, rank AS lex_rank FROM ({BM25_ORACLE})
), prior AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS prior_rank
    FROM documents
    QUALIFY prior_rank <= {RRF_PRIOR_K}
), per_term_prior AS (
    SELECT t.term, p.doc_id, p.prior_rank
    FROM (SELECT DISTINCT term FROM lex) t CROSS JOIN prior p
), fused AS (
    SELECT coalesce(l.term, p.term) AS term,
           coalesce(l.doc_id, p.doc_id) AS doc_id,
           l.lex_rank, p.prior_rank,
           round(coalesce(1.0 / ({RRF_K} + l.lex_rank), 0.0)
                 + coalesce(1.0 / ({RRF_K} + p.prior_rank), 0.0), 6) AS rrf_score
    FROM lex l FULL OUTER JOIN per_term_prior p
      ON l.term = p.term AND l.doc_id = p.doc_id
)
SELECT term, doc_id, lex_rank, prior_rank, rrf_score,
       row_number() OVER (PARTITION BY term
                          ORDER BY rrf_score DESC, doc_id ASC) AS fused_rank
FROM fused
QUALIFY fused_rank <= {RRF_TOP}
"""


# --- Matryoshka prefix-dim recall --------------------------------------------

#: prefix dimensions retained in the truncated index (of EMB_DIM=64).
MAT_PREFIX_DIM = 16


def matryoshka_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of PREFIX-dimension cosine retrieval against the
    full-dimension ranking — the acceptance audit for Matryoshka-style
    truncation (Kusupati et al. 2022), where a 64-dim index is served
    from its first 16 dims to cut memory/bandwidth 4x and the question
    is how much of the true top-k survives.

    Both arms are the exact-cosine operator (same rounding/tie
    contract as ``similarity_cosine_topk``); the audit is their
    per-query overlap.  Scale shape: both rankings are top-k-bounded,
    so the overlap join is O(#probes * k) rows; the brute-force arms
    are the documented verify stage (production uses the IVF/LSH
    routes for the full index and this audit certifies the truncation
    before switching the serving index over).
    """
    from amazon_books_review_spark.functions import similarity
    from amazon_books_review_spark.plans.northstar_queries import (
        N_PROBES,
        TOPK_K,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    full = similarity.cosine_topk(emb, probes, "vec_id", "embedding", k=TOPK_K)
    trunc = emb.select(
        "vec_id", F.slice("embedding", 1, MAT_PREFIX_DIM).alias("embedding")
    )
    tprobes = trunc.filter(F.col("vec_id") < N_PROBES)
    pref = similarity.cosine_topk(trunc, tprobes, "vec_id", "embedding", k=TOPK_K)
    hits = (
        full.select("query_id", "neighbor_id")
        .join(pref.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        full.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0)) / F.lit(TOPK_K), 6
            ).alias("recall_at_k"),
        )
    )


def _matryoshka_oracle() -> str:
    from amazon_books_review_spark.plans.northstar_queries import (
        N_PROBES,
        TOPK_K,
    )

    def arm(slice_expr: str) -> str:
        return f"""
    SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
               PARTITION BY p.vec_id
               ORDER BY round(list_inner_product(p.e, c.e) / (p.nrm * c.nrm), 6)
                            DESC,
                        c.vec_id ASC) AS rank
    FROM (SELECT vec_id, {slice_expr} AS e,
                 sqrt(list_inner_product({slice_expr}, {slice_expr})) AS nrm
          FROM embeddings WHERE vec_id < {N_PROBES}) p
    JOIN (SELECT vec_id, {slice_expr} AS e,
                 sqrt(list_inner_product({slice_expr}, {slice_expr})) AS nrm
          FROM embeddings) c ON c.vec_id <> p.vec_id
    QUALIFY rank <= {TOPK_K}
"""

    full_e = "embedding::DOUBLE[]"
    pref_e = f"(embedding::DOUBLE[])[1:{MAT_PREFIX_DIM}]"
    return f"""
WITH full_arm AS ({arm(full_e)}),
pref_arm AS ({arm(pref_e)}),
hits AS (
    SELECT f.query_id, count(*) AS n_overlap
    FROM full_arm f JOIN pref_arm p
      ON f.query_id = p.query_id AND f.neighbor_id = p.neighbor_id
    GROUP BY 1
)
SELECT q.query_id,
       CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       round(coalesce(h.n_overlap, 0) * 1.0 / {TOPK_K}, 6) AS recall_at_k
FROM (SELECT DISTINCT query_id FROM full_arm) q
LEFT JOIN hits h USING (query_id)
"""


RETRIEVAL_QUERIES = [
    ("bm25_topk_docs", bm25_topk_docs, BM25_ORACLE,
     "Okapi BM25 top-k docs per probe term; postings-of-query shuffle only"),
    ("rrf_hybrid_retrieval", rrf_hybrid_retrieval, RRF_ORACLE,
     "reciprocal-rank fusion of BM25 and a document-prior ranking, top-k-bounded"),
    ("matryoshka_recall_audit", matryoshka_recall_audit, _matryoshka_oracle(),
     "recall@k of prefix-dim cosine retrieval vs the full-dim ranking"),
    ("minhash_containment_pairs", minhash_containment_pairs, _containment_oracle(),
     "doc-inside-doc detection: LSH candidates verified by containment coefficient"),
    ("lsh_recall_audit", lsh_recall_audit, _lsh_recall_oracle(),
     "banded-MinHash recall/precision vs exact all-pairs Jaccard, per band width"),
]
