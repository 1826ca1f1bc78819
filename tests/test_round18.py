"""Round-18 pins: the GEMM port of the ANN top-k tier (VERDICT r17
#1) — strategy dichotomy equivalence, the round6 row-wise partial
top-k kernel mode, and the ADVICE-r17 hardening (plan-band errors,
recall-target validation, the degenerate-bucket guard).  Equivalences
are computed by degenerate-setting identity or an independent numpy
replica, never by the DuckDB oracle's algorithm replay."""

from __future__ import annotations

import warnings

import numpy as np
import pytest

from amazon_books_review_spark.functions import similarity


def _fixture(n=160, dim=16, seed=181):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dim))
    # plant near-duplicate clusters so top-k has real structure
    for base in range(0, n, 20):
        for j in range(1, 4):
            if base + j < n:
                v[base + j] = v[base] + rng.normal(scale=0.05, size=dim)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def emb_df(spark):
    v = _fixture()
    rows = [(int(i), [float(x) for x in v[i]]) for i in range(len(v))]
    return v, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


# ---------------------------------------------------------------------------
# Strategy dichotomy: broadcast (serving) and gemm (batch) are two
# physical plans for ONE logical query — rows must match exactly.


def _topk_rows(df):
    return {
        (r.query_id, r.neighbor_id, r.rank, r.sim) for r in df.collect()
    }


def test_topk_strategies_identical_small_probes(spark, emb_df):
    v, df = emb_df
    probes = df.filter("vec_id < 12")
    kw = dict(k=4, n_planes=4, n_tables=3, dim=v.shape[1])
    bc = similarity.lsh_bucketed_topk(
        df, probes, "vec_id", "embedding", strategy="broadcast", **kw
    )
    gm = similarity.lsh_bucketed_topk(
        df, probes, "vec_id", "embedding", strategy="gemm", **kw
    )
    assert _topk_rows(bc) == _topk_rows(gm)


def test_topk_strategies_identical_batch(spark, emb_df):
    # probes == corpus: the k-NN-graph regime the gemm strategy
    # exists for — full-batch identity against the broadcast shape
    v, df = emb_df
    kw = dict(k=3, n_planes=4, n_tables=2, dim=v.shape[1])
    bc = similarity.lsh_bucketed_topk(
        df, df, "vec_id", "embedding", strategy="broadcast", **kw
    )
    gm = similarity.lsh_bucketed_topk(
        df, df, "vec_id", "embedding", strategy="gemm", **kw
    )
    assert _topk_rows(bc) == _topk_rows(gm)


def test_topk_gemm_matches_numpy_replica(spark, emb_df):
    # independent replica: same md5 planes, numpy bucket join + rank
    v, df = emb_df
    k, b, t = 4, 4, 2
    n = len(v)
    cand = set()
    for table in range(t):
        planes = np.array(similarity.deterministic_planes(b, v.shape[1], table))
        sigs = ((v @ planes.T) >= 0) @ (1 << np.arange(b))
        for s in np.unique(sigs):
            members = np.flatnonzero(sigs == s)
            for q in members:
                for c in members:
                    if q != c:
                        cand.add((int(q), int(c)))
    sims = np.round(v @ v.T, 6)
    want = set()
    for q in range(n):
        neigh = sorted(
            (c for (qq, c) in cand if qq == q),
            key=lambda c: (-sims[q, c], c),
        )[:k]
        want |= {
            (q, c, r + 1, sims[q, c]) for r, c in enumerate(neigh)
        }
    got = similarity.lsh_bucketed_topk(
        df, df, "vec_id", "embedding",
        k=k, n_planes=b, n_tables=t, dim=v.shape[1], strategy="gemm",
    )
    assert _topk_rows(got) == want


def test_topk_strategy_validation(spark, emb_df):
    v, df = emb_df
    with pytest.raises(ValueError, match="broadcast|gemm"):
        similarity.lsh_bucketed_topk(
            df, df, "vec_id", "embedding", strategy="bogus"
        )


# ---------------------------------------------------------------------------
# Kernel-mode pins: round6 row-wise top-k


def test_kernel_round6_topk_mode_validation(spark, emb_df):
    v, df = emb_df
    arm = df.selectExpr(
        "vec_id AS _id", "0 AS table_id", "0 AS sig", "embedding AS _v"
    )
    # round6 with neither threshold nor topk: quadratic emit refused
    with pytest.raises(ValueError, match="threshold.*topk|topk.*threshold"):
        similarity.lsh_bucket_gemm_scored(
            arm, arm, "a", "b", quantize="round6"
        )
    # topk is two-sided only
    with pytest.raises(ValueError, match="two-sided"):
        similarity.lsh_bucket_gemm_scored(
            arm, None, "a", "b", quantize="round6", threshold=0.0, topk=3
        )
    # exclude_eq is two-sided only
    with pytest.raises(ValueError, match="two-sided|upper triangle"):
        similarity.lsh_bucket_gemm_scored(
            arm, None, "a", "b", quantize="round6", threshold=0.0,
            exclude_eq=True,
        )


def test_kernel_round6_topk_equals_threshold_emit_ranked(spark, emb_df):
    # degenerate identity: row-wise top-k over one shared bucket must
    # equal post-hoc per-row ranking of the emit-all (threshold=-1)
    # output with the same (sim DESC, id ASC) tie rule
    v, df = emb_df
    sub = df.filter("vec_id < 40")
    arm = sub.selectExpr(
        "vec_id AS _id", "0 AS table_id", "0 AS sig", "embedding AS _v"
    )
    k = 3
    full = similarity.lsh_bucket_gemm_scored(
        arm, arm, "qa", "qb", quantize="round6", threshold=-1.0,
        exclude_eq=True,
    ).collect()
    by_q = {}
    for r in full:
        by_q.setdefault(r.qa, []).append((r.qb, r.sim))
    want = set()
    for q, cands in by_q.items():
        cands.sort(key=lambda cs: (-cs[1], cs[0]))
        want |= {(q, c, s) for c, s in cands[:k]}
    got = {
        (r.qa, r.qb, r.sim)
        for r in similarity.lsh_bucket_gemm_scored(
            arm, arm, "qa", "qb", quantize="round6", topk=k,
            exclude_eq=True,
        ).collect()
    }
    assert got == want


def test_kernel_round6_threshold_with_topk_composes(spark, emb_df):
    # threshold + topk: top-k drawn only from at-or-above-threshold
    # cells (the mask applies before selection)
    v, df = emb_df
    sub = df.filter("vec_id < 40")
    arm = sub.selectExpr(
        "vec_id AS _id", "0 AS table_id", "0 AS sig", "embedding AS _v"
    )
    th, k = 0.2, 2
    got = similarity.lsh_bucket_gemm_scored(
        arm, arm, "qa", "qb", quantize="round6", threshold=th, topk=k,
        exclude_eq=True,
    ).collect()
    per_q = {}
    for r in got:
        assert r.sim >= th
        assert r.qa != r.qb
        per_q[r.qa] = per_q.get(r.qa, 0) + 1
    assert per_q and max(per_q.values()) <= k


# ---------------------------------------------------------------------------
# ADVICE-r17 hardening


def test_adaptive_plan_rejects_recall_100():
    with pytest.raises(ValueError, match=r"\[0, 100\)"):
        similarity.lsh_adaptive_plan(0.45, 100)


def test_adaptive_plan_accepts_recall_0():
    plan = similarity.lsh_adaptive_plan(0.45, 0, min_planes=2, max_planes=4)
    assert all(t == 1 for t, _pb, _cl in plan.by_b.values())


def test_plan_checked_out_of_band_is_descriptive():
    plan = similarity.lsh_adaptive_plan(
        0.45, 90, min_planes=4, max_planes=8
    )
    with pytest.raises(ValueError, match=r"\[4, 8\]"):
        similarity.lsh_plan_checked(plan, 12)
    with pytest.raises(ValueError, match="bounds"):
        similarity.lsh_plan_checked(plan, 3)


# ---------------------------------------------------------------------------
# Partition-local multiprobe: f is a pure transport knob — outputs
# must be byte-identical across the split, in both kernel modes.


def _sig_arm(df, b, t, dim, out):
    from amazon_books_review_spark.functions.similarity import lsh_signatures
    from pyspark.sql import functions as F

    sigs = lsh_signatures(df, "vec_id", out, "embedding", b, t, dim)
    v = df.select(F.col("vec_id").alias(out), F.col("embedding").alias("_v"))
    return sigs.join(v, out).withColumnRenamed(out, "_id")


@pytest.mark.parametrize("f", [0, 2, 4])
def test_local_probe_split_identical_self_round6(spark, emb_df, f):
    v, df = emb_df
    b, t = 4, 3
    arm = _sig_arm(df, b, t, v.shape[1], "id")
    got = {
        (r.id_a, r.id_b, r.sim)
        for r in similarity.lsh_bucket_gemm_scored(
            arm, None, "id_a", "id_b",
            quantize="round6", threshold=0.45, require_lt=True,
            symmetric_probe_planes=b, local_probe_bits=f,
        ).groupBy("id_a", "id_b").agg({"sim": "max"})
        .withColumnRenamed("max(sim)", "sim").collect()
    }
    # reference: the r17 JVM-side tagged explode (f is transport only)
    from amazon_books_review_spark.functions.similarity import (
        hamming1_probes_tagged,
    )

    want = {
        (r.id_a, r.id_b, r.sim)
        for r in similarity.lsh_bucket_gemm_scored(
            hamming1_probes_tagged(arm, b), None, "id_a", "id_b",
            quantize="round6", threshold=0.45, require_lt=True,
        ).groupBy("id_a", "id_b").agg({"sim": "max"})
        .withColumnRenamed("max(sim)", "sim").collect()
    }
    assert got == want


@pytest.mark.parametrize("f", [0, 2, 4])
def test_local_probe_split_identical_twosided_floorq_topk(spark, emb_df, f):
    v, df = emb_df
    b, t, k = 4, 2, 3
    src = df.filter("vec_id % 2 = 0")
    tgt = df.filter("vec_id % 2 = 1")
    sa = _sig_arm(src, b, t, v.shape[1], "src_id")
    ta = _sig_arm(tgt, b, t, v.shape[1], "tgt_id")
    def dedup(pairs):
        return {
            (r.src_id, r.tgt_id, r.cos_q)
            for r in pairs.groupBy("src_id", "tgt_id")
            .agg({"cos_q": "max"})
            .withColumnRenamed("max(cos_q)", "cos_q").collect()
        }
    got = dedup(similarity.lsh_bucket_gemm_scored(
        sa, ta, "src_id", "tgt_id", quantize="floorq", topk=k,
        symmetric_probe_planes=b, local_probe_bits=f,
    ))
    from amazon_books_review_spark.functions.similarity import (
        hamming1_probes_tagged,
    )
    want = dedup(similarity.lsh_bucket_gemm_scored(
        hamming1_probes_tagged(sa, b), hamming1_probes_tagged(ta, b),
        "src_id", "tgt_id", quantize="floorq", topk=k,
    ))
    assert got == want


def test_local_probe_split_validation(spark, emb_df):
    v, df = emb_df
    arm = _sig_arm(df, 4, 2, v.shape[1], "id")
    with pytest.raises(ValueError, match="local_probe_bits"):
        similarity.lsh_bucket_gemm_scored(
            arm, None, "a", "b", quantize="round6", threshold=0.4,
            symmetric_probe_planes=4, local_probe_bits=5,
        )
    with pytest.raises(ValueError, match="requires symmetric_probe_planes"):
        similarity.lsh_bucket_gemm_scored(
            arm, None, "a", "b", quantize="round6", threshold=0.4,
            local_probe_bits=2,
        )
    from amazon_books_review_spark.functions.similarity import (
        hamming1_probes_tagged,
    )
    with pytest.raises(ValueError, match="UNEXPLODED"):
        similarity.lsh_bucket_gemm_scored(
            hamming1_probes_tagged(arm, 4), None, "a", "b",
            quantize="round6", threshold=0.4,
            symmetric_probe_planes=4,
        )


def test_lsh_local_probe_split_rule():
    # largest f leaving >= min_keys_factor * parallelism keys
    # (default factor 8 — measured balance point, see docstring)
    # T=23, P=32: need >= 256 keys; 23*2^4 = 368 -> g=4 -> f=b-4
    assert similarity.lsh_local_probe_split(14, 23, 32) == 10
    # the measured sweet-spot config: T=13, b=12 -> f=7 (416 keys)
    assert similarity.lsh_local_probe_split(12, 13, 32) == 7
    # tiny T at high parallelism: g grows until keys suffice (or b)
    assert similarity.lsh_local_probe_split(4, 2, 32) == 0
    # plenty of tables: few high bits needed
    assert similarity.lsh_local_probe_split(10, 64, 32) == 8
    # explicit factor override still honored
    assert similarity.lsh_local_probe_split(14, 23, 32, min_keys_factor=2) == 12
    with pytest.raises(ValueError):
        similarity.lsh_local_probe_split(0, 8, 32)


# ---------------------------------------------------------------------------
# Mutual k-NN graph: containment + symmetry properties (independent
# of the oracle's SQL replay)


def test_mutual_knn_contained_and_symmetric(spark, emb_df):
    v, df = emb_df
    k, b, t = 4, 4, 2
    g = similarity.lsh_bucketed_topk(
        df, df, "vec_id", "embedding",
        k=k, n_planes=b, n_tables=t, dim=v.shape[1], strategy="gemm",
    )
    edges = {(r.query_id, r.neighbor_id) for r in g.collect()}
    mutual_want = {
        (a, c) for (a, c) in edges if (c, a) in edges and a < c
    }
    from pyspark.sql import functions as F

    rev = g.select(
        F.col("neighbor_id").alias("query_id"),
        F.col("query_id").alias("neighbor_id"),
    )
    got = {
        (r.id_a, r.id_b)
        for r in g.select("query_id", "neighbor_id", "sim")
        .join(rev, ["query_id", "neighbor_id"])
        .filter(F.col("query_id") < F.col("neighbor_id"))
        .select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
        )
        .collect()
    }
    assert got == mutual_want
    assert got <= {(a, c) for (a, c) in edges if a < c}


def test_gemm_group_guard_warns_only_past_threshold():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        similarity._warn_oversized_gemm_group(
            similarity._GEMM_GROUP_WARN_ROWS
        )
    with pytest.warns(RuntimeWarning, match="degenerate bucket"):
        similarity._warn_oversized_gemm_group(
            similarity._GEMM_GROUP_WARN_ROWS + 1
        )
