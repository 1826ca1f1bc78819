"""Hypothesis property tests: engine operators vs plain-Python
reference implementations on adversarial generated inputs."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from amazon_books_review_spark.operators import cleaning
from amazon_books_review_spark.operators.joins import asof_join

# Spark-session-per-example is too slow; generate WHOLE datasets as
# one example and run a handful of examples.
_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

fraction_strings = st.one_of(
    st.builds(lambda a, b: f"{a}/{b}", st.integers(0, 99), st.integers(0, 99)),
    st.sampled_from(["n/a", "", "7/", "/3", "x/y", "1/2/3"]),
    st.none(),
)


def _py_ratio(frac: str | None) -> float | None:
    """Plain-Python reference for the BR:42-52 helpfulness chain."""
    if frac is None:
        return None
    parts = frac.split("/")
    def to_f(s):
        try:
            return float(s)
        except ValueError:
            return None
    num = to_f(parts[0]) if len(parts) >= 1 else None
    den = to_f(parts[1]) if len(parts) >= 2 else None
    if num is None or den is None or den == 0.0:
        return None
    return round(num / den * 100, 2)


@given(st.lists(fraction_strings, min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_ratio_percent_matches_python_reference(spark, fracs):
    schema = StructType([StructField("frac", StringType(), True)])
    df = spark.createDataFrame([Row(frac=f) for f in fracs], schema)
    out = cleaning.split_fraction(df, "frac", "num", "den")
    out = cleaning.ratio_percent(out, "num", "den", "pct")
    got = [r.pct for r in out.collect()]
    want = [_py_ratio(f) for f in fracs]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        if w is None:
            assert g is None
        else:
            # float32 cast of inputs before the double division can
            # shift the rounded value by one ulp of the 2nd decimal
            assert g is not None and math.isclose(g, w, abs_tol=0.011)


@given(
    st.lists(  # left: (key, time)
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
    ),
    st.lists(  # right: (key, time, value) — unique (key, time)
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 999)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        [Row(k=k, t=t, lid=i) for i, (k, t) in enumerate(left_rows)]
    )
    right = spark.createDataFrame(
        [Row(k=k, t=t, v=v) for (k, t, v) in right_rows]
    )
    got = {
        r.lid: r.v_asof
        for r in asof_join(
            left, right, by="k", left_time="t", right_time="t",
            right_values=["v"], how="inner",
        ).collect()
    }
    # brute force: latest right at-or-before, same key
    want = {}
    for i, (k, t) in enumerate(left_rows):
        cands = [(rt, v) for (rk, rt, v) in right_rows if rk == k and rt <= t]
        if cands:
            want[i] = max(cands)[1]
    assert got == want


def test_asof_join_null_payload_comes_from_matched_row(spark):
    # The matched (latest <=) right row has v1=NULL, v2=7; an OLDER
    # right row has v1=5.  Per-column last(ignorenulls) would leak
    # v1=5 from the older row; the struct carry must return the
    # matched row as-is: (None, 7).
    left = spark.createDataFrame([Row(k=1, t=10, lid=0)])
    right = spark.createDataFrame(
        [(1, 1, 5, 6), (1, 9, None, 7)], "k int, t int, v1 int, v2 int"
    )
    out = asof_join(
        left, right, by="k", left_time="t", right_time="t",
        right_values=["v1", "v2"], how="inner",
    ).collect()
    assert len(out) == 1
    assert out[0].v1_asof is None
    assert out[0].v2_asof == 7


@given(st.lists(st.text(alphabet="ab [']\\\"", min_size=0, max_size=12),
                min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_strip_listish_matches_python(spark, strings):
    schema = StructType([StructField("s", StringType(), True)])
    df = spark.createDataFrame([Row(s=s) for s in strings], schema)
    got = [r.s for r in cleaning.strip_listish(df, "s").collect()]
    want = [s.replace("[", "").replace("]", "").replace("'", "") for s in strings]
    assert got == want


# ---------------------------------------------------------------------------
# Round-4 training-data operators vs plain-Python references
# ---------------------------------------------------------------------------

_words = st.sampled_from(["w0", "w1", "w2", "w3"])
_doc_texts = st.lists(
    st.lists(_words, min_size=0, max_size=14).map(" ".join),
    min_size=1, max_size=12,
)


def _py_ngrams(text: str, n: int) -> set[str]:
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@given(_doc_texts, _doc_texts)
@settings(**_SETTINGS)
def test_decontam_matches_bruteforce(spark, eval_texts, train_texts):
    from amazon_books_review_spark.functions import decontam

    n = 3  # short grams so tiny generated docs can actually collide
    eval_df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(eval_texts)]
    )
    train_df = spark.createDataFrame(
        [Row(doc_id=1000 + i, text=t) for i, t in enumerate(train_texts)]
    )
    grams = decontam.eval_ngram_set(eval_df, "doc_id", "text", n=n)
    got = {
        r.doc_id: (r.n_eval_grams_hit, r.contaminated)
        for r in decontam.flag_contaminated(
            train_df, grams, "doc_id", "text", n=n
        ).collect()
    }
    eval_grams = set().union(*(_py_ngrams(t, n) for t in eval_texts))
    for i, t in enumerate(train_texts):
        hits = len(_py_ngrams(t, n) & eval_grams)
        assert got[1000 + i] == (hits, int(hits > 0))
    assert len(got) == len(train_texts)


@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
       st.integers(1, 5))
@settings(**_SETTINGS)
def test_shard_manifest_matches_bruteforce(spark, ids, shards):
    import hashlib

    from amazon_books_review_spark.functions import sampling

    df = spark.createDataFrame([Row(doc_id=i) for i in ids])
    got = {
        r.doc_id: (r.shard, r.pos, r.shuffle_key)
        for r in sampling.shuffled_shard_manifest(
            df, "doc_id", shards=shards, salt="s"
        ).collect()
    }
    # plain-Python reference: same md5 key, same bucket arithmetic,
    # positions by (key, id) order within each shard
    key = {i: hashlib.md5(f"s|{i}".encode()).hexdigest() for i in ids}
    shard_of = {i: int(key[i][:7], 16) % shards for i in ids}
    want: dict[int, tuple[int, int, str]] = {}
    for s in set(shard_of.values()):
        members = sorted((key[i], i) for i in ids if shard_of[i] == s)
        for pos, (k, i) in enumerate(members, start=1):
            want[i] = (s, pos, k)
    assert got == want


# ---------------------------------------------------------------------------
# Misra-Gries sketch recall guarantee (pure Python — no Spark needed)
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(0, 500), min_size=1, max_size=300),
    st.lists(st.integers(0, 3), min_size=0, max_size=100),
    st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_mg_sketch_union_contains_all_heavy_hitters(noise, heavy_draw, n_parts):
    """The property heavy_hitters_mg's exactness rests on: splitting a
    stream across partitions and unioning the per-partition Misra-Gries
    survivors must retain EVERY item with global frequency
    > N/(cap+1), for any partitioning and any batch boundaries."""
    import pandas as pd

    # noise spans far more than MG_CAPACITY distinct values (so the
    # sketch actually evicts); heavy_draw concentrates mass on <= 4
    # values so true heavy hitters exist to lose
    stream = noise + heavy_draw

    from amazon_books_review_spark.plans import scale_ops_queries as so

    words = [f"w{v}" for v in stream]
    n = len(words)
    # deterministic round-robin split into partitions, then odd-sized
    # batch boundaries inside each partition (exercises the per-batch
    # merge path, not just one-shot counting)
    parts = [words[p::n_parts] for p in range(n_parts)]
    candidates: set[str] = set()
    for part in parts:
        batches = [
            pd.DataFrame({"word": part[i : i + 7]})
            for i in range(0, len(part), 7)
        ]
        for out in so.mg_sketch_fn(so.MG_CAPACITY)(iter(batches)):
            candidates.update(out["word"].tolist())
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    heavy = {w for w, c in counts.items() if c * (so.MG_CAPACITY + 1) > n}
    assert heavy <= candidates, f"lost heavy hitters: {heavy - candidates}"


def test_mg_capacity_derivation():
    """Support -> capacity pinning (VERDICT r10 #3): the recall floor
    N/(cap+1) must sit at or below min_support*N, with the smallest
    such cap, so vocabulary growth can never evict a target item."""
    from amazon_books_review_spark.plans import scale_ops_queries as so

    assert so.mg_capacity(0.5) == 1          # majority item: 1 slot
    assert so.mg_capacity(0.01) == 99        # 1% support: floor N/100
    assert so.mg_capacity(1.0 / 51.0) == 50  # the catalog query's cap
    assert so.MG_CAPACITY == 50              # contract unchanged vs r6-r10
    for s in (0.5, 0.1, 0.033, 0.01, 1 / 51, 1 / 128, 0.0007):
        cap = so.mg_capacity(s)
        assert 1.0 / (cap + 1) <= s          # guarantee holds
        assert cap == 0 or 1.0 / cap > s     # and cap is minimal
    import pytest

    with pytest.raises(ValueError):
        so.mg_capacity(0.0)
    with pytest.raises(ValueError):
        so.mg_capacity(1.0)


def test_mg_support_survives_vocab_growth():
    """The failure mode the support API closes: a vocabulary far
    larger than any fixed cap, with one 2%-share item.  Sizing from
    min_support=0.02 keeps it; the old fixed cap-50 contract only
    found items above 1/51 ~ 1.96% by luck of its constant."""
    import pandas as pd

    from amazon_books_review_spark.plans import scale_ops_queries as so

    vocab = 5000                    # >> any reasonable fixed cap
    noise = [f"n{i}" for i in range(vocab)] * 2        # 10k noise tokens
    heavy = ["hot"] * 300                              # ~2.9% share
    words = []
    for i, w in enumerate(noise):                      # interleave
        words.append(w)
        if i % 33 == 0 and heavy:
            words.append(heavy.pop())
    words.extend(heavy)
    n = len(words)
    support = 0.02
    cap = so.mg_capacity(support)
    batches = [
        pd.DataFrame({"word": words[i : i + 997]})
        for i in range(0, n, 997)
    ]
    (out,) = list(so.mg_sketch_fn(cap)(iter(batches)))
    survivors = set(out["word"])
    assert "hot" in survivors, "support-sized sketch evicted the 2.9% item"
    # and the sketch stayed bounded: at most cap keys retained
    assert len(survivors) <= cap


# --- round-6 analytics operators vs plain-Python references ---------------

event_streams = st.lists(
    st.tuples(
        st.integers(0, 3),                      # user_id
        st.integers(0, 50),                     # epoch seconds (dense -> ties)
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=0,
    max_size=40,
)


def _py_funnel(rows):
    """Reference funnel: first view, first click >= that view, first
    purchase >= that click — per user, ties allowed (>=)."""
    out = {}
    for uid in {r[0] for r in rows}:
        evs = sorted((t, e) for u, t, e in rows if u == uid)
        t_view = min((t for t, e in evs if e == "view"), default=None)
        t_click = (
            min((t for t, e in evs if e == "click" and t >= t_view), default=None)
            if t_view is not None else None
        )
        t_purch = (
            min((t for t, e in evs if e == "purchase" and t >= t_click), default=None)
            if t_click is not None else None
        )
        out[uid] = (t_view, t_click, t_purch)
    return out


@given(rows=event_streams)
@settings(**_SETTINGS)
def test_funnel_matches_python_reference(spark, rows):
    from pyspark.sql import Window

    if not rows:
        return
    df = spark.createDataFrame(
        [Row(user_id=u, epoch_s=t, event_type=e) for u, t, e in rows]
    ).withColumn("ts", F.timestamp_seconds("epoch_s"))
    w = Window.partitionBy("user_id")
    staged = (
        df.withColumn(
            "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .groupBy("user_id")
        .agg(
            F.max(F.unix_timestamp("t_view")).alias("v"),
            F.max(F.unix_timestamp("t_click")).alias("c"),
            F.max(F.unix_timestamp("t_purchase")).alias("p"),
        )
    )
    got = {r.user_id: (r.v, r.c, r.p) for r in staged.collect()}
    assert got == _py_funnel(rows)


@given(
    words=st.lists(
        st.text(alphabet="abcx", min_size=1, max_size=6), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
def test_bpe_pairs_match_python_reference(spark, words):
    from collections import Counter

    ref = Counter()
    for w in words:
        for i in range(len(w) - 1):
            ref[w[i : i + 2]] += 1
    df = spark.createDataFrame([Row(w=w) for w in words])
    got = {
        r.pair: r.n
        for r in (
            df.filter(F.length("w") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, length(w) - 1),"
                        " i -> substring(w, i, 2))"
                    )
                ).alias("pair")
            )
            .groupBy("pair")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        )
    }
    assert got == {k: v for k, v in ref.items()}


@given(
    vals=st.lists(
        st.integers(-1000, 1000).map(float), min_size=3, max_size=40
    )
)
@settings(**_SETTINGS)
def test_mad_zscores_match_python_reference(spark, vals):
    """Exact-percentile MAD pipeline vs a plain-Python median/MAD
    (linear-interpolation quantile, the percentile/quantile_cont
    definition both engines share)."""
    def q50(xs):
        xs = sorted(xs)
        n = len(xs)
        mid = (n - 1) / 2
        lo, hi = xs[int(mid)], xs[int(mid + 0.5)]
        return (lo + hi) / 2

    med = q50(vals)
    mad = q50([abs(v - med) for v in vals])
    df = spark.createDataFrame([Row(v=v) for v in vals])
    got_med, got_mad = (
        df.agg(
            F.percentile("v", F.lit(0.5)).alias("m"),
            F.percentile(F.abs(F.col("v") - F.lit(med)), F.lit(0.5)).alias("d"),
        ).collect()[0]
    )
    assert math.isclose(got_med, med, rel_tol=1e-12, abs_tol=1e-12)
    assert math.isclose(got_mad, mad, rel_tol=1e-12, abs_tol=1e-12)


# ---------------------------------------------------------------------------
# MERGE / CDC algebra (round 7)
# ---------------------------------------------------------------------------

_kv_tables = st.tuples(
    st.dictionaries(st.integers(0, 15), st.integers(-3, 3), max_size=12),
    st.dictionaries(st.integers(0, 15), st.integers(-3, 3), max_size=12),
)


@given(_kv_tables)
@settings(**_SETTINGS)
def test_merge_upsert_is_dict_update(spark, tables):
    """Plain upsert == Python dict.update on the key space."""
    from amazon_books_review_spark.operators.merge import merge_dataframes

    t, s = tables
    target = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in t.items()] or [Row(k=None, v=None)],
        "k long, v long",
    ).filter(F.col("k").isNotNull())
    source = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in s.items()] or [Row(k=None, v=None)],
        "k long, v long",
    ).filter(F.col("k").isNotNull())
    got = {r.k: r.v for r in merge_dataframes(target, source, "k").collect()}
    expected = dict(t)
    expected.update(s)
    assert got == expected


@given(_kv_tables)
@settings(**_SETTINGS)
def test_snapshot_diff_feed_reconstructs_new(spark, tables):
    """For ANY snapshot pair: old + feed == new (apply deletes, then
    upsert post-images/inserts) and the feed equals the dict diff."""
    from amazon_books_review_spark.operators.cdc import snapshot_diff
    from amazon_books_review_spark.operators.merge import merge_dataframes

    a, b = tables
    old = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in a.items()] or [Row(k=None, v=None)],
        "k long, v long",
    ).filter(F.col("k").isNotNull())
    new = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in b.items()] or [Row(k=None, v=None)],
        "k long, v long",
    ).filter(F.col("k").isNotNull())
    feed = snapshot_diff(old, new, "k").collect()
    kinds = {(r.k, r._change_type) for r in feed}
    expected_kinds = set()
    for k in set(a) | set(b):
        if k in a and k not in b:
            expected_kinds.add((k, "delete"))
        elif k in b and k not in a:
            expected_kinds.add((k, "insert"))
        elif a[k] != b[k]:
            expected_kinds.add((k, "update_preimage"))
            expected_kinds.add((k, "update_postimage"))
    assert kinds == expected_kinds
    # replay: old minus deletes, merged with inserts+postimages == new
    deletes = {r.k for r in feed if r._change_type == "delete"}
    upserts = [
        Row(k=r.k, v=r.v)
        for r in feed
        if r._change_type in ("insert", "update_postimage")
    ]
    base = old.filter(~F.col("k").isin(list(deletes)) if deletes else F.lit(True))
    if upserts:
        src = spark.createDataFrame(upserts, "k long, v long")
        replayed = merge_dataframes(base, src, "k")
    else:
        replayed = base
    assert {r.k: r.v for r in replayed.collect()} == b


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),          # group
            st.integers(0, 10_000),     # id (deduped below)
            st.integers(-50, 50),       # value (ties likely)
        ),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(1, 5),
    n_salts=st.integers(1, 6),
)
@settings(**_SETTINGS)
def test_salted_topk_matches_plain_topk(spark, rows, k, n_salts):
    """salted_top_k_per_key == top_k_per_key on adversarial frames:
    duplicate values (ties), singleton groups, k > group size, any
    salt fan-out.  Ids are deduped so the (value desc, id asc) order
    is total — the operator's documented contract."""
    from amazon_books_review_spark.operators.windows import (
        salted_top_k_per_key,
        top_k_per_key,
    )

    dedup = {(g, i): v for g, i, v in rows}
    data = [(g, i, float(v)) for (g, i), v in dedup.items()]
    df = spark.createDataFrame(data, "grp int, id long, v double")
    order = [F.col("v").desc(), F.col("id").asc()]
    want = sorted(
        tuple(r)
        for r in top_k_per_key(df, ["grp"], order, k=k)
        .select("grp", "id", "v", "rank")
        .collect()
    )
    got = sorted(
        tuple(r)
        for r in salted_top_k_per_key(
            df, ["grp"], order, k=k,
            salt_col=F.pmod(F.col("id"), F.lit(n_salts)).cast("int"),
            n_salts=n_salts,
        )
        .select("grp", "id", "v", "rank")
        .collect()
    )
    assert got == want


def test_heavy_hitters_filters_on_requested_support(spark):
    """ADVICE r11 regression: for supports whose reciprocal is not an
    integer the MG recall floor 1/(cap+1) is strictly looser than the
    support (0.03 -> cap 33 -> floor 1/34 ~ 2.94%), and the old
    second-pass filter ``n*(cap+1) > tot`` emitted items BELOW the
    promised threshold.  An item at 2.96% share must now be excluded
    at min_support=0.03 while a 4% item survives."""
    from amazon_books_review_spark.plans import scale_ops_queries as so

    support = 0.03
    cap = so.mg_capacity(support)
    assert cap == 33 and 1.0 / (cap + 1) < support  # floor looser than support

    total = 10_000
    words = (
        ["hot"] * 400                       # 4.00% > support: keep
        + ["mid"] * 296                     # 2.96%: above floor, below support
        + [f"n{i}" for i in range(total - 696)]
    )
    toks = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: r["n"] for r in so.heavy_hitters(toks, support).collect()}
    assert got == {"hot": 400}, f"support filter leaked: {got}"
