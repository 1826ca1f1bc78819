"""Deterministic sampling/splitting + PII redaction properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_books_review_spark.functions import sampling, text


def test_split_is_deterministic_and_complete(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sampling.train_val_test_split(df, "doc_id")
    b = sampling.train_val_test_split(df.repartition(7), "doc_id")
    rows_a = {r.doc_id: (r.bucket, r.split) for r in a.collect()}
    rows_b = {r.doc_id: (r.bucket, r.split) for r in b.collect()}
    assert rows_a == rows_b  # partitioning-independent
    counts = {r.split: r.n for r in a.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 2000  # total partition of input
    # ~80/10/10 within generous tolerance at n=2000
    assert 0.72 <= counts["train"] / 2000 <= 0.88
    assert 0.05 <= counts["val"] / 2000 <= 0.16
    assert 0.05 <= counts["test"] / 2000 <= 0.16


def test_split_stable_under_append(spark):
    """Appending rows never reassigns existing ids."""
    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s = {r.doc_id: r.split
         for r in sampling.train_val_test_split(small, "doc_id").collect()}
    b = {r.doc_id: r.split
         for r in sampling.train_val_test_split(big, "doc_id").collect()}
    assert all(b[k] == v for k, v in s.items())


def test_stratified_sample_rates(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)],
        "doc_id long, lang string",
    )
    out = sampling.stratified_sample(
        df, "doc_id", "lang", rates_pct={"en": 50, "zh": 10}
    )
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert 0.40 <= counts["en"] / 1000 <= 0.60
    assert 0.04 <= counts.get("zh", 0) / 1000 <= 0.17
    # independent salts: sampling must not systematically prefer one split
    again = {r.doc_id for r in out.collect()}
    assert again == {r.doc_id for r in out.collect()}  # deterministic


def test_pack_sequences_properties(spark):
    """Bins fill in id order; each bin's token total stays under
    budget + one document (the documented overflow bound); every doc
    is assigned exactly once."""
    import random

    rng = random.Random(7)
    rows = [(i, "g%d" % (i % 3), rng.randint(1, 900)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, n_tokens long")
    out = sampling.pack_sequences(
        df, "doc_id", "n_tokens", budget=2048, group_cols=["grp"]
    ).collect()
    assert len(out) == 500
    by_bin: dict = {}
    for r in out:
        by_bin.setdefault((r.grp, r.seq_bin), []).append((r.doc_id, r.n_tokens))
    max_doc = max(t for _, _, t in rows)
    for (_, _bin), members in by_bin.items():
        assert sum(t for _, t in members) < 2048 + max_doc
    # bins are contiguous runs in id order within each group
    for grp in {"g0", "g1", "g2"}:
        seq = sorted((r.doc_id, r.seq_bin) for r in out if r.grp == grp)
        bins = [b for _, b in seq]
        assert bins == sorted(bins)


def test_pack_sequences_greedy_hard_cap(spark):
    """The applyInPandas greedy packer: budget is a HARD cap (except
    single oversized docs), ids stay in order, result matches a pure
    Python reference exactly."""
    import random

    rng = random.Random(11)
    rows = [(i, "g%d" % (i % 2), rng.randint(100, 900)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, n_tokens long")
    out = sampling.pack_sequences_greedy(
        df, "doc_id", "n_tokens", budget=2048, group_cols=["grp"]
    ).collect()
    assert len(out) == 300

    def reference(group_rows):
        bins, cur, tot = {}, 0, 0
        for doc_id, t in sorted(group_rows):
            if tot > 0 and tot + t > 2048:
                cur += 1
                tot = 0
            bins[doc_id] = cur
            tot += t
        return bins

    for grp in ("g0", "g1"):
        want = reference([(d, t) for d, g, t in rows if g == grp])
        got = {r.doc_id: r.seq_bin for r in out if r.grp == grp}
        assert got == want
        # hard cap holds
        totals: dict = {}
        for d, g, t in rows:
            if g == grp:
                totals[want[d]] = totals.get(want[d], 0) + t
        assert all(v <= 2048 for v in totals.values())


def test_redact_pii_handcrafted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@sub.example.org or bob@ex.io ok"),
            (2, "host 10.0.42.7 and 192.168.1.255 up"),
            (3, "call +1 (555) 010-4217 today"),
            (4, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.redact_pii(df, "doc_id", "text").collect()}
    assert out[1].n_emails == 2 and out[1].n_ips == 0
    assert out[2].n_ips == 2 and out[2].n_emails == 0
    assert out[3].n_phones == 1
    assert out[4].n_emails == out[4].n_ips == out[4].n_phones == 0
    # redacted text no longer matches any pattern
    red = text.redact_pii(
        df.select("doc_id", F.col("text").alias("orig"),
                  F.regexp_replace(
                      F.regexp_replace(
                          F.regexp_replace("orig", text.PII_EMAIL, "<EMAIL>"),
                          text.PII_IPV4, "<IP>"),
                      text.PII_PHONE, "<PHONE>").alias("text")),
        "doc_id", "text",
    ).collect()
    for r in red:
        assert r.n_emails == 0 and r.n_ips == 0 and r.n_phones == 0
