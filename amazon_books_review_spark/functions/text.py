"""Text-analysis functions for large-scale training-data pipelines.

All Catalyst-native (no Python UDFs): tokenization, n-grams, quality
scoring, language ID and fingerprinting run inside whole-stage codegen
over the `documents` table — at 100 TB these are the per-document map
stages that must never cross the Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword inventories for the n-gram/stopword
#: language-ID heuristic.  Deliberately small and deterministic —
#: the operator shape (per-language evidence scores -> argmax) is what
#:  matters; swap in real CLD-style tables for production.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un"),
    "es": ("el", "la", "los", "y", "es", "un"),
}

#: Stopwords used by the quality score (English-ish).
QUALITY_STOPWORDS: tuple[str, ...] = LANG_STOPWORDS["en"]


# --- PII redaction ---------------------------------------------------------
#
# Patterns are kept in the Java-regex/RE2 COMMON subset (no
# backreferences, no lookaround) so the DuckDB oracle can run the
# exact same expressions.

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d[\d ()-]{7,}\d"


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII scrub for training corpora: count and redact emails, IPv4
    addresses and international-format phone numbers.

    Pure ``regexp_count`` + chained ``regexp_replace`` — codegen'd,
    zero shuffle, linear map stage (the shape every corpus-wide scrub
    must have at 100 TB).  Counts are taken on the ORIGINAL text, then
    redaction applies email -> ip -> phone so earlier placeholders
    can't be re-matched.  Returns (id, n_emails, n_ips, n_phones,
    redacted_md5) — the md5 keeps the oracle compact while still
    value-checking the full redacted string.
    """
    t = F.col(text_col)
    red = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4, "<IP>")
    red = F.regexp_replace(red, PII_PHONE, "<PHONE>")
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.md5(red).alias("redacted_md5"),
    )


# --- HTML / URL hygiene ----------------------------------------------------

URL_PATTERN = r"https?://[A-Za-z0-9./_%-]+"
HTML_TAG_PATTERN = r"<[^>]+>"

#: decode order matters: named/numeric entities first, ``&amp;`` LAST
#: (else "&amp;lt;" would double-decode).
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def extract_urls(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Pull every http(s) URL out of a document (link-density is a
    standard corpus-quality signal; the URL list feeds domain
    frequency/blocklist stages).  Pure regexp_extract_all."""
    t = F.col(text_col)
    urls = F.regexp_extract_all(t, F.lit(URL_PATTERN), F.lit(0))
    return df.select(
        F.col(id_col),
        urls.alias("urls"),
        F.array_join(urls, " ").alias("urls_joined"),
        F.size(urls).cast("long").alias("n_urls"),
    )


def strip_html(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Markup hygiene: drop tags, decode the common entities,
    collapse whitespace.  A chained-replace projection (codegen'd,
    shuffle-free) — the first stage of any web-scrape ingest.
    Returns (id, clean_len, clean_md5); callers wanting the cleaned
    text inline can lift the same expressions."""
    t = F.regexp_replace(F.col(text_col), HTML_TAG_PATTERN, " ")
    for entity, char in HTML_ENTITIES:
        t = F.replace(t, F.lit(entity), F.lit(char))
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("clean_len"),
        F.md5(t).alias("clean_md5"),
    )


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (split on one-or-more whitespace)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), "\\s+")


def bpe_ish_token_count(col: str | Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND on
    letter/digit/punctuation class changes (a cheap BPE-flavored
    proxy; real BPE needs a vocab).  Pure regex -> codegen-friendly."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_replace(
        c, r"(\d+|[^\w\s]+)", r" $1 "
    )
    return F.size(F.split(F.trim(pieces), "\\s+"))


def word_ngrams(tokens_col: str | Column, n: int) -> Column:
    """Word n-grams as an ARRAY column, for plans that keep consuming
    the array (MinHash signatures take 8 min-aggs over it, the LSH
    verify stage array_intersects it): built via slice + zip_with.

    Two pitfalls, both measured at sf0.1, pick the construction per
    consumption pattern:

    - ``transform(sequence, i -> ...element_at(t, i)...)`` re-evaluates
      the token expression (a regex split of the whole document) per
      ELEMENT inside the lambda — 3x slower on the shingle stage.
    - the slice+array_join form (:func:`word_ngrams_sliced`) is ~4x
      cheaper to BUILD (O(n) vs O(n^2) string bytes per gram), but as
      an array expression consumed by further lambdas/aggregates it
      gets re-inlined into every consumer (8 min-aggs -> 8 rebuilds:
      minhash 1.9s -> 5.6s).  The zip_with chain is what Catalyst
      declines to duplicate, so it stays evaluated once per row here.
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    length = F.greatest(F.size(t) - (n - 1), F.lit(0))
    grams = F.slice(t, 1, length)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(t, 1 + j, length), lambda a, b: F.concat_ws(" ", a, b)
        )
    return grams


def word_ngrams_sliced(tokens_col: str | Column, n: int) -> Column:
    """Word n-grams via one ``slice`` + ``array_join`` per gram — the
    cheap construction (O(n) bytes per gram vs the zip_with chain's
    O(n^2); 3.1s -> 0.5s at n=8, sf0.1) for plans that EXPLODE the
    grams immediately: the Generate boundary stops Catalyst from
    re-inlining the expression into downstream consumers, which is the
    one hazard of this form (see :func:`word_ngrams`).  The guard
    keeps short docs exact — ``sequence(1, 0)`` counts DOWN and would
    emit phantom grams."""
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    m = F.size(t) - (n - 1)  # gram count
    idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.array_join(F.slice(t, i, n), " "))


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics: counts, distinct counts, length
    moments — one projection, no shuffle."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length(text_col).cast("long").alias("n_chars_measured"),
        (F.length(text_col) / F.size(toks)).alias("avg_token_len"),
        bpe_ish_token_count(text_col).cast("long").alias("n_subword_tokens"),
    )


def quality_score(
    df: DataFrame, id_col: str, text_col: str, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Heuristic document quality in [0,1]: blends length saturation,
    alpha ratio, stopword presence and repetition (distinct ratio) —
    the standard cheap pre-filter shape for pretraining corpora.

    ``keep`` passes extra columns through, so pipelines can score and
    filter WITHOUT joining the scores back to the source (a self-join
    Catalyst would plan as a sort-merge join)."""
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("double")
    alpha_ratio = (
        F.length(F.regexp_replace(text_col, r"[^A-Za-z]", ""))
        / F.greatest(F.length(text_col), F.lit(1))
    )
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in QUALITY_STOPWORDS]))
    ).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1.0))
    len_sat = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    score = F.round(
        0.3 * len_sat
        + 0.3 * alpha_ratio
        + 0.2 * F.least(stop_hits / F.lit(3.0), F.lit(1.0))
        + 0.2 * distinct_ratio,
        4,
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        score.alias("quality"),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Within-document repetition — the standard boilerplate/loop
    detector for pretraining corpora (repeated lines and duplicated
    word trigrams are the classic symptoms of templated or
    model-generated junk).

    All array-native (split / distinct / size): a per-row projection,
    no explode, no shuffle.  Returns per-doc:
    - ``dup_line_ratio``: 1 - distinct/total over newline-split lines
    - ``dup_trigram_ratio``: 1 - distinct/total over word trigrams
    """
    lines = F.split(F.col(text_col), "\\n")
    n_lines = F.size(lines).cast("double")
    dup_lines = F.round(
        F.lit(1.0) - F.size(F.array_distinct(lines)) / F.greatest(n_lines, F.lit(1.0)),
        4,
    )
    grams = word_ngrams(tokens(text_col), 3)
    n_grams = F.size(grams).cast("double")
    dup_grams = F.round(
        F.lit(1.0) - F.size(F.array_distinct(grams)) / F.greatest(n_grams, F.lit(1.0)),
        4,
    )
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        dup_lines.alias("dup_line_ratio"),
        F.size(grams).cast("long").alias("n_trigrams"),
        dup_grams.alias("dup_trigram_ratio"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-evidence language ID: count stopword hits per
    language, argmax with deterministic tie-break on language code.

    Shape note: evidence scoring stays a per-row projection (array
    intersections against literal arrays — no join, no shuffle); at
    100 TB this is a pure map stage.
    """
    toks = tokens(text_col)
    scores = [
        F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        ).alias(f"hits_{lang}")
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    scored = df.select(F.col(id_col), F.col(text_col), *scores)
    # argmax via a struct array sort: (-hits, lang) ascending.
    pairs = F.array(
        *[
            F.struct(
                (-F.col(f"hits_{lang}")).alias("neg_hits"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_STOPWORDS)
        ]
    )
    best = F.sort_array(pairs).getItem(0)
    return scored.select(
        F.col(id_col),
        *[F.col(f"hits_{lang}").cast("long") for lang in sorted(LANG_STOPWORDS)],
        best.getField("lang").alias("lang_guess"),
        (-best.getField("neg_hits")).cast("long").alias("lang_evidence"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic document fingerprints:

    - ``fp_md5``: md5 of whitespace-normalized lowercase text (content
      identity for exact dedup across formatting).
    - ``fp_rolling``: 63-bit polynomial rolling hash over the md5s of
      the tokens (order-sensitive, composable per-chunk — the shape a
      chunked 100 TB ingest wants, since it can merge per-split).
    """
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    rolling = F.expr(
        "aggregate(transform({t}, x -> cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint)), "
        "cast(1469598103934665603 as bigint), "
        "(acc, h) -> (acc * 31 + h) & 9223372036854775807)".format(
            t=f"split(trim({text_col}), '\\\\s+')"
        )
    )
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp_md5"),
        rolling.alias("fp_rolling"),
    )


# --- Gopher quality rules --------------------------------------------------

#: Rae et al. 2021 (Gopher), Appendix A1.1 — the published document
#: filter thresholds, verbatim.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_LINE_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """The Gopher quality-filter suite as ONE Catalyst scan.

    Emits every rule as its own boolean plus the conjunction
    (``keep``), so a 100 TB corpus run can both filter and report
    per-rule kill counts from the same pass — re-running one rule at a
    time re-scans the corpus once per rule, which is the anti-pattern.
    ``passthrough`` names input columns to carry through the
    projection unchanged — how a funnel stacks other verdicts onto
    this same scan instead of re-joining at doc grain (r20).
    All expressions are built-in (split / filter / aggregate higher-
    order functions): no Python boundary, whole-stage codegen intact.

    Rules (Rae et al. 2021, A1.1): word count within
    [{min_w}, {max_w}]; mean word length within [{min_l}, {max_l}];
    symbol-to-word ratio (# or ellipsis) <= {sym}; <= {bul:.0%} of
    lines bullet-led; <= {ell:.0%} of lines ellipsis-terminated;
    >= {alpha:.0%} of words containing an alphabetic character;
    >= {stop} distinct stopwords present.
    """
    text = F.col(text_col)
    words = F.split(F.trim(text), r"\s+")
    lines = F.split(text, "\n")
    n_words = F.size(words).cast("long")
    n_lines = F.size(lines).cast("double")
    word_chars = F.expr(
        f"aggregate(transform(split(trim({text_col}), '\\\\s+'), "
        "w -> length(w)), 0L, (a, x) -> a + x)"
    )
    mean_wl = word_chars / n_words
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3 + (
        F.length(text) - F.length(F.replace(text, F.lit("…"), F.lit("")))
    )
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike(r"^[-*•]"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    flags = {
        "ok_word_count": (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS),
        "ok_mean_word_len": (mean_wl >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN),
        "ok_symbol_ratio": (n_hash + n_ellipsis) / n_words
        <= GOPHER_MAX_SYMBOL_RATIO,
        "ok_bullet_lines": bullet_lines / n_lines <= GOPHER_MAX_BULLET_LINE_FRAC,
        "ok_ellipsis_lines": ellipsis_lines / n_lines
        <= GOPHER_MAX_ELLIPSIS_LINE_FRAC,
        "ok_alpha_words": alpha_words / n_words >= GOPHER_MIN_ALPHA_WORD_FRAC,
        "ok_stopwords": n_stop >= GOPHER_MIN_STOPWORDS,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        n_words.alias("n_words"),
        *[c.alias(name) for name, c in flags.items()],
        keep.alias("keep"),
    )


# A formatted literal as a function's first statement is NOT a
# docstring (it's a discarded expression) — bind the thresholds into
# __doc__ after definition so help() shows the live constants.
if gopher_quality_flags.__doc__:  # stripped to None under -OO
    gopher_quality_flags.__doc__ = gopher_quality_flags.__doc__.format(
        min_w=GOPHER_MIN_WORDS, max_w=GOPHER_MAX_WORDS,
        min_l=GOPHER_MIN_MEAN_WORD_LEN, max_l=GOPHER_MAX_MEAN_WORD_LEN,
        sym=GOPHER_MAX_SYMBOL_RATIO, bul=GOPHER_MAX_BULLET_LINE_FRAC,
        ell=GOPHER_MAX_ELLIPSIS_LINE_FRAC, alpha=GOPHER_MIN_ALPHA_WORD_FRAC,
        stop=GOPHER_MIN_STOPWORDS,
    )


# --- Gopher repetition rules ----------------------------------------------

#: Rae et al. 2021, Appendix A1.2 — repetition thresholds, verbatim.
#: top-n-gram rule: chars inside the single most frequent n-gram
#: (count x gram length) / doc chars must not exceed the bound.
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
#: dup-n-gram rule: chars inside ALL n-grams occurring >= 2 times
#: (count x gram length, the standard overlap-free proxy) / doc chars.
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
GOPHER_MAX_DUP_LINE_FRAC = 0.30
GOPHER_MAX_DUP_LINE_CHAR_FRAC = 0.20


def _run_masses(grams: Column) -> Column:
    """(top, dup) char masses of an n-gram array, row-locally.

    Sort the grams, then one ``aggregate`` pass tracks the current
    equal-run (prev, runlen) while folding two outputs: ``top`` = max
    over runs of runlen x gram length (chars inside the single most
    frequent gram) and ``dup`` = sum over runs with runlen >= 2 of
    runlen x gram length (chars inside all duplicated grams).  The
    finish lambda flushes the final run.  O(G log G) string compares
    per row, zero shuffle — this replaced an explode + (doc, n, gram)
    groupBy that shuffled every gram STRING of the corpus (x9 n-gram
    widths): 8.1s -> 6.0s warm at sf0.1 with identical flags, and the
    remaining cost is pure map-side gram construction (perfectly
    partition-parallel; the shuffle variant ALSO paid it, plus the
    network).  Token-hash n-grams (xxhash64 per token, polynomial
    window signature + windowed length sums) were prototyped and
    measured NO win — 6.4s vs 6.0s at sf0.1: Catalyst's projection
    collapse re-inlines the hash/length arrays into every per-gram
    slice-aggregate, so the O(n)-per-gram arithmetic costs what the
    string building did.  Don't re-attempt without a way to pin the
    arrays materialized (no such expression-level mechanism today).
    """
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("runlen"),
        F.lit(0).cast("long").alias("top"),
        F.lit(0).cast("long").alias("dup"),
    )

    def merge(acc: Column, g: Column) -> Column:
        same = acc.prev.isNotNull() & (acc.prev == g)
        newrun = F.when(same, acc.runlen + 1).otherwise(F.lit(1))
        flushed = F.when(
            ~same & (acc.runlen >= 2), acc.dup + acc.runlen * F.length(acc.prev)
        ).otherwise(acc.dup)
        return F.struct(
            g.alias("prev"),
            newrun.cast("long").alias("runlen"),
            F.greatest(acc.top, newrun * F.length(g)).cast("long").alias("top"),
            flushed.cast("long").alias("dup"),
        )

    def finish(acc: Column) -> Column:
        return F.struct(
            acc.top.alias("top"),
            F.when(acc.runlen >= 2, acc.dup + acc.runlen * F.length(acc.prev))
            .otherwise(acc.dup)
            .cast("long")
            .alias("dup"),
        )

    return F.aggregate(F.array_sort(grams), zero, merge, finish)


def gopher_repetition_flags(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The Gopher repetition-filter suite (Rae et al. 2021 A1.2).

    ALL rules evaluate row-locally — the line rules over the newline
    split, the n-gram rules via :func:`_run_masses` (sorted-run
    accumulation), so the whole suite is a ZERO-SHUFFLE map stage:
    the ideal 100 TB filter shape (co-schedule with any other
    per-document scan for free).  Char masses use the standard
    count x gram-length proxy (exact overlap accounting needs
    interval union, which no production filter pays for); both
    engines compute the identical proxy, so the flags hash-match.
    """
    text = F.col(text_col)
    toks = tokens(text_col)
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("double")
    dup_line_frac = F.lit(1.0) - F.size(F.array_distinct(lines)) / F.greatest(
        n_lines, F.lit(1.0)
    )
    # chars inside duplicated lines: per distinct line, count * length
    # when count >= 2 (O(L^2) per row; L = lines per doc, small)
    dup_line_chars = F.aggregate(
        F.transform(
            F.array_distinct(lines),
            lambda l: F.when(
                F.size(F.filter(lines, lambda x: x == l)) >= 2,
                F.size(F.filter(lines, lambda x: x == l)) * F.length(l),
            ).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text).cast("long").alias("n_chars"),
        toks.alias("toks"),
        (dup_line_frac <= GOPHER_MAX_DUP_LINE_FRAC).alias("ok_dup_lines"),
        (
            dup_line_chars / F.greatest(F.length(text), F.lit(1)).cast("double")
            <= GOPHER_MAX_DUP_LINE_CHAR_FRAC
        ).alias("ok_dup_line_chars"),
    )
    ns = sorted(set(GOPHER_TOP_NGRAM_MAX) | set(GOPHER_DUP_NGRAM_MAX))
    masses = base.select(
        "doc_id",
        "n_chars",
        "ok_dup_lines",
        "ok_dup_line_chars",
        *[
            _run_masses(word_ngrams_sliced(F.col("toks"), n)).alias(f"m{n}")
            for n in ns
        ],
    )
    flag_exprs = []
    for n, thr in GOPHER_TOP_NGRAM_MAX.items():
        flag_exprs.append(
            (F.col(f"m{n}.top") / F.col("n_chars") <= thr).alias(
                f"ok_top_{n}gram"
            )
        )
    for n, thr in GOPHER_DUP_NGRAM_MAX.items():
        flag_exprs.append(
            (F.col(f"m{n}.dup") / F.col("n_chars") <= thr).alias(
                f"ok_dup_{n}gram"
            )
        )
    out = masses.select(
        "doc_id", "ok_dup_lines", "ok_dup_line_chars", *flag_exprs
    )
    flag_cols = (
        ["ok_dup_lines", "ok_dup_line_chars"]
        + [f"ok_top_{n}gram" for n in GOPHER_TOP_NGRAM_MAX]
        + [f"ok_dup_{n}gram" for n in GOPHER_DUP_NGRAM_MAX]
    )
    keep = None
    for c in flag_cols:
        keep = F.col(c) if keep is None else (keep & F.col(c))
    return out.withColumn("keep", keep)
