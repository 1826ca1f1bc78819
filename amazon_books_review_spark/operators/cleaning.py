"""Cleaning operators — the reference's batch transform surface.

Each function is a pure ``DataFrame -> DataFrame`` transform (shared
by batch and streaming plans) re-expressing one inventory row from
SURVEY.md §2.2/§2.8.  Reference citations use BD =
Amazon-book-review_books_details.py, BR = Amazon-book-review_books_reviews.py.

All transforms stay in Catalyst-native expressions (no Python UDFs),
so whole-stage codegen and vectorized parquet reads apply end to end —
this module adds zero Python-boundary crossings at any scale.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The exact char-class the reference strips from stringified lists
#: ("['A', 'B']" -> "A, B") — BD:68, BD:81.  Kept byte-identical.
LISTISH_CHARS_PATTERN = "[\\[\\]']"


def strip_listish(df: DataFrame, *cols: str) -> DataFrame:
    """F1 — remove ``[``, ``]``, ``'`` from stringified-list columns
    (BD:68 authors, BD:81 categories)."""
    return df.withColumns(
        {c: F.regexp_replace(F.col(c), LISTISH_CHARS_PATTERN, "") for c in cols}
    )


def split_to_array(df: DataFrame, col: str, delim: str = ",") -> DataFrame:
    """F2 — string -> array<string> on a delimiter (BD:76, BD:86)."""
    return df.withColumn(col, F.split(F.col(col), delim))


def split_fraction(df: DataFrame, col: str, num: str, den: str) -> DataFrame:
    """F2 — split a ``"7/10"`` fraction string into numerator /
    denominator float columns, garbage -> NULL via non-ANSI cast
    (BR:42-48)."""
    parts = F.split(F.col(col), "/")
    return df.withColumns(
        {
            num: parts.getItem(0).cast("float"),
            den: parts.getItem(1).cast("float"),
        }
    )


def ratio_percent(
    df: DataFrame, num: str, den: str, out: str, decimals: int = 2
) -> DataFrame:
    """F8/F9 — ``round(num/den*100, d)`` (BR:52).  ``x/0`` and
    ``0/0`` yield NULL (Spark division semantics), which the reference
    then maps to 0 via fillna (BR:105) — callers chain
    :func:`fillna_defaults` for that behavior."""
    return df.withColumn(out, F.round(F.col(num) / F.col(den) * 100, decimals))


def explode_columns(df: DataFrame, *cols: str) -> DataFrame:
    """F3 — explode array columns to one row per element.

    The reference writes both explodes in ONE select (BD:153) —
    ``select(..., explode("authors"), ..., explode("categories"), ...)``
    — which Spark rejects ("only one generator allowed per select").
    The *intended* semantics is the cross-product per row
    (|authors| x |categories| output rows), which sequential explodes
    produce; that is what we implement.

    Scale note: cross-product explode multiplies row count; at 100 TB
    prefer normalizing each array into its own link table (one explode
    each) and joining on demand — see plans/books_pipeline.py which
    offers both shapes.
    """
    out = df
    for c in cols:
        out = out.withColumn(c, F.explode(F.col(c)))
    return out


def cast_invalid_to_null(df: DataFrame, cols: Mapping[str, str]) -> DataFrame:
    """F4 — cast columns, mapping unparseable values to NULL (BD:99
    ratingsCount->float, BR:67 review/score->float, BR:76 time->long).

    Uses ``try_cast`` so the semantics hold even if the session runs
    in ANSI mode (Spark 4 default); under the engine's pinned
    ``spark.sql.ansi.enabled=false`` a plain cast would behave the
    same.
    """
    return df.withColumns(
        {c: F.col(c).try_cast(dtype) for c, dtype in cols.items()}
    )


def filter_url_like(df: DataFrame, *cols: str, prefix: str = "http") -> DataFrame:
    """P4/F10/F11 — keep rows where each URL column either starts with
    the prefix or is NULL (BD:128, BD:135, BD:142).  The three chained
    filters collapse into one Filter node under Catalyst; expressing
    them in one call just makes that explicit."""
    cond: Column | None = None
    for c in cols:
        this = F.col(c).startswith(prefix) | F.col(c).isNull()
        cond = this if cond is None else (cond & this)
    return df.filter(cond) if cond is not None else df


def strip_escapes_and_quotes(df: DataFrame, *cols: str) -> DataFrame:
    """F1 — final cleanup pass removing backslashes and double quotes
    (BD:189, BD:192, BD:195).  Patterns kept identical: ``'\\\\\\\\'``
    (a literal backslash) then ``'"'``."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.regexp_replace(F.col(c), "\\\\", ""))
        out = out.withColumn(c, F.regexp_replace(F.col(c), '"', ""))
    return out


def fillna_defaults(df: DataFrame, values: Mapping[str, object]) -> DataFrame:
    """F12 — dict-form fillna (BD:167-169, BR:104-107)."""
    return df.fillna(dict(values))


def drop_nulls(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """F13 — dropna, all-columns (BD:176) or subset (BR:69)."""
    return df.dropna(subset=list(subset) if subset else None)


def dedup_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """A4 — dropDuplicates (BD:177).

    Scale note: all-columns dedup shuffles every byte of the table on
    a hash of the full row.  At 100 TB pass ``subset`` (the natural
    key) so the shuffle key is narrow; better still, dedup within
    partitions first (Spark does map-side partial dedup for
    dropDuplicates automatically via partial aggregation).
    """
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def impute_mean(df: DataFrame, cols: Sequence[str], decimals: int | None = None) -> DataFrame:
    """A2 — fill NULLs in numeric columns with the column mean
    (BR:102-107), computed for ALL columns in ONE aggregation job
    (the reference runs one job per column and a driver collect each).

    The single ``.first()`` here is the only driver-side data
    dependency in the engine, matching the reference's one
    ``collect()[0][0]`` (BR:102) — semantically required because the
    fill value must exist before the rewrite.

    ``decimals`` rounds the mean before filling (deterministic
    cross-engine comparisons; the reference fills with the raw mean).
    """
    means_row = df.agg(
        *[F.avg(F.col(c).cast("double")).alias(c) for c in cols]
    ).first()
    fill = {}
    for c in cols:
        val = means_row[c]
        if val is not None:
            fill[c] = round(val, decimals) if decimals is not None else val
    return df.fillna(fill) if fill else df
