"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

For each catalog entry: run the Spark query and the DuckDB oracle on
the same parquet tables, then compare row count and an
order-insensitive value comparison with columns sorted by name —
the same shape as the driver's check, so a pass here predicts a pass
in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from amazon_books_review_spark.sources.io import TESTDATA_TABLES

REL_TOL = 1e-9
ABS_TOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Canonical value forms so dtype-only differences don't fail:
    out = {}
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_float_dtype(s):
            out[col] = s.astype(float)
        elif pd.api.types.is_integer_dtype(s):
            out[col] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[col] = pd.to_datetime(s).dt.tz_localize(None)
        else:
            import numpy as np

            out[col] = s.astype(object).map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple, np.ndarray))
                else v
            )
    norm = pd.DataFrame(out)
    return norm.sort_values(by=list(norm.columns), ignore_index=True)


def _type_family(s: pd.Series) -> str:
    """Coarse dtype family used to catch cross-engine typing drift.

    The driver hashes *raw* values, so Spark LONG vs DuckDB
    HUGEINT/DOUBLE (``1`` vs ``1.0``) is a hash mismatch even though
    ``1 == 1.0``.  Comparing families locally makes that drift fail
    here first (VERDICT r1 §What's wrong #1/#2/#4)."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    # object columns: infer from the first non-null value (DuckDB
    # HUGEINT can surface as object-dtype python ints)
    non_null = s.dropna()
    if len(non_null):
        v = non_null.iloc[0]
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
    return "object"


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=REL_TOL, abs_tol=ABS_TOL)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    for col in s_cols:
        fam_s = _type_family(spark_pdf[col])
        fam_o = _type_family(oracle_pdf[col])
        if fam_s != fam_o:
            problems.append(
                f"dtype family mismatch col {col}: spark={fam_s} "
                f"({spark_pdf[col].dtype}) oracle={fam_o} ({oracle_pdf[col].dtype})"
                " — the driver hashes raw values, cast the oracle"
            )
    if problems:
        return problems
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    for i in range(len(s)):
        for col in s.columns:
            if not _values_equal(s.at[i, col], o.at[i, col]):
                problems.append(
                    f"value mismatch row {i} col {col}: "
                    f"spark={s.at[i, col]!r} oracle={o.at[i, col]!r}"
                )
                if len(problems) > 5:
                    return problems
    return problems


def run_parity(spark, sf_dir: str, name: str, fn, oracle: str) -> list[str]:
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).fetchdf()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf)
