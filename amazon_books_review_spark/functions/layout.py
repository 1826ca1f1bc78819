"""Multi-column data layout: Z-order (Morton) clustering.

`sources.io.write_range_sorted` clusters on ONE sort key; queries
filtering on a second column still scan everything.  Z-ordering maps
k columns onto one dimension-interleaved integer so that parquet
row-group/file min-max statistics stay selective on EVERY interleaved
column — the public Delta/Iceberg `OPTIMIZE ZORDER BY` idea, built
here from plain Spark primitives:

    rank-normalize each column -> interleave bits -> range-partition
    + sort by the Morton code -> write.

At 100 TB this is the difference between "point query on (user, day)
reads 3 files" and "reads every file": both dimensions' value ranges
shrink per file, not just the primary sort key's.

Everything is deterministic, expression-only bit arithmetic —
oracle-checkable cross-engine (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension in the interleaved code (16 bits x 2 dims fits
#: comfortably in a long; 3+ dims would drop to 10-12 bits each).
MORTON_BITS = 16


def morton_interleave(a: Column, b: Column, bits: int = MORTON_BITS) -> Column:
    """Bit-interleave two non-negative ints (a's bit i -> output bit
    2i+1, b's bit i -> output bit 2i).  Pure shift/and/multiply
    expression tree — whole-stage-codegen'd, and trivially
    reproducible in any SQL dialect with integer division."""
    terms = []
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        terms.append(bit_a * F.lit(1 << (2 * i + 1)) + bit_b * F.lit(1 << (2 * i)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def normalize_to_bits(col: Column, lo: Column, hi: Column, bits: int = MORTON_BITS) -> Column:
    """Min-max scale a numeric column onto [0, 2^bits - 1] integers.
    ``lo``/``hi`` are scalar columns (pass literals or an aggregated
    min/max) so callers control whether bounds come from data or are
    fixed schema constants."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    scaled = (col - lo) / span * F.lit((1 << bits) - 1)
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def _with_layout_code(
    df: DataFrame,
    col_a: str,
    col_b: str,
    code_col: str,
    encode,
    bits: int,
) -> DataFrame:
    """``df`` plus the layout code of (col_a, col_b) as ``code_col``.
    Column bounds come from one cheap min/max aggregate joined in as a
    broadcast scalar row (no collect; the bounds never leave the
    cluster).  Zero-shuffle past that broadcast: this is the
    CODE-computation half, shared by the ``*_by`` layout writers and
    the code-only catalog checks (which need the codes, not the
    redistribution — the range exchange would only reorder rows)."""
    bounds = df.agg(
        F.min(col_a).cast("double").alias("_lo_a"),
        F.max(col_a).cast("double").alias("_hi_a"),
        F.min(col_b).cast("double").alias("_lo_b"),
        F.max(col_b).cast("double").alias("_hi_b"),
    )
    return df.join(F.broadcast(bounds)).withColumn(
        code_col,
        encode(
            normalize_to_bits(
                F.col(col_a).cast("double"), F.col("_lo_a"), F.col("_hi_a"), bits
            ),
            normalize_to_bits(
                F.col(col_b).cast("double"), F.col("_lo_b"), F.col("_hi_b"), bits
            ),
            bits,
        ),
    ).drop("_lo_a", "_hi_a", "_lo_b", "_hi_b")


def zorder_codes(df: DataFrame, col_a: str, col_b: str, bits: int = MORTON_BITS) -> DataFrame:
    """``df`` plus the Morton code as ``_zorder`` — codes only, no
    redistribution (one broadcast of the 1-row bounds aggregate, no
    exchange of ``df`` itself)."""
    return _with_layout_code(df, col_a, col_b, "_zorder", morton_interleave, bits)


def zorder_by(
    df: DataFrame,
    col_a: str,
    col_b: str,
    num_files: int | None = None,
    bits: int = MORTON_BITS,
) -> DataFrame:
    """Return ``df`` redistributed and sorted by the Morton code of
    (col_a, col_b) — ready to write.

    ``repartitionByRange`` on the code gives files disjoint Morton
    ranges; sorting within partitions tightens row-group stats.
    """
    with_code = zorder_codes(df, col_a, col_b, bits)
    parts = [num_files] if num_files else []
    return with_code.repartitionByRange(*parts, F.col("_zorder")).sortWithinPartitions(
        "_zorder"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-ordered parquet layout on two columns (the multi-column
    sibling of ``sources.io.write_range_sorted``)."""
    zorder_by(df, col_a, col_b, num_files).drop("_zorder").write.mode(mode).parquet(
        path
    )


# --- Hilbert curve -----------------------------------------------------------

#: bits per dimension for the Hilbert code (2^16 x 2^16 grid; the
#: code fits in 32 bits of a long).
HILBERT_BITS = 16


def hilbert_encode(a: Column, b: Column, bits: int = HILBERT_BITS) -> Column:
    """(x, y) -> distance along the 2-D Hilbert curve.

    Z-order's locality has seams: consecutive Morton codes jump
    across the grid at power-of-two boundaries, so a range of codes
    can span distant cells.  The Hilbert curve is the space-filling
    curve WITHOUT those jumps (every consecutive pair of codes is
    grid-adjacent — property-tested), which is why Hudi/Iceberg offer
    it next to Z-order for layout clustering: range scans touch
    strictly fewer files at the same file count.

    Implementation: the standard bit-level xy2d walk (one quadrant
    decision per level, rotating the frame as it descends), expressed
    as a single ``aggregate`` over the level array with an (x, y, d)
    struct accumulator — the same zero-shuffle fold the text module
    uses for run masses.  No UDF; the identical walk unrolls into the
    DuckDB oracle as two CTEs per level.
    """
    levels = F.array(*[F.lit(1 << (bits - 1 - i)).cast("long") for i in range(bits)])
    zero = F.struct(
        a.cast("long").alias("x"),
        b.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def merge(acc: Column, s: Column) -> Column:
        rx = F.when(acc.x.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when(acc.y.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        d = acc.d + s * s * (rx * 3).bitwiseXOR(ry)
        # frame rotation: quadrant (rx=1, ry=0) reflects both axes,
        # any ry=0 quadrant swaps x/y; ry=1 leaves the frame alone
        fx = F.when(rx == 1, s - 1 - acc.x).otherwise(acc.x)
        fy = F.when(rx == 1, s - 1 - acc.y).otherwise(acc.y)
        nx = F.when(ry == 0, fy).otherwise(acc.x)
        ny = F.when(ry == 0, fx).otherwise(acc.y)
        return F.struct(
            nx.cast("long").alias("x"),
            ny.cast("long").alias("y"),
            d.cast("long").alias("d"),
        )

    return F.aggregate(levels, zero, merge, lambda acc: acc.d)


def hilbert_codes(df: DataFrame, col_a: str, col_b: str, bits: int = HILBERT_BITS) -> DataFrame:
    """``df`` plus the Hilbert code as ``_hilbert`` — codes only, no
    redistribution (one broadcast of the 1-row bounds aggregate, no
    exchange of ``df`` itself)."""
    return _with_layout_code(df, col_a, col_b, "_hilbert", hilbert_encode, bits)


def hilbert_by(
    df: DataFrame,
    col_a: str,
    col_b: str,
    num_files: int | None = None,
    bits: int = HILBERT_BITS,
) -> DataFrame:
    """``zorder_by`` with the Hilbert code instead of Morton —
    same bounds broadcast, same range-partition + in-partition sort."""
    with_code = hilbert_codes(df, col_a, col_b, bits)
    parts = [num_files] if num_files else []
    return with_code.repartitionByRange(
        *parts, F.col("_hilbert")
    ).sortWithinPartitions("_hilbert")
