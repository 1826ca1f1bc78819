"""Tests for the scale helpers: salted joins, bucketed co-located
joins, single-pass observed metrics."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from amazon_books_review_spark.operators import metrics
from amazon_books_review_spark.operators.joins import salted_join
from amazon_books_review_spark.sources.io import load_table, write_bucketed

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey", n_salts=4).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # the join key is widened with the salt column
    assert "_salt" in _plan(salted)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts
    join with ZERO Exchange nodes (broadcast disabled to force the
    shuffle question)."""
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 4)
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, "bucketed join still shuffles"
        n = joined.count()
        plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_dpp_subquery_in_partition_filters(spark):
    """The dpp_partitioned_scan catalog query must carry a runtime
    ``dynamicpruning`` subquery in the partitioned scan's
    PartitionFilters — the static shape (a literal year filter) would
    prune at compile time and prove nothing about runtime pruning."""
    from amazon_books_review_spark.plans.format_queries import dpp_partitioned_scan

    df = dpp_partitioned_scan(spark, SF)
    plan = _plan(df)
    assert "dynamicpruning" in plan, "dynamic partition pruning did not fire"
    # and the pruning actually drops the partial year: at every SF the
    # 2001 partition (7 months of orders) falls under the 10% cut
    years = sorted(r.ship_year for r in df.collect())
    assert 2001 not in years and len(years) >= 5


def test_runtime_bloom_filter_on_shuffle_join(spark):
    """Row-level runtime filtering — DPP's sibling for UNpartitioned
    facts: a selective dim filter on a shuffle join makes Catalyst
    build a bloom filter from the dim side and inject
    ``might_contain`` into the fact scan's post-scan filter, so
    non-matching fact rows die before the shuffle.  At 100 TB this
    fires out of the box (the fact side clears the 10 GiB application
    threshold); at test scale the threshold is lowered to prove the
    mechanics.  Values must equal the unfiltered join's."""
    old_thresh = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF, "lineitem")
        urgent = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(urgent, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert "might_contain" in _plan(j), "runtime bloom filter not injected"
        got = {r.o_orderstatus: r.n for r in j.collect()}
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_thresh,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
    li = load_table(spark, SF, "lineitem")
    urgent = load_table(spark, SF, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plain = {
        r.o_orderstatus: r.n
        for r in li.join(urgent, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == plain


def test_aqe_skew_join_split(spark):
    """AQE's runtime answer to the problem salted_join solves by hand:
    a hot key's shuffle partition is split into mapper-output chunks
    and the other side's matching partition duplicated —
    ``SortMergeJoin(skew=true)`` in the FINAL adaptive plan.

    Two local-scale accommodations, both documented because they are
    real operational knowledge: thresholds are lowered (the defaults
    are sized for multi-GB partitions), and the input is repartitioned
    first — AQE splits a skewed partition at MAPPER granularity, so a
    single-file scan (one mapper) can never be split no matter how
    skewed the key is.  At 100 TB both conditions hold naturally.
    """
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF, "lineitem").repartition(8)
        skewed = li.withColumn(
            "k",
            F.when(F.col("l_orderkey") % 10 != 0, F.lit(7)).otherwise(
                F.col("l_orderkey") % 97
            ),
        )
        dim = (
            spark.range(0, 100)
            .select(F.col("id").alias("k2"), (F.col("id") * 2).alias("attr"))
            .repartition(4)
        )
        j = skewed.join(dim, F.col("k") == F.col("k2"))
        n = j.count()
        j.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain()  # simple mode renders the skew marker on the node
        assert "skew=true" in buf.getvalue(), "AQE did not split the skewed join"
        # same row count as the logical join computed without skew
        plain = skewed.join(
            F.broadcast(dim), F.col("k") == F.col("k2")
        ).count()
        assert n == plain
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_range_sorted_layout_enables_file_skipping(spark, tmp_path):
    """Files from write_range_sorted carry disjoint min/max ranges on
    the sort key (verified via parquet footer stats) — the property
    row-group/file skipping depends on."""
    import glob

    import pyarrow.parquet as pq

    from amazon_books_review_spark.sources.io import write_range_sorted

    orders = load_table(spark, SF, "orders")
    out = str(tmp_path / "orders_sorted")
    write_range_sorted(orders, out, ["o_totalprice"], num_files=4)

    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "o_totalprice"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 3
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {ranges}"

    back = spark.read.parquet(out)
    assert back.count() == orders.count()


def test_observation_single_pass_metrics(spark):
    """The BD probe pattern (7 recomputing counts) as ONE pass."""
    orders = load_table(spark, SF, "orders")
    df, obs = metrics.with_observation(
        orders,
        {
            "rows": metrics.row_count_metric(),
            "null_status": metrics.null_count_metric("o_orderstatus"),
            "total": F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
        },
    )
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["rows"] == orders.count()
    assert got["null_status"] == 0
    assert got["total"] > 0


def test_copurchase_edges_match_self_join(spark):
    """The set-explode edge derivation must emit exactly the edge set
    of the reference fact self-join, in both orientations (the 1.6x
    speedup is only valid because the sets are identical)."""
    import pyspark.sql.functions as F

    from amazon_books_review_spark.plans.scale_ops_queries import copurchase_edges
    from amazon_books_review_spark.sources.io import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem")
    lp = li.select("l_orderkey", "l_partkey").distinct()
    a, b = lp.alias("a"), lp.alias("b")
    ref_directed = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    got_directed = copurchase_edges(li, directed=True)
    assert got_directed.exceptAll(ref_directed).count() == 0
    assert ref_directed.exceptAll(got_directed).count() == 0

    got_und = copurchase_edges(li, directed=False)
    assert got_und.filter(F.col("u") >= F.col("v")).count() == 0
    assert got_und.count() * 2 == got_directed.count()
