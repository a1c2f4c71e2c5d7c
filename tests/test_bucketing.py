"""Bucketed-table co-located joins: the persisted-data analog of the
reference's co-partitioned SpatialKey joins. The assertions pin the
scale property itself: joining two co-bucketed tables must not
shuffle either side, and must agree with the plain-join result."""

from __future__ import annotations

import pytest

from biggis_landuse_spark.operators.bucketing import (
    cobucketed_join,
    write_bucketed,
)
from biggis_landuse_spark.queries import load_tables


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    lineitem, orders = load_tables(spark, sf_dir, "lineitem", "orders")
    write_bucketed(lineitem, "bk_lineitem", 4, "l_orderkey")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "bk_orders",
        4,
        "l_orderkey",
    )
    yield "bk_lineitem", "bk_orders"
    spark.sql("DROP TABLE IF EXISTS bk_lineitem")
    spark.sql("DROP TABLE IF EXISTS bk_orders")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the join strategy actually exercises the
    # bucketed distribution (at 100 TB neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = cobucketed_join(spark, left, right, ["l_orderkey"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # with the sorted-bucket scan enabled, the stored sortBy order
        # is trusted (one file per bucket) and the Sort disappears too
        df = cobucketed_join(
            spark, left, right, ["l_orderkey"], trust_sorted_buckets=True
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Sort [l_orderkey" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )


def test_cobucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    lineitem, orders = load_tables(spark, sf_dir, "lineitem", "orders")
    expected = lineitem.join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    ).count()
    got = cobucketed_join(spark, left, right, ["l_orderkey"]).count()
    assert got == expected


def test_single_bucketed_side_still_avoids_its_shuffle(spark, bucketed_tables):
    left, _ = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        other = (
            spark.table(left)
            .groupBy("l_orderkey")
            .count()
            .withColumnRenamed("count", "n")
        )
        # grouping a bucketed table by its bucket key needs no Exchange
        plan = other._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
