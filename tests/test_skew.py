"""Skew-handling primitives: results must equal their unsalted
equivalents row-for-row, the salt must actually spread hot keys, and
plans must stay hash-based."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biggis_landuse_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 holds 2000 rows; keys 1..20 hold 5 each
    hot = spark.range(2000).select(
        F.lit(0).alias("k"), (F.col("id") % 97).alias("v")
    )
    cold = spark.range(100).select(
        (F.col("id") % 20 + 1).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(21)], "k long, name string"
    )
    plain = skewed.join(dim, "k").groupBy("k", "name").count()
    salted = salted_join(skewed, dim, on="k", n_salt=8).groupBy(
        "k", "name"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_spreads_hot_key(spark, skewed):
    dim = spark.createDataFrame([(0, "hot")], "k long, name string")
    b = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64("v"), F.lit(8))
    )
    n_salts = (
        b.where(F.col("k") == 0).select("_salt").distinct().count()
    )
    assert n_salts == 8  # the hot key really fans out across reducers
    joined = salted_join(skewed, dim, on="k", n_salt=8)
    assert joined.count() == 2000


def test_salted_join_left_preserves_unmatched(spark, skewed):
    dim = spark.createDataFrame([(1, "one")], "k long, name string")
    out = salted_join(skewed, dim, on="k", n_salt=4, how="left")
    assert out.count() == skewed.count()
    assert out.where(F.col("name").isNull()).count() == skewed.where(
        F.col("k") != 1
    ).count()


@pytest.mark.parametrize("how", ["right", "right_outer", "full", "full_outer"])
def test_salted_join_rejects_right_and_full_outer(spark, skewed, how):
    # the replicated small side would emit n_salt duplicate
    # null-extended rows per unmatched right row — must be rejected
    dim = spark.createDataFrame([(0, "hot")], "k long, name string")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(skewed, dim, on="k", n_salt=4, how=how)


def test_salted_distinct_count_exact(spark, skewed):
    want = {
        r["k"]: r["n"]
        for r in skewed.groupBy("k")
        .agg(F.count_distinct("v").alias("n"))
        .collect()
    }
    got = {
        r["k"]: r["n_distinct"]
        for r in salted_distinct_count(skewed, "k", "v", n_salt=8).collect()
    }
    assert got == want


def test_salted_distinct_count_is_two_phase_hash_agg(spark, skewed):
    plan = (
        salted_distinct_count(skewed, "k", "v", n_salt=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortAggregate" not in plan
    assert plan.count("HashAggregate") >= 2
