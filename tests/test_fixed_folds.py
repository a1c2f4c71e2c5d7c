"""Bit-identity of the r12 fixed-dim codegen folds vs the HOF forms.

l2sq_fixed and _adc_sum must reproduce the aggregate/zip_with folds
EXACTLY (same element order, same left-to-right accumulation), or the
6dp-rounded oracle hashes of the PQ queries drift. Random vectors and
a shorter-than-dim edge case (NULL like zip_with's padding).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biggis_landuse_spark.functions import similarity as S

DIM = 16


@pytest.fixture(scope="module")
def vec_df(spark):
    import random

    rnd = random.Random(42)
    rows = [
        (i, [rnd.uniform(-2, 2) for _ in range(DIM)],
         [rnd.uniform(-2, 2) for _ in range(DIM)])
        for i in range(50)
    ]
    return spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )


def test_l2sq_fixed_matches_hof(vec_df):
    bad = vec_df.select(
        S.l2sq_fixed(F.col("a"), F.col("b"), DIM).alias("f"),
        S.l2sq(F.col("a"), F.col("b")).alias("h"),
    ).where(~(F.col("f") == F.col("h"))).count()
    assert bad == 0


def test_l2sq_fixed_short_array_yields_null_like_zip_with(spark):
    df = spark.createDataFrame(
        [([float(x) for x in range(DIM - 3)],
          [float(x) for x in range(DIM)])],
        "a array<double>, b array<double>",
    )
    row = df.select(
        S.l2sq_fixed(F.col("a"), F.col("b"), DIM).alias("f"),
        S.l2sq(F.col("a"), F.col("b")).alias("h"),
    ).first()
    assert row["f"] is None and row["h"] is None


def test_adc_sum_matches_aggregate(spark):
    df = spark.createDataFrame(
        [([[0.5, 1.5], [2.5, 3.5], [4.5, 5.5]], [1, 0, 1])],
        "dt array<array<double>>, codes array<int>",
    )
    m = 3
    hof = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at("dt", s + 1),
            (F.element_at("codes", s + 1) + 1).cast("int"),
        ),
    )
    row = df.select(S._adc_sum(m).alias("f"), hof.alias("h")).first()
    assert row["f"] == row["h"] == 1.5 + 2.5 + 5.5
