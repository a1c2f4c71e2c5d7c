"""Distributed global ranking: exact total-order row numbers and
NTILE without a single-partition window.

Spark's ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY
moves EVERY row through one task — the classic 100 TB cliff
(WindowExec warns "Moving all data to a single partition"). The
scalable equivalent is the two-phase rank every MPP engine uses:

1. ``repartitionByRange`` on the order key — each partition holds a
   contiguous, disjoint key range (a range shuffle, sampled bounds);
2. rank WITHIN each partition (parallel, partition-local sort);
3. add each partition's cumulative predecessor count — a tiny
   per-partition histogram aggregated on the driver side of a
   broadcast, never touching the data again.

The result is bit-identical to the single-partition form for a total
(deterministic, duplicate-free) order, which the callers guarantee by
including a unique tiebreak column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row numbers in ``order_cols`` order
    (which must be a total order — include a unique key).

    One range shuffle + one partition-local sort + one broadcast of
    |partitions| offsets. No stage sees all rows in one task.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_local_rn",
        F.row_number().over(
            Window.partitionBy("_pid").orderBy(*order_cols)
        ),
    )
    offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_local_rn") + F.col("_offset")).cast("long"))
        .drop("_pid", "_local_rn", "_offset")
    )


def grouped_cumsum(
    df: DataFrame,
    group_cols: list,
    order_cols: list,
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Segmented running sum: ``sum(value) OVER (PARTITION BY group
    ORDER BY order)`` without any group's rows collapsing into one
    task.

    A plain partitionBy window serializes each group — fatal when a
    few hot groups hold most rows (the sweep-line / time-series
    shape). Two-phase instead: range-partition on (group, order) so
    each task holds a contiguous slice of one-or-more groups, running-
    sum locally, then add the per-(partition, group) predecessor
    totals — a |partitions|×|groups-crossing-boundaries| relation,
    tiny, broadcast. Bit-identical to the single-window form because
    range partitioning keeps equal keys together and the local window
    uses the same RANGE-frame tie semantics SQL does.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    keys = [*group_cols, *order_cols]
    ranged = df.repartitionByRange(n, *keys).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_local",
        F.sum(value_col).over(
            Window.partitionBy("_pid", *group_cols).orderBy(*order_cols)
        ),
    )
    offsets = (
        local.groupBy("_pid", *group_cols)
        .agg(F.sum(value_col).alias("_tot"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_tot").over(
                    Window.partitionBy(*group_cols)
                    .orderBy("_pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", *group_cols, "_offset")
    )
    return (
        local.join(F.broadcast(offsets), ["_pid", *group_cols])
        .withColumn(out_col, F.col("_local") + F.col("_offset"))
        .drop("_pid", "_local", "_offset")
    )


def ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """SQL NTILE(n) from a 1-based global rank and the total count:
    the first ``total % n`` buckets get ``total div n + 1`` rows, the
    rest ``total div n`` — exactly the standard's distribution."""
    big = (total / n).cast("long") + 1  # size of the first `rem` buckets
    small = (total / n).cast("long")
    rem = total % n
    boundary = big * rem  # ranks 1..boundary fall in the big buckets
    return (
        F.when(rank <= boundary, ((rank - 1) / big).cast("long") + 1)
        .otherwise(
            rem + ((rank - boundary - 1) / F.greatest(small, F.lit(1))).cast("long") + 1
        )
        .cast("int")
    )


def global_ntile(
    df: DataFrame,
    order_cols: list,
    n: int,
    out_col: str = "band",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global NTILE(n) via :func:`global_row_number` + a 1-row
    count broadcast — the scale-correct form of
    ``ntile(n) OVER (ORDER BY ...)``."""
    ranked = global_row_number(df, order_cols, out_col="_rn", num_partitions=num_partitions)
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out_col, ntile_from_rank(F.col("_rn"), F.col("_total"), n))
        .drop("_rn", "_total")
    )
