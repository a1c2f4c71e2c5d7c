"""Bucketed (pre-shuffled) tables for co-located, shuffle-free joins.

The reference co-locates work by construction: every layer is keyed
and partitioned on SpatialKey, so its RDD joins
(NDVILayerExample.scala:64-66, /root/reference) reuse one partitioning
across the pipeline. The Spark-native equivalent for *persisted* data
is bucketing: write both sides bucketed (and sorted) by the join key,
and every subsequent equi-join on that key skips the shuffle AND the
sort — at 100 TB, re-shuffling a fact table per join is the single
largest avoidable cost in a multi-join pipeline.

Layout contract (what makes the join shuffle-free):
- both tables bucketed by the SAME columns into the SAME bucket count;
- `sortBy` the same columns so sort-merge join also skips the sort;
- readers must not re-split files (`spark.sql.sources.bucketing.enabled`
  is on by default; AQE respects bucketed distribution).

Bucketed output requires a table-catalog write (`saveAsTable`) — plain
`.parquet(path)` writes carry no bucket metadata Spark can trust.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    *keys: str,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and key-sorted) managed table.

    ``n_buckets`` should divide target-cluster parallelism evenly and
    keep each bucket file in the 100 MB–1 GB range at production
    scale; it must match across tables that will join.

    The pre-write ``repartition(n_buckets, keys)`` aligns the task
    partitioning with the bucket hash (both Murmur3 pmod n), so every
    bucket is exactly ONE file — the condition under which readers
    trust the ``sortBy`` order and drop the per-join Sort too. Without
    it each task writes a sliver of every bucket: thousands of small
    files at scale, and a re-sort on every read.
    """
    if sort:
        df = df.repartition(n_buckets, *keys)
    writer = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.format("parquet").saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
    trust_sorted_buckets: bool = False,
) -> DataFrame:
    """Join two co-bucketed tables on their bucket keys.

    When both tables were written by :func:`write_bucketed` with the
    same keys and bucket count, the physical plan contains NO Exchange
    on either side (asserted by tests/test_bucketing.py) — the join
    runs bucket-by-bucket, the distributed analog of the reference's
    co-partitioned SpatialKey joins.

    ``trust_sorted_buckets=True`` additionally drops the per-join Sort
    by letting the scan report the stored ``sortBy`` order
    (``spark.sql.legacy.bucketedTableScan.outputOrdering``; off by
    default in Spark ≥3.0). Trade-off: the sorted scan reads each
    bucket as one task, so scan parallelism = n_buckets — enable it
    for join-dominated pipelines over adequately-bucketed tables, not
    for scan-dominated ones.
    """
    if trust_sorted_buckets:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
    return spark.table(left_table).join(spark.table(right_table), on, how)
