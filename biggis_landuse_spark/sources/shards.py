"""Training-shard writer: deterministic corpus shuffle → hash-balanced,
internally-ordered parquet shards.

The write-layout step after select/mix/pack (the physical twin of the
``corpus_shuffle_shards`` registry query): every row gets a
content-hash order key, its shard is the key's md5-prefix modulo, and
the writer lays rows out so one task writes one shard file in shuffle
order. Training loaders then stream shards sequentially and still see
a globally well-mixed order — no reader-side shuffle buffer needed.

Scale shape: ONE shuffle (`repartition(n_shards, shard)`; all rows of
a shard hash to the same task) + a per-partition sort that spills,
never a global sort. Shard count scales with corpus size (one shard ~
one output file of a few hundred MB), never with executor count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHUFFLE_SALT = "|shuffle"


def shard_key(id_col: str) -> F.Column:
    """md5 order key for the deterministic corpus shuffle — portable
    across engines/runs/partitionings (same mix corpus_shuffle_shards
    oracles in DuckDB)."""
    return F.md5(F.concat(F.col(id_col).cast("string"), F.lit(SHUFFLE_SALT)))


def shard_of(key: F.Column, n_shards: int) -> F.Column:
    """Shard id from the order key's md5 prefix: balanced regardless of
    id layout (strides/ranges never concentrate)."""
    return F.pmod(
        F.conv(F.substring(key, 1, 6), 16, 10).cast("long"), F.lit(n_shards)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> None:
    """Write ``df`` as ``shard=N/`` parquet directories, each holding
    ONE file whose row order is the deterministic shuffle order.

    ``repartition(n_shards, shard)`` routes every row of a shard to a
    single task (same-valued keys always co-locate, even when two
    shards share a task), so each ``shard=N`` directory gets exactly
    the files of the task(s) that owned it — one per shard here —
    and ``sortWithinPartitions`` fixes the in-file order without a
    global sort. ``order_key`` is kept in the schema so readers and
    audits can verify the order independently.
    """
    keyed = df.withColumn("order_key", shard_key(id_col)).withColumn(
        "shard", shard_of(F.col("order_key"), n_shards)
    )
    (
        keyed.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "order_key")
        .write.partitionBy("shard")
        .mode("error")
        .parquet(path)
    )


def read_training_shard(spark, path: str, shard: int) -> DataFrame:
    """Read one shard in its written (shuffle) order — partition
    pruning makes this a single-directory scan."""
    return (
        spark.read.parquet(path)
        .where(F.col("shard") == shard)
    )
