"""Training-shard writer (sources/shards.py): layout, order, balance,
and agreement with the corpus_shuffle_shards manifest query."""

from __future__ import annotations

import glob
import hashlib

from pyspark.sql import functions as F

from biggis_landuse_spark.sources.shards import (
    read_training_shard,
    write_training_shards,
)

SF_DIR = "/root/testdata/sf0.001"
N_SHARDS = 8


def _expected_key(doc_id: int) -> str:
    return hashlib.md5(f"{doc_id}|shuffle".encode()).hexdigest()


def _expected_shard(doc_id: int) -> int:
    return int(_expected_key(doc_id)[:6], 16) % N_SHARDS


def test_shard_layout_one_file_per_shard(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, N_SHARDS)
    dirs = sorted(glob.glob(f"{path}/shard=*"))
    assert len(dirs) == N_SHARDS
    for d in dirs:
        files = glob.glob(f"{d}/*.parquet")
        # all rows of a shard hash to one task -> exactly one file
        assert len(files) == 1, d


def test_shard_contents_complete_and_assigned_by_hash(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, N_SHARDS)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    rows = back.select("doc_id", "shard", "order_key").collect()
    for r in rows:
        assert r.shard == _expected_shard(r.doc_id), r
        assert r.order_key == _expected_key(r.doc_id), r


def test_shard_file_order_is_shuffle_order(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, N_SHARDS)
    for shard in range(N_SHARDS):
        got = [
            r.order_key
            for r in read_training_shard(spark, path, shard).collect()
        ]
        assert got == sorted(got), f"shard {shard} not in shuffle order"
        assert len(got) > 0


def test_shard_balance_and_manifest_agreement(spark, tmp_path):
    # the writer's physical layout must agree with the
    # corpus_shuffle_shards manifest query (same key, same modulo)
    from biggis_landuse_spark.queries import REGISTRY, release_caches
    import biggis_landuse_spark.queries.pipeline  # noqa: F401

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, N_SHARDS)
    physical = {
        r.shard: (r.n, r.head)
        for r in spark.read.parquet(path)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min_by("doc_id", "order_key").alias("head"),
        )
        .collect()
    }
    manifest = {
        r.shard: (r.n_docs, r.head_doc)
        for r in REGISTRY["corpus_shuffle_shards"].spark(spark, SF_DIR).collect()
    }
    release_caches()
    assert physical == manifest
    # md5 prefixes balance shards: no shard dominates
    counts = [n for n, _ in physical.values()]
    assert max(counts) <= 3 * min(counts)
