"""Stream-vs-batch parity for the Bloom dedup admission path."""

from __future__ import annotations

from pyspark.sql import functions as F

from biggis_landuse_spark.functions.dedup import bloom_bits
from biggis_landuse_spark.queries import load_tables
from biggis_landuse_spark.streaming.dedup import stream_bloom_admit

DOC_DDL = "doc_id long, text string"


def _setup(spark, sf_dir, tmp_path, n_files: int):
    (documents,) = load_tables(spark, sf_dir, "documents")
    snap = documents.where(F.col("doc_id") % 2 == 0)
    batch = documents.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    bits = bloom_bits(snap)
    src = str(tmp_path / "doc_stream")
    # several files => several micro-batches with maxFilesPerTrigger=1
    for i in range(n_files):
        batch.where(F.col("doc_id") % n_files == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    return batch, bits, src


def test_stream_bloom_matches_batch_twin(spark, sf_dir, tmp_path):
    batch, bits, src = _setup(spark, sf_dir, tmp_path, n_files=3)
    out = str(tmp_path / "scored")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(DOC_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_bloom_admit(stream, bits, out, ckpt).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    from biggis_landuse_spark.functions.dedup import bloom_containment

    want = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], r["flagged"])
        for r in bloom_containment(batch, bits).collect()
    }
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], r["flagged"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == want  # micro-batching is invisible: per-doc scoring


def test_stream_bloom_admitted_only_filters_flagged(spark, sf_dir, tmp_path):
    batch, bits, src = _setup(spark, sf_dir, tmp_path, n_files=2)
    out = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt2")
    stream = spark.readStream.schema(DOC_DDL).parquet(src)
    q = stream_bloom_admit(stream, bits, out, ckpt, admitted_only=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    assert rows and all(not r["flagged"] for r in rows)


# ---------------------------------------------------------------------------
# SimHash near-dup admission (the Hamming twin of the Bloom gate)
# ---------------------------------------------------------------------------


def _setup_simhash(spark, sf_dir, tmp_path, n_files: int):
    from biggis_landuse_spark.functions.dedup import simhash_band_index

    (documents,) = load_tables(spark, sf_dir, "documents")
    snap = documents.where(F.col("doc_id") % 2 == 0)
    # odd docs PLUS an exact copy of a snapshot doc under a fresh id —
    # the known near-dup (Hamming 0) the gate must flag
    copy_src = snap.orderBy("doc_id").limit(1).select(
        (F.lit(10_000_000)).alias("doc_id"), F.col("text")
    )
    batch = (
        documents.where(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text")
        .unionByName(copy_src)
    )
    index = simhash_band_index(snap).cache()
    src = str(tmp_path / "sh_stream")
    for i in range(n_files):
        batch.where(F.col("doc_id") % n_files == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    return batch, index, src


def test_stream_simhash_matches_batch_twin(spark, sf_dir, tmp_path):
    from biggis_landuse_spark.functions.dedup import simhash_near_dup_flags
    from biggis_landuse_spark.streaming.dedup import stream_simhash_admit

    batch, index, src = _setup_simhash(spark, sf_dir, tmp_path, n_files=3)
    out = str(tmp_path / "sh_scored")
    ckpt = str(tmp_path / "sh_ckpt")
    stream = (
        spark.readStream.schema(DOC_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_simhash_admit(stream, index, out, ckpt).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    want = {
        r["doc_id"]: (r["min_hamming"], r["nearest_snap_id"], r["flagged"])
        for r in simhash_near_dup_flags(batch, index).collect()
    }
    got = {
        r["doc_id"]: (r["min_hamming"], r["nearest_snap_id"], r["flagged"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == want  # micro-batching is invisible: per-doc scoring
    # the planted exact copy is a Hamming-0 flag against its source
    assert got[10_000_000][0] == 0
    assert got[10_000_000][2] is True
    index.unpersist()


def test_stream_simhash_admitted_only_drops_near_dups(spark, sf_dir, tmp_path):
    from biggis_landuse_spark.streaming.dedup import stream_simhash_admit

    batch, index, src = _setup_simhash(spark, sf_dir, tmp_path, n_files=2)
    out = str(tmp_path / "sh_admitted")
    ckpt = str(tmp_path / "sh_ckpt2")
    stream = spark.readStream.schema(DOC_DDL).parquet(src)
    q = stream_simhash_admit(stream, index, out, ckpt, admitted_only=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    ids = {r["doc_id"] for r in rows}
    assert 10_000_000 not in ids  # the planted copy was gated
    assert all(not r["flagged"] for r in rows)
    index.unpersist()
