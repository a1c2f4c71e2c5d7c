"""Totality on an EMPTY corpus.

At 100 TB an upstream filter, a partition predicate, or a fresh
ingest routinely hands an operator zero rows; every registry query
must return an empty (schema-stable) result, never throw. The
iterative model-fitting queries are the risk surface: they collect
model-sized state driver-side, and an empty collection must not
turn into KeyError / ZeroDivisionError / IndexError before the plan
even runs (the bugs this file pins were exactly those three).

A full 172-query empty sweep runs out-of-band (it is how these were
found); the suite keeps a representative per-family subset so the
guard never regresses without 30 minutes of CI.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# the three previously-crashing iterative queries + one per family
PROBES = [
    "pagerank_suppliers",  # 1.0/node_count on the driver
    "logreg_gd",           # gradient dict indexed by dim
    "pca_power",           # mean vector / direction lists
    "kmeans_lloyd",
    "pricing_summary",
    "tumbling_window",
    "semantic_dedup",
    "dedup_minhash",
    "bm25_search",
    "bpe_train_merges",  # per-round driver collect must tolerate no pairs
    "dsir_select",
    "ndvi_shape",
    "media_metadata",
    "hybrid_retrieval",  # empty shortlist → empty centroid row, not a crash
    "simhash_hamming_pairs",
    "proximity_grid",  # no cells, no targets → empty grid, not a crash
    "viewshed_grid",  # empty grid → empty observer row, not a crash
    # r8 session-2 families, one probe each
    "gopher_rules",  # NULL-safe rule flags over zero docs
    "quality_classifier_train",  # empty corpus → the zero model
    "flow_accumulation",  # no cells → no edges → empty histogram
    "flow_accumulation_full",  # doubling loop drains round one (r9)
    "watershed_basins",  # pointer doubling over an empty parent map
    "media_exif",  # mapInPandas kernel over zero rows
    "media_png16_stats",  # deep-PNG round-trip kernel over zero rows
]


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", PROBES)
def test_query_total_on_empty_corpus(spark, empty_dir, name):
    from biggis_landuse_spark.queries import (
        REGISTRY,
        _ensure_loaded,
        release_caches,
    )

    _ensure_loaded()
    try:
        out = REGISTRY[name].spark(spark, empty_dir)
        # schema must still resolve, and no rows may materialize
        assert out.columns, name
        assert out.count() == 0, name
    finally:
        release_caches()


@pytest.fixture(scope="module")
def nulled_dir(spark, tmp_path_factory) -> str:
    """documents with NULL text / embeddings with NULL vectors (every
    7th row) — the 100 TB reality of a crawl with failed extractions.
    The full-registry sweep (175 queries, 0 crashes) runs out-of-band;
    this keeps the text/embedding-heavy subset pinned."""
    from pyspark.sql import functions as F

    out = tmp_path_factory.mktemp("null_sf")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
                    F.col("text")
                ),
            )
        if t == "embeddings":
            emb = "embedding" if "embedding" in df.columns else df.columns[1]
            idc = "vec_id" if "vec_id" in df.columns else df.columns[0]
            df = df.withColumn(
                emb,
                F.when(
                    F.col(idc) % 7 == 0,
                    F.lit(None).cast(df.schema[emb].dataType),
                ).otherwise(F.col(emb)),
            )
        df.write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


NULL_PROBES = [
    "semantic_dedup",
    "dedup_minhash",
    "bm25_search",
    "knn_cosine",
    "media_decode_features",
    "media_phash_dedup",
    "media_audio_stats",  # real WAV codec: NULL text must be gated upstream
    "document_chunking",
    "sequence_packing",
    "pca_power",
    "hybrid_retrieval",  # NULL text scores NULL → dropped before shortlist
    "simhash_hamming_pairs",
    "ann_ivfpq_topk",  # NULL embeddings must not crash assignment/encoding
    "rrf_fusion",  # NULL-affinity rows must not crash either input list
    "ngram_containment",
    "simhash_incremental",  # NULL-text docs must not crash either side
    "lexical_diversity",  # NULL filtered, empty text keeps a NULL-metric row
]


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory) -> str:
    """THREE rows per table, written as single parquet files so the
    DuckDB oracle can read them — the degenerate-group regime where
    engine semantics diverge (empty grouping sets, zero-variance
    neighborhoods, one-element rank-tolerance bands). The full
    186-query ORACLE sweep on this corpus runs out-of-band (0 bad);
    this pins the four queries it caught."""
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("tiny_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{SF_DIR}/{t}.parquet")
        pq.write_table(tbl.slice(0, 3), str(out / f"{t}.parquet"))
    return str(out)


TINY_ORACLE_PROBES = [
    # found by the 3-row sweep, each a distinct engine-semantics edge:
    "rollup_revenue",            # Spark rollup: no () row over empty input
    "grouping_sets_revenue",     # same, via SQL GROUPING SETS
    "hash_split_counts",         # static split grid must emit 0-count rows
    "getis_ord_tile",            # zero-variance neighborhoods drop as NODATA
    "approx_percentile_prices",  # rank-tol band < 1 element at tiny n
]


@pytest.mark.parametrize("name", TINY_ORACLE_PROBES)
def test_query_matches_oracle_on_tiny_corpus(spark, tiny_dir, name):
    from tests.oracle_diff import compare

    from biggis_landuse_spark.queries import (
        REGISTRY,
        _ensure_loaded,
        release_caches,
    )

    _ensure_loaded()
    try:
        spec = REGISTRY[name]
        r = compare(spec.spark(spark, tiny_dir), spec.oracle, tiny_dir)
        assert r["rowcount_match"] and r["schema_match"] and r["values_match"], (
            name,
            r,
        )
    finally:
        release_caches()


@pytest.mark.parametrize("name", NULL_PROBES)
def test_query_total_on_nulled_corpus(spark, nulled_dir, name):
    from biggis_landuse_spark.queries import (
        REGISTRY,
        _ensure_loaded,
        release_caches,
    )

    _ensure_loaded()
    try:
        out = REGISTRY[name].spark(spark, nulled_dir)
        assert out.columns, name
        out.count()  # must evaluate without raising
    finally:
        release_caches()


@pytest.fixture(scope="module")
def nulled_file_dir(tmp_path_factory) -> str:
    """Single-file parquet twin of nulled_dir (DuckDB reads one file
    per table, not a Spark part-directory): every 7th document's text
    is NULL and one is the empty string — the exact degenerate rows
    the LEFT-JOIN-shaped oracles disagreed on."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("null_file_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "documents":
            pdf = tbl.to_pandas()
            pdf.loc[pdf["doc_id"] % 7 == 0, "text"] = None
            if len(pdf) > 1:
                pdf.loc[pdf.index[1], "text"] = ""  # empty-but-present
            tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_table(tbl, str(out / f"{t}.parquet"))
    return str(out)


NULLED_ORACLE_PROBES = [
    # advisor-found engine/oracle mismatch class: a NULL/empty-text doc
    # yields zero frames from the engine's frame generator but a
    # document-scan row from a LEFT-JOIN-shaped oracle. Both sides now
    # filter degenerate docs identically; pin the match on the corpus
    # that actually CONTAINS such docs.
    "media_scene_cuts",
    "media_audio_stats",
    "media_frame_sample",
    # same class, found by sweeping ALL media queries on this corpus:
    # the decode_media family scanned every document in the oracle but
    # dropped NULL/empty payloads in the mapInPandas decoder
    "media_decode_features",
    "media_pixel_stats",
    "media_resize_stats",
    "media_phash_dedup",
    "media_metadata",  # total over all docs on BOTH sides — no filter
    "media_audio_frames",  # frame generator vs oracle: both gate NULL/empty
    "simhash_hamming_pairs",  # NULL-text docs get no fingerprint on either side
    "hybrid_retrieval",  # NULL text never reaches the shortlist on either side
    "lexical_diversity",  # empty text: n_tokens=0 + NULL entropy on BOTH sides
]


@pytest.mark.parametrize("name", NULLED_ORACLE_PROBES)
def test_query_matches_oracle_on_nulled_corpus(spark, nulled_file_dir, name):
    from tests.oracle_diff import compare

    from biggis_landuse_spark.queries import (
        REGISTRY,
        _ensure_loaded,
        release_caches,
    )

    _ensure_loaded()
    try:
        spec = REGISTRY[name]
        r = compare(
            spec.spark(spark, nulled_file_dir), spec.oracle, nulled_file_dir
        )
        assert r["rowcount_match"] and r["schema_match"] and r["values_match"], (
            name,
            r,
        )
    finally:
        release_caches()
