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
    "dsir_select",
    "ndvi_shape",
    "media_metadata",
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
