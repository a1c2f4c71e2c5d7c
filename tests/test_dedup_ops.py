"""Dedup-resolution operator invariants beyond the oracle check."""

from __future__ import annotations

from pyspark.sql import functions as F

from biggis_landuse_spark.functions import dedup as D
from biggis_landuse_spark.queries import load_tables


def test_linear_dropped_ids_equals_pairwise_form(spark, sf_dir):
    # the linear per-group form must select exactly the ids the
    # quadratic pair explosion would mark as dropped
    (documents,) = load_tables(spark, sf_dir, "documents")
    sig = D.minhash_signatures_from_text(documents, "doc_id", "text")
    linear = {
        r["doc_id"] for r in D.lsh_dropped_ids(sig, "doc_id").collect()
    }
    pairwise = {
        r["doc_id"]
        for r in D.lsh_band_pairs(sig, "doc_id")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .collect()
    }
    assert linear == pairwise
    assert linear  # non-trivial on the fixture corpus


def test_dropped_ids_fanout_is_linear_in_group_size(spark):
    # a hot bucket of n identical docs must expand to n-1 rows in the
    # resolution path, not the n(n-1)/2 pairs of the similarity path —
    # the property that keeps boilerplate-heavy corpora tractable
    n = 10
    docs = spark.createDataFrame(
        [(i, "the same boilerplate text repeated here") for i in range(n)],
        "doc_id long, text string",
    )
    sig = D.minhash_signatures_from_text(docs, "doc_id", "text")
    banded = D.banded_signatures(sig, "doc_id")
    linear_rows = (
        banded.groupBy("band_id", "sig")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
        .select(F.explode(F.expr("slice(ids, 2, size(ids) - 1)")))
        .count()
    )
    quad_rows = D.pairs_within_groups(banded, "doc_id").count()
    assert linear_rows == D.N_BANDS * (n - 1)
    assert quad_rows == D.N_BANDS * n * (n - 1) // 2
    # and the final answer is identical: all but the minimum id drop
    dropped = {
        r["doc_id"] for r in D.lsh_dropped_ids(sig, "doc_id").collect()
    }
    assert dropped == set(range(1, n))


def test_semantic_dedup_invariants(spark, sf_dir):
    # every dropped doc keeps a LOWER-id partner in the SAME ivf cell
    # with cosine >= tau — kept_id really is the minimal such partner
    from biggis_landuse_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["semantic_dedup"].spark(spark, sf_dir).collect()
    assert rows, "threshold should fire at sf0.01"
    for r in rows:
        assert r["kept_id"] < r["dropped_id"]
        assert r["max_sim"] >= 0.3


def test_dedup_incremental_reasons_partition(spark, sf_dir):
    # a doc is reported once, with 'exact' shadowing 'near'; only odd
    # (incoming-batch) ids ever appear
    from biggis_landuse_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["dedup_incremental"].spark(spark, sf_dir).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(i % 2 == 1 for i in ids)
    assert all(r["reason"] in ("exact", "near") for r in rows)
