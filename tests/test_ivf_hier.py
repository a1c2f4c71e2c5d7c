"""Hierarchical (two-level) IVF: the n^1.25 assignment path.

The contract under test: bucketing the fine codebook under a coarse
codebook changes the COST of assignment (each vector scores
~|coarse| + |fines of probed coarse| centroids instead of all k),
never the candidate-join shape — and when every coarse cell is
probed, the hierarchical assignment must degenerate to exactly the
flat ``ivf_assign`` answer (same 6dp cosine, same tie-breaks).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biggis_landuse_spark.functions.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_assign_hier,
    ivf_topk_hier,
)
from biggis_landuse_spark.queries import load_tables

K = 5
N_QUERIES = 20
N_FINE = 32
N_COARSE = 6


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    return emb.cache()


@pytest.fixture(scope="module")
def vectors(embeddings):
    from biggis_landuse_spark.functions.similarity import as_double

    return embeddings.select(
        "vec_id", as_double("embedding").alias("vec")
    )


@pytest.fixture(scope="module")
def fine(embeddings):
    from biggis_landuse_spark.functions.similarity import as_double

    return embeddings.where(F.col("vec_id") < N_FINE).select(
        F.col("vec_id").alias("cid"), as_double("embedding").alias("cv")
    )


@pytest.fixture(scope="module")
def coarse(embeddings):
    from biggis_landuse_spark.functions.similarity import as_double

    return embeddings.where(F.col("vec_id") < N_COARSE).select(
        F.col("vec_id").alias("ccid"), as_double("embedding").alias("cv")
    )


def test_all_coarse_probed_equals_flat_assign(vectors, fine, coarse):
    """Probing every coarse cell makes every fine cell reachable, so
    the top-1 fine pick must be bit-identical to flat ivf_assign."""
    flat = {
        (r["vec_id"], r["cid"])
        for r in ivf_assign(vectors, fine, n_probe=1).collect()
    }
    hier = {
        (r["vec_id"], r["cid"])
        for r in ivf_assign_hier(
            vectors, fine, coarse, n_probe_coarse=N_COARSE, n_probe=1
        ).collect()
    }
    assert flat == hier


def test_probe_ranks_are_dense_and_bounded(vectors, fine, coarse):
    got = ivf_assign_hier(
        vectors, fine, coarse, n_probe_coarse=2, n_probe=3
    )
    per_vec = (
        got.groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_set("probe_rank").alias("ranks"),
            F.count_distinct("cid").alias("ncid"),
        )
        .collect()
    )
    for r in per_vec:
        assert 1 <= r["n"] <= 3
        assert sorted(r["ranks"]) == list(range(1, r["n"] + 1))
        assert r["ncid"] == r["n"]  # fine cells never repeat


def test_hier_subset_of_flat_multiprobe_universe(vectors, fine, coarse):
    """Hierarchical probing only ever returns fine cells that exist in
    the codebook, and the coarse filter can drop but never invent."""
    fine_ids = {r["cid"] for r in fine.select("cid").collect()}
    got = ivf_assign_hier(
        vectors, fine, coarse, n_probe_coarse=1, n_probe=2
    ).collect()
    assert {r["cid"] for r in got} <= fine_ids


def test_hier_topk_recall_vs_brute_force(spark, embeddings, fine, coarse):
    queries = embeddings.where(F.col("vec_id") < N_QUERIES)
    exact = brute_force_topk(queries, embeddings, k=K)
    approx = ivf_topk_hier(
        queries, embeddings, fine, coarse,
        k=K, n_probe_coarse=3, n_probe=3,
    )
    e = {
        (r["query_id"], r["neighbor_id"])
        for r in exact.collect()
        if r["query_id"] != r["neighbor_id"]
    }
    a = {
        (r["query_id"], r["neighbor_id"])
        for r in approx.collect()
        if r["query_id"] != r["neighbor_id"]
    }
    recall = len(e & a) / len(e)
    # random cell routing would land ~n_probe/k_fine ≈ 0.1
    assert recall >= 0.4, recall


def test_assignment_is_single_pass_no_window(vectors, fine, coarse):
    """The per-row probe must stay inside a projection over the
    broadcast codebook row — no Window/Sort over an n×k affinity
    relation (the scale hazard the hierarchical path exists to avoid),
    and no shuffle of the vector side at all."""
    plan = (
        ivf_assign_hier(vectors, fine, coarse, n_probe_coarse=2, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    # the only exchanges allowed are the bounded codebook aggregations
    # (fine→coarse groupBy + the one-row collect_list agg) and their
    # broadcast — never a hash exchange keyed on the vector id
    assert "hashpartitioning(vec_id" not in plan


def test_multiprobe_null_affinity_centroid_ranks_last(spark):
    # r7 review fix: a zero-norm/NULL centroid yields NULL cosine via
    # try_divide; the array_sort comparator must push it LAST (like
    # the oracles' NULLS LAST row_number and the n_probe=1 max_by),
    # not let it tie and win on the lowest cid
    from pyspark.sql import functions as F

    from biggis_landuse_spark.functions.similarity import (
        hier_codebook,
        ivf_assign,
        ivf_assign_hier,
    )

    vecs = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.9, 0.1]), (102, [0.0, 1.0])],
        "vec_id long, vec array<double>",
    )
    # cid 0 is the all-zero (NULL-affinity) centroid with the LOWEST id
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "cid long, cv array<double>",
    )
    got = {
        (r["vec_id"], r["probe_rank"]): r["cid"]
        for r in ivf_assign(vecs, cents, n_probe=2).collect()
    }
    # rank 1 and 2 are the REAL centroids for every vector; the
    # zero-norm cell never occupies a probe slot while real ones exist
    assert got[(100, 1)] == 1 and got[(100, 2)] == 2
    assert got[(102, 1)] == 2 and got[(102, 2)] == 1

    coarse = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])],
        "ccid long, cv array<double>",
    )
    hier = {
        (r["vec_id"], r["probe_rank"]): r["cid"]
        for r in ivf_assign_hier(
            vecs, cents, coarse, n_probe_coarse=2, n_probe=2,
            codebook=hier_codebook(cents, coarse),
        ).collect()
    }
    assert hier[(100, 1)] == 1
    assert hier[(102, 1)] == 2
