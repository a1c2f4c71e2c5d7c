"""Scale guards for the IVF pair-block machinery.

semantic_dedup / knn_graph confine their quadratic candidate product
to (cell, sub) blocks. These tests pin the two invariants that make
that linear in the corpus: the cell count grows with the corpus
(ivf_cell_count) and no pair block ever exceeds the hard cap
(subsplit_cells), even under total assignment skew.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from biggis_landuse_spark.functions.similarity import (
    ivf_cell_count,
    subsplit_cells,
)

CAP = 8


def test_ivf_cell_count_bounds_expected_cell_size():
    # k(n) >= sqrt(n) => expected cell size n/k <= sqrt(n) + 1; and the
    # floor keeps tiny corpora at the legacy 16 cells.
    assert ivf_cell_count(0) == 16
    assert ivf_cell_count(100) == 16
    assert ivf_cell_count(500) == 23  # matches the sf0.01 fixture
    for n in (1_000, 50_000, 2_000_000, 10**10):
        k = ivf_cell_count(n)
        assert k >= math.sqrt(n) - 1e-6
        assert n / k <= math.sqrt(n) + 1
    # monotone non-decreasing: more data never means fewer cells
    ks = [ivf_cell_count(n) for n in range(1, 5000, 97)]
    assert ks == sorted(ks)


def test_subsplit_caps_block_size_under_total_skew(spark):
    # worst case: every vector lands in ONE cell (max assignment skew).
    n = 1000
    assigned = spark.range(n).select(
        F.col("id").alias("vec_id"), F.lit(7).alias("cid")
    )
    split = subsplit_cells(assigned, CAP)
    sizes = (
        split.groupBy("cid", "sub")
        .count()
        .agg(F.max("count").alias("mx"), F.count(F.lit(1)).alias("nblocks"))
        .collect()[0]
    )
    # md5-mixed buckets are multinomial, not exact — allow a small
    # constant factor over the cap, which is all the linearity needs
    assert sizes["mx"] <= 4 * CAP
    assert sizes["nblocks"] <= math.ceil(n / CAP)


def test_subsplit_noop_below_cap(spark):
    assigned = spark.range(CAP).select(
        F.col("id").alias("vec_id"), (F.col("id") % 2).alias("cid")
    )
    split = subsplit_cells(assigned, CAP)
    assert split.where(F.col("sub") != 0).count() == 0
    assert split.count() == CAP


def test_subsplit_pair_volume_linear_even_with_strided_ids(spark):
    # ids within a cell share a stride (cid = id % 3) — the layout that
    # defeats a plain `id % nsub` (it hits only gcd-many residues,
    # re-concentrating the block). The md5 mix must keep the total
    # same-(cid, sub) pair volume ~n*cap as n doubles — the property
    # that kills the n^2 blow-up.
    for n in (600, 1200):
        assigned = spark.range(n).select(
            F.col("id").alias("vec_id"), (F.col("id") % 3).alias("cid")
        )
        split = subsplit_cells(assigned, CAP).groupBy("cid", "sub").count()
        pair_volume = split.agg(
            F.sum(F.col("count") * F.col("count")).alias("pv")
        ).collect()[0]["pv"]
        assert pair_volume <= 2 * n * CAP


def test_subsplit_window_twin_matches_broadcast_variant(spark):
    # subsplit_cells_window must assign bit-identical (vec_id, sub)
    # to subsplit_cells — the oracle SQL mirrors ONE formula for both
    from biggis_landuse_spark.functions.similarity import (
        subsplit_cells_window,
    )

    assigned = spark.range(500).select(
        F.col("id").alias("vec_id"), (F.col("id") % 3).alias("cid")
    )
    a = subsplit_cells(assigned, CAP).select("vec_id", "sub")
    b = subsplit_cells_window(assigned, CAP).select("vec_id", "sub")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pair_joins_keep_the_subsplit_key(spark, sf_dir):
    # a refactor that drops `sub` from the pair-join key silently
    # reverts to unbounded per-cell quadratic blocks — pin the key
    import io
    from contextlib import redirect_stdout

    from biggis_landuse_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    # the block queries confine pair enumeration to same-(cell, sub)
    # groups — the sub-split key must survive next to the cell key in
    # whichever operator forms the pairs (dropping `sub` silently
    # reverts to unbounded per-cell quadratic blocks). Two accepted
    # shapes: a GROUPING key of an in-group Aggregate (the pre-r11
    # single-pass flatten) or an equi-JOIN key of the cached
    # self-join (the r11 shape for semantic_dedup / knn_graph).
    for name, cell_key in (
        ("semantic_dedup", "cid"),
        ("knn_graph", "cid"),
        ("embedding_near_dup", "bucket"),  # LSH-bucket path, same guard
    ):
        df = REGISTRY[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(True)
        plan = buf.getvalue()
        pair_lines = [
            ln for ln in plan.splitlines()
            if ("Aggregate" in ln or "Join" in ln) and cell_key in ln
        ]
        assert any("sub" in ln for ln in pair_lines), (
            f"{name}: pair stage neither groups nor joins on the "
            "sub-split key\n" + "\n".join(pair_lines)
        )
