"""Connected components: correctness vs a union-find reference and
the transitivity property band-level resolution lacks."""

from __future__ import annotations

import pytest

from biggis_landuse_spark.functions.graph import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize(
    "edges",
    [
        # chain: transitive closure must merge all three
        [(1, 2), (2, 3)],
        # two components + a cycle
        [(1, 2), (2, 3), (3, 1), (10, 11)],
        # star, reversed insertion order
        [(5, 4), (5, 3), (5, 2), (5, 1)],
        # long chain (exercises multiple propagation rounds)
        [(i, i + 1) for i in range(0, 30)],
    ],
)
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    expected = _union_find(edges)
    assert got == expected


def test_transitive_closure_beats_pairwise_lower_id_rule(spark):
    # pairs (1,3) and (2,3): the pairwise "drop if a LOWER id shares a
    # bucket" rule keeps {1, 2} (2 only pairs with 3, which is
    # higher); the transitive closure knows 1-3-2 is ONE cluster and
    # keeps only {1} — the semantic gap dedup_cc_resolve closes
    df = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    comp = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    survivors = {n for n, c in comp.items() if n == c}
    assert survivors == {1}
    pairwise_survivors = {1, 2}  # what the non-transitive rule keeps
    assert pairwise_survivors != survivors
