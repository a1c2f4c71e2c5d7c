"""Physical-plan regression tests: the scale properties that make the
engine viable at 100 TB — predicate pushdown to the parquet scan,
column pruning, broadcast joins for small dims, partial (map-side)
aggregation, and the absence of accidental cartesian products — are
asserted on the executed plans so a refactor can't silently lose them.
"""

from __future__ import annotations

import pytest

from biggis_landuse_spark.queries import REGISTRY, _ensure_loaded

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plan_of(spark):
    _ensure_loaded()

    def get(name: str) -> str:
        df = REGISTRY[name].spark(spark, SF)
        return df._jdf.queryExecution().executedPlan().toString()

    return get


def test_dim_joins_broadcast_not_shuffle(plan_of):
    # small dims (part/orders/customer/supplier/nation) must broadcast:
    # no shuffle of the 100 TB fact side, no cartesian fallback
    for q in ("ndvi_shape", "join3_chain", "stack_join"):
        plan = plan_of(q)
        assert "BroadcastHashJoin" in plan, q
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_filter_pushdown_reaches_scan(plan_of):
    plan = plan_of("pricing_summary")
    assert "PushedFilters" in plan and "LessThanOrEqual(l_shipdate" in plan
    plan = plan_of("ndvi_shape")
    assert "GreaterThan(p_retailprice,0.0)" in plan


def _read_schemas(plan: str) -> list[str]:
    import re

    return re.findall(r"ReadSchema: (struct<[^>]*>)", plan)


def test_column_pruning_reaches_scan(plan_of):
    # an 11-column lineitem scan feeding a 3-column query must read 3
    plan = plan_of("ndvi_shape")
    li = next(s for s in _read_schemas(plan) if "l_partkey" in s)
    assert "l_extendedprice" in li and "l_shipdate" not in li
    assert li.count(":") == 3  # exactly three fields survive pruning
    # media queries wrap documents: only (doc_id, text) may be read
    plan = plan_of("media_metadata")
    doc = _read_schemas(plan)[0]
    assert "doc_id" in doc and "lang" not in doc and "source" not in doc


def test_aggregation_is_partial_then_final(plan_of):
    # map-side combine: two HashAggregate levels around one exchange
    plan = plan_of("pricing_summary")
    assert plan.count("HashAggregate") >= 2
    assert "SortAggregate" not in plan


def test_knn_broadcasts_query_side_only(plan_of):
    # brute-force knn: deliberate broadcast nested loop of the tiny
    # query side; the corpus side must NOT shuffle or sort-merge
    plan = plan_of("knn_cosine")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_asof_join_has_no_join_operator(plan_of):
    # the as-of union+window formulation replaces any join with a
    # single partition-sort — no join operator may appear at all
    plan = plan_of("asof_last_click")
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_is_hash_join(plan_of):
    plan = plan_of("range_join_cooccur")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_candidate_join_is_equi_join(plan_of):
    # near-dup candidates must come from a bucket equi-join, never the
    # all-pairs product
    plan = plan_of("embedding_near_dup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
