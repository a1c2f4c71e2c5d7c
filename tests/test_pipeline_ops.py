"""Training-data-pipeline operators (queries/pipeline.py): TF-IDF,
decontamination, repetition filter, sequence packing — semantics and
the plan shapes that carry to 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biggis_landuse_spark.queries import REGISTRY, _ensure_loaded

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def run(spark):
    _ensure_loaded()

    def get(name: str):
        return REGISTRY[name].spark(spark, SF)

    return get


@pytest.fixture(scope="module")
def plan_of(spark):
    _ensure_loaded()

    def get(name: str) -> str:
        df = REGISTRY[name].spark(spark, SF)
        return df._jdf.queryExecution().executedPlan().toString()

    return get


def test_tfidf_query_side_broadcasts(plan_of):
    # the bounded tf side broadcasts into the corpus-wide df relation;
    # the only nested-loop is the deliberate 1-row N broadcast
    plan = plan_of("tfidf_top_terms")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tfidf_top3_and_idf_consistency(run):
    rows = run("tfidf_top_terms").collect()
    assert rows
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
        assert r["tf"] >= 1 and r["df"] >= 1
        assert 1 <= r["rnk"] <= 3
    for doc, rs in per_doc.items():
        assert len(rs) == len({r["rnk"] for r in rs}) <= 3
        # rank order matches descending weight
        rs.sort(key=lambda r: r["rnk"])
        ws = [r["tfidf"] for r in rs]
        assert ws == sorted(ws, reverse=True)


def test_decontaminate_eval_side_broadcasts(plan_of):
    plan = plan_of("decontaminate_overlap")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_never_flags_eval_docs(run):
    rows = run("decontaminate_overlap").collect()
    for r in rows:
        assert r["doc_id"] % 50 != 0  # eval docs are not their own hits
        assert r["n_eval_matched"] >= 1 and r["n_shared"] >= 1


def test_repetition_ratio_bounds(run):
    rows = run("repetition_ratio").collect()
    assert rows
    for r in rows:
        assert 0 <= r["distinct_bigrams"] <= r["total_bigrams"]
        assert 0.0 <= r["dup_fraction"] < 1.0


def test_sequence_packing_conserves_and_is_deterministic(spark, run):
    rows = run("sequence_packing").collect()
    assert rows
    # conservation: packed token mass equals the corpus token mass
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    total = docs.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda t: t != "")))
    ).first()[0]
    assert sum(r["bin_tokens"] for r in rows) == total
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert all(r["bin_id"] >= 0 for r in rows)
    # shard-parallel: bins keyed per (lang, shard) never collide across
    # shards, so re-running yields the identical multiset
    again = run("sequence_packing").collect()
    key = lambda r: (r["lang"], r["shard"], r["bin_id"])  # noqa: E731
    assert sorted(map(tuple, rows), key=str) == sorted(
        map(tuple, again), key=str
    ), "packing must be deterministic"
    assert len({key(r) for r in rows}) == len(rows)


def test_sequence_packing_windows_are_shard_local(plan_of):
    # the running sum sorts WITHIN hash-partitioned (lang, shard)
    # groups — a window exchange, never a global single-partition sort
    plan = plan_of("sequence_packing")
    assert "Window" in plan
    assert "hashpartitioning(lang" in plan
    assert "SinglePartition" not in plan
