"""Oracle-differential suite: every registry query vs its DuckDB oracle.

This is the same comparison the driver records in CORRECTNESS_r{N}.json
(row count + column names + order-insensitive values), run at the small
scale factor so it stays fast in the inner loop.
"""

from __future__ import annotations

import pytest

from biggis_landuse_spark.queries import REGISTRY, _ensure_loaded
from tests.oracle_diff import compare

_ensure_loaded()

ORACLE_QUERIES = sorted(
    name for name, spec in REGISTRY.items() if spec.oracle is not None
)
ROWS_ONLY_QUERIES = sorted(
    name for name, spec in REGISTRY.items() if spec.oracle is None
)


@pytest.fixture(autouse=True)
def _release_query_caches():
    # iterative queries hold_cache() loop-invariant relations; drop
    # them after each comparison so the 139-query gate never
    # accumulates caches in one session
    from biggis_landuse_spark.queries import release_caches

    yield
    release_caches()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    result = compare(df, spec.oracle, sf_dir)
    assert result["schema_match"], (
        f"{name}: columns differ spark={result['spark_cols']} "
        f"duck={result['duck_cols']}"
    )
    assert result["rowcount_match"], (
        f"{name}: rows spark={result['spark_rows']} duck={result['duck_rows']}"
    )
    assert result["values_match"], (
        f"{name}: value mismatch, first diffs: {result.get('first_diffs')}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries().keys()) >= set(e.oracle_sql().keys())
