"""Two-level blocking contract for fuzzy_name_matches.

The first-level key (nation x segment) has constant cardinality, so
its block sizes grow linearly with the customer table; the name-prefix
second level must keep candidate blocks bounded as the data scales.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"

BLOCK_SQL = """
SELECT max(n) FROM (
  SELECT count(*) AS n FROM read_parquet('{path}/customer.parquet')
  GROUP BY {keys}
)
"""

L1 = "c_nationkey, c_mktsegment"
L2 = (
    L1
    + ", substring(c_name, 1, greatest(length(c_name) - 3, 0))"
)


@pytest.mark.skipif(
    not os.path.exists(f"{SF_BIG}/customer.parquet"), reason="sf0.1 absent"
)
def test_prefix_block_is_bounded_while_level1_grows():
    l1_small = duckdb.sql(BLOCK_SQL.format(path=SF_SMALL, keys=L1)).fetchone()[0]
    l1_big = duckdb.sql(BLOCK_SQL.format(path=SF_BIG, keys=L1)).fetchone()[0]
    l2_small = duckdb.sql(BLOCK_SQL.format(path=SF_SMALL, keys=L2)).fetchone()[0]
    l2_big = duckdb.sql(BLOCK_SQL.format(path=SF_BIG, keys=L2)).fetchone()[0]
    # level-1 blocks grow roughly with the table (the scale hazard)
    assert l1_big >= 5 * l1_small
    # two-level blocks stay bounded by the 3-char suffix alphabet,
    # regardless of table size
    assert l2_big <= 1000
    assert l2_big <= 4 * max(l2_small, 4)


def test_recall_contract_suffix_confined_edits():
    # a pair whose edits sit in the last 3 chars shares the prefix
    # block and is found; a distance-1 pair whose edit is earlier is
    # (by documented contract) excluded by the blocking.
    rows = """
    SELECT * FROM (VALUES
      (1, 'Customer#000000042', 0, 'AUTO'),
      (2, 'Customer#000000043', 0, 'AUTO'),   -- suffix edit: found
      (3, 'Customer#000100042', 0, 'AUTO')    -- mid edit: excluded
    ) t(c_custkey, c_name, c_nationkey, c_mktsegment)
    """
    found = duckdb.sql(f"""
    WITH customer AS ({rows})
    SELECT a.c_custkey, b.c_custkey
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND substring(a.c_name, 1, greatest(length(a.c_name) - 3, 0))
         = substring(b.c_name, 1, greatest(length(b.c_name) - 3, 0))
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """).fetchall()
    assert found == [(1, 2)]
