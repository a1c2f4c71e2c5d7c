"""Local replica of the driver's oracle-differential comparator.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive multiset of values (columns sorted by name, floats
rounded). Used by tests/test_oracle.py so the local gate mirrors
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v: Any) -> Any:
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    try:  # Decimal → float
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(normed, key=repr)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict[str, Any]:
    con = duck_connection(sf_dir)
    duck = con.sql(oracle_sql)
    duck_cols = [c.lower() for c in duck.columns]
    duck_rows = duck.fetchall()

    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    result = {
        "rowcount_match": len(spark_rows) == len(duck_rows),
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "schema_match": sorted(spark_cols) == sorted(duck_cols),
        "spark_cols": spark_cols,
        "duck_cols": duck_cols,
        "values_match": False,
    }
    if result["rowcount_match"] and result["schema_match"]:
        sset = _rowset(spark_rows, spark_cols)
        dset = _rowset(duck_rows, duck_cols)
        result["values_match"] = sset == dset
        if not result["values_match"]:
            diffs = [
                (a, b) for a, b in zip(sset, dset) if a != b
            ][:5]
            result["first_diffs"] = diffs
    con.close()
    return result
