"""Regression tests for load_tables timestamp normalization.

The driver testdata has shipped ``events.ts`` as both TIMESTAMP(NANOS)
(read by Spark as a nanos long) and timestamp[us]-no-tz (read as
TIMESTAMP_NTZ, which ``unix_micros`` rejects — the round-3 regression).
These tests write each physical flavor and assert load_tables delivers
a plain TIMESTAMP with the wall-clock preserved, so a future testdata
format change fails locally instead of in the driver's CORRECTNESS run.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from biggis_landuse_spark.queries import load_tables

WALL = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
WALL_US = int(
    (WALL - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000
)  # epoch micros of the naive wall-clock, i.e. treating it as UTC


def _write(tmp_path, ts_type, values):
    path = str(tmp_path / "events.parquet")
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(values, ts_type),
            "user_id": pa.array([7], pa.int64()),
        }
    )
    pq.write_table(table, path)
    return str(tmp_path)


@pytest.mark.parametrize(
    "ts_type,values",
    [
        (pa.timestamp("us"), [WALL]),  # current driver format → TIMESTAMP_NTZ
        (pa.timestamp("ns"), [WALL]),  # legacy format → nanos long
    ],
    ids=["micros-ntz", "nanos-long"],
)
def test_load_tables_normalizes_ts(spark, tmp_path, ts_type, values):
    sf_dir = _write(tmp_path, ts_type, values)
    (events,) = load_tables(spark, sf_dir, "events")
    assert isinstance(events.schema["ts"].dataType, TimestampType)
    # unix_micros must resolve (the round-3 failure mode was an
    # AnalysisException here) and the wall-clock must be preserved
    # under the pinned-UTC session zone.
    row = events.select(F.unix_micros("ts").alias("us")).first()
    assert row["us"] == WALL_US


def test_load_tables_real_testdata(spark, sf_dir):
    """Whatever format the driver currently generates must normalize."""
    (events,) = load_tables(spark, sf_dir, "events")
    assert isinstance(events.schema["ts"].dataType, TimestampType)
    events.select(F.unix_micros("ts")).first()
