"""Tests for the WebMercator reprojection operator: golden projection
math, zoomed-layout keying, nearest-neighbor collision rule, mercator
domain clipping, and the end-to-end georeferenced ingest slice."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from biggis_landuse_spark.operators.reproject import (
    R_EARTH,
    WEB_MERCATOR_MAX,
    mercator_x,
    mercator_y,
    reproject_pixels_to_webmercator,
    zoom_for_resolution,
)

PIX_DDL = (
    "band int, px int, py int, value double, "
    "x0 double, y0 double, dx double, dy double"
)


def test_mercator_golden_points(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (180.0, 0.0), (0.0, 45.0)], "lon double, lat double"
    )
    got = df.select(
        mercator_x(F.col("lon")).alias("mx"), mercator_y(F.col("lat")).alias("my")
    ).collect()
    assert got[0]["mx"] == pytest.approx(0.0, abs=1e-6)
    assert got[0]["my"] == pytest.approx(0.0, abs=1e-6)
    assert got[1]["mx"] == pytest.approx(WEB_MERCATOR_MAX)
    # ln(tan(pi/4 + 22.5deg)) * R — standard EPSG:3857 value for 45N
    assert got[2]["my"] == pytest.approx(5621521.486, abs=1e-2)


def test_zoom_for_resolution_roundtrip():
    # zoom z cell size in degrees at the equator:
    # 360 / (2^z * 256) deg-ish (mercator x is linear in lon)
    for z in (0, 5, 10):
        deg = 360.0 / (2**z * 256)
        assert zoom_for_resolution(deg) == z


def test_grid_keying_and_tile_assembly(spark):
    # one pixel exactly at (lon,lat)=(0,0) cell center lands in the
    # first cell of the SE quadrant at any zoom
    z = 2
    rows = [(0, 0, 0, 7.0, 0.0005 - 0.0005 / 2, 0.0005 / 2, 0.0005, 0.0005)]
    px = spark.createDataFrame(rows, PIX_DDL)
    out = reproject_pixels_to_webmercator(px, zoom=z, layer="t").collect()
    assert len(out) == 1
    r = out[0]
    n = 2**z * 256
    gx = r["tile_col"] * 256 + r["px"]
    gy = r["tile_row"] * 256 + r["py"]
    assert (gx, gy) == (n // 2, n // 2)
    assert r["value"] == 7.0 and r["layer"] == "t" and r["zoom"] == z


def test_nn_collision_nearest_source_wins(spark):
    # two source pixels projecting into the same target cell: the one
    # nearer the cell center must win
    z = 0
    res_deg = 360.0 / 256  # one target cell ≈ 1.40625 deg of lon
    rows = [
        # near the center of target cell (128,128)-ish
        (0, 0, 0, 1.0, res_deg * 0.5 - 0.5 * res_deg, res_deg * 0.5, res_deg, res_deg),
        # same cell but offset toward the edge
        (0, 1, 0, 2.0, res_deg * 0.5 - 0.5 * res_deg - res_deg * 0.4, res_deg * 0.5, res_deg, res_deg),
    ]
    px = spark.createDataFrame(rows, PIX_DDL)
    out = reproject_pixels_to_webmercator(px, zoom=z, layer="t")
    vals = [r["value"] for r in out.collect()]
    # either they map to different cells (fine) or the nearest won
    assert 1.0 in vals


def test_mercator_domain_clipping(spark):
    rows = [
        (0, 0, 0, 1.0, 0.0, 89.9, 0.001, 0.001),  # beyond 85.06N
        (0, 0, 0, 2.0, 0.0, 10.0, 0.001, 0.001),  # valid
    ]
    px = spark.createDataFrame(rows, PIX_DDL)
    out = reproject_pixels_to_webmercator(px, zoom=3, layer="t").collect()
    assert [r["value"] for r in out] == [2.0]


def test_reproject_plan_has_no_udf_and_one_shuffle(spark):
    rows = [(0, 0, 0, 1.0, 0.0, 10.0, 0.001, 0.001)]
    px = spark.createDataFrame(rows, PIX_DDL)
    out = reproject_pixels_to_webmercator(px, zoom=3, layer="t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert plan.count("Exchange") == 1  # only the groupBy(band,gx,gy)


def test_ingest_geotiff_webmercator_end_to_end(spark, tmp_path):
    import numpy as np

    from biggis_landuse_spark.operators.reproject import (
        ingest_geotiff_webmercator,
    )
    from biggis_landuse_spark.sources.geotiff import FakeRampDecoder

    # 8x8 ramp at 0.01 deg/px anchored at (10E, 50N)
    w = h = 8
    payload = (
        w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + np.array([10.0, 50.0, 0.01, 0.01], dtype="<f8").tobytes()
    )
    d = tmp_path / "tiffs"
    d.mkdir()
    (d / "a.bin").write_bytes(payload)

    tiles = ingest_geotiff_webmercator(
        spark, str(d), layer="wm", decoder=FakeRampDecoder()
    )
    rows = tiles.collect()
    assert rows, "ingest produced no tiles"
    t = rows[0]
    assert t["layer"] == "wm" and t["tile"]["cols"] == 256
    # the inferred zoom matches the source resolution
    assert t["zoom"] == zoom_for_resolution(0.01)
    # all 64 ramp values survive (no collisions at the matched zoom)
    vals = [
        v
        for r in rows
        for band in r["tile"]["bands"]
        for v in band
        if v is not None
    ]
    assert sorted(vals) == [float(i) for i in range(64)]
