"""Golden tests for the spatial structure operators: focal mean /
Getis-Ord (W1/W2 via J5), pyramid (A8), zoom resample (W3), polygon
rasterization (A5)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from biggis_landuse_spark import fixtures as FX
from biggis_landuse_spark.operators.focal import focal_mean, getis_ord_gstar
from biggis_landuse_spark.operators.pyramid import pyramid_up
from biggis_landuse_spark.operators.rasterize import (
    GridLayout,
    rasterize_features,
)
from biggis_landuse_spark.operators.resample import zoom_resample
from biggis_landuse_spark.pixeling import tiles_to_pixels


def world_grid() -> np.ndarray:
    """The red fixture as one (GRID*TS, GRID*TS) numpy array
    (global py-major: row = tr*TS + py)."""
    n = FX.GRID * FX.TS
    world = np.full((n, n), np.nan)
    for tr in range(FX.GRID):
        for tc in range(FX.GRID):
            for py in range(FX.TS):
                for px in range(FX.TS):
                    world[tr * FX.TS + py, tc * FX.TS + px] = FX.red_value(
                        tc, tr, px, py
                    )
    return world


def test_focal_mean_golden(spark):
    red = FX.fixture_layer(spark, "b4_red")
    out = focal_mean(red, radius=1)
    world = world_grid()
    px = tiles_to_pixels(out).collect()
    assert len(px) == FX.GRID * FX.GRID * FX.TS * FX.TS
    # circular kernel radius 1 = von Neumann cross (5 cells)
    for r in px[:: 7]:  # sample
        gx = r["tile_col"] * FX.TS + r["px"]
        gy = r["tile_row"] * FX.TS + r["py"]
        vals = []
        for dx, dy in [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)]:
            x, y = gx + dx, gy + dy
            if 0 <= x < world.shape[1] and 0 <= y < world.shape[0]:
                vals.append(world[y, x])
        assert r["value"] == pytest.approx(np.mean(vals), rel=1e-12), (gx, gy)


def test_getis_ord_golden(spark):
    red = FX.fixture_layer(spark, "b4_red")
    out = getis_ord_gstar(red, radius=1)
    world = world_grid()
    flat = world.ravel()
    mu, sd, n = flat.mean(), flat.std(ddof=1), flat.size
    px = tiles_to_pixels(out).collect()
    for r in px[:: 13]:
        gx = r["tile_col"] * FX.TS + r["px"]
        gy = r["tile_row"] * FX.TS + r["py"]
        vals = [
            world[gy + dy, gx + dx]
            for dx, dy in [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)]
            if 0 <= gx + dx < world.shape[1] and 0 <= gy + dy < world.shape[0]
        ]
        w = len(vals)
        expect = (sum(vals) - mu * w) / (
            sd * math.sqrt((n * w - w * w) / (n - 1))
        )
        assert r["value"] == pytest.approx(expect, rel=1e-9), (gx, gy)


def test_pyramid_level_golden(spark):
    red = FX.fixture_layer(spark, "b4_red", zoom=1)
    parent = pyramid_up(red)
    assert parent.count() == (FX.GRID // 2) ** 2
    world = world_grid()
    px = tiles_to_pixels(parent).collect()
    for r in px[:: 5]:
        gx = r["tile_col"] * FX.TS + r["px"]
        gy = r["tile_row"] * FX.TS + r["py"]
        block = world[2 * gy : 2 * gy + 2, 2 * gx : 2 * gx + 2]
        assert r["value"] == pytest.approx(block.mean(), rel=1e-12)
    meta = parent.first()
    assert meta["zoom"] == 0


def test_zoom_resample_golden(spark):
    red = FX.fixture_layer(spark, "b4_red", zoom=0)
    children = zoom_resample(red, dz=1)
    assert children.count() == FX.GRID * FX.GRID * 4
    world = world_grid()
    px = tiles_to_pixels(children).collect()
    for r in px[:: 11]:
        gx = r["tile_col"] * FX.TS + r["px"]
        gy = r["tile_row"] * FX.TS + r["py"]
        assert r["value"] == world[gy // 2, gx // 2], (gx, gy)
    assert px[0]["zoom"] == 1 or children.first()["zoom"] == 1


def test_zoom_resample_bounds_pruning(spark):
    red = FX.fixture_layer(spark, "b4_red", zoom=0)
    pruned = zoom_resample(red, dz=1, target_bounds=(0, 0, 3, 3))
    assert pruned.count() == 16
    keys = {(r["tile_col"], r["tile_row"]) for r in pruned.collect()}
    assert keys == {(c, r) for c in range(4) for r in range(4)}


def test_rasterize_rectangle_and_overlap(spark):
    layout = GridLayout(x0=0.0, y0=0.0, cell=1.0, tile_size=8)
    feats = spark.createDataFrame(
        [
            # rectangle covering x in [2,10), y in [3,6) → straddles 2 tiles
            (1, "POLYGON ((2 3, 10 3, 10 6, 2 6, 2 3))", 7.0),
            # overlapping rectangle, higher feature_id wins where both burn
            (2, "POLYGON ((4 4, 6 4, 6 5, 4 5, 4 4))", 9.0),
        ],
        "feature_id long, geom string, value double",
    )
    tiles = rasterize_features(feats, layout)
    got = {
        (r["tile_col"], r["tile_row"]): r["tile"]["bands"][0]
        for r in tiles.collect()
    }
    assert set(got) == {(0, 0), (1, 0)}

    def cell(tc, px, py):
        return got[(tc, 0)][py * 8 + px]

    assert cell(0, 2, 3) == 7.0  # inside rect 1
    assert cell(0, 1, 3) is None  # left of rect 1
    assert cell(1, 1, 4) == 7.0  # x=9 inside rect 1 (second tile)
    assert cell(1, 2, 4) is None  # x=10 outside (right edge exclusive)
    assert cell(0, 4, 4) == 9.0  # overlap: later feature wins
    assert cell(0, 6, 4) == 7.0  # x=6 at rect2's right edge → rect 1


def test_rasterize_with_hole(spark):
    layout = GridLayout(tile_size=8)
    feats = spark.createDataFrame(
        [
            (
                1,
                "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 6 2, 6 6, 2 6, 2 2))",
                5.0,
            )
        ],
        "feature_id long, geom string, value double",
    )
    tiles = rasterize_features(feats, layout)
    band = tiles.first()["tile"]["bands"][0]
    assert band[1 * 8 + 1] == 5.0  # shell
    assert band[3 * 8 + 3] is None  # inside the hole
    assert band[6 * 8 + 6] == 5.0  # shell again


def test_points_in_zones_matches_brute_force(spark):
    from biggis_landuse_spark.operators.spatial_join import points_in_zones

    # coordinates straddling cell boundaries and negative space
    pts = [(i, (i * 37) % 97 - 20, (i * 53) % 71 - 10) for i in range(300)]
    zones = [
        (z, (z * 13) % 60 - 25, (z * 7) % 40 - 15, (z * 13) % 60 - 25 + 33, (z * 7) % 40 - 15 + 17)
        for z in range(12)
    ]
    points = spark.createDataFrame(pts, "pid long, x long, y long")
    zdf = spark.createDataFrame(zones, "zone_id long, xmin long, ymin long, xmax long, ymax long")
    got = {
        (r["pid"], r["zone_id"])
        for r in points_in_zones(points, zdf, cell_size=16).collect()
    }
    want = {
        (pid, z)
        for pid, x, y in pts
        for z, xmin, ymin, xmax, ymax in zones
        if xmin <= x < xmax and ymin <= y < ymax
    }
    assert got == want and want  # non-trivial and exact


def test_points_in_zones_fractional_bounds_brute_force(spark):
    # regression for the cell_of(xmax) upper bound: with DOUBLE bounds
    # (xmax=64.5, cell=32) a point at x=64.25 lives in cell 2, which
    # the old cell_of(xmax - 1) sequence end would miss entirely
    from biggis_landuse_spark.operators.spatial_join import points_in_zones

    pts = [
        (0, 64.25, 10.0),   # in cell 2 of the x axis, inside [0, 64.5)
        (1, 64.75, 10.0),   # outside xmax=64.5
        (2, 63.999, 10.0),  # cell 1, inside
        (3, 0.0, 31.5),     # fractional y inside
        (4, -0.25, 10.0),   # just left of xmin=0 → out
        (5, 10.0, 33.25),   # above ymax=33.0 → out
    ]
    zones = [(0, 0.0, 0.0, 64.5, 33.0)]
    points = spark.createDataFrame(pts, "pid long, x double, y double")
    zdf = spark.createDataFrame(
        zones, "zone_id long, xmin double, ymin double, xmax double, ymax double"
    )
    got = {
        (r["pid"], r["zone_id"])
        for r in points_in_zones(points, zdf, cell_size=32).collect()
    }
    want = {
        (pid, z)
        for pid, x, y in pts
        for z, xmin, ymin, xmax, ymax in zones
        if xmin <= x < xmax and ymin <= y < ymax
    }
    assert got == want == {(0, 0), (2, 0), (3, 0)}


def test_points_in_zones_pairs_are_unique(spark):
    from biggis_landuse_spark.operators.spatial_join import points_in_zones

    # one zone spanning many cells: each (point, zone) must appear once
    points = spark.createDataFrame(
        [(i, i, i) for i in range(100)], "pid long, x long, y long"
    )
    zones = spark.createDataFrame(
        [(0, 0, 0, 100, 100)], "zone_id long, xmin long, ymin long, xmax long, ymax long"
    )
    rows = points_in_zones(points, zones, cell_size=8).collect()
    assert len(rows) == 100 == len({(r["pid"], r["zone_id"]) for r in rows})


def test_spatial_join_is_hash_equi_join(spark):
    from biggis_landuse_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["spatial_join_points_zones"].spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_focal_extrema_golden(spark):
    from biggis_landuse_spark.operators.focal import focal_stats

    red = FX.fixture_layer(spark, "b4_red")
    out = focal_stats(red, radius=1, stats=("min", "max", "range", "median"))
    world = world_grid()
    px = tiles_to_pixels(out).collect()
    by_cell: dict[tuple, dict[int, float]] = {}
    for r in px:
        gx = r["tile_col"] * FX.TS + r["px"]
        gy = r["tile_row"] * FX.TS + r["py"]
        by_cell.setdefault((gx, gy), {})[r["band"]] = r["value"]
    for (gx, gy), bands in list(by_cell.items())[::11]:
        vals = []
        for dx, dy in [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)]:
            x, y = gx + dx, gy + dy
            if 0 <= x < world.shape[1] and 0 <= y < world.shape[0]:
                v = world[y, x]
                if not np.isnan(v):
                    vals.append(v)
        assert bands[0] == pytest.approx(min(vals)), (gx, gy)
        assert bands[1] == pytest.approx(max(vals)), (gx, gy)
        assert bands[2] == pytest.approx(max(vals) - min(vals)), (gx, gy)
        assert bands[3] == pytest.approx(float(np.median(vals))), (gx, gy)


def test_terrain_inclined_plane_golden(spark):
    # z = x plane: p = 1, q = 0 everywhere interior → slope 45°,
    # aspect = atan2(0, -1) = π; hillshade closed-form
    from biggis_landuse_spark.operators.focal import terrain
    from biggis_landuse_spark.pixeling import pixels_to_tiles

    ts = 4
    rows = [
        (tc, tr, px, py, float(tc * ts + px))
        for tc in range(2)
        for tr in range(2)
        for px in range(ts)
        for py in range(ts)
    ]
    pixels = spark.createDataFrame(
        rows, "tile_col int, tile_row int, px int, py int, value double"
    ).select(
        F.lit("plane").alias("layer"),
        F.lit(0).alias("zoom"),
        "tile_col",
        "tile_row",
        F.lit(0).alias("band"),
        "px",
        "py",
        "value",
    )
    tiles = pixels_to_tiles(pixels, cols=ts, rows=ts, n_bands=1)
    out = tiles_to_pixels(terrain(tiles))
    zen = az = math.radians(45.0)  # altitude 45 → zenith 45; az 315
    aspect = math.atan2(0.0, -1.0)
    hs_want = 255.0 * max(
        0.0,
        math.cos(zen) * math.cos(math.radians(45.0))
        + math.sin(zen)
        * math.sin(math.radians(45.0))
        * math.cos(math.radians(315.0) - aspect),
    )
    got = {
        (r["tile_col"] * ts + r["px"], r["tile_row"] * ts + r["py"], r["band"]):
        r["value"]
        for r in out.collect()
    }
    n = 2 * ts
    for gx in range(n):
        for gy in range(n):
            on_edge = gx in (0, n - 1) or gy in (0, n - 1)
            s, h = got[(gx, gy, 0)], got[(gx, gy, 1)]
            a = got[(gx, gy, 2)]
            if on_edge:
                assert s is None and h is None and a is None, (gx, gy)
            else:
                assert s == pytest.approx(45.0, abs=1e-9), (gx, gy)
                assert h == pytest.approx(hs_want, abs=1e-9), (gx, gy)
                # z = x plane slopes due east-down: aspect π → 180°
                assert a == pytest.approx(180.0, abs=1e-9), (gx, gy)


def test_points_in_polygons_matches_brute_force(spark):
    from biggis_landuse_spark.functions import geometry as G
    from biggis_landuse_spark.operators.spatial_join import points_in_polygons

    def inside(px, py, ring):
        n = 0
        for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
            if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
                n += 1
        return n % 2 == 1

    rings = {
        0: [(0.0, 0.0), (40.0, 0.0), (20.0, 50.0), (0.0, 0.0)],
        1: [(30.0, 10.0), (90.0, 10.0), (90.0, 70.0), (30.0, 70.0), (30.0, 10.0)],
        2: [(10.0, 60.0), (70.0, 80.0), (15.0, 95.0), (10.0, 60.0)],  # crosses cells
    }
    pts = [(i, (i * 13) % 100 + 0.5, (i * 29) % 100 + 0.5) for i in range(300)]
    polys = spark.createDataFrame(
        [
            (
                zid,
                "POLYGON ((" + ", ".join(f"{int(x)} {int(y)}" for x, y in ring) + "))",
            )
            for zid, ring in rings.items()
        ],
        "zone_id long, wkt string",
    ).select("zone_id", G.wkt_polygon_coords("wkt").alias("coords"))
    points = spark.createDataFrame(pts, "pid long, x double, y double")

    got = {
        (r["pid"], r["zone_id"])
        for r in points_in_polygons(points, polys).collect()
    }
    want = {
        (pid, zid)
        for pid, x, y in pts
        for zid, ring in rings.items()
        if inside(x, y, ring)
    }
    assert got == want and len(want) > 50


def test_zoom_resample_bilinear_golden_2x2(spark):
    # hand-computed: parent tile [[0, 10], [20, 30]], s=2, center-aligned
    # source coords (g+0.5)/2-0.5 clamped at the tile border
    from biggis_landuse_spark.pixeling import pixels_to_tiles, tiles_to_pixels

    vals = {(0, 0): 0.0, (1, 0): 10.0, (0, 1): 20.0, (1, 1): 30.0}
    pixels = spark.createDataFrame(
        [("bl", 0, 0, 0, 0, x, y, v) for (x, y), v in vals.items()],
        "layer string, zoom int, tile_col int, tile_row int, band int, "
        "px int, py int, value double",
    )
    parents = pixels_to_tiles(pixels, cols=2, rows=2, n_bands=1)
    children = zoom_resample(parents, dz=1, method="bilinear")
    got = {}
    for r in tiles_to_pixels(children).collect():
        got[(r["tile_col"] * 2 + r["px"], r["tile_row"] * 2 + r["py"])] = r["value"]
    expected = {
        (0, 0): 0.0, (1, 0): 2.5, (2, 0): 7.5, (3, 0): 10.0,
        (0, 1): 5.0, (1, 1): 7.5, (2, 1): 12.5, (3, 1): 15.0,
        (0, 2): 15.0, (1, 2): 17.5, (2, 2): 22.5, (3, 2): 25.0,
        (0, 3): 20.0, (1, 3): 22.5, (2, 3): 27.5, (3, 3): 30.0,
    }
    assert got == expected  # quarters x integers: exact in float64


def test_zoom_resample_bilinear_null_support_and_method_guard(spark):
    from biggis_landuse_spark.pixeling import pixels_to_tiles, tiles_to_pixels

    rows = [
        ("bl", 0, 0, 0, 0, 0, 0, None),
        ("bl", 0, 0, 0, 0, 1, 0, 10.0),
        ("bl", 0, 0, 0, 0, 0, 1, 20.0),
        ("bl", 0, 0, 0, 0, 1, 1, 30.0),
    ]
    pixels = spark.createDataFrame(
        rows,
        "layer string, zoom int, tile_col int, tile_row int, band int, "
        "px int, py int, value double",
    )
    parents = pixels_to_tiles(pixels, cols=2, rows=2, n_bands=1)
    children = zoom_resample(parents, dz=1, method="bilinear")
    got = {}
    for r in tiles_to_pixels(children).collect():
        got[(r["tile_col"] * 2 + r["px"], r["tile_row"] * 2 + r["py"])] = r["value"]
    # any NULL in the 2x2 support -> NULL (deterministic NODATA contract);
    # children whose clamped support avoids the NULL corner keep values
    assert got[(0, 0)] is None
    assert got[(1, 1)] is None  # interior child touches all 4 parents
    assert got[(3, 3)] == 30.0
    assert got[(3, 0)] == 10.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown resampling method"):
        zoom_resample(parents, dz=1, method="lanczos")


def test_zoom_resample_bilinear_matches_numpy(spark):
    # independent numpy implementation over the fixture layer
    import numpy as np

    red = FX.fixture_layer(spark, "b4_red", zoom=0)
    children = zoom_resample(red, dz=1, method="bilinear")
    world = world_grid()
    ts = FX.TS
    px = tiles_to_pixels(children).collect()
    checked = 0
    for r in px[::37]:
        pc, pr = r["tile_col"] // 2, r["tile_row"] // 2
        tile = world[pr * ts : (pr + 1) * ts, pc * ts : (pc + 1) * ts]
        gx = (r["tile_col"] % 2) * ts + r["px"]
        gy = (r["tile_row"] % 2) * ts + r["py"]
        sx = min(max((gx + 0.5) / 2 - 0.5, 0.0), ts - 1)
        sy = min(max((gy + 0.5) / 2 - 0.5, 0.0), ts - 1)
        x0, y0 = int(np.floor(sx)), int(np.floor(sy))
        x1, y1 = min(x0 + 1, ts - 1), min(y0 + 1, ts - 1)
        fx, fy = sx - x0, sy - y0
        expect = (1 - fy) * ((1 - fx) * tile[y0, x0] + fx * tile[y0, x1]) + fy * (
            (1 - fx) * tile[y1, x0] + fx * tile[y1, x1]
        )
        assert r["value"] == pytest.approx(expect, rel=1e-12), (gx, gy)
        checked += 1
    assert checked > 50


def test_zoom_resample_cubic_constant_and_guard(spark):
    # Keys kernel weights sum to 1: a constant tile upsamples to the
    # same constant everywhere, including clamped borders
    from biggis_landuse_spark.pixeling import pixels_to_tiles, tiles_to_pixels

    pixels = spark.createDataFrame(
        [("cb", 0, 0, 0, 0, x, y, 7.0) for x in range(4) for y in range(4)],
        "layer string, zoom int, tile_col int, tile_row int, band int, "
        "px int, py int, value double",
    )
    parents = pixels_to_tiles(pixels, cols=4, rows=4, n_bands=1)
    children = zoom_resample(parents, dz=1, method="cubic")
    vals = [r["value"] for r in tiles_to_pixels(children).collect()]
    assert len(vals) == 64
    assert all(v == 7.0 for v in vals)


def test_zoom_resample_cubic_reproduces_linear_ramp_interior(spark):
    # cubic convolution with a=-0.5 reproduces linear functions exactly
    # wherever the 4x4 support is unclamped
    from biggis_landuse_spark.pixeling import pixels_to_tiles, tiles_to_pixels

    n = 8
    pixels = spark.createDataFrame(
        [
            ("rm", 0, 0, 0, 0, x, y, float(3 * x + 5 * y))
            for x in range(n)
            for y in range(n)
        ],
        "layer string, zoom int, tile_col int, tile_row int, band int, "
        "px int, py int, value double",
    )
    parents = pixels_to_tiles(pixels, cols=n, rows=n, n_bands=1)
    children = zoom_resample(parents, dz=1, method="cubic")
    for r in tiles_to_pixels(children).collect():
        gx = r["tile_col"] * n + r["px"]
        gy = r["tile_row"] * n + r["py"]
        sx = (gx + 0.5) / 2 - 0.5
        sy = (gy + 0.5) / 2 - 0.5
        # interior: full unclamped 4x4 support
        if 1 <= sx <= n - 2.5 and 1 <= sy <= n - 2.5:
            assert r["value"] == pytest.approx(3 * sx + 5 * sy, abs=1e-12), (gx, gy)


def test_zoom_resample_cubic_matches_numpy(spark):
    import numpy as np

    red = FX.fixture_layer(spark, "b4_red", zoom=0)
    children = zoom_resample(red, dz=1, method="cubic")
    world = world_grid()
    ts = FX.TS
    a = -0.5

    def w(t):
        t = abs(t)
        if t < 1:
            return (a + 2) * t**3 - (a + 3) * t**2 + 1
        if t < 2:
            return a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a
        return 0.0

    px = tiles_to_pixels(children).collect()
    checked = 0
    for r in px[::53]:
        pc, pr = r["tile_col"] // 2, r["tile_row"] // 2
        tile = world[pr * ts : (pr + 1) * ts, pc * ts : (pc + 1) * ts]
        gx = (r["tile_col"] % 2) * ts + r["px"]
        gy = (r["tile_row"] % 2) * ts + r["py"]
        sx = min(max((gx + 0.5) / 2 - 0.5, 0.0), ts - 1)
        sy = min(max((gy + 0.5) / 2 - 0.5, 0.0), ts - 1)
        x0, y0 = int(np.floor(sx)), int(np.floor(sy))
        fx, fy = sx - x0, sy - y0
        expect = 0.0
        for ky in (-1, 0, 1, 2):
            wy = w(ky - fy)
            row = 0.0
            for kx in (-1, 0, 1, 2):
                cx = min(max(x0 + kx, 0), ts - 1)
                cy = min(max(y0 + ky, 0), ts - 1)
                row += w(kx - fx) * tile[cy, cx]
            expect += wy * row
        assert r["value"] == pytest.approx(expect, rel=1e-12), (gx, gy)
        checked += 1
    assert checked > 30


def test_focal_mode_majority_tie_and_nodata(spark):
    from biggis_landuse_spark.operators.focal import focal_stats
    from biggis_landuse_spark.pixeling import pixels_to_tiles, tiles_to_pixels

    # 3x3 tile; cross kernel at center sees {center, up, down, left,
    # right} = {1, 2, 2, 3, None} -> mode 2; corner (0,0) sees
    # {3, 2, 1} all distinct -> tie broken to the SMALLEST (1)
    vals = {
        (0, 0): 3.0, (1, 0): 2.0, (2, 0): 9.0,
        (0, 1): 1.0, (1, 1): 1.0, (2, 1): None,
        (0, 2): 5.0, (1, 2): 2.0, (2, 2): 7.0,
    }
    # center cross: (1,1)=1, (1,0)=2, (1,2)=2, (0,1)=1, (2,1)=None
    # -> counts {1:2, 2:2} tie -> 1
    pixels = spark.createDataFrame(
        [("m", 0, 0, 0, 0, x, y, v) for (x, y), v in vals.items()],
        "layer string, zoom int, tile_col int, tile_row int, band int, "
        "px int, py int, value double",
    )
    tiles = pixels_to_tiles(pixels, cols=3, rows=3, n_bands=1)
    out = focal_stats(tiles, radius=1, stats=("mode",))
    got = {(r["px"], r["py"]): r["value"] for r in tiles_to_pixels(out).collect()}
    assert got[(1, 1)] == 1.0  # tie {1:2, 2:2} -> smallest
    assert got[(0, 0)] == 1.0  # all-distinct cross {3,2,1} -> smallest
    # NODATA center still votes its neighbors: cross of (2,1) sees
    # {up 9, down 7, left 1}, all distinct -> smallest wins
    assert got[(2, 1)] == 1.0
