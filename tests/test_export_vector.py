"""GeoTiff export (S7/S8: per-tile encode round-trip, stitch guard)
and vector sources (S9: GeoJSON → WKT features → rasterize)."""

from __future__ import annotations

import json
import math

import numpy as np
import pytest

from biggis_landuse_spark.fixtures import band as fixture_band
from biggis_landuse_spark.fixtures import fixture_layer
from biggis_landuse_spark.sources import vector as V
from biggis_landuse_spark.sources.geotiff import (
    GeoTiffEncoder,
    export_tiles,
    stitch_layer,
)


def test_export_tiles_roundtrip(spark):
    tiles = fixture_layer(spark, "b4_red")
    out = {
        (r["tile_col"], r["tile_row"]): r
        for r in export_tiles(tiles).collect()
    }
    enc = GeoTiffEncoder()
    for (tc, tr), r in out.items():
        bands = enc.decode(bytes(r["payload"]))
        assert len(bands) == 1 and bands[0].shape == (8, 8)
        want = np.array(fixture_band("b4_red", tc, tr)).reshape(8, 8)
        np.testing.assert_array_equal(bands[0], want)
        assert r["n_bytes"] == len(bytes(r["payload"]))


def test_stitch_layer_and_guard(spark):
    tiles = fixture_layer(spark, "b4_red")
    mosaic = stitch_layer(tiles)
    # fixture grid is 4×4 tiles of 8×8
    assert mosaic.shape == (32, 32)
    assert mosaic[0, 0] == fixture_band("b4_red", 0, 0)[0]
    assert not math.isnan(mosaic.min())
    with pytest.raises(ValueError, match="use export_tiles"):
        stitch_layer(tiles, max_cells=10)


SQUARE = {
    "type": "Feature",
    "properties": {"value": 7.0},
    "geometry": {
        "type": "Polygon",
        "coordinates": [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]],
    },
}
MULTI = {
    "type": "Feature",
    "properties": {"value": 3.0},
    "geometry": {
        "type": "MultiPolygon",
        "coordinates": [
            [[[5.0, 5.0], [7.0, 5.0], [7.0, 7.0], [5.0, 7.0], [5.0, 5.0]]],
            [[[1.0, 6.0], [2.0, 6.0], [2.0, 7.0], [1.0, 7.0], [1.0, 6.0]]],
        ],
    },
}


def test_read_geojson(spark, tmp_path):
    p = tmp_path / "features.geojson"
    p.write_text(json.dumps({"type": "FeatureCollection", "features": [SQUARE, MULTI]}))
    df = V.read_geojson(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3  # MultiPolygon explodes to 2 members
    assert {r["value"] for r in rows} == {7.0, 3.0}
    assert all(r["geom"].startswith("POLYGON (") for r in rows)


def test_read_geojsonl_distributed(spark, tmp_path):
    p = tmp_path / "features.jsonl"
    p.write_text("\n".join(json.dumps(f) for f in [SQUARE, MULTI]))
    df = V.read_geojsonl(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3
    assert len({r["feature_id"] for r in rows}) == 3  # globally unique ids


def test_geojson_feeds_rasterizer(spark, tmp_path):
    from biggis_landuse_spark.operators.rasterize import (
        GridLayout,
        rasterize_features,
    )

    p = tmp_path / "features.geojson"
    p.write_text(json.dumps({"type": "FeatureCollection", "features": [SQUARE]}))
    feats = V.read_geojson(spark, str(p))
    tiles = rasterize_features(feats, GridLayout(tile_size=8))
    assert tiles.count() > 0


# ---------------------------------------------------------------------------
# Shapefile source: stdlib .shp/.dbf writers (test-side) + round-trip
# against the GeoJSON twin of the same geometry
# ---------------------------------------------------------------------------


def _write_shp(path, shapes):
    """Minimal ESRI .shp writer: shapes = list of ring-lists, each ring
    a closed [(x, y), ...]."""
    import struct as st

    records = b""
    for num, rings in enumerate(shapes, start=1):
        n_points = sum(len(r) for r in rings)
        parts, acc = [], 0
        for r in rings:
            parts.append(acc)
            acc += len(r)
        xs = [p[0] for r in rings for p in r]
        ys = [p[1] for r in rings for p in r]
        content = st.pack("<i", 5)
        content += st.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        content += st.pack("<ii", len(rings), n_points)
        content += st.pack(f"<{len(parts)}i", *parts)
        for r in rings:
            for x, y in r:
                content += st.pack("<2d", x, y)
        records += st.pack(">ii", num, len(content) // 2) + content

    flen = (100 + len(records)) // 2
    header = st.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, flen)
    header += st.pack("<ii", 1000, 5)  # version, shape type
    header += st.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)  # bbox + z/m ranges
    path.write_bytes(header + records)


def _write_dbf(path, names, rows):
    """Minimal dBASE III writer with N (numeric) fields."""
    import struct as st

    fields = b""
    for n in names:
        fields += n.encode().ljust(11, b"\x00") + b"N" + b"\x00" * 4 + bytes([18, 6]) + b"\x00" * 14
    rec_size = 1 + 18 * len(names)
    hdr_size = 32 + len(fields) + 1
    header = st.pack(
        "<B3BIHH20x", 3, 24, 1, 1, len(rows), hdr_size, rec_size
    )
    body = b""
    for row in rows:
        body += b" " + b"".join(f"{v:18.6f}".encode() for v in row)
    path.write_bytes(header + fields + b"\x0d" + body + b"\x1a")


def test_read_shapefile_matches_geojson_twin(spark, tmp_path):
    # same two squares, once as .shp+.dbf, once as GeoJSON
    sq1 = [(2.0, 3.0), (2.0, 6.0), (10.0, 6.0), (10.0, 3.0), (2.0, 3.0)]  # CW
    sq2 = [(1.0, 6.0), (1.0, 7.0), (2.0, 7.0), (2.0, 6.0), (1.0, 6.0)]  # CW
    _write_shp(tmp_path / "zones.shp", [[sq1], [sq2]])
    _write_dbf(tmp_path / "zones.dbf", ["VAL"], [[7.0], [3.0]])

    twin = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"value": v},
                "geometry": {"type": "Polygon", "coordinates": [[list(p) for p in ring]]},
            }
            for ring, v in [(sq1, 7.0), (sq2, 3.0)]
        ],
    }
    (tmp_path / "zones.geojson").write_text(json.dumps(twin))

    shp = V.read_shapefile(spark, str(tmp_path / "zones.shp")).collect()
    gj = V.read_geojson(spark, str(tmp_path / "zones.geojson")).collect()
    assert {(r["geom"], r["value"]) for r in shp} == {
        (r["geom"], r["value"]) for r in gj
    }
    assert len(shp) == 2


def test_read_shapefile_multipart_with_hole(spark, tmp_path):
    # one record: outer CW ring + CCW hole + second CW outer (multi-part)
    outer = [(0.0, 0.0), (0.0, 8.0), (8.0, 8.0), (8.0, 0.0), (0.0, 0.0)]  # CW
    hole = [(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0), (2.0, 2.0)]  # CCW
    island = [(10.0, 0.0), (10.0, 2.0), (12.0, 2.0), (12.0, 0.0), (10.0, 0.0)]  # CW
    _write_shp(tmp_path / "multi.shp", [[outer, hole, island]])
    rows = V.read_shapefile(spark, str(tmp_path / "multi.shp")).collect()
    # CW/CCW grouping: polygon-with-hole + island = 2 WKTs, ids unique
    assert len(rows) == 2
    with_hole = [r for r in rows if r["geom"].count("(") == 3]
    assert len(with_hole) == 1
    assert all(r["value"] == 1.0 for r in rows)  # no .dbf → default value


def test_shapefile_feeds_rasterizer_like_geojson(spark, tmp_path):
    from biggis_landuse_spark.operators.rasterize import (
        GridLayout,
        rasterize_features,
    )

    ring = [(2.0, 3.0), (2.0, 6.0), (10.0, 6.0), (10.0, 3.0), (2.0, 3.0)]
    _write_shp(tmp_path / "r.shp", [[ring]])
    _write_dbf(tmp_path / "r.dbf", ["VAL"], [[9.0]])
    feats = V.read_shapefile(spark, str(tmp_path / "r.shp"))
    tiles = rasterize_features(feats, GridLayout(tile_size=8))
    got = {
        (r["tile_col"], r["tile_row"]): r["tile"]["bands"][0]
        for r in tiles.collect()
    }
    assert got[(0, 0)][3 * 8 + 2] == 9.0  # (x=2, y=3) inside
    assert got[(0, 0)][3 * 8 + 1] is None  # (x=1, y=3) outside


def test_shapefile_rejects_non_polygon_types(spark, tmp_path):
    import struct as st

    content = st.pack("<i", 3)  # PolyLine record type
    records = st.pack(">ii", 1, len(content) // 2) + content
    header = st.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, (100 + len(records)) // 2)
    header += st.pack("<ii", 1000, 3) + st.pack("<8d", *([0.0] * 8))
    (tmp_path / "line.shp").write_bytes(header + records)
    with pytest.raises(ValueError, match="shape type 3"):
        V.read_shapefile(spark, str(tmp_path / "line.shp"))


def test_geometry_shoelace_golden(spark):
    # unit square (ccw) and a cw triangle: area/centroid closed-form
    from biggis_landuse_spark.functions import geometry as G

    df = spark.createDataFrame(
        [
            ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",),  # ccw unit square
            ("POLYGON ((0 0, 0 2, 4 0, 0 0))",),       # cw right triangle
        ],
        "wkt string",
    )
    coords = G.wkt_polygon_coords("wkt")
    rows = df.select(
        G.signed_area(coords).alias("s"),
        G.area(coords).alias("a"),
        G.centroid(coords).alias("c"),
    ).collect()
    assert rows[0]["s"] == 1.0 and rows[0]["a"] == 1.0
    assert rows[0]["c"]["x"] == 0.5 and rows[0]["c"]["y"] == 0.5
    assert rows[1]["s"] == -4.0 and rows[1]["a"] == 4.0
    assert abs(rows[1]["c"]["x"] - 4 / 3) < 1e-12
    assert abs(rows[1]["c"]["y"] - 2 / 3) < 1e-12
