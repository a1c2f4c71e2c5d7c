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


def test_shapefile_stubbed(spark):
    with pytest.raises(NotImplementedError):
        V.read_shapefile(spark, "/nonexistent.shp")
