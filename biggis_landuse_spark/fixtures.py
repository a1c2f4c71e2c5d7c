"""Deterministic raster fixtures (FIXTURES.md §B): 4×4 grid of 8×8
tiles, pure functions of (layer, tile_col, tile_row, px, py) — so every
golden test value is hand-computable in numpy.

Layers (FIXTURES.md B2):
- ``b4_red`` / ``b5_nir``: deterministic ramps
- ``bqa``: bit patterns incl. 0x8000 (cloud) / 0x2000 (cirrus)
- ``labels``: integer classes 0-3
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from biggis_landuse_spark.model import FIXTURE_TILE_SIZE, TILE_SCHEMA

GRID = 4  # 4×4 tiles
TS = FIXTURE_TILE_SIZE  # 8×8 pixels per tile

CLOUD_BIT = 0x8000
CIRRUS_BIT = 0x2000


def red_value(tc: int, tr: int, px: int, py: int) -> float:
    return float(tc * 1000 + tr * 100 + py * TS + px)


def nir_value(tc: int, tr: int, px: int, py: int) -> float:
    return float(tc * 1000 + tr * 100 + py * TS + px) * 2.0 + 10.0


def qa_value(tc: int, tr: int, px: int, py: int) -> float:
    """Bit pattern: every 7th cell cloudy, every 11th cirrus."""
    i = ((tr * GRID + tc) * TS * TS) + py * TS + px
    v = 0
    if i % 7 == 0:
        v |= CLOUD_BIT
    if i % 11 == 0:
        v |= CIRRUS_BIT
    return float(v)


def label_value(tc: int, tr: int, px: int, py: int) -> float:
    return float((tc + tr + (px > 3) + (py > 3)) % 4)


_VALUE_FNS = {
    "b4_red": red_value,
    "b5_nir": nir_value,
    "bqa": qa_value,
    "labels": label_value,
}


def band(layer: str, tc: int, tr: int) -> list[float]:
    fn = _VALUE_FNS[layer]
    return [fn(tc, tr, px, py) for py in range(TS) for px in range(TS)]


def layer_rows(layer: str, zoom: int = 0) -> list[tuple]:
    cell_type = "float64" if layer in ("b4_red", "b5_nir") else "int32"
    return [
        (
            layer,
            zoom,
            tc,
            tr,
            None,
            (TS, TS, cell_type, [band(layer, tc, tr)]),
        )
        for tr in range(GRID)
        for tc in range(GRID)
    ]


def fixture_layer(spark: SparkSession, layer: str, zoom: int = 0) -> DataFrame:
    return spark.createDataFrame(layer_rows(layer, zoom), schema=TILE_SCHEMA)


def expected_ndvi(tc: int, tr: int, px: int, py: int) -> float | None:
    n = nir_value(tc, tr, px, py)
    r = red_value(tc, tr, px, py)
    if n + r == 0:
        return None
    return (n - r) / (n + r)
