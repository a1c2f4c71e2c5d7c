"""Vector → raster: burn (Multi)Polygon features into the tile layout
(SURVEY.md §2.4 A5, §2.1 S9).

Reference: RasterizeFeaturesRDD.scala:24-74 — features are keyed to
the tiles they cover, then a ``combineByKeyWithClassTag`` burns them
per tile with map-side combine. DataFrame form:

1. parse WKT → edge list + bbox (one ``mapInPandas`` pass — WKT never
   leaves the executor);
2. explode each feature to the tile keys its bbox covers (SQL
   ``sequence`` × ``explode`` — the skew-prone step; features
   covering many tiles fan out here, and AQE's skew handling splits
   hot tiles);
3. groupBy tile key + ``applyInPandas`` burn: vectorized even-odd
   (ray-casting) point-in-polygon over the tile's pixel centers,
   features applied in feature_id order so later features overwrite
   (last-burn-wins, FIXTURES.md B5).

Grid convention: world (x, y) → global pixel
``gx = floor((x - x0)/cell)``, ``gy = floor((y - y0)/cell)``; py
increases with y (documented engine convention); tile key =
``(gx div tile_size, gy div tile_size)``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GridLayout:
    x0: float = 0.0
    y0: float = 0.0
    cell: float = 1.0
    tile_size: int = 8


_RING_RE = re.compile(r"\(([^()]+)\)")


def parse_wkt_rings(wkt: str) -> list[list[tuple[float, float]]]:
    """Minimal WKT parser for POLYGON / MULTIPOLYGON (incl. holes):
    every innermost parenthesized group is one ring. Even-odd filling
    makes hole semantics automatic."""
    rings = []
    for grp in _RING_RE.findall(wkt):
        pts = []
        for pair in grp.split(","):
            xs = pair.split()
            if len(xs) >= 2:
                pts.append((float(xs[0]), float(xs[1])))
        if len(pts) >= 3:
            rings.append(pts)
    return rings


def _edges(rings: list[list[tuple[float, float]]]) -> list[list[float]]:
    out = []
    for ring in rings:
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            if y1 != y2:  # horizontal edges never cross a scanline
                out.append([x1, y1, x2, y2])
    return out


def point_in_polygon_mask(
    edges: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """Vectorized even-odd test: crossing count parity for each point.
    edges: (E, 4) float array of [x1, y1, x2, y2]."""
    inside = np.zeros(xs.shape, dtype=bool)
    for x1, y1, x2, y2 in edges:
        crosses = (y1 > ys) != (y2 > ys)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (ys - y1) / (y2 - y1) + x1
        inside ^= crosses & (xs < xint)
    return inside


_PARSED_SCHEMA = (
    "feature_id long, value double, edges array<array<double>>, "
    "xmin double, ymin double, xmax double, ymax double"
)

_TILE_OUT_SCHEMA = (
    "layer string, zoom int, tile_col int, tile_row int, ts timestamp, "
    "tile struct<cols:int, rows:int, cell_type:string, "
    "bands:array<array<double>>>"
)


def rasterize_features(
    features: DataFrame,
    layout: GridLayout = GridLayout(),
    layer: str = "rasterized",
    zoom: int = 0,
) -> DataFrame:
    """Burn features (feature_id, geom WKT, value) into tiles."""
    from biggis_landuse_spark.shipping import ensure_package_shipped

    ensure_package_shipped(features.sparkSession)
    ts = layout.tile_size

    def parse(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                rings = parse_wkt_rings(r.geom)
                if not rings:
                    continue
                pts = [p for ring in rings for p in ring]
                rows.append(
                    {
                        "feature_id": r.feature_id,
                        "value": float(r.value),
                        "edges": _edges(rings),
                        "xmin": min(p[0] for p in pts),
                        "ymin": min(p[1] for p in pts),
                        "xmax": max(p[0] for p in pts),
                        "ymax": max(p[1] for p in pts),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "feature_id", "value", "edges",
                    "xmin", "ymin", "xmax", "ymax",
                ],
            )

    parsed = features.select("feature_id", "geom", "value").mapInPandas(
        parse, schema=_PARSED_SCHEMA
    )

    span = layout.cell * ts
    covering = parsed.select(
        "feature_id",
        "value",
        "edges",
        F.explode(
            F.sequence(
                F.floor((F.col("xmin") - layout.x0) / span).cast("int"),
                F.floor((F.col("xmax") - layout.x0) / span).cast("int"),
            )
        ).alias("tile_col"),
        F.col("ymin"),
        F.col("ymax"),
    ).select(
        "feature_id",
        "value",
        "edges",
        "tile_col",
        F.explode(
            F.sequence(
                F.floor((F.col("ymin") - layout.y0) / span).cast("int"),
                F.floor((F.col("ymax") - layout.y0) / span).cast("int"),
            )
        ).alias("tile_row"),
    )

    def burn(pdf: pd.DataFrame) -> pd.DataFrame:
        tc = int(pdf["tile_col"].iloc[0])
        tr = int(pdf["tile_row"].iloc[0])
        # pixel-center world coordinates for this tile
        px = np.arange(ts)
        xs, ys = np.meshgrid(
            layout.x0 + (tc * ts + px + 0.5) * layout.cell,
            layout.y0 + (tr * ts + px + 0.5) * layout.cell,
        )
        tile = np.full((ts, ts), np.nan)
        for r in pdf.sort_values("feature_id").itertuples(index=False):
            edges = np.asarray([list(e) for e in r.edges], dtype=np.float64)
            if edges.size == 0:
                continue
            mask = point_in_polygon_mask(edges, xs, ys)
            tile[mask] = r.value  # later feature_ids overwrite (last wins)
        out = tile.astype(object)
        out[np.isnan(tile)] = None
        return pd.DataFrame(
            [
                {
                    "layer": layer,
                    "zoom": zoom,
                    "tile_col": tc,
                    "tile_row": tr,
                    "ts": None,
                    "tile": {
                        "cols": ts,
                        "rows": ts,
                        "cell_type": "float64",
                        "bands": [out.ravel().tolist()],
                    },
                }
            ]
        )

    return covering.groupBy("tile_col", "tile_row").applyInPandas(
        burn, schema=_TILE_OUT_SCHEMA
    )
