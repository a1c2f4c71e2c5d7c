"""Vector geometry as JVM-side column expressions: WKT polygon parse,
shoelace area, polygon centroid.

The reference handles vector features through GeoTrellis/JTS objects
(UtilsShape.scala:26-107, ShapefilePolygonRasterizer); here the
geometry math lives in Catalyst array expressions (whole-stage
codegen, zero UDF) so it runs scan-local at any scale. The WKT parse
covers the single-ring POLYGON form the synthetic feature pipelines
emit; multi-ring/multipolygon WKT goes through the mapInPandas path
in operators/rasterize.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def wkt_polygon_coords(wkt: Column | str) -> Column:
    """``POLYGON ((x y, x y, ...))`` → array<struct<x:double,y:double>>
    (the ring as written, first point repeated at the end)."""
    col = F.col(wkt) if isinstance(wkt, str) else wkt
    inner = F.regexp_extract(col, r"POLYGON \(\((.*)\)\)", 1)
    return F.transform(
        F.split(inner, ", "),
        lambda p: F.struct(
            F.split(p, " ")[0].cast("double").alias("x"),
            F.split(p, " ")[1].cast("double").alias("y"),
        ),
    )


def _cross_terms(coords: Column) -> Column:
    """cross_i = x_i·y_{i+1} − x_{i+1}·y_i over the closed ring —
    left-to-right array order, reproduced verbatim by the SQL oracle
    so integer-coordinate sums stay exact on both engines."""
    idx = F.sequence(F.lit(1), F.size(coords) - 1)
    return F.transform(
        idx,
        lambda i: F.element_at(coords, i)["x"] * F.element_at(coords, i + 1)["y"]
        - F.element_at(coords, i + 1)["x"] * F.element_at(coords, i)["y"],
    )


def signed_area(coords: Column) -> Column:
    """Shoelace signed area (positive = counter-clockwise ring)."""
    s = F.aggregate(
        _cross_terms(coords), F.lit(0.0), lambda acc, t: acc + t
    )
    return s / 2


def area(coords: Column) -> Column:
    return F.abs(signed_area(coords))


def centroid(coords: Column) -> Column:
    """Polygon centroid struct<x,y> (area-weighted; standard formula
    cx = Σ(x_i+x_{i+1})·cross_i / (6·signed_area)). NULL for
    degenerate zero-area rings via try_divide."""
    terms = _cross_terms(coords)
    idx = F.sequence(F.lit(1), F.size(coords) - 1)
    sx = F.aggregate(
        F.zip_with(
            idx,
            terms,
            lambda i, t: (
                F.element_at(coords, i)["x"] + F.element_at(coords, i + 1)["x"]
            )
            * t,
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    sy = F.aggregate(
        F.zip_with(
            idx,
            terms,
            lambda i, t: (
                F.element_at(coords, i)["y"] + F.element_at(coords, i + 1)["y"]
            )
            * t,
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    sa6 = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t) * 3
    return F.struct(
        F.try_divide(sx, sa6).alias("x"), F.try_divide(sy, sa6).alias("y")
    )


def point_in_polygon(px: Column, py: Column, coords: Column) -> Column:
    """Even-odd ray cast: true iff the half-line x→+∞ from (px, py)
    crosses an odd number of ring edges. Pure column expression; the
    horizontal-edge case short-circuits on the y-straddle test before
    the slope division (try_divide → NULL → false, same outcome). The
    SQL oracle replays this formula verbatim so on-edge points —
    however IEEE resolves them — resolve identically on both engines.
    """
    idx = F.sequence(F.lit(1), F.size(coords) - 1)

    def edge_cross(i: Column) -> Column:
        x1 = F.element_at(coords, i)["x"]
        y1 = F.element_at(coords, i)["y"]
        x2 = F.element_at(coords, i + 1)["x"]
        y2 = F.element_at(coords, i + 1)["y"]
        straddles = (y1 > py) != (y2 > py)
        xcross = (x2 - x1) * F.try_divide(py - y1, y2 - y1) + x1
        return F.when(straddles & (px < xcross), F.lit(1)).otherwise(F.lit(0))

    n = F.aggregate(
        F.transform(idx, edge_cross), F.lit(0), lambda acc, c: acc + c
    )
    return n % 2 == 1


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine, R = 6371.0088 — the
    IUGG mean Earth radius). Pure column expression; the SQL oracle
    replays the identical operation order so both engines round the
    same way."""
    r = 6371.0088
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(p1) * F.cos(p2) * F.sin(dlmb) * F.sin(dlmb)
    )
    return 2 * r * F.asin(F.sqrt(a))
