"""Grid-bucketed spatial join: point-in-zone as an equi-join.

The reference's only spatial joins are SpatialKey equi-joins (SURVEY.md
§2.3); a vector point⋈zone join (assign events/samples to polygon
zones) is the natural extension its pipeline needs the moment features
carry coordinates. The naive formulation is an inequality join —
a nested-loop / cartesian at any scale. The scale path, same as the
tile grid itself: snap both sides onto an integer grid so containment
becomes an equi-join on the cell key, then refine exactly.

- points are assigned to exactly ONE cell (`x div cell, y div cell`) —
  no duplication of the big side;
- zones (axis-aligned boxes here; arbitrary polygons refine via
  `operators.rasterize.point_in_polygon_mask` on the same keys)
  explode to their covering cells — bounded fan-out
  (area / cell²), the same 9-way-bounded trick as the focal margin
  exchange;
- the join is a plain hash equi-join on (cx, cy) which AQE can
  broadcast when the zone side is small, and the exact box predicate
  refines the candidates map-side.

Each (point, zone) candidate appears exactly once (the point lives in
one cell), so no distinct pass is needed — unlike replicate-both-sides
schemes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_CELL = 32


def cell_of(coord: Column, cell_size: int = DEFAULT_CELL) -> Column:
    """Grid cell index of a scalar coordinate (floor division)."""
    return F.floor(coord / F.lit(cell_size)).cast("long")


def zones_to_cells(
    zones: DataFrame,
    cell_size: int = DEFAULT_CELL,
    bounds=("xmin", "ymin", "xmax", "ymax"),
) -> DataFrame:
    """Explode each zone box to its covering grid cells (half-open
    [min, max) boxes, fractional bounds allowed). Fan-out is
    ceil(w/cell)+1 × ceil(h/cell)+1 worst case — the bounded
    replication of the SMALL side only.

    The upper end of the sequence is `cell_of(xmax)`, not
    `cell_of(xmax - 1)`: with fractional bounds (e.g. xmax=64.5,
    cell=32) points in [64, 64.5) live in cell 2, which
    `cell_of(xmax - 1)` would miss. When xmax lands exactly on a cell
    boundary this admits one extra empty-candidate cell per axis; the
    exact refine predicate in points_in_zones discards those
    false candidates map-side, so correctness is unaffected."""
    xmin, ymin, xmax, ymax = (F.col(c) for c in bounds)
    return zones.select(
        "*",
        F.explode(
            F.sequence(cell_of(xmin, cell_size), cell_of(xmax, cell_size))
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(cell_of(ymin, cell_size), cell_of(ymax, cell_size))
        ).alias("cy"),
    )


def points_in_zones(
    points: DataFrame,
    zones: DataFrame,
    cell_size: int = DEFAULT_CELL,
    point_cols=("x", "y"),
    bounds=("xmin", "ymin", "xmax", "ymax"),
) -> DataFrame:
    """(point, zone) candidate pairs refined to exact containment.

    One equi-join on the cell key; the point side shuffles at most
    once on (cx, cy) (not at all when the exploded zone side
    broadcasts), and the exact refine runs in the join's own stage.
    """
    px, py = (F.col(c) for c in point_cols)
    xmin, ymin, xmax, ymax = (F.col(c) for c in bounds)
    keyed = points.withColumns(
        {"cx": cell_of(px, cell_size), "cy": cell_of(py, cell_size)}
    )
    cells = zones_to_cells(zones, cell_size, bounds)
    return keyed.join(cells, ["cx", "cy"]).where(
        (px >= xmin) & (px < xmax) & (py >= ymin) & (py < ymax)
    )


def points_in_polygons(
    points: DataFrame,
    polygons: DataFrame,
    cell_size: int = DEFAULT_CELL,
    point_cols=("x", "y"),
    coords_col: str = "coords",
) -> DataFrame:
    """Point-in-POLYGON join with the same grid-bucket shape as
    points_in_zones: the polygon side derives its bbox from the
    coordinate array, explodes to covering cells (bounded small-side
    fan-out), the hash equi-join on (cx, cy) pairs candidates, and
    the exact even-odd ray cast (functions.geometry.point_in_polygon,
    a pure column expression) refines map-side in the join stage —
    arbitrary rings, still zero UDF and zero inequality joins.
    """
    from biggis_landuse_spark.functions.geometry import point_in_polygon

    px, py = (F.col(c) for c in point_cols)
    c = F.col(coords_col)
    boxed = polygons.withColumns(
        {
            "xmin": F.array_min(F.transform(c, lambda p: p["x"])),
            "ymin": F.array_min(F.transform(c, lambda p: p["y"])),
            "xmax": F.array_max(F.transform(c, lambda p: p["x"])),
            "ymax": F.array_max(F.transform(c, lambda p: p["y"])),
        }
    )
    keyed = points.withColumns(
        {"cx": cell_of(px, cell_size), "cy": cell_of(py, cell_size)}
    )
    cells = zones_to_cells(boxed, cell_size)
    return (
        keyed.join(cells, ["cx", "cy"])
        .where(point_in_polygon(px, py, F.col(coords_col)))
        .drop("cx", "cy", "xmin", "ymin", "xmax", "ymax")
    )
