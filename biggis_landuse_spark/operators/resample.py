"""Zoom resample: upsample a layer by 2^dz, exploding each tile into
its 2^dz × 2^dz children with nearest-neighbor resampling
(SURVEY.md §2.5 W3).

Reference: ZoomResampleTEST.scala:64-154 / LayerRDDZoomResampleMethods
.scala:28-85 — child key arithmetic ``childCol = col*2^dz + ox``, with
optional target-bounds pruning (``targetGridBounds`` intersect →
skip). Here it is pure Spark SQL: an explode over child offsets and a
``transform(sequence(...))`` index remap per child — whole-stage
codegen, no Python; bounds pruning is a WHERE on the child keys that
Catalyst folds into the explode (empty-relation short-circuit free).

Nearest-neighbor is exact integer math (``(oy*rows + y) div 2^dz``) so
keys and values are bit-stable across partitions (SURVEY.md §7.5.3).
``method="bilinear"`` adds the reference's documented alternative
(Utils.scala:23 carries Bilinear next to NearestNeighbor): GDAL-style
center-aligned source coordinates ``s = (g + 0.5)/2^dz - 0.5`` clamped
at the parent-tile border (each tile resamples independently — no
margin exchange), 2×2 support weights exact in float64 for power-of-2
factors; a NULL (NODATA) anywhere in the support yields NULL, the same
deterministic edge contract as the focal family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bilinear_value_sql(scale: int) -> str:
    """Child-pixel bilinear expression over the parent band array.

    Built from interpolated sub-expression strings (Spark SQL lambdas
    have no let-bindings); whole-stage codegen CSEs the repeats.
    """
    sx = f"(((ox * ptile.cols + CAST(i % ptile.cols AS INT)) + 0.5D) / {scale}.0D - 0.5D)"
    sy = f"(((oy * ptile.rows + CAST(i div ptile.cols AS INT)) + 0.5D) / {scale}.0D - 0.5D)"
    sxc = f"greatest(0.0D, least({sx}, CAST(ptile.cols - 1 AS DOUBLE)))"
    syc = f"greatest(0.0D, least({sy}, CAST(ptile.rows - 1 AS DOUBLE)))"
    x0 = f"CAST(floor({sxc}) AS INT)"
    y0 = f"CAST(floor({syc}) AS INT)"
    x1 = f"least({x0} + 1, ptile.cols - 1)"
    y1 = f"least({y0} + 1, ptile.rows - 1)"
    fx = f"({sxc} - floor({sxc}))"
    fy = f"({syc} - floor({syc}))"
    v = "band[({y}) * ptile.cols + ({x})]"
    v00 = v.format(x=x0, y=y0)
    v10 = v.format(x=x1, y=y0)
    v01 = v.format(x=x0, y=y1)
    v11 = v.format(x=x1, y=y1)
    return (
        f"(1.0D - {fy}) * ((1.0D - {fx}) * {v00} + {fx} * {v10})"
        f" + {fy} * ((1.0D - {fx}) * {v01} + {fx} * {v11})"
    )


def zoom_resample(
    tiles: DataFrame,
    dz: int = 1,
    target_bounds: tuple[int, int, int, int] | None = None,
    method: str = "nearest",
) -> DataFrame:
    """Upsample by 2^dz zoom levels.

    ``method``: "nearest" (default — exact integer replication) or
    "bilinear" (center-aligned 2×2 interpolation, tile-border clamped).
    ``target_bounds = (col_min, row_min, col_max, row_max)`` prunes
    child tiles outside the bounds BEFORE any pixel work.
    """
    if dz < 1:
        raise ValueError("dz must be >= 1")
    if method not in ("nearest", "bilinear"):
        raise ValueError(
            f"unknown resampling method {method!r}: nearest | bilinear"
        )
    scale = 1 << dz
    offsets = F.array(
        *[
            F.struct(F.lit(ox).alias("ox"), F.lit(oy).alias("oy"))
            for oy in range(scale)
            for ox in range(scale)
        ]
    )
    exploded = tiles.select(
        "layer",
        (F.col("zoom") + dz).alias("zoom"),
        F.explode(offsets).alias("o"),
        F.col("tile_col").alias("pc"),
        F.col("tile_row").alias("pr"),
        F.col("tile").alias("ptile"),
    ).select(
        "layer",
        "zoom",
        (F.col("pc") * scale + F.col("o.ox")).cast("int").alias("tile_col"),
        (F.col("pr") * scale + F.col("o.oy")).cast("int").alias("tile_row"),
        F.col("o.ox").alias("ox"),
        F.col("o.oy").alias("oy"),
        "ptile",
    )
    if target_bounds is not None:
        c0, r0, c1, r1 = target_bounds
        exploded = exploded.where(
            (F.col("tile_col") >= c0)
            & (F.col("tile_col") <= c1)
            & (F.col("tile_row") >= r0)
            & (F.col("tile_row") <= r1)
        )
    if method == "bilinear":
        remap = F.expr(
            "transform(ptile.bands, band -> "
            "  transform(sequence(0, ptile.cols * ptile.rows - 1), i -> "
            f"    {_bilinear_value_sql(scale)}"
            "  ))"
        )
    else:
        # child pixel (x, y) ← parent ((oy*rows + y) div s, (ox*cols + x) div s)
        remap = F.expr(
            "transform(ptile.bands, band -> "
            "  transform(sequence(0, ptile.cols * ptile.rows - 1), i -> "
            "    band[ "
            f"      CAST((oy * ptile.rows + CAST(i div ptile.cols AS INT)) div {scale} AS INT)"
            "       * ptile.cols + "
            f"      CAST((ox * ptile.cols + CAST(i % ptile.cols AS INT)) div {scale} AS INT)"
            "    ]))"
        )
    return exploded.select(
        "layer",
        "zoom",
        "tile_col",
        "tile_row",
        F.lit(None).cast("timestamp").alias("ts"),
        F.struct(
            F.col("ptile")["cols"].alias("cols"),
            F.col("ptile")["rows"].alias("rows"),
            F.col("ptile")["cell_type"].alias("cell_type"),
            remap.alias("bands"),
        ).alias("tile"),
    )
