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


_CUBIC_A = -0.5  # Keys 1981 convolution parameter (the GDAL default)


def _cubic_axis(scale: int, axis: str) -> tuple[str, str, list[str], list[str]]:
    """Per-axis pieces for cubic convolution: clamped source coord,
    base index, the 4 clamped tap indices (offsets -1..2) and their
    Keys-kernel weights as expression strings."""
    if axis == "x":
        g = "(ox * ptile.cols + CAST(i % ptile.cols AS INT))"
        dim = "ptile.cols"
    else:
        g = "(oy * ptile.rows + CAST(i div ptile.cols AS INT))"
        dim = "ptile.rows"
    s = f"(({g} + 0.5D) / {scale}.0D - 0.5D)"
    sc = f"greatest(0.0D, least({s}, CAST({dim} - 1 AS DOUBLE)))"
    i0 = f"CAST(floor({sc}) AS INT)"
    fr = f"({sc} - floor({sc}))"
    a = _CUBIC_A
    idxs, ws = [], []
    for k in (-1, 0, 1, 2):
        idxs.append(f"greatest(0, least({i0} + {k}, {dim} - 1))")
        t = f"abs({k}.0D - {fr})"
        if k in (0, 1):  # |t| < 1: inner kernel (a+2)t^3 - (a+3)t^2 + 1
            ws.append(
                f"(({a + 2!r}) * {t}*{t}*{t} - ({a + 3!r}) * {t}*{t} + 1.0D)"
            )
        else:  # 1 <= |t| < 2: outer kernel a t^3 - 5a t^2 + 8a t - 4a
            ws.append(
                f"(({a!r}) * {t}*{t}*{t} - ({5 * a!r}) * {t}*{t}"
                f" + ({8 * a!r}) * {t} - ({4 * a!r}))"
            )
    return sc, i0, idxs, ws


def _cubic_value_sql(scale: int) -> str:
    """Keys cubic-convolution child-pixel expression: 4×4 clamped taps,
    separable weights, sum_j wy_j * (sum_i wx_i * v(xi, yj)). For
    power-of-2 factors the fractions are dyadic, so every weight and
    product is exact in float64 — the oracle's flat 16-term sum
    evaluates to the bit-identical value."""
    _, _, xs, wxs = _cubic_axis(scale, "x")
    _, _, ys, wys = _cubic_axis(scale, "y")
    rows = []
    for yj, wy in zip(ys, wys):
        taps = " + ".join(
            f"{wx} * band[({yj}) * ptile.cols + ({xi})]"
            for xi, wx in zip(xs, wxs)
        )
        rows.append(f"{wy} * ({taps})")
    return "(" + " + ".join(rows) + ")"


def zoom_resample(
    tiles: DataFrame,
    dz: int = 1,
    target_bounds: tuple[int, int, int, int] | None = None,
    method: str = "nearest",
) -> DataFrame:
    """Upsample by 2^dz zoom levels.

    ``method``: "nearest" (default — exact integer replication),
    "bilinear" (center-aligned 2×2 interpolation, tile-border clamped)
    or "cubic" (Keys cubic convolution, 4×4 clamped support — the
    reference's CubicConvolution alternative, Utils.scala:23).
    ``target_bounds = (col_min, row_min, col_max, row_max)`` prunes
    child tiles outside the bounds BEFORE any pixel work.
    """
    if dz < 1:
        raise ValueError("dz must be >= 1")
    if method not in ("nearest", "bilinear", "cubic"):
        raise ValueError(
            f"unknown resampling method {method!r}: nearest | bilinear | cubic"
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
    if method in ("bilinear", "cubic"):
        value_sql = (
            _bilinear_value_sql(scale)
            if method == "bilinear"
            else _cubic_value_sql(scale)
        )
        remap = F.expr(
            "transform(ptile.bands, band -> "
            "  transform(sequence(0, ptile.cols * ptile.rows - 1), i -> "
            f"    {value_sql}"
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
