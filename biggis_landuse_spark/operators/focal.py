"""Focal (neighborhood/stencil) operators: convolution, focal mean/sum,
Getis-Ord G* (SURVEY.md §2.5 W1/W2, J5).

Strategy (the reference uses GeoTrellis ``bufferTiles`` — margin
exchange between neighboring tiles, ConvolveLayerExample.scala:67-73):

1. **Neighborhood join (J5)**: every tile row is exploded to its 9
   neighbor targets ``(tile_col+dc, tile_row+dr)`` and re-grouped on
   the target key — one shuffle whose payload is 9× tile references,
   the DataFrame form of margin exchange. At 100 TB this is a single
   hash shuffle on compact int keys; AQE balances the reduce side.
2. **Kernel pass**: one ``applyInPandas`` over assembled groups runs a
   vectorized numpy kernel per tile (Arrow-batched; NaN is the
   in-kernel NODATA and is converted back to NULL on the way out).
   Kernel math is a sum of shifted windows — O(|kernel|) array adds,
   no per-pixel Python.

Edge semantics: missing neighbors pad with NODATA and the kernel
normalizes by the count of *data* cells under it — the reference's
``targetArea`` behavior (partial kernels at layer edges,
ConvolveLayerExample.scala:71).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biggis_landuse_spark.pixeling import KEY_COLS

_NEIGHBOR_SCHEMA = (
    "layer string, zoom int, tile_col int, tile_row int, "
    "cols int, rows int, cell_type string, "
    "neighbors map<int, array<double>>"
)


def circle_kernel_offsets(radius: int) -> list[tuple[int, int]]:
    """Binary circular kernel (reference: Kernel.circle,
    ConvolveLayerExample.scala:64-66)."""
    return [
        (dx, dy)
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
        if dx * dx + dy * dy <= radius * radius
    ]


def with_neighbors(tiles: DataFrame, band: int = 0) -> DataFrame:
    """Neighborhood join: for every tile key, a map
    ``(dc+1)*3+(dr+1) → neighbor band pixels`` (NULL-padded absent).

    Only tiles that exist in the layer produce output rows (the
    original extent is preserved — explode targets that have no center
    tile are dropped by the inner join back on the key set).
    """
    offsets = F.array(
        *[
            F.struct(F.lit(dc).alias("dc"), F.lit(dr).alias("dr"))
            for dc in (-1, 0, 1)
            for dr in (-1, 0, 1)
        ]
    )
    contrib = tiles.select(
        "layer",
        "zoom",
        F.explode(offsets).alias("o"),
        F.col("tile_col").alias("src_col"),
        F.col("tile_row").alias("src_row"),
        F.col("tile")["bands"][band].alias("pixels"),
        F.col("tile")["cols"].alias("cols"),
        F.col("tile")["rows"].alias("rows"),
        F.col("tile")["cell_type"].alias("cell_type"),
    ).select(
        "layer",
        "zoom",
        (F.col("src_col") + F.col("o.dc")).cast("int").alias("tile_col"),
        (F.col("src_row") + F.col("o.dr")).cast("int").alias("tile_row"),
        # position of the SOURCE relative to the TARGET
        ((-F.col("o.dc") + 1) * 3 + (-F.col("o.dr") + 1)).cast("int").alias("slot"),
        "pixels",
        "cols",
        "rows",
        "cell_type",
    )
    assembled = contrib.groupBy(*KEY_COLS).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("slot"), F.col("pixels")))
        ).alias("neighbors"),
        F.first("cols").alias("cols"),
        F.first("rows").alias("rows"),
        F.first("cell_type").alias("cell_type"),
    )
    centers = tiles.select(*KEY_COLS)
    return assembled.join(centers, KEY_COLS).select(
        "layer", "zoom", "tile_col", "tile_row",
        "cols", "rows", "cell_type", "neighbors",
    )


_TILE_OUT_SCHEMA = (
    "layer string, zoom int, tile_col int, tile_row int, ts timestamp, "
    "tile struct<cols:int, rows:int, cell_type:string, "
    "bands:array<array<double>>>"
)


def _padded(nb: dict, cols: int, rows: int) -> np.ndarray:
    """Assemble the 3×3 neighborhood into a (3*rows, 3*cols) NaN-padded
    array. Slot layout: slot = (dc+1)*3 + (dr+1), source at offset
    (dc, dr) from the target."""
    big = np.full((3 * rows, 3 * cols), np.nan)
    for slot, pixels in (nb or {}).items():
        if pixels is None:
            continue
        dc = slot // 3 - 1
        dr = slot % 3 - 1
        arr = np.asarray(
            [np.nan if v is None else v for v in pixels], dtype=np.float64
        ).reshape(rows, cols)
        big[(dr + 1) * rows : (dr + 2) * rows, (dc + 1) * cols : (dc + 2) * cols] = arr
    return big


def _to_nullable_list(arr: np.ndarray) -> list:
    mask = np.isnan(arr)
    out = arr.astype(object)
    out[mask] = None
    return out.ravel().tolist()


def focal_stats(
    tiles: DataFrame, radius: int = 1, stats: tuple[str, ...] = ("mean",)
) -> DataFrame:
    """Run a circular-kernel focal pass; each requested stat becomes one
    band of the output tile (order = ``stats``): 'mean', 'sum',
    'count' (count of data cells under the kernel), 'min', 'max',
    'range' (max − min), 'median', 'mode' (majority value, ties to
    the SMALLEST value — the deterministic majority filter land-use
    classification post-processing uses; GeoTrellis focalMode).

    Reference: focalMean / focalSum over buffered tiles
    (ConvolveLayerExample.scala:62-73, SpatialGetisOrd.scala:31-39);
    min/max/median extend the same margin-exchange to GeoTrellis's
    wider focal family (focalMin/focalMax/focalMedian) without new
    shuffle structure — every stat shares the one neighborhood join.
    """
    from biggis_landuse_spark.shipping import ensure_package_shipped

    ensure_package_shipped(tiles.sparkSession)
    offsets = circle_kernel_offsets(radius)

    def kernel(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            rows_out = []
            for r in pdf.itertuples(index=False):
                cols, rows_ = int(r.cols), int(r.rows)
                big = _padded(r.neighbors, cols, rows_)
                acc = np.zeros((rows_, cols))
                cnt = np.zeros((rows_, cols))
                vmin = np.full((rows_, cols), np.nan)
                vmax = np.full((rows_, cols), np.nan)
                wins = (
                    []
                    if ("median" in stats or "mode" in stats)
                    else None
                )
                for dx, dy in offsets:
                    win = big[
                        rows_ + dy : 2 * rows_ + dy, cols + dx : 2 * cols + dx
                    ]
                    valid = ~np.isnan(win)
                    acc += np.where(valid, win, 0.0)
                    cnt += valid
                    vmin = np.fmin(vmin, win)  # fmin/fmax ignore NaN
                    vmax = np.fmax(vmax, win)
                    if wins is not None:
                        wins.append(win)
                results = {}
                with np.errstate(invalid="ignore", divide="ignore"):
                    results["sum"] = np.where(cnt > 0, acc, np.nan)
                    results["mean"] = np.where(cnt > 0, acc / cnt, np.nan)
                    results["count"] = cnt.astype(np.float64)
                    results["min"] = vmin
                    results["max"] = vmax
                    results["range"] = vmax - vmin
                    if wins is not None:
                        import warnings

                        stacked = np.stack(wins)
                        with warnings.catch_warnings():
                            # all-NaN window → NaN median, silently
                            warnings.simplefilter("ignore", RuntimeWarning)
                            results["median"] = np.nanmedian(stacked, axis=0)
                        if "mode" in stats:
                            # majority with smallest-value tie-break:
                            # ascending sort (NaN last) + strict-> count
                            # comparison means the first (smallest) value
                            # of a tied count wins; NaN==NaN is False so
                            # NODATA never counts. O(k^2) in the kernel
                            # size (<= 2 or so dozen cells), vectorized
                            # over the tile.
                            s = np.sort(stacked, axis=0)
                            best_val = np.full(s.shape[1:], np.nan)
                            best_cnt = np.zeros(s.shape[1:])
                            for i in range(s.shape[0]):
                                v = s[i]
                                c = np.zeros(s.shape[1:])
                                for j in range(s.shape[0]):
                                    c += s[j] == v
                                better = (~np.isnan(v)) & (c > best_cnt)
                                best_val = np.where(better, v, best_val)
                                best_cnt = np.where(better, c, best_cnt)
                            results["mode"] = best_val
                bands = [_to_nullable_list(results[s]) for s in stats]
                rows_out.append(
                    {
                        "layer": r.layer,
                        "zoom": r.zoom,
                        "tile_col": r.tile_col,
                        "tile_row": r.tile_row,
                        "ts": None,
                        "tile": {
                            "cols": cols,
                            "rows": rows_,
                            "cell_type": "float64",
                            "bands": bands,
                        },
                    }
                )
            yield pd.DataFrame(rows_out)

    return with_neighbors(tiles).mapInPandas(kernel, schema=_TILE_OUT_SCHEMA)


def focal_mean(tiles: DataFrame, radius: int = 1) -> DataFrame:
    return focal_stats(tiles, radius, stats=("mean",))


def focal_sum(tiles: DataFrame, radius: int = 1) -> DataFrame:
    return focal_stats(tiles, radius, stats=("sum",))


def getis_ord_gstar(tiles: DataFrame, radius: int = 1) -> DataFrame:
    """Getis-Ord G* hotspot statistic with binary circular weights.

    z_i = (Σ_j x_j − x̄·W_i) / (S · sqrt((N·W_i − W_i²)/(N−1)))
    where the sum runs over the kernel, W_i = #data cells under the
    kernel at i (targetArea edge handling), and x̄/S/N are the global
    mean / stdev / count of the layer.

    Reference: SpatialGetisOrd.scala:66-83 (focalSum + standardization
    from the layer histogram); the global stats come from one agg over
    the exploded pixels and ride into the per-cell expression via a
    broadcast join — the DataFrame form of the reference's
    hist.statistics broadcast.
    """
    from biggis_landuse_spark.pixeling import tiles_to_pixels

    px = tiles_to_pixels(tiles).where(F.col("value").isNotNull())
    stats = px.agg(
        F.avg("value").alias("g_mean"),
        F.stddev("value").alias("g_std"),
        F.count("value").alias("g_n"),
    )
    fs = focal_stats(tiles, radius, stats=("sum", "count"))
    t = F.col("tile")
    z = F.zip_with(
        t["bands"][0],
        t["bands"][1],
        # try_divide: a constant layer (g_std = 0) or single-cell
        # layer (g_n = 1) has no defined z-score — NULL, not an ANSI
        # DIVIDE_BY_ZERO crash
        lambda s, w: F.try_divide(
            s - F.col("g_mean") * w,
            F.col("g_std")
            * F.sqrt(
                F.try_divide(
                    F.col("g_n") * w - w * w, F.col("g_n") - F.lit(1.0)
                )
            ),
        ),
    )
    return fs.crossJoin(F.broadcast(stats)).select(
        "layer",
        "zoom",
        "tile_col",
        "tile_row",
        "ts",
        F.struct(
            t["cols"].alias("cols"),
            t["rows"].alias("rows"),
            F.lit("float64").alias("cell_type"),
            F.array(z).alias("bands"),
        ).alias("tile"),
    )


def terrain(
    tiles: DataFrame,
    cell_size: float = 1.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
) -> DataFrame:
    """Horn-method terrain analysis (Horn 1981; the GDAL/GeoTrellis
    focal Slope/Hillshade pair) over the SAME single margin-exchange
    shuffle as focal_stats — output band 0 = slope in degrees, band 1
    = hillshade in [0, 255], band 2 = aspect in degrees (atan2(q, −p),
    consumed by e.g. terrain_tile).

    Gradients from the 3×3 window (a b c / d e f / g h i, x east,
    y south):  p = dz/dx = ((c+2f+i) − (a+2d+g)) / (8·cell)
               q = dz/dy = ((g+2h+i) − (a+2b+c)) / (8·cell)
    slope = atan(sqrt(p²+q²)); aspect = atan2(q, −p);
    hillshade = 255·max(0, cos(zen)cos(slope)
                          + sin(zen)sin(slope)cos(az − aspect)),
    zen = 90° − altitude. A cell with ANY missing 3×3 neighbor is
    NODATA (deterministic edge semantics; the reference's GeoTrellis
    dependency exposes the same family via focal.Slope/Hillshade).
    sqrt(p²+q²) is used verbatim (not hypot) so the SQL oracle's
    arithmetic is reproduced operation-for-operation.
    """
    from biggis_landuse_spark.shipping import ensure_package_shipped

    ensure_package_shipped(tiles.sparkSession)
    zen = np.radians(90.0 - altitude_deg)
    az = np.radians(azimuth_deg)

    def kernel(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            rows_out = []
            for r in pdf.itertuples(index=False):
                cols, rows_ = int(r.cols), int(r.rows)
                big = _padded(r.neighbors, cols, rows_)

                def win(dx: int, dy: int) -> np.ndarray:
                    return big[
                        rows_ + dy : 2 * rows_ + dy, cols + dx : 2 * cols + dx
                    ]

                a, b, c = win(-1, -1), win(0, -1), win(1, -1)
                d, e, f_ = win(-1, 0), win(0, 0), win(1, 0)
                g, h, i_ = win(-1, 1), win(0, 1), win(1, 1)
                p = ((c + 2 * f_ + i_) - (a + 2 * d + g)) / (8.0 * cell_size)
                q = ((g + 2 * h + i_) - (a + 2 * b + c)) / (8.0 * cell_size)
                slope = np.arctan(np.sqrt(p * p + q * q))
                aspect = np.arctan2(q, -p)
                hs = 255.0 * np.maximum(
                    0.0,
                    np.cos(zen) * np.cos(slope)
                    + np.sin(zen) * np.sin(slope) * np.cos(az - aspect),
                )
                # any-NaN in the 3×3 window (incl. center) → NODATA
                aspect_deg = (np.degrees(aspect) + 360.0) % 360.0
                nan9 = np.isnan(a + b + c + d + e + f_ + g + h + i_)
                slope_deg = np.where(nan9, np.nan, np.degrees(slope))
                hs = np.where(nan9, np.nan, hs)
                aspect_deg = np.where(nan9, np.nan, aspect_deg)
                rows_out.append(
                    {
                        "layer": r.layer,
                        "zoom": r.zoom,
                        "tile_col": r.tile_col,
                        "tile_row": r.tile_row,
                        "ts": None,
                        "tile": {
                            "cols": cols,
                            "rows": rows_,
                            "cell_type": "float64",
                            "bands": [
                                _to_nullable_list(slope_deg),
                                _to_nullable_list(hs),
                                _to_nullable_list(aspect_deg),
                            ],
                        },
                    }
                )
            yield pd.DataFrame(rows_out)

    return with_neighbors(tiles).mapInPandas(kernel, schema=_TILE_OUT_SCHEMA)
