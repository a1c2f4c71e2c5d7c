"""EPSG:4326 → WebMercator (EPSG:3857) reprojection as a relational
transform on the pixel table.

Reference: ``.reproject(WebMercator, ZoomedLayoutScheme(WebMercator,
256), NearestNeighbor)`` inside ingest (GeotiffTilingExample.scala:
56-60) — a GeoTrellis per-tile warp. Spark-native restatement: the
projection formulas are plain arithmetic, so the warp is a column
expression over pixel rows (whole-stage codegen, no UDF, no proj
library):

    mx = R * radians(lon)
    my = R * ln(tan(pi/4 + radians(lat)/2))

followed by re-keying onto the zoomed layout (2^z × 2^z tiles of
256²) and grouped reassembly (pixeling.pixels_to_tiles).

Nearest-neighbor semantics: this is a FORWARD mapping — each source
pixel lands in the target cell containing its projected center; when
several source pixels hit one target cell the one nearest the cell
center wins (min_by distance, ties by value for determinism). When
the target zoom is chosen to match the source resolution
(``zoom_for_resolution``, the reference's ZoomedLayoutScheme level
selection) the mapping is ~1:1, which is exactly the reference's
ingest configuration; upsampling beyond that leaves NODATA holes that
the inverse-warp variant of zoom_resample fills (operators.resample).

Scale: one narrow projection stage + the single pixels→tiles shuffle;
the same shuffle ingest pays anyway, so reprojection is free at the
plan level.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

R_EARTH = 6378137.0
WEB_MERCATOR_MAX = math.pi * R_EARTH  # 20037508.342789244
TILE_SIZE = 256


def mercator_x(lon: Column) -> Column:
    return F.radians(lon) * F.lit(R_EARTH)


def mercator_y(lat: Column) -> Column:
    return F.log(F.tan(F.lit(math.pi / 4) + F.radians(lat) / 2)) * F.lit(
        R_EARTH
    )


def zoom_for_resolution(
    deg_per_pixel: float, tile_size: int = TILE_SIZE
) -> int:
    """Closest zoomed-layout level for a source resolution (the
    reference's ZoomedLayoutScheme.levelFor): meters-per-pixel at the
    equator ≈ deg_per_pixel * R * pi/180; zoom z has resolution
    world / (2^z * tile_size)."""
    m_per_px = math.radians(deg_per_pixel) * R_EARTH
    world = 2 * WEB_MERCATOR_MAX
    z = math.log2(world / (m_per_px * tile_size))
    return max(0, round(z))


def reproject_pixels_to_webmercator(
    pixels: DataFrame,
    zoom: int,
    layer: str,
    tile_size: int = TILE_SIZE,
) -> DataFrame:
    """Pixel rows with EPSG:4326 georeferencing → WebMercator keyed
    pixel rows on the zoomed layout, ready for pixels_to_tiles.

    Expects columns (band, px, py, value) plus the per-file affine
    ``x0, y0, dx, dy`` (top-left lon/lat and positive cell sizes in
    degrees). Cell centers project; off-world rows (|lat| beyond the
    mercator limit) are dropped like the reference warp does.
    """
    res = 2 * WEB_MERCATOR_MAX / (2**zoom * tile_size)  # meters/cell
    lon = F.col("x0") + (F.col("px") + 0.5) * F.col("dx")
    lat = F.col("y0") - (F.col("py") + 0.5) * F.col("dy")
    mx = mercator_x(lon)
    my = mercator_y(lat)
    # global cell address on the zoom-z grid
    gx = F.floor((mx + F.lit(WEB_MERCATOR_MAX)) / F.lit(res)).cast("long")
    gy = F.floor((F.lit(WEB_MERCATOR_MAX) - my) / F.lit(res)).cast("long")
    n_cells = 2**zoom * tile_size
    projected = (
        pixels.where(F.abs(lat) < F.lit(85.06))  # mercator domain
        .select(
            F.col("band"),
            F.col("value"),
            gx.alias("gx"),
            gy.alias("gy"),
            # distance from projected point to its target cell center,
            # for nearest-neighbor tie-breaking on collisions
            (
                F.pow(mx - (gx + 0.5) * res + F.lit(WEB_MERCATOR_MAX), 2)
                + F.pow(F.lit(WEB_MERCATOR_MAX) - (gy + 0.5) * res - my, 2)
            ).alias("d2"),
        )
        .where(
            (F.col("gx") >= 0)
            & (F.col("gx") < n_cells)
            & (F.col("gy") >= 0)
            & (F.col("gy") < n_cells)
        )
    )
    # forward-NN collision rule: nearest source pixel wins, then value
    nn = projected.groupBy("band", "gx", "gy").agg(
        F.min_by(
            F.col("value"), F.struct(F.col("d2"), F.col("value"))
        ).alias("value")
    )
    return nn.select(
        F.lit(layer).alias("layer"),
        F.lit(zoom).alias("zoom"),
        (F.col("gx") / tile_size).cast("int").alias("tile_col"),
        (F.col("gy") / tile_size).cast("int").alias("tile_row"),
        "band",
        (F.col("gx") % tile_size).cast("int").alias("px"),
        (F.col("gy") % tile_size).cast("int").alias("py"),
        "value",
    )


def ingest_geotiff_webmercator(
    spark,
    path: str,
    layer: str,
    zoom: int | None = None,
    tile_size: int = TILE_SIZE,
    decoder=None,
    n_bands: int | None = None,
) -> DataFrame:
    """Full reference ingest parity (GeotiffTilingExample.scala:44-66):
    scan → decode → reproject to the WebMercator zoomed layout →
    re-tile. The decoder must supply georeferencing columns
    (x0, y0, dx, dy) alongside pixels — see sources.geotiff.

    ``zoom=None`` infers the level from the first file's resolution
    (zoom_for_resolution), the ZoomedLayoutScheme behavior.
    """
    from biggis_landuse_spark.pixeling import pixels_to_tiles
    from biggis_landuse_spark.shipping import ensure_package_shipped
    from biggis_landuse_spark.sources.geotiff import (
        GeoTiffDecoder,
        decode_to_pixels_georef,
        scan_geotiffs,
    )

    ensure_package_shipped(spark)
    binaries = scan_geotiffs(spark, path)
    pixels = decode_to_pixels_georef(binaries, decoder or GeoTiffDecoder())
    if zoom is None:
        first = pixels.select("dx").first()
        if first is None:
            raise ValueError(f"no decodable pixels under {path}")
        zoom = zoom_for_resolution(first["dx"], tile_size)
    keyed = reproject_pixels_to_webmercator(
        pixels, zoom=zoom, layer=layer, tile_size=tile_size
    )
    return pixels_to_tiles(
        keyed, cols=tile_size, rows=tile_size, n_bands=n_bands
    )
