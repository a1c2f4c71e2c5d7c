"""GeoTiff ingest (SURVEY.md §2.1 S1/S2, §3.1): binary-file scan →
decode → re-tile to the fixed grid → layer write.

Reference pipeline (GeotiffTilingExample.scala:44-66): hadoopGeoTiffRDD
→ TileLayerMetadata.fromRDD → tileToLayout(256) → reproject →
writeRddToLayer. Spark-native restatement:

- scan: ``spark.read.format("binaryFile")`` — distributed, no driver
  I/O, predicate-prunable by path;
- decode: rasterio inside ``mapInPandas`` (Arrow-batched). The decode
  dependency is NOT in this container, so it is stubbed behind
  ``GeoTiffDecoder`` — the Spark-side plumbing (schema, batching,
  re-tile math) is real and tested with the deterministic fake;
- re-tile: pixel-table groupBy onto the engine grid (pixels_to_tiles);
- reproject: a per-tile warp kernel would slot in exactly like the
  decoder (numpy/rasterio pandas UDF, SURVEY.md §4.2.3) — out of v1
  scope since no proj lib is present.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "path string, band int, py int, px int, value double, "
    "width int, height int"
)


class GeoTiffDecoder:
    """Pluggable decode step. The real implementation would call
    rasterio/GDAL; this container has neither, so ``decode`` raises
    unless a fake is injected (tests use :class:`FakeRampDecoder`)."""

    def decode(self, path: str, payload: bytes):
        raise NotImplementedError(
            "GeoTiff decoding requires rasterio/GDAL, not present in "
            "this environment; inject a decoder (see FakeRampDecoder)"
        )


class FakeRampDecoder(GeoTiffDecoder):
    """Deterministic fake: interprets the first 8 bytes of the payload
    as (width, height) uint32 little-endian and synthesizes a ramp
    band — exercises the full plumbing without an image lib."""

    def decode(self, path: str, payload: bytes):
        w = int.from_bytes(payload[0:4], "little")
        h = int.from_bytes(payload[4:8], "little")
        band = (np.arange(h * w, dtype=np.float64)).reshape(h, w)
        return [band]  # list of 2-D arrays, one per band


def scan_geotiffs(spark: SparkSession, path: str) -> DataFrame:
    """Distributed binary scan (S1/S2). Column pruning keeps payloads
    out of any plan that only needs paths/sizes."""
    return spark.read.format("binaryFile").load(path)


def decode_to_pixels(
    binaries: DataFrame, decoder: GeoTiffDecoder
) -> DataFrame:
    """binary rows → pixel rows, Arrow-batched; one task per file
    partition, no driver involvement."""

    def run(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            for r in pdf.itertuples(index=False):
                bands = decoder.decode(r.path, r.content)
                for b, arr in enumerate(bands):
                    h, w = arr.shape
                    ys, xs = np.mgrid[0:h, 0:w]
                    yield pd.DataFrame(
                        {
                            "path": r.path,
                            "band": b,
                            "py": ys.ravel(),
                            "px": xs.ravel(),
                            "value": arr.ravel(),
                            "width": w,
                            "height": h,
                        }
                    )

    return binaries.select("path", "content").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def retile_pixels(
    pixels: DataFrame, tile_size: int, layer: str, zoom: int = 0
) -> DataFrame:
    """Re-key decoded pixels onto the engine grid and assemble tiles
    (the tileToLayout analog — one shuffle on the tile key)."""
    from biggis_landuse_spark.pixeling import pixels_to_tiles

    keyed = pixels.select(
        F.lit(layer).alias("layer"),
        F.lit(zoom).alias("zoom"),
        (F.col("px") / tile_size).cast("int").alias("tile_col"),
        (F.col("py") / tile_size).cast("int").alias("tile_row"),
        F.col("band"),
        (F.col("px") % tile_size).cast("int").alias("px"),
        (F.col("py") % tile_size).cast("int").alias("py"),
        F.col("value"),
    )
    return pixels_to_tiles(keyed, cols=tile_size, rows=tile_size, n_bands=1)


def ingest_geotiff(
    spark: SparkSession,
    path: str,
    layer: str,
    tile_size: int = 256,
    decoder: GeoTiffDecoder | None = None,
) -> DataFrame:
    """Full S1→S4 slice: scan → decode → re-tile. Returns the tile
    DataFrame ready for ``LayerCatalog.write_layer``."""
    from biggis_landuse_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    binaries = scan_geotiffs(spark, path)
    pixels = decode_to_pixels(binaries, decoder or GeoTiffDecoder())
    return retile_pixels(pixels, tile_size, layer)
