"""Per-band min-max normalization of multiband tile layers
(SURVEY.md §2.2 P5/P6).

Reference: ``UtilsSVM.NormalizeMultibandTile`` + ``findMinMaxDouble``
(UtilsSVM.scala:316-386): a reduce over per-band minima/maxima, then a
per-cell rescale to [0,1]; the class band (labels) is exempt.

DataFrame form: one agg over the exploded pixels (partial map-side
combine), broadcast back into a per-cell ``transform`` — the classic
two-phase agg+broadcast normalization; no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biggis_landuse_spark.pixeling import KEY_COLS, tiles_to_pixels


def band_min_max(tiles: DataFrame) -> DataFrame:
    """Global per-band (min, max) over data cells (P6)."""
    return (
        tiles_to_pixels(tiles)
        .where(F.col("value").isNotNull())
        .groupBy("band")
        .agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    )


def normalize_layer(tiles: DataFrame, skip_band: int | None = None) -> DataFrame:
    """Rescale every band to [0,1]; ``skip_band`` (the class band)
    passes through unchanged (reference bandNoClass handling,
    UtilsSVM.scala:331-340)."""
    stats = band_min_max(tiles).agg(
        F.map_from_entries(
            F.collect_list(
                F.struct("band", F.struct("vmin", "vmax").alias("mm"))
            )
        ).alias("mm_by_band")
    )
    t = F.col("tile")
    skip = -1 if skip_band is None else skip_band
    rescaled = F.expr(
        f"""
        transform(tile.bands, (band, b) ->
          CASE WHEN b = {skip} THEN band
               ELSE transform(band, x ->
                 CASE
                   WHEN x IS NULL THEN CAST(NULL AS DOUBLE)
                   WHEN mm_by_band[b].vmax = mm_by_band[b].vmin THEN 0.0D
                   ELSE (x - mm_by_band[b].vmin)
                      / (mm_by_band[b].vmax - mm_by_band[b].vmin)
                 END)
          END)
        """
    )
    return tiles.crossJoin(F.broadcast(stats)).select(
        *KEY_COLS,
        F.col("ts"),
        F.struct(
            t["cols"].alias("cols"),
            t["rows"].alias("rows"),
            F.lit("float64").alias("cell_type"),
            rescaled.alias("bands"),
        ).alias("tile"),
    )
