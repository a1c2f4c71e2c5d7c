"""Tile ⇄ pixel dual representation (SURVEY.md §7.1).

The reference's "pixeling" explodes tiles into per-pixel rows for ML
(``MultibandTile2LabeledPixelSamples``, UtilsML.scala:17-52;
TilePixelingExample.scala:63-72) and reassembles rows back into dense
tiles with a custom combiner (TilePixelingExample.scala:97-107).

Both directions here are pure built-in Spark SQL (posexplode one way;
map_from_entries + sequence/transform lookup the other) — whole-stage
codegen, no Python in the loop, and the reassembly tolerates sparse /
missing pixels by filling NULL (NODATA), which the reference's dense
ArrayBuffer combiner could not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KEY_COLS = ["layer", "zoom", "tile_col", "tile_row"]


def tiles_to_pixels(tiles: DataFrame, tile_col: str = "tile") -> DataFrame:
    """Explode a tile table into the pixel table (UDTF shape).

    One output row per (band, py, px) cell; NULL values preserved.
    """
    t = F.col(tile_col)
    per_band = tiles.select(
        *KEY_COLS,
        t["cols"].alias("cols"),
        F.posexplode(t["bands"]).alias("band", "pixels"),
    )
    return per_band.select(
        *KEY_COLS,
        F.col("band").cast("int").alias("band"),
        F.posexplode("pixels").alias("i", "value"),
        "cols",
    ).select(
        *KEY_COLS,
        "band",
        (F.col("i") % F.col("cols")).cast("int").alias("px"),
        (F.col("i") / F.col("cols")).cast("int").alias("py"),
        F.col("value").cast("double").alias("value"),
    )


def pixels_to_tiles(
    pixels: DataFrame,
    cols: int,
    rows: int,
    n_bands: int | None = None,
    cell_type: str = "float64",
) -> DataFrame:
    """Reassemble pixel rows into dense tiles (UDAF shape).

    groupBy tile key → collect (flat_index, value) entries → build the
    dense band-major array by indexed lookup; absent pixels become
    NULL (NODATA). Duplicate pixels resolve last-wins (Spark
    map_from_entries semantics), mirroring the reference combiner's
    overwrite behavior (RasterizeFeaturesRDD.scala:56-64).

    ``n_bands=None`` derives the band count GLOBALLY (max(band)+1 over
    the whole input, a 1-row broadcast) rather than per tile: a tile
    whose top band lost all its pixels to masking must still emit the
    same number of bands as its siblings, or downstream zip_with band
    ops silently misalign — the reference's multiband invariant
    (ManyLayersToMultibandLayer.scala:198-203).

    One shuffle on the tile key with map-side partial collect_list
    (plus, for n_bands=None, a tiny parallel max reduce).

    Assembly cost (r8, found by the scene-scale e2e): the previous
    form probed ``m[b*size + i]`` per cell — Spark's GetMapValue is a
    LINEAR scan of the map array, so a 256² tile with ~42k entries
    did ~2.7e9 comparisons PER TILE. The dense array now builds by
    sorting the (deduplicated) entries once and flattening explicit
    NULL gap runs between consecutive keys — O(m log m + N) per tile,
    still pure Catalyst expressions, and values are identical (the
    same map_from_entries last-wins dedup feeds the sort).
    """
    size = cols * rows
    per_tile = F.col("band") * size + F.col("py") * cols + F.col("px")
    entries = pixels.groupBy(*KEY_COLS).agg(
        F.array_sort(
            F.map_entries(
                F.map_from_entries(
                    F.collect_list(
                        F.struct(
                            per_tile.alias("k"), F.col("value").alias("v")
                        )
                    )
                )
            )
        ).alias("_s"),
    )
    if n_bands is None:
        gnb = pixels.agg((F.max("band") + 1).cast("int").alias("_gnb"))
        entries = entries.crossJoin(F.broadcast(gnb))
        hi_band = "_gnb - 1"
    else:
        hi_band = f"{n_bands - 1}"
    n_total = f"((({hi_band}) + 1) * {size})"
    # keys outside the addressable range never matched a lookup in
    # the old form; drop them before the positional fill
    s_valid = f"filter(_s, e -> e.key >= 0 AND e.key < {n_total})"
    fill = (
        "flatten(transform(_sv, (e, j) -> concat("
        "array_repeat(CAST(NULL AS DOUBLE), CAST(e.key - (CASE WHEN j = 0 "
        "THEN -1 ELSE element_at(_sv, j).key END) - 1 AS INT)), "
        "array(e.value))))"
    )
    dense = (
        f"CASE WHEN size(_sv) = 0 "
        f"THEN array_repeat(CAST(NULL AS DOUBLE), CAST({n_total} AS INT)) "
        f"ELSE concat({fill}, array_repeat(CAST(NULL AS DOUBLE), "
        f"CAST({n_total} - 1 - element_at(_sv, -1).key AS INT))) END"
    )
    staged = entries.withColumn("_sv", F.expr(s_valid)).withColumn(
        "_dense", F.expr(dense)
    )
    band_expr = (
        f"transform(sequence(0, {hi_band}), b -> "
        f"slice(_dense, b * {size} + 1, {size}))"
    )
    return staged.select(
        *KEY_COLS,
        F.lit(None).cast("timestamp").alias("ts"),
        F.struct(
            F.lit(cols).alias("cols"),
            F.lit(rows).alias("rows"),
            F.lit(cell_type).alias("cell_type"),
            F.expr(band_expr).alias("bands"),
        ).alias("tile"),
    )


def labeled_pixel_samples(
    pixels: DataFrame, label_band: int
) -> DataFrame:
    """Pivot the pixel table into ML sample rows: one row per pixel
    position with a ``features`` array (all bands except the label
    band) and a ``label`` (the label band's value).

    The relational face of UtilsML.MultibandTile2LabeledPixelSamples
    (UtilsML.scala:17-52): classBandNo selects the label band; the
    remaining bands are the feature vector.
    """
    assembled = (
        pixels.groupBy(*KEY_COLS, "px", "py")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("band"), F.col("value")))
            ).alias("by_band"),
            F.max("band").alias("max_band"),
        )
    )
    features = F.expr(
        f"transform(filter(sequence(0, max_band), b -> b != {label_band}), "
        f"b -> by_band[b])"
    )
    return assembled.select(
        *KEY_COLS,
        "px",
        "py",
        F.col("by_band").getItem(label_band).alias("label"),
        features.alias("features"),
    )


def tile_col_expr(cols: int, rows: int, cell_type: str, bands: Column) -> Column:
    """Build a tile struct column from a bands array column."""
    return F.struct(
        F.lit(cols).alias("cols"),
        F.lit(rows).alias("rows"),
        F.lit(cell_type).alias("cell_type"),
        bands.alias("bands"),
    )
