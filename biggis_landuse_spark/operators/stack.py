"""Layer stacking with CRS/zoom alignment guards.

Reference: ManyLayersToMultibandLayer.scala — createLayerStack
(:233-259) reads every layer at a common zoom (findFinestZoom :183-188
takes the MAX finest zoom) and, when a layer's CRS disagrees with the
accumulating stack, reprojects it onto the stack's grid before
stack2MBlayers concatenates bands (:244-249). Without that branch a
tile-key inner join silently stacks disjoint grids into an empty or
garbage result.

This engine's equivalents:

- zoom mismatch → real alignment: the layer is read at its finest
  stored zoom below the common level and zoom-resampled up
  (operators.resample.zoom_resample, exact 2^dz grid nesting of the
  WebMercator zoomed layout). Scale shape: the resample is a per-tile
  narrow map + one exchange on the new key — no driver work.
- CRS mismatch → typed error (CrsMismatchError). Every georeferenced
  ingest path here normalizes onto the EPSG:3857 zoomed layout
  (operators.reproject.ingest_geotiff_webmercator), so two catalog
  layers with different grid CRSs means at least one is a raw
  pixel-gridded layer whose tiles carry no georeference — there is
  nothing to warp FROM, and the reference's RDD.reproject has no
  input either in that situation. The error names both CRSs and the
  re-ingest fix instead of silently joining disjoint grids.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class LayerAlignmentError(ValueError):
    """A stack input cannot be aligned onto the common grid."""


class CrsMismatchError(LayerAlignmentError):
    """Grid CRSs disagree and no georeferenced warp is possible."""


class ZoomMismatchError(LayerAlignmentError):
    """No stored zoom level can be aligned to the common zoom."""


def read_layer_aligned(
    cat,
    layer: str,
    zoom: int,
    ref_crs: str,
    method: str = "nearest",
    auto_align: bool = True,
) -> DataFrame:
    """Read ``layer`` on the (``ref_crs``, ``zoom``) grid, resampling
    from a coarser stored level when needed (reference behavior:
    createLayerStack reads at commonZoom and reprojects on mismatch,
    ManyLayersToMultibandLayer.scala:233-259).

    With ``auto_align=False`` any mismatch raises instead — the strict
    mode for pipelines that pre-align on ingest and want drift caught.
    """
    from biggis_landuse_spark.operators.resample import zoom_resample

    crs = cat.layer_crs(layer, None)
    if crs != ref_crs:
        raise CrsMismatchError(
            f"layer {layer!r} grid CRS {crs!r} != stack CRS {ref_crs!r}: "
            "catalog tiles carry no georeference to warp from — re-ingest "
            "the layer onto the common grid "
            "(ingest_geotiff_webmercator; ref ManyLayersToMultibandLayer"
            ".scala:244-249 reprojects here because GeoTrellis metadata "
            "retains the source grid, which a raw pixel-grid layer does not)"
        )
    zooms = sorted(z for (l, z) in cat.layer_ids() if l == layer)
    if not zooms:
        raise KeyError(f"layer not found: {layer}")
    if zoom in zooms:
        return cat.read_layer(layer, zoom)
    below = [z for z in zooms if z < zoom]
    if not below or not auto_align:
        detail = (
            f"stored zooms {zooms} have no level <= {zoom} to resample from"
            if not below
            else f"auto_align=False and zoom {zoom} not stored (has {zooms})"
        )
        raise ZoomMismatchError(
            f"layer {layer!r}: {detail}; build the level (build_pyramid / "
            "zoom_resample) or ingest at the common zoom"
        )
    src = max(below)
    tiles = cat.read_layer(layer, src)
    out = zoom_resample(
        tiles.withColumn("zoom", F.lit(src)), dz=zoom - src, method=method
    )
    return out


def stack_layers(
    cat,
    layer_names: list[str],
    zoom: int | None = None,
    method: str = "nearest",
    auto_align: bool = True,
) -> DataFrame:
    """N-way band stack on a common aligned grid — the guarded form of
    the plain tile-key join (reference createLayerStack + stack2MBlayers,
    ManyLayersToMultibandLayer.scala:194-259).

    ``zoom=None`` uses the max finest zoom across inputs (reference
    findFinestZoom). The first layer's CRS is the stack CRS. Returns
    (layer, zoom, tile_col, tile_row, tile) with bands concatenated in
    input order. The join stays a co-partitioned equi-join on the tile
    key; alignment work happens per mismatched input only.
    """
    from biggis_landuse_spark.operators.local import band_concat

    if not layer_names:
        raise ValueError("stack_layers needs at least one layer")
    if zoom is None:
        zoom = max(cat.finest_zoom(n) for n in layer_names)
    ref_crs = cat.layer_crs(layer_names[0], None)
    frames = [
        read_layer_aligned(cat, name, zoom, ref_crs, method, auto_align)
        .select("tile_col", "tile_row", F.col("tile").alias(f"_t{i}"))
        for i, name in enumerate(layer_names)
    ]
    joined = reduce(lambda a, b: a.join(b, ["tile_col", "tile_row"]), frames)
    tile = reduce(
        lambda acc, i: band_concat(acc, F.col(f"_t{i}")),
        range(1, len(layer_names)),
        F.col("_t0"),
    )
    return joined.select(
        F.lit("stack").alias("layer"),
        F.lit(zoom).alias("zoom"),
        "tile_col",
        "tile_row",
        tile.alias("tile"),
    )
