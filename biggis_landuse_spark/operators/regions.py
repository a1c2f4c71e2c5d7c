"""Distributed connected-component labeling (CCL) of classified
rasters — tile-local union-find + boundary-graph merge.

The scale design for "label every contiguous same-class pixel region
in a 100 TB scene": a naive formulation runs min-label propagation
over the FULL pixel adjacency graph (every pixel is a node in every
round). Here pixels shuffle ONCE (groupBy tile); each tile labels
itself locally with a union-find (per-partition imperative logic —
the applyInPandas carve-out); and the iterative component merge runs
only on the TILE-BOUNDARY adjacency graph, which is a perimeter/area
fraction (~4/tile_size) of the pixel count. Final labels broadcast
back onto the pixel relation. Canonical labels (min pixel id of the
whole region, id = gy*width+gx) are identical to the naive
formulation's — equality is test-enforced against both the
whole-graph path and a BFS reference (tests/test_regions.py), and the
oracle-checked registry query ``raster_region_labels`` runs THIS
path.

GeoTrellis ships region grouping as a local-mode-only operation
(RegionGroup); this is the distributed form of it.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biggis_landuse_spark.functions.graph import connected_components

_LABELED_SCHEMA = "gx long, gy long, cls int, label long"


def _label_tile_factory(width: int):
    """Union-find labeling of one tile's pixels. Runs executor-side
    over Arrow batches; a tile is at most tile_size² pixels, so the
    Python cost is bounded per group regardless of scene size."""

    def label_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        gxs = pdf["gx"].to_numpy()
        gys = pdf["gy"].to_numpy()
        cls = pdf["cls"].to_numpy()
        n = len(pdf)
        idx = {(int(gxs[i]), int(gys[i])): i for i in range(n)}
        parent = list(range(n))

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        def union(i: int, j: int) -> None:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)

        for i in range(n):
            x, y, c = int(gxs[i]), int(gys[i]), cls[i]
            for nb in ((x - 1, y), (x, y - 1)):
                j = idx.get(nb)
                if j is not None and cls[j] == c:
                    union(i, j)
        best: dict[int, int] = {}
        for i in range(n):
            r = find(i)
            pid = int(gys[i]) * width + int(gxs[i])
            if r not in best or pid < best[r]:
                best[r] = pid
        out = pdf[["gx", "gy", "cls"]].copy()
        out["label"] = [best[find(i)] for i in range(n)]
        return out

    return label_tile


def _boundary_edges(
    labeled: DataFrame, tile_size: int, axes: Iterable[str] = ("gx", "gy")
) -> DataFrame:
    """Cross-tile same-class adjacencies as a (src, dst) LABEL edge
    list. Only pairs whose east/south step crosses a tile boundary are
    generated (intra-tile adjacencies were already unioned locally),
    so the relation is ~perimeter-sized: |pixels| * 2/tile_size."""
    edges = None
    for axis in axes:
        other = "gy" if axis == "gx" else "gx"
        a = labeled.where(
            F.pmod(F.col(axis), F.lit(tile_size)) == tile_size - 1
        ).alias("a")
        b = labeled.where(F.pmod(F.col(axis), F.lit(tile_size)) == 0).alias("b")
        e = a.join(
            b,
            (F.col(f"a.{axis}") + 1 == F.col(f"b.{axis}"))
            & (F.col(f"a.{other}") == F.col(f"b.{other}"))
            & (F.col("a.cls") == F.col("b.cls")),
        ).select(F.col("a.label").alias("src"), F.col("b.label").alias("dst"))
        edges = e if edges is None else edges.union(e)
    return edges.where(F.col("src") != F.col("dst"))


def label_regions(
    px: DataFrame, width: int, tile_size: int = 64
) -> DataFrame:
    """Label maximal 4-connected same-class regions of a pixel
    relation (gx, gy, cls) → (gx, gy, cls, region_id).

    ``region_id`` is canonical: the minimum pixel id (gy*width+gx) of
    the whole region, independent of tiling. Pipeline: ONE shuffle
    groups pixels by tile; union-find labels each tile locally;
    :func:`connected_components` (pointer jumping, localCheckpoint)
    merges labels across tiles on the boundary-only edge list; the
    label→region map is component-count-sized and joins back onto the
    labeled pixels (broadcast when it fits — AQE decides from
    observed size).
    """
    keyed = px.select(
        F.col("gx").cast("long").alias("gx"),
        F.col("gy").cast("long").alias("gy"),
        F.col("cls").cast("int").alias("cls"),
        F.floor(F.col("gx") / tile_size).alias("_tx"),
        F.floor(F.col("gy") / tile_size).alias("_ty"),
    )
    labeled = keyed.groupBy("_tx", "_ty").applyInPandas(
        _label_tile_factory(width), schema=_LABELED_SCHEMA
    )
    # `labeled` feeds three consumers (both _boundary_edges sides and
    # the final join-back); without a cut the Python union-find stage
    # and its upstream shuffle would re-execute per consumer.
    # localCheckpoint materializes it once and truncates the lineage —
    # same lifecycle the pointer-jumping rounds below already use.
    labeled = labeled.localCheckpoint()
    merge = connected_components(_boundary_edges(labeled, tile_size))
    return labeled.join(
        merge, labeled.label == merge.node, "left"
    ).select(
        "gx",
        "gy",
        "cls",
        F.coalesce(F.col("component"), F.col("label")).alias("region_id"),
    )
