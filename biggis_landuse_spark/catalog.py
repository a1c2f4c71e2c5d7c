"""Layer catalog: Parquet-backed tile storage + metadata/attribute tables.

Replaces the reference's HDFS AttributeStore + Avro layer
readers/writers + SFC index (api/package.scala:62-385):

- ``{base}/tiles/layer=<name>/zoom=<z>/part-*.parquet`` — tile rows,
  hive-partitioned by (layer, zoom) so reads prune partitions, sorted
  within files by a Z-order (Morton) key over (tile_col, tile_row) so
  Parquet row-group min/max stats prune spatial ranges — the exact
  role of the reference's ZCurveKeyIndexMethod (api/package.scala:143).
- ``{base}/layers/`` — one metadata row per (layer, zoom)
  (TileLayerMetadata analog, inferred from the data at write time like
  TileLayerMetadata.fromRDD, GeotiffTilingExample.scala:50).
- ``{base}/attributes/`` — JSON attribute store rows
  (Utils.writeHistogram / readHistogram analog, Utils.scala:78-89).

Scale: writes never collect tiles; metadata inference is one small agg
job; deletes drop whole partition directories.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biggis_landuse_spark.model import ATTRIBUTE_SCHEMA, LAYER_META_SCHEMA

# serializes the read-modify-write metadata/attribute upserts so
# concurrent per-layer ingest jobs (operators.reproject.
# ingest_layers_webmercator) can share one catalog safely
_META_LOCK = threading.RLock()

Z_BITS = 16


def zorder_key(col: str = "tile_col", row: str = "tile_row") -> F.Column:
    """Morton (Z-curve) interleave of two 16-bit keys (O2, SFC write
    order) — a pure column expression, codegen'd; no custom Catalyst
    work (SURVEY.md §4.1)."""
    terms = " + ".join(
        f"(shiftleft(CAST((shiftright({col}, {i}) & 1) AS BIGINT), {2 * i}) + "
        f"shiftleft(CAST((shiftright({row}, {i}) & 1) AS BIGINT), {2 * i + 1}))"
        for i in range(Z_BITS)
    )
    return F.expr(terms)


def with_hilbert_key(
    df: DataFrame,
    col: str = "tile_col",
    row: str = "tile_row",
    out: str = "_hk",
    bits: int = Z_BITS,
) -> DataFrame:
    """Append the Hilbert-curve index of (col, row) on a 2^bits grid —
    the reference's `HilbertKeyIndexMethod` key order
    (api/package.scala:152-164); `zorder_key` is the engine's default
    (documented-equivalent range pruning), this is the exact-parity
    alternative.

    The classic quadrant-recursive descent (MSB → LSB: consume the top
    bit of each axis, reduce into the quadrant, reflect+transpose on
    the lower two quadrants) expressed as ONE STAGED PROJECTION PER
    BIT LEVEL. The state (x, y) feeds the next level through several
    references, so a single closed-form expression would grow 4^bits
    nodes; per-level projections keep the plan linear in `bits` and
    each stage inside whole-stage codegen — the same staging
    discipline as the warp families (BASELINE.md r6 note). Hilbert
    beats Z-order on range-query locality (no long diagonal jumps),
    identical cost at write time: still a pure column pipeline feeding
    repartitionByRange.
    """
    x, y = "_hx", "_hy"
    df = (
        df.withColumn(x, F.col(col).cast("long"))
        .withColumn(y, F.col(row).cast("long"))
        .withColumn(out, F.lit(0).cast("long"))
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        df = (
            df.withColumn("_rx", F.expr(f"CAST(({x} & {s}) > 0 AS BIGINT)"))
            .withColumn("_ry", F.expr(f"CAST(({y} & {s}) > 0 AS BIGINT)"))
            .withColumn(
                out,
                F.expr(
                    f"{out} + CAST({s} AS BIGINT) * {s}"
                    f" * ((3 * _rx) ^ _ry)"
                ),
            )
            # reduce into the quadrant, then reflect+transpose the
            # lower-left (rx=0,ry=0) and lower-right (rx=1,ry=0) cases
            .withColumn("_qx", F.expr(f"{x} & {s - 1}"))
            .withColumn("_qy", F.expr(f"{y} & {s - 1}"))
            .withColumn(
                x,
                F.expr(
                    f"CASE WHEN _ry = 0 THEN"
                    f" (CASE WHEN _rx = 1 THEN {s - 1} - _qy ELSE _qy END)"
                    f" ELSE _qx END"
                ),
            )
            .withColumn(
                y,
                F.expr(
                    f"CASE WHEN _ry = 0 THEN"
                    f" (CASE WHEN _rx = 1 THEN {s - 1} - _qx ELSE _qx END)"
                    f" ELSE _qy END"
                ),
            )
        )
    return df.drop("_hx", "_hy", "_rx", "_ry", "_qx", "_qy")


class LayerCatalog:
    """Catalog service over a base directory (local FS or HDFS/S3 URI)."""

    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base = base.rstrip("/")
        self.tiles_path = f"{self.base}/tiles"
        self.layers_path = f"{self.base}/layers"
        self.attributes_path = f"{self.base}/attributes"

    # -- write -------------------------------------------------------------

    def write_layer(
        self,
        tiles: DataFrame,
        layer: str,
        zoom: int,
        crs: str = "EPSG:3857",
        target_files: int | None = None,
        index_method: str = "zorder",
    ) -> None:
        """Write a tile DataFrame as (layer, zoom), globally SFC-ordered
        across ``target_files`` files, and upsert the inferred
        metadata row.

        ``index_method``: "zorder" (default, Morton interleave) or
        "hilbert" (locality-equivalent Hilbert keying — the same
        disjoint-file-range write contract and range locality as the
        reference's HilbertKeyIndexMethod, api/package.scala:152; the
        reference's uzaygezen compact-Hilbert index values generally
        differ in curve orientation from the classic xy2d transform
        used here, and the keys are internal sort keys, so index-value
        parity is neither claimed nor needed).

        Reference: writeRddToLayer (api/package.scala:130-180) = SFC
        index + Avro write + histogram attribute; here the SFC is a
        sort key and the histogram is a one-pass agg stored as JSON.

        The write range-partitions on the SFC key (default
        ``defaultParallelism`` output files): every task writes a
        disjoint, sorted key range, so (a) the write parallelizes — a
        plain repartition(layer, zoom) would funnel the whole layer
        through ONE task at 100 TB — and (b) file- and row-group-level
        min/max stats on the key stay non-overlapping, which is what
        makes spatial-range reads prune files like the reference's
        Z-curve index ranges (api/package.scala:143).
        """
        keyed = tiles.withColumn("layer", F.lit(layer)).withColumn(
            "zoom", F.lit(zoom)
        )
        # space-time layers (SpaceTimeKey analog, api/package.scala:
        # 152-164 HilbertKeyIndexMethod(1)): time-major, Z-curve within
        # each instant, so Parquet row-group min/max stats prune BOTH a
        # time-range filter and a spatial-range filter. Spatial-only
        # layers (ts all NULL) keep the pure Z-order.
        if index_method == "hilbert":
            keyed = with_hilbert_key(keyed, out="_zk")
        elif index_method == "zorder":
            keyed = keyed.withColumn("_zk", zorder_key())
        else:
            raise ValueError(
                f"index_method must be 'zorder' or 'hilbert', got "
                f"{index_method!r}"
            )
        sort_keys = ["ts", "_zk"] if "ts" in keyed.columns else ["_zk"]
        n_files = (
            target_files
            if target_files is not None
            else self.spark.sparkContext.defaultParallelism
        )
        # repartitionByRange needs a range-SAMPLING pass before the
        # write pass, so an unmaterialized input executes its whole
        # upstream plan twice — for the lazy ingest chain (chunked
        # decode → warp → reassembly) that was most of scene-ingest
        # wall time (r10, found by the 4-band scene e2e: 21-30 s per
        # band of which ~5 s is the chain run once). Persist spills to
        # local disk past memory, trading one extra local IO pass for
        # a full recompute — the same trade at 1000 executors.
        from pyspark import StorageLevel

        keyed = keyed.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            (
                keyed.repartitionByRange(n_files, "layer", "zoom", *sort_keys)
                .sortWithinPartitions(*sort_keys)
                .drop("_zk")
                .write.mode("overwrite")
                .partitionBy("layer", "zoom")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(self.tiles_path)
            )
        finally:
            keyed.unpersist()
        # metadata + histogram read BACK from the written parquet
        # (r8, found by the scene-scale e2e): computing them from the
        # input relation re-executed the whole upstream pipeline —
        # with the lazy ingest chain (decode → warp → reassembly)
        # that made one write_layer cost ~4 full passes (range-
        # partitioner sampling + write + metadata + histogram). The
        # written layer is byte-identical input for both, and the
        # post-write scans are cheap columnar reads.
        written = self.read_layer(layer, zoom).withColumn(
            "layer", F.lit(layer)
        ).withColumn("zoom", F.lit(zoom))
        meta = self._infer_metadata(written, layer, zoom, crs)
        self._upsert_layer_row(meta)
        self.write_attribute(
            layer, zoom, "histogramData", self._histogram_json(written)
        )

    def _infer_metadata(
        self, tiles: DataFrame, layer: str, zoom: int, crs: str
    ) -> dict:
        t = F.col("tile")
        row = (
            tiles.agg(
                F.min("tile_col").alias("key_col_min"),
                F.max("tile_col").alias("key_col_max"),
                F.min("tile_row").alias("key_row_min"),
                F.max("tile_row").alias("key_row_max"),
                F.first(t["cols"]).alias("tile_cols"),
                F.first(t["rows"]).alias("tile_rows"),
                F.first(t["cell_type"]).alias("cell_type"),
                F.max(F.size(t["bands"])).alias("n_bands"),
            )
        ).first()
        return {
            "layer": layer,
            "zoom": zoom,
            "cell_type": row["cell_type"],
            "crs": crs,
            "n_bands": row["n_bands"],
            "tile_cols": row["tile_cols"],
            "tile_rows": row["tile_rows"],
            "layout_cols": row["key_col_max"] - row["key_col_min"] + 1,
            "layout_rows": row["key_row_max"] - row["key_row_min"] + 1,
            "key_col_min": row["key_col_min"],
            "key_col_max": row["key_col_max"],
            "key_row_min": row["key_row_min"],
            "key_row_max": row["key_row_max"],
            "extent": None,
        }

    def _histogram_json(self, tiles: DataFrame, n_buckets: int = 16) -> str:
        """Layer histogram attribute (reference: rdd.histogram written
        at zoom 0, api/package.scala:146).

        Bounds and counts come from the SAME all-band pixel relation,
        so multiband layers get true lo/hi (not band-0-only clamps).
        """
        t = F.col("tile")
        values = (
            tiles.select(F.explode(t["bands"]).alias("b"))
            .select(F.explode("b").alias("v"))
            .where(F.col("v").isNotNull())
        )
        bounds = values.agg(
            F.min("v").alias("lo"), F.max("v").alias("hi")
        ).first()
        lo, hi = bounds["lo"], bounds["hi"]
        if lo is None or hi is None or hi == lo:
            return json.dumps({"lo": lo, "hi": hi, "counts": []})
        step = (hi - lo) / n_buckets
        counts = (
            values
            .groupBy(
                F.least(
                    F.greatest(
                        F.floor((F.col("v") - F.lit(lo)) / F.lit(step)), F.lit(0)
                    ),
                    F.lit(n_buckets - 1),
                ).alias("bucket")
            )
            .count()
            .orderBy("bucket")
            .collect()
        )
        return json.dumps(
            {
                "lo": lo,
                "hi": hi,
                "counts": [[int(r["bucket"]), int(r["count"])] for r in counts],
            }
        )

    def _upsert_layer_row(self, meta: dict) -> None:
        # the metadata upsert is a read-modify-write of a tiny table:
        # the ONE part of write_layer that is not safe under
        # concurrent per-layer ingest jobs (the data writes commit
        # disjoint (layer, zoom) partitions through per-job dynamic-
        # overwrite staging dirs). Serialize it process-wide.
        with _META_LOCK:
            new_row = self._local_df([meta], LAYER_META_SCHEMA)
            existing = self.layers()
            merged = existing.where(
                ~((F.col("layer") == meta["layer"])
                  & (F.col("zoom") == meta["zoom"]))
            ).unionByName(new_row)
            self._rewrite_small_table(
                merged, self.layers_path, LAYER_META_SCHEMA
            )

    def _rewrite_small_table(self, df: DataFrame, path: str, schema) -> None:
        rows = df.collect()  # metadata tables are tiny by construction
        out = self._local_df(rows, schema)
        out.coalesce(1).write.mode("overwrite").parquet(path)

    def _local_df(self, rows: list, schema) -> DataFrame:
        """Tiny driver-local rows → DataFrame via the Arrow/pandas
        path (session.local_df). A plain ``createDataFrame(list)``
        plans a PYTHON RDD scan, so every metadata write paid ~4.5 s
        of Python-worker spin-up for a one-row table (r10, found
        profiling scene ingest: upsert + attribute write cost more
        than the layer write itself); the pandas route converts
        through Arrow into a JVM-local relation — 0.15 s."""
        from biggis_landuse_spark.session import local_df

        return local_df(self.spark, rows, schema)

    # -- read --------------------------------------------------------------

    def layers(self) -> DataFrame:
        if not self._exists(self.layers_path):
            return self.spark.createDataFrame([], schema=LAYER_META_SCHEMA)
        return self.spark.read.parquet(self.layers_path)

    def layer_ids(self) -> list[tuple[str, int]]:
        """All (layer, zoom) pairs (reference: attributeStore.layerIds,
        api/package.scala:108-122)."""
        return [
            (r["layer"], r["zoom"])
            for r in self.layers().select("layer", "zoom").collect()
        ]

    def finest_zoom(self, layer: str) -> int:
        """Reference: zoomsOfLayer ... maxBy(_.zoom)
        (NDVILayerExample.scala:95-103)."""
        row = (
            self.layers()
            .where(F.col("layer") == layer)
            .agg(F.max("zoom").alias("z"))
            .first()
        )
        if row is None or row["z"] is None:
            raise KeyError(f"layer not found: {layer}")
        return row["z"]

    def layer_crs(self, layer: str, zoom: int | None = None) -> str:
        """Grid CRS recorded for (layer, zoom) — zoom=None means any
        level (one layer keeps one grid CRS across its pyramid). The
        stacking alignment check reads this (reference:
        tilesmerged.metadata.crs != tiles.metadata.crs,
        ManyLayersToMultibandLayer.scala:244)."""
        sel = self.layers().where(F.col("layer") == layer)
        if zoom is not None:
            sel = sel.where(F.col("zoom") == zoom)
        row = sel.select("crs").first()
        if row is None:
            raise KeyError(f"layer not found: {layer}")
        return row["crs"]

    def read_layer(
        self,
        layer: str,
        zoom: int | None = None,
        band: int | None = None,
        time_range: tuple | None = None,
    ) -> DataFrame:
        """Partition-pruned read of one (layer, zoom); optional band
        selection (reference: readRddFromLayer band coercion,
        api/package.scala:189-308) and, for space-time layers, a
        ``time_range=(start, end)`` half-open filter — pushed to the
        parquet scan, where the time-major write order makes it a
        row-group-pruning range predicate (the Hilbert-index read path,
        api/package.scala:225-245)."""
        if zoom is None:
            zoom = self.finest_zoom(layer)
        df = self.spark.read.parquet(self.tiles_path).where(
            (F.col("layer") == layer) & (F.col("zoom") == zoom)
        )
        if time_range is not None:
            start, end = time_range
            df = df.where(
                (F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end))
            )
        if band is not None:
            from biggis_landuse_spark.operators.local import band_select

            df = df.withColumn("tile", band_select(F.col("tile"), band))
        return df

    # -- delete ------------------------------------------------------------

    def delete_layer(self, layer: str, zoom: int | None = None) -> None:
        """Drop one zoom or all zooms of a layer, including metadata and
        attributes (S5; reference: deleteLayerFromCatalog /
        deleteZoomLevelFromLayer, api/package.scala:67-102)."""
        zooms = (
            [zoom]
            if zoom is not None
            else [z for (l, z) in self.layer_ids() if l == layer]
        )
        for z in zooms:
            self._delete_dir(f"{self.tiles_path}/layer={layer}/zoom={z}")
        if zoom is None:
            # leftover dirs, like the reference
            self._delete_dir(f"{self.tiles_path}/layer={layer}")
        keep = ~(
            (F.col("layer") == layer)
            & (F.col("zoom").isin(zooms) if zoom is not None else F.lit(True))
        )
        self._rewrite_small_table(
            self.layers().where(keep), self.layers_path, LAYER_META_SCHEMA
        )
        if self._exists(self.attributes_path):
            self._rewrite_small_table(
                self.attributes().where(keep), self.attributes_path, ATTRIBUTE_SCHEMA
            )

    # -- merge (layer update) ----------------------------------------------

    def merge_into_layer(self, update: DataFrame, layer: str, zoom: int) -> None:
        """Merge an update into an existing layer: full-outer join on the
        tile key, cell-level coalesce(existing, update) — Delta MERGE
        semantics built from join + overwrite (reference:
        mergeRddIntoLayer, api/package.scala:328-385)."""
        from biggis_landuse_spark.operators.local import tile_merge

        existing = self.read_layer(layer, zoom).select(
            "tile_col", "tile_row", F.col("tile").alias("t_old")
        )
        upd = update.select(
            "tile_col", "tile_row", F.col("tile").alias("t_new")
        )
        merged = existing.join(upd, ["tile_col", "tile_row"], "full_outer").select(
            "tile_col",
            "tile_row",
            F.lit(None).cast("timestamp").alias("ts"),
            F.when(
                F.col("t_old").isNotNull() & F.col("t_new").isNotNull(),
                tile_merge(F.col("t_old"), F.col("t_new")),
            )
            .otherwise(F.coalesce("t_old", "t_new"))
            .alias("tile"),
        )
        # stage to a temp dir (never read+overwrite the same partition),
        # then rewrite the layer from the staged result — scales to any
        # layer size, no driver collect
        tmp = f"{self.base}/_staging/{layer}/{zoom}"
        merged.write.mode("overwrite").parquet(tmp)
        staged = self.spark.read.parquet(tmp)
        self.write_layer(staged, layer, zoom)
        self._delete_dir(f"{self.base}/_staging")

    def compact_layer(
        self, layer: str, zoom: int, target_files: int = 1
    ) -> None:
        """Rewrite a layer partition into ``target_files`` globally
        Z-ordered files.

        Incremental ingest (streaming foreachBatch merges, repeated
        merge_into_layer calls) accretes small files; at scale, scan
        cost and open-file overhead grow with file count while min/max
        pruning degrades as key ranges overlap. Compaction re-sorts
        once and restores the write-time layout contract (disjoint
        sorted key ranges per file). Same staging discipline as merge:
        never read and overwrite a partition in one job.
        """
        meta = (
            self.layers()
            .where((F.col("layer") == layer) & (F.col("zoom") == zoom))
            .select("crs")
            .first()
        )
        current = self.read_layer(layer, zoom)
        tmp = f"{self.base}/_staging/compact/{layer}/{zoom}"
        current.write.mode("overwrite").parquet(tmp)
        staged = self.spark.read.parquet(tmp)
        self.write_layer(
            staged,
            layer,
            zoom,
            crs=meta["crs"] if meta else "EPSG:3857",
            target_files=target_files,
        )
        self._delete_dir(f"{self.base}/_staging")

    # -- attributes (S19) ---------------------------------------------------

    def write_attribute(self, layer: str, zoom: int, name: str, payload: str) -> None:
        with _META_LOCK:
            new_row = self._local_df(
                [{"layer": layer, "zoom": zoom, "name": name,
                  "json": payload}],
                ATTRIBUTE_SCHEMA,
            )
            merged = self.attributes().where(
                ~(
                    (F.col("layer") == layer)
                    & (F.col("zoom") == zoom)
                    & (F.col("name") == name)
                )
            ).unionByName(new_row)
            self._rewrite_small_table(
                merged, self.attributes_path, ATTRIBUTE_SCHEMA
            )

    def attributes(self) -> DataFrame:
        if not self._exists(self.attributes_path):
            return self.spark.createDataFrame([], schema=ATTRIBUTE_SCHEMA)
        return self.spark.read.parquet(self.attributes_path)

    def read_attribute(self, layer: str, zoom: int, name: str) -> str | None:
        rows = (
            self.attributes()
            .where(
                (F.col("layer") == layer)
                & (F.col("zoom") == zoom)
                & (F.col("name") == name)
            )
            .select("json")
            .collect()
        )
        return rows[0]["json"] if rows else None

    # -- util ---------------------------------------------------------------

    def _hadoop_path(self, path: str):
        """Resolve a path through the Hadoop FileSystem API so every
        catalog op works on any supported scheme (local FS, HDFS, S3A),
        not just os.path-reachable local paths."""
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, p

    def _exists(self, path: str) -> bool:
        fs, p = self._hadoop_path(path)
        return bool(fs.exists(p))

    def _delete_dir(self, path: str) -> None:
        fs, p = self._hadoop_path(path)
        if fs.exists(p):
            fs.delete(p, True)
