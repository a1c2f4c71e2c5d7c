"""Tile-serving layer (SURVEY.md §2.1 S18): color-map rendering +
indexed point lookup — the engine-side half of the reference's
spray/akka tile server (ServeLayerAsMap.scala:97-124).

The reference serves ``GET /{zoom}/{x}/{y}`` by an indexed single-tile
read (HadoopValueReader, ServeLayerAsMap.scala:33,111), renders with a
10-quantile color map (:88-94), and returns PNG bytes. Here:

- class breaks: exact percentiles via the quantile_breaks query (A3)
  or ``approx_breaks`` (percentile_approx) for the 100 TB path;
- ``color_map_expr``: value → RGBA via a CASE-WHEN bucket chain —
  pure Catalyst, codegen'd, usable over whole layers (bulk render),
  not just per-request;
- ``render_tile_png``: grayscale/paletted PNG bytes per tile via a
  stdlib-only encoder (zlib + struct — no image libraries needed)
  inside ``mapInPandas``;
- ``lookup_tile``: the ms-latency point read. Spark is the wrong tool
  for per-request reads (SURVEY.md §1.3) — this goes straight to the
  partition-pruned parquet path with filters on the Z-order key
  range, which is exactly what the catalog's sorted layout indexes;
  an HTTP frontend would cache these.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# default 10-class color ramp (hex RGBA), analog of the reference's
# ColorRamps usage in ServeLayerAsMap.scala:88-94
DEFAULT_PALETTE = (
    0x30123BFF, 0x4458CBFF, 0x3E9BFEFF, 0x18D6CBFF, 0x46F884FF,
    0xA2FC3CFF, 0xE1DD37FF, 0xFDA531FF, 0xEF5A11FF, 0x7A0403FF,
)


def approx_breaks(
    df: DataFrame, value_col: str, n_classes: int = 10, rel_err: float = 0.001
) -> list[float]:
    """Class breaks via approxQuantile — single pass, mergeable sketch,
    the scale path for layer-wide statistics (vs the exact
    percentile_disc of the quantile_breaks oracle query)."""
    qs = [i / n_classes for i in range(1, n_classes)]
    return df.approxQuantile(value_col, qs, rel_err)


def color_map_expr(
    value: Column | str,
    breaks: Sequence[float],
    palette: Sequence[int] = DEFAULT_PALETTE,
) -> Column:
    """value → 32-bit RGBA by class bucket (NULL value → transparent 0).

    A CASE-WHEN chain over sorted breaks: len(breaks) = len(palette)-1.
    Pure Catalyst expression — bulk-renders whole layers in codegen;
    the reference could only render per-request on the server.
    """
    assert len(palette) == len(breaks) + 1, "palette must be breaks+1"
    col = F.col(value) if isinstance(value, str) else value
    expr = F.lit(int(palette[-1]))
    # build from the last class backwards: value <= breaks[i] → palette[i]
    for b, rgba in zip(reversed(breaks), reversed(palette[:-1])):
        expr = F.when(col <= F.lit(float(b)), F.lit(int(rgba))).otherwise(expr)
    return F.when(col.isNull(), F.lit(0)).otherwise(expr).cast("long")


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png_rgba(width: int, height: int, rgba_rows: bytes) -> bytes:
    """Minimal RGBA8 PNG encoder — stdlib only (zlib/struct).

    ``rgba_rows`` is height*width*4 bytes, row-major. Each scanline is
    prefixed with filter byte 0 (None) before deflate.
    """
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    raw = b"".join(
        b"\x00" + rgba_rows[y * width * 4 : (y + 1) * width * 4]
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


RENDERED_SCHEMA = StructType(
    [
        StructField("tile_col", IntegerType()),
        StructField("tile_row", IntegerType()),
        StructField("png", BinaryType()),
        StructField("png_bytes", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def render_tiles_png(
    tiles: DataFrame,
    breaks: Sequence[float],
    palette: Sequence[int] = DEFAULT_PALETTE,
    tile_struct: str = "tile",
    band: int = 0,
) -> DataFrame:
    """Bulk tile → PNG render: color-map JVM-side, then PNG-encode the
    RGBA ints in an Arrow-batched mapInPandas (stdlib zlib only).

    The expensive classification work (bucket search per pixel) stays
    in codegen via ``color_map_expr`` applied with ``transform``; the
    Python stage only packs bytes + deflates.
    """
    from biggis_landuse_spark.shipping import ensure_package_shipped

    ensure_package_shipped(tiles.sparkSession)
    t = F.col(tile_struct)
    colored = tiles.select(
        "tile_col",
        "tile_row",
        t["cols"].alias("cols"),
        t["rows"].alias("rows"),
        F.transform(
            F.element_at(t["bands"], band + 1),
            lambda v: color_map_expr(v, breaks, palette),
        ).alias("rgba"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "tile_col": [],
                "tile_row": [],
                "png": [],
                "png_bytes": [],
                "checksum": [],
            }
            for r in pdf.itertuples(index=False):
                w, h = int(r.cols), int(r.rows)
                buf = b"".join(
                    struct.pack(">I", int(v) & 0xFFFFFFFF) for v in r.rgba
                )
                png = encode_png_rgba(w, h, buf)
                out["tile_col"].append(int(r.tile_col))
                out["tile_row"].append(int(r.tile_row))
                out["png"].append(png)
                out["png_bytes"].append(len(png))
                out["checksum"].append(zlib.crc32(png))
            yield pd.DataFrame(out)

    return colored.mapInPandas(run, RENDERED_SCHEMA)


def lookup_tile(
    catalog, layer: str, zoom: int, x: int, y: int
) -> DataFrame:
    """Indexed point read for ``GET /{zoom}/{x}/{y}``.

    Partition pruning on (layer, zoom) + min/max row-group pruning on
    the Z-ordered (tile_col, tile_row) sort — the catalog's analog of
    the reference's SFC value reader (ServeLayerAsMap.scala:33).
    """
    return catalog.read_layer(layer, zoom).where(
        (F.col("tile_col") == x) & (F.col("tile_row") == y)
    )


class TileServer:
    """HTTP tile server: ``GET /{zoom}/{x}/{y}`` → rendered PNG —
    functional parity with the reference's spray/akka actor route
    (ServeLayerAsMap.scala:97-124), stdlib-only.

    Per SURVEY.md §1.3, Spark is the wrong engine for per-request
    ms-latency reads, so the server renders the requested zoom ONCE in
    bulk (one Spark job over the partition-pruned layer read, PNG
    encoding executor-side via render_tiles_png) and serves from an
    in-process dict — the 'small in-process cache over the same
    Parquet' design. Unrendered zooms are rendered on first request.
    A size guard refuses zooms whose tile count exceeds
    ``max_cached_tiles`` (driver-OOM posture: the reference's stitch
    paths crash there, LayerToGeotiff.scala:73-78).
    """

    def __init__(
        self,
        catalog,
        layer: str,
        breaks: Sequence[float],
        palette: Sequence[int] = DEFAULT_PALETTE,
        max_cached_tiles: int = 65536,
    ):
        self.catalog = catalog
        self.layer = layer
        self.breaks = list(breaks)
        self.palette = list(palette)
        self.max_cached_tiles = max_cached_tiles
        self._cache: dict[tuple[int, int, int], bytes] = {}
        self._zooms_loaded: set[int] = set()
        self._httpd = None
        import threading

        self._render_lock = threading.Lock()

    def _ensure_zoom(self, zoom: int) -> None:
        # double-checked under a lock: concurrent first requests for a
        # zoom must run the bulk Spark render exactly once, not once
        # per request thread (ThreadingHTTPServer serves concurrently)
        if zoom in self._zooms_loaded:
            return
        with self._render_lock:
            if zoom in self._zooms_loaded:
                return
            self._render_zoom(zoom)

    def _render_zoom(self, zoom: int) -> None:
        tiles = self.catalog.read_layer(self.layer, zoom)
        n = tiles.count()
        if n > self.max_cached_tiles:
            raise MemoryError(
                f"zoom {zoom} has {n} tiles > cache bound "
                f"{self.max_cached_tiles}; raise the bound or serve "
                "from a KV sink"
            )
        rendered = render_tiles_png(tiles, self.breaks, self.palette)
        for r in rendered.select("tile_col", "tile_row", "png").collect():
            self._cache[(zoom, r["tile_col"], r["tile_row"])] = bytes(
                r["png"]
            )
        self._zooms_loaded.add(zoom)

    def lookup(self, zoom: int, x: int, y: int) -> bytes | None:
        self._ensure_zoom(zoom)
        return self._cache.get((zoom, x, y))

    def start(self, port: int = 0) -> int:
        """Start serving on ``port`` (0 → ephemeral); returns the
        bound port. Route: ``GET /{zoom}/{x}/{y}`` → image/png."""
        import http.server
        import re
        import threading

        server = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet test runs
                pass

            def do_GET(self):
                m = re.fullmatch(r"/(\d+)/(\d+)/(\d+)", self.path)
                if not m:
                    self.send_error(400, "expected /{zoom}/{x}/{y}")
                    return
                try:
                    png = server.lookup(*(int(g) for g in m.groups()))
                except Exception as exc:  # noqa: BLE001 — surface as 500
                    self.send_error(500, str(exc)[:100])
                    return
                if png is None:
                    self.send_error(404, "no tile")
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)

        self._httpd = http.server.ThreadingHTTPServer(
            ("127.0.0.1", port), Handler
        )
        threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        ).start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
