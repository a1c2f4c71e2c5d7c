"""GeoTiff ingest (SURVEY.md §2.1 S1/S2, §3.1): binary-file scan →
decode → re-tile to the fixed grid → layer write.

Reference pipeline (GeotiffTilingExample.scala:44-66): hadoopGeoTiffRDD
→ TileLayerMetadata.fromRDD → tileToLayout(256) → reproject →
writeRddToLayer. Spark-native restatement:

- scan: ``spark.read.format("binaryFile")`` — distributed, no driver
  I/O, predicate-prunable by path;
- decode: the pure-Python baseline TIFF codec (sources/tiff.py —
  stripped/tiled, none/deflate, int/float samples, GeoTIFF affine
  tags) runs inside ``mapInPandas`` (Arrow-batched) by default;
  ``GeoTiffDecoder`` stays pluggable so a rasterio/GDAL-backed
  decoder drops in where those libs exist (LZW/JPEG compression,
  exotic CRS metadata);
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

# max pixel rows per yielded pandas frame: each yield becomes ONE
# Arrow record batch on the Python→JVM hop, so an unbounded yield
# (a whole 8k² band = 64M rows ≈ multi-GB) exhausts the JVM's direct
# memory pool — found by the 8192²×4 scene e2e (r10). 512k rows ≈
# ~50 MB batches: sized so 32 concurrent emitting tasks (4 parallel
# band jobs × 8 row-band chunks) stay well inside the pool
_EMIT_ROWS = 1 << 19


def _emit_band_rows(arr: np.ndarray, y_base: int, fixed: dict):
    """Yield one band's pixels as row-bounded pandas frames."""
    bh, bw = arr.shape
    step = max(1, _EMIT_ROWS // max(1, bw))
    for y in range(0, bh, step):
        seg = arr[y : y + step]
        sh = seg.shape[0]
        ys, xs = np.mgrid[y_base + y : y_base + y + sh, 0:bw]
        yield pd.DataFrame(
            {
                "path": fixed["path"],
                "band": fixed["band"],
                "py": ys.ravel(),
                "px": xs.ravel(),
                "value": seg.ravel(),
                "width": bw,
                "height": fixed["height"],
                **fixed.get("geo", {}),
            }
        )


class GeoTiffDecoder:
    """Default decode step: the pure-Python baseline TIFF codec
    (sources/tiff.py). Subclass to plug in rasterio/GDAL where those
    libs exist — needed for LZW/JPEG compression or exotic metadata
    the baseline codec deliberately refuses (TiffFormatError).

    ``ifd`` (r10, VERDICT r9 #2) selects which image of a multi-IFD
    file to decode: 0 (default) is the full-resolution IFD0 — ingest
    always selects it — and higher indexes reach stored COG overviews
    or multi-page archive pages (see sources.tiff.tiff_pages and
    :func:`ingest_geotiff_overviews`)."""

    def __init__(self, ifd: int = 0) -> None:
        self.ifd = ifd

    def decode(self, path: str, payload: bytes):
        """→ list of (height, width) float64 arrays, one per band."""
        from biggis_landuse_spark.sources.tiff import decode_tiff

        return decode_tiff(payload, ifd=self.ifd)

    def georef(self, path: str, payload: bytes):
        """Model-space affine of the file: (x0, y0, dx, dy) = top-left
        coords + positive cell sizes (GeoTIFF ModelPixelScale/
        ModelTiepoint; rasterio equivalent: transform.c, transform.f,
        transform.a, -transform.e)."""
        from biggis_landuse_spark.sources.tiff import georef_of

        return georef_of(payload)

    def decode_rows(self, path: str, payload: bytes, y0: int, y1: int):
        """→ per-band (y1−y0, width) arrays for one row band — the
        partial-decode hook chunked ingest fans out over. The baseline
        codec decompresses only the segments intersecting the band;
        subclasses without a partial path should override with a
        decode-then-slice fallback (still correct, just not
        cost-proportional)."""
        from biggis_landuse_spark.sources.tiff import decode_tiff

        return decode_tiff(payload, ifd=self.ifd, rows=(y0, y1))


class RasterioDecoder(GeoTiffDecoder):
    """Optional C-backed fast path (r8, VERDICT r7 #5): decode through
    rasterio/GDAL when the library is importable. The pure-Python
    baseline codec is correct but ~single-digit MB/s/core on
    LZW/JPEG segments (measured, tools/codec_throughput.py +
    SCALING.md); GDAL decodes the same formats at hundreds of MB/s.
    Output contract is IDENTICAL to GeoTiffDecoder — per-band float64
    (height, width) arrays and the (x0, y0, dx, dy) affine — pinned by
    the parity test on the shared fixtures
    (tests/test_geotiff_fastpath.py, env-gated on rasterio).
    Construction raises ImportError when rasterio is missing; use
    :func:`best_decoder` to auto-select."""

    def __init__(self) -> None:
        import rasterio  # noqa: F401 — fail fast at plug time

    def _open(self, payload: bytes):
        import rasterio
        from rasterio.io import MemoryFile

        return rasterio, MemoryFile(payload)

    def decode(self, path: str, payload: bytes):
        _, mem = self._open(payload)
        with mem as m, m.open() as src:
            return [
                src.read(b + 1).astype("float64")
                for b in range(src.count)
            ]

    def georef(self, path: str, payload: bytes):
        _, mem = self._open(payload)
        with mem as m, m.open() as src:
            t = src.transform
            return (t.c, t.f, t.a, -t.e)

    def decode_rows(self, path: str, payload: bytes, y0: int, y1: int):
        import rasterio

        _, mem = self._open(payload)
        with mem as m, m.open() as src:
            win = rasterio.windows.Window(0, y0, src.width, y1 - y0)
            return [
                src.read(b + 1, window=win).astype("float64")
                for b in range(src.count)
            ]


def best_decoder() -> GeoTiffDecoder:
    """Auto-select the decode step: rasterio/GDAL when importable
    (the C fast path — same outputs, parity-tested), else the
    pure-Python baseline codec. Callers that need a SPECIFIC codec
    behavior (e.g. the honest-bounds TiffFormatError taxonomy)
    should instantiate GeoTiffDecoder directly."""
    try:
        return RasterioDecoder()
    except ImportError:
        return GeoTiffDecoder()


class PageBandDecoder(GeoTiffDecoder):
    """Band-per-page archive decode (r11, VERDICT r10 #5): a
    multi-page TIFF whose pages each carry one band stacks into ONE
    multiband image — the GeoTrellis ``hadoopMultibandGeoTiffRDD``
    reader surface (MultibandGeotiffTilingExample.scala:59) for
    page-organized archives. IFD0 plus every non-reduced page IFD
    contributes its band(s) in chain order; reduced-resolution IFDs
    (COG overviews) are skipped — those are pyramid levels, not bands
    (ingest them via ``ingest_geotiff_overviews``). Plugs into
    ``ingest_geotiff(decoder=...)`` / the CLI ``--pages-as-bands``
    flag; georeferencing comes from IFD0 (the COG convention)."""

    def _band_ifds(self, payload: bytes):
        from biggis_landuse_spark.sources.tiff import tiff_pages

        return [p for p in tiff_pages(payload) if not p["reduced"]]

    def _stack(self, payload: bytes, pages, decode_one):
        from biggis_landuse_spark.sources.tiff import TiffFormatError

        bands: list[np.ndarray] = []
        shape = None
        for p in pages:
            arrs = decode_one(p["index"])
            for a in arrs:
                if shape is None:
                    shape = a.shape
                elif a.shape != shape:
                    raise TiffFormatError(
                        "page-band stack: page "
                        f"{p['index']} is {a.shape}, expected {shape} — "
                        "pages of a band-per-page archive must share "
                        "the full-resolution grid"
                    )
                bands.append(a)
        return bands

    def decode(self, path: str, payload: bytes):
        from biggis_landuse_spark.sources.tiff import decode_tiff

        return self._stack(
            payload,
            self._band_ifds(payload),
            lambda i: decode_tiff(payload, ifd=i),
        )

    def decode_rows(self, path: str, payload: bytes, y0: int, y1: int):
        from biggis_landuse_spark.sources.tiff import decode_tiff

        return self._stack(
            payload,
            self._band_ifds(payload),
            lambda i: decode_tiff(payload, ifd=i, rows=(y0, y1)),
        )


class FakeRampDecoder(GeoTiffDecoder):
    """Deterministic fake: interprets the first 8 bytes of the payload
    as (width, height) uint32 little-endian and synthesizes a ramp
    band — exercises the full plumbing without an image lib.

    For the georeferenced path, bytes 8..40 optionally carry the
    affine (x0, y0, dx, dy) as little-endian float64s."""

    def decode(self, path: str, payload: bytes):
        w = int.from_bytes(payload[0:4], "little")
        h = int.from_bytes(payload[4:8], "little")
        band = (np.arange(h * w, dtype=np.float64)).reshape(h, w)
        return [band]  # list of 2-D arrays, one per band

    def georef(self, path: str, payload: bytes):
        if len(payload) >= 40:
            x0, y0, dx, dy = np.frombuffer(payload[8:40], dtype="<f8")
            return float(x0), float(y0), float(dx), float(dy)
        return 0.0, 0.0, 1e-3, 1e-3

    def decode_rows(self, path: str, payload: bytes, y0: int, y1: int):
        # no partial path for the fake: decode-then-slice fallback
        return [b[y0:y1] for b in self.decode(path, payload)]


def scan_geotiffs(spark: SparkSession, path: str) -> DataFrame:
    """Distributed binary scan (S1/S2). Column pruning keeps payloads
    out of any plan that only needs paths/sizes. Non-raster sidecars
    that ride along in scene directories (.prj/.tfw georeference
    files, metadata XML/JSON/text) are filtered on the path — a
    pushed-down scan filter, cheaper and more permissive than an
    allowlist (fake test payloads and extensionless scenes still
    scan)."""
    df = spark.read.format("binaryFile").load(path)
    return df.where(
        ~F.lower(F.col("path")).rlike(
            r"\.(prj|proj4|tfw|wld|xml|json|txt|md)$"
        )
    )


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
                    yield from _emit_band_rows(
                        arr, 0,
                        {"path": r.path, "band": b,
                         "height": arr.shape[0]},
                    )

    return binaries.select("path", "content").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


GEOREF_SCHEMA = DECODED_SCHEMA + ", x0 double, y0 double, dx double, dy double"


def decode_to_pixels_georef(
    binaries: DataFrame, decoder: GeoTiffDecoder
) -> DataFrame:
    """Like decode_to_pixels, plus the per-file EPSG:4326 affine
    columns the WebMercator reprojection consumes
    (operators.reproject)."""

    def run(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            for r in pdf.itertuples(index=False):
                bands = decoder.decode(r.path, r.content)
                x0, y0, dx, dy = decoder.georef(r.path, r.content)
                geo = {"x0": x0, "y0": y0, "dx": dx, "dy": dy}
                for b, arr in enumerate(bands):
                    yield from _emit_band_rows(
                        arr, 0,
                        {"path": r.path, "band": b,
                         "height": arr.shape[0], "geo": geo},
                    )

    return binaries.select("path", "content").mapInPandas(
        run, schema=GEOREF_SCHEMA
    )


def _read_file_bytes(path: str) -> bytes:
    """Read one scene file by URI inside a kernel task. Supports the
    ``file:`` scheme binaryFile yields in local/shared-FS deployments;
    a remote-FS deployment plugs a pyarrow.fs/Hadoop range reader in
    here (one function, one contract)."""
    p = path
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    with open(p, "rb") as fh:
        return fh.read()


def decode_to_pixels_georef_chunked(
    spark: SparkSession,
    path: str,
    decoder: GeoTiffDecoder | None = None,
    chunk_rows: int = 1024,
) -> DataFrame:
    """Chunk-parallel variant of :func:`decode_to_pixels_georef` (r10:
    the scene-scale ingest fix). ``binaryFile`` rows are non-splittable,
    so the plain path decodes + explodes + warps EVERY pixel of a
    scene file in ONE task — a 4-file 8k² ingest keeps 4 of 32 cores
    busy. Here the unit of work is a ROW BAND: a metadata pre-scan
    reads each file's height, the driver plans ceil(h / chunk_rows)
    (path, y0, y1) slices (a handful of metadata-sized rows), and the
    kernel re-reads its file and decodes ONLY its band
    (``decoder.decode_rows`` — segment-pruned in the baseline codec),
    emitting pixels with GLOBAL row indexes. Downstream (warp,
    re-tile) is identical; parity with the unchunked path is pinned in
    tests/test_tiff_codec.py. The file re-read per chunk is page-cache
    cheap on a shared FS; the decode cost is band-proportional."""
    from biggis_landuse_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    decoder = decoder or GeoTiffDecoder()
    meta = (
        scan_geotiff_pages(spark, path)
        .where(F.col("ifd") == getattr(decoder, "ifd", 0))
        .select("path", "height")
        .collect()
    )
    if not meta:
        # non-TIFF payloads (fake-codec fixtures): fall back to the
        # per-file path — chunk planning needs the TIFF header
        return decode_to_pixels_georef(
            scan_geotiffs(spark, path), decoder
        )
    # mixed directory: files the pages scan could NOT parse as TIFF
    # (fake-codec fixtures beside real scenes) still decode through the
    # per-file path, unioned below — chunking is a plan optimization,
    # never a filter (parity with chunk_rows=None pinned in tests)
    binaries = scan_geotiffs(spark, path)
    tiff_paths = {r["path"] for r in meta}
    # path-only projection: binaryFile prunes `content`, so this is a
    # listing-cost job, not a re-read of the scene bytes
    all_paths = {r["path"] for r in binaries.select("path").collect()}
    leftover_paths = sorted(all_paths - tiff_paths)
    plan = [
        (r["path"], lo, min(lo + chunk_rows, r["height"]), r["height"])
        for r in meta
        for lo in range(0, r["height"], chunk_rows)
    ]
    chunks = spark.createDataFrame(
        plan, "path string, y0 int, y1 int, h int"
    ).repartition(len(plan))

    def run(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, bytes] = {}
        for pdf in batch_iter:
            for r in pdf.itertuples(index=False):
                if r.path not in cache:
                    cache.clear()  # hold at most one file per task
                    cache[r.path] = _read_file_bytes(r.path)
                payload = cache[r.path]
                bands = decoder.decode_rows(r.path, payload, r.y0, r.y1)
                gx0, gy0, gdx, gdy = decoder.georef(r.path, payload)
                geo = {"x0": gx0, "y0": gy0, "dx": gdx, "dy": gdy}
                for b, arr in enumerate(bands):
                    yield from _emit_band_rows(
                        arr, int(r.y0),
                        {"path": r.path, "band": b,
                         "height": int(r.h), "geo": geo},
                    )

    chunked = chunks.mapInPandas(run, schema=GEOREF_SCHEMA)
    if not leftover_paths:
        return chunked
    leftover = binaries.where(F.col("path").isin(leftover_paths))
    return chunked.unionByName(
        decode_to_pixels_georef(leftover, decoder)
    )


def retile_pixels(
    pixels: DataFrame,
    tile_size: int,
    layer: str,
    zoom: int = 0,
    n_bands: int | None = None,
) -> DataFrame:
    """Re-key decoded pixels onto the engine grid and assemble tiles
    (the tileToLayout analog — one shuffle on the tile key).

    ``n_bands=None`` lets the reassembly derive the band count from the
    decoded rows (max(band)+1 per tile), so multiband GeoTiffs keep all
    their bands (S2)."""
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
    return pixels_to_tiles(keyed, cols=tile_size, rows=tile_size, n_bands=n_bands)


def ingest_geotiff(
    spark: SparkSession,
    path: str,
    layer: str,
    tile_size: int = 256,
    decoder: GeoTiffDecoder | None = None,
    n_bands: int | None = None,
) -> DataFrame:
    """Full S1→S4 slice: scan → decode → re-tile. Returns the tile
    DataFrame ready for ``LayerCatalog.write_layer``."""
    from biggis_landuse_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    binaries = scan_geotiffs(spark, path)
    pixels = decode_to_pixels(binaries, decoder or GeoTiffDecoder())
    return retile_pixels(pixels, tile_size, layer, n_bands=n_bands)


PAGES_SCHEMA = (
    "path string, ifd int, width int, height int, n_bands int, "
    "bits int, compression int, reduced boolean, page boolean"
)


def scan_geotiff_pages(spark: SparkSession, path: str) -> DataFrame:
    """Per-file, per-IFD metadata of a scene directory (r10, VERDICT
    r9 #2): walks each TIFF's WHOLE IFD chain (sources.tiff.tiff_pages)
    so COG overview levels and multi-page archives are visible to
    planning — previously only IFD0 existed. Arrow-batched
    executor-side scan; non-TIFF payloads yield no rows (the scan
    directory may carry fake-codec fixtures or sidecars)."""
    from biggis_landuse_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    binaries = scan_geotiffs(spark, path)

    def run(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from biggis_landuse_spark.sources.tiff import (
            TiffFormatError,
            tiff_pages,
        )

        for pdf in batch_iter:
            for r in pdf.itertuples(index=False):
                try:
                    pages = tiff_pages(bytes(r.content))
                except (TiffFormatError, struct.error, KeyError,
                        IndexError):
                    # truncated / corrupt files can fail inside the
                    # raw struct unpacks while walking an untrusted
                    # next-IFD chain — one bad file must not fail the
                    # whole scene scan (it simply yields no pages)
                    continue
                yield pd.DataFrame(
                    [
                        {
                            "path": r.path,
                            "ifd": p["index"],
                            "width": p["width"],
                            "height": p["height"],
                            "n_bands": p["n_bands"],
                            "bits": p["bits"],
                            "compression": p["compression"],
                            "reduced": p["reduced"],
                            "page": p["page"],
                        }
                        for p in pages
                    ]
                )

    return binaries.select("path", "content").mapInPandas(
        run, schema=PAGES_SCHEMA
    )


def ingest_geotiff_overviews(
    spark: SparkSession,
    path: str,
    layer: str,
    catalog,
    base_zoom: int,
    tile_size: int = 256,
    crs: str | None = None,
) -> list[int]:
    """Bootstrap pyramid levels from STORED COG overviews instead of
    recomputing them (r10, VERDICT r9 #2 — the GeoTrellis multi-IFD
    reader surface): ingest IFD0 as ``base_zoom`` and every
    reduced-resolution IFD present in ALL scene files as successively
    coarser zooms (IFD i → base_zoom − i, the COG factor-2 ladder).
    Returns the zooms written, coarsest last — chain
    ``build_pyramid(catalog, layer, from_zoom=<coarsest>)`` for levels
    the file does not store. Equality with the computed pyramid is
    pinned in tests/test_tiff_codec.py for mean-2x2 overviews."""
    pages = scan_geotiff_pages(spark, path)
    n_files = pages.where(F.col("ifd") == 0).count()
    usable = [
        r["ifd"]
        for r in (
            pages.where(F.col("reduced") | (F.col("ifd") == 0))
            .groupBy("ifd")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") == n_files)
            .orderBy("ifd")
            .collect()
        )
    ]
    written: list[int] = []
    for i in usable:
        tiles = ingest_geotiff(
            spark, path, layer, tile_size=tile_size,
            decoder=GeoTiffDecoder(ifd=i),
        )
        zoom = base_zoom - i
        catalog.write_layer(
            tiles.select(
                "tile_col", "tile_row",
                F.lit(None).cast("timestamp").alias("ts"), "tile",
            ),
            layer,
            zoom,
            **({"crs": crs} if crs else {}),
        )
        written.append(zoom)
    return written


# ---------------------------------------------------------------------------
# Export (S7/S8): per-tile distributed write, or driver-side stitch
# ---------------------------------------------------------------------------


class GeoTiffEncoder:
    """Pluggable encode step (inverse of GeoTiffDecoder). The real
    implementation would call rasterio; the deterministic default
    packs a raw header + float64 band payload — a stand-in container
    format so the write path, partitioning and round-trip are real."""

    MAGIC = b"FGT1"  # fake-geotiff v1

    def encode(self, bands: list[np.ndarray]) -> bytes:
        h, w = bands[0].shape
        head = self.MAGIC + len(bands).to_bytes(2, "little")
        head += w.to_bytes(4, "little") + h.to_bytes(4, "little")
        return head + b"".join(np.ascontiguousarray(b, dtype="<f8").tobytes() for b in bands)

    def decode(self, payload: bytes) -> list[np.ndarray]:
        assert payload[:4] == self.MAGIC
        n = int.from_bytes(payload[4:6], "little")
        w = int.from_bytes(payload[6:10], "little")
        h = int.from_bytes(payload[10:14], "little")
        body = payload[14:]
        size = w * h * 8
        return [
            np.frombuffer(body[i * size : (i + 1) * size], dtype="<f8").reshape(h, w)
            for i in range(n)
        ]


class TiffEncoder(GeoTiffEncoder):
    """Real-.tif export encoder: per-tile payloads are valid deflate-
    compressed float64 GeoTIFF files readable by any TIFF reader
    (reference: per-tile executor-side writes,
    LayerToGeotiff.scala:100-113)."""

    def encode(self, bands: list[np.ndarray]) -> bytes:
        from biggis_landuse_spark.sources.tiff import encode_tiff

        return encode_tiff(bands, compression="deflate")

    def decode(self, payload: bytes) -> list[np.ndarray]:
        from biggis_landuse_spark.sources.tiff import decode_tiff

        return decode_tiff(payload)


MAX_STITCH_CELLS = 64_000_000  # 64M cells ≈ 512 MB float64 on the driver


def export_tiles(
    tiles: DataFrame,
    encoder: GeoTiffEncoder | None = None,
    tile_struct: str = "tile",
) -> DataFrame:
    """Per-tile export (S7 useStitching=false / S8): every tile becomes
    one encoded file payload, produced executor-side with mapInPandas —
    the distributed path that scales to any layer size (the reference
    wrote per-tile files from executors too, LayerToGeotiff.scala:100-113).
    Write the result with ``df.write`` (parquet/binary sink of choice).
    """
    from biggis_landuse_spark.shipping import ensure_package_shipped

    ensure_package_shipped(tiles.sparkSession)
    enc = encoder or GeoTiffEncoder()
    t = F.col(tile_struct)
    flat = tiles.select(
        "tile_col",
        "tile_row",
        t["cols"].alias("cols"),
        t["rows"].alias("rows"),
        t["bands"].alias("bands"),
    )

    def run(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            out = {"tile_col": [], "tile_row": [], "payload": [], "n_bytes": []}
            for r in pdf.itertuples(index=False):
                w, h = int(r.cols), int(r.rows)
                bands = [
                    np.array(
                        [np.nan if v is None else v for v in band],
                        dtype=np.float64,
                    ).reshape(h, w)
                    for band in r.bands
                ]
                payload = enc.encode(bands)
                out["tile_col"].append(int(r.tile_col))
                out["tile_row"].append(int(r.tile_row))
                out["payload"].append(payload)
                out["n_bytes"].append(len(payload))
            yield pd.DataFrame(out)

    return flat.mapInPandas(
        run, "tile_col int, tile_row int, payload binary, n_bytes int"
    )


def stitch_layer(
    tiles: DataFrame,
    tile_struct: str = "tile",
    band: int = 0,
    max_cells: int = MAX_STITCH_CELLS,
) -> "np.ndarray":
    """Driver-side mosaic of one band (S7 useStitching=true / A11).

    REFUSES unbounded collects: the reference's stitch driver-OOMs on
    large layers (its own ToDo, LayerToGeotiff.scala:73-74;
    GettingStarted.scala:70-71) — here a pre-flight agg computes the
    mosaic size and raises beyond ``max_cells`` (SURVEY.md §7.5.6).
    """
    t = F.col(tile_struct)
    ext = tiles.agg(
        F.min("tile_col").alias("c0"),
        F.max("tile_col").alias("c1"),
        F.min("tile_row").alias("r0"),
        F.max("tile_row").alias("r1"),
        F.max(t["cols"]).alias("tw"),
        F.max(t["rows"]).alias("th"),
    ).first()
    n_cells = (
        (ext["c1"] - ext["c0"] + 1) * ext["tw"]
        * (ext["r1"] - ext["r0"] + 1) * ext["th"]
    )
    if n_cells > max_cells:
        raise ValueError(
            f"stitch would materialize {n_cells} cells on the driver "
            f"(> {max_cells}); use export_tiles for the distributed path"
        )
    tw, th = ext["tw"], ext["th"]
    mosaic = np.full(
        ((ext["r1"] - ext["r0"] + 1) * th, (ext["c1"] - ext["c0"] + 1) * tw),
        np.nan,
    )
    rows = tiles.select(
        "tile_col", "tile_row", F.element_at(t["bands"], band + 1).alias("b")
    ).collect()
    for r in rows:
        arr = np.array(
            [np.nan if v is None else v for v in r["b"]], dtype=np.float64
        ).reshape(th, tw)
        y0 = (r["tile_row"] - ext["r0"]) * th
        x0 = (r["tile_col"] - ext["c0"]) * tw
        mosaic[y0 : y0 + th, x0 : x0 + tw] = arr
    return mosaic
