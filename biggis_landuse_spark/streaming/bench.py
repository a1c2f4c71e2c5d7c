"""Streaming micro-benchmark: rows/s through the engine's stateful
streaming operators, driven to completion with processAllAvailable.

VERDICT r7 #6: no streaming query was in the bench set, so a state-
store regression (a slow applyInPandasWithState kernel, a watermark
misconfiguration that balloons state) would have been invisible in
BENCH_r{N}.json. This module gives bench.py three deterministic legs:

- ``tumbling``: file-source event stream → tumbling_counts (window
  aggregation state)
- ``session``: same stream → session_counts (session-window state
  merge)
- ``tile_reassembly``: pixel stream → reassemble_tiles_stream
  (applyInPandasWithState custom state, Arrow-batched)
- ``tile_reassembly_scene`` (r9): the same operator at 256x256 tiles
  — the 16x16 leg is micro-batch-latency bound, so kernel
  regressions only show at real tile sizes (the r8 kernel ran 97x
  slower here; SCALING.md "Streaming reassembly profile")

Each leg synthesizes its input ONCE as K parquet files (K micro-
batches via maxFilesPerTrigger=1), runs the stream with a foreachBatch
count sink (full plan execution, no driver data collection), and
reports rows/s of source rows. Deterministic sizing — no rate source
clock dependency — so numbers are comparable round over round.

r12 (VERDICT r11 #3): every leg is min-of-2 with a fresh checkpoint
per run (pipeline_scene had this since r11; the window/reassembly legs
join the protocol — the first run of a leg pays stream-query setup,
and one loaded-scheduler window otherwise writes the round's number).
A ``canary_stream`` leg — a frozen stateless passthrough whose cost is
almost purely per-trigger machinery — rides along so box-load drift in
the stateful legs is machine-attributable (the batch suite's canary
discipline, applied to streaming).
"""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

EVENT_DDL = "user_id long, event_type string, value double, ts timestamp"
PIXEL_DDL = (
    "tile_col int, tile_row int, band int, px int, py int, "
    "value double, event_ts timestamp"
)


def _write_event_files(spark, src: str, n_rows: int, n_files: int) -> None:
    """n_rows synthetic events spread over n_files parquet files:
    200 users/row-mod (so session state holds hundreds of concurrent
    sessions, not a handful of giant merges), 4 event types, one
    event per 2 seconds of event time."""
    base = spark.range(n_rows).select(
        (F.col("id") % 200).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 4).cast("string")).alias(
            "event_type"
        ),
        ((F.col("id") % 97) * 1.5).alias("value"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 2).alias(
            "ts"
        ),
        (F.col("id") % n_files).alias("f"),
    )
    for i in range(n_files):
        base.where(F.col("f") == i).drop("f").coalesce(1).write.mode(
            "append"
        ).parquet(src)


def _write_pixel_files(
    spark, src: str, n_tiles: int, size: int, n_files: int
) -> None:
    """n_tiles complete size×size tiles, pixels shuffled across
    n_files so most tiles span micro-batches (real state carry)."""
    n_rows = n_tiles * size * size
    base = spark.range(n_rows).select(
        ((F.col("id") / (size * size)).cast("int") % 64).alias("tile_col"),
        ((F.col("id") / (size * size * 64)).cast("int")).alias("tile_row"),
        F.lit(0).alias("band"),
        ((F.col("id") % (size * size)) % size).cast("int").alias("px"),
        ((F.col("id") % (size * size)) / size).cast("int").alias("py"),
        (F.col("id") % 251).cast("double").alias("value"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") % 600)
        ).alias("event_ts"),
        # interleave: consecutive pixels land in different files, so
        # every tile needs cross-batch state before it completes
        (F.col("id") % n_files).alias("f"),
    )
    for i in range(n_files):
        base.where(F.col("f") == i).drop("f").coalesce(1).write.mode(
            "append"
        ).parquet(src)


def _min_of(runs: int, fn) -> dict:
    """Run a leg ``runs`` times (fresh checkpoint each — fn takes the
    attempt index) and keep the fastest (r12, VERDICT r11 #3): the
    first run of a leg pays stream-query setup + kernel JIT, and on a
    loaded box any single run can be inflated by scheduler noise. The
    same min-of-N steady-state protocol the batch suite has used since
    r8; pipeline_scene adopted it in r11, the window/reassembly legs
    join it now. The per-run methodology (same input files, same
    batching, full processAllAvailable drain) is unchanged."""
    return min((fn(i) for i in range(runs)), key=lambda r: r["sec"])


def _streaming_canary(spark: SparkSession, root: str) -> dict:
    """Pinned-plan micro-batch canary (r12, VERDICT r11 #3): a
    STATELESS passthrough stream over 4 tiny fixed files. Its cost is
    almost purely the per-trigger machinery (planning, offset/commit
    log, task scheduling) — the shared denominator of every stateful
    leg — so round-over-round drift here measures the BOX, not the
    engine's state kernels. Freeze this leg's code like the batch
    canaries."""
    src = f"{root}/canary_src"
    n_rows, n_files = 4000, 4
    base = spark.range(n_rows).select(
        (F.col("id") % 16).alias("user_id"),
        F.lit("c").alias("event_type"),
        F.col("id").cast("double").alias("value"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        (F.col("id") % n_files).alias("f"),
    )
    for i in range(n_files):
        base.where(F.col("f") == i).drop("f").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def one(i: int) -> dict:
        stream = (
            spark.readStream.schema(EVENT_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        sec = _drive(
            stream.select("user_id", "value"), f"{root}/ck_canary{i}", "append"
        )
        return {
            "rows": n_rows,
            "sec": round(sec, 3),
            "rows_per_sec": round(n_rows / sec),
        }

    return _min_of(2, one)


def _drive(stream_df, ckpt: str, mode: str = "update") -> float:
    """Run a streaming DataFrame to exhaustion through a foreachBatch
    count sink; return wall seconds. ``mode``: session-window and
    applyInPandasWithState plans require append; plain windowed
    aggregation benches as update (per-batch state emission)."""
    q = (
        stream_df.writeStream.foreachBatch(
            lambda df, _bid: (df.count(), None)[1]
        )
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .start()
    )
    t0 = time.perf_counter()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return time.perf_counter() - t0


def run_pipeline_scene(
    spark: SparkSession,
    n_tiles: int = 8,
    size: int = 256,
    n_chunks: int = 3,
    n_spool_parts: int = 4,
    stage: str = "full",
    n_state_parts: int = 4,
) -> dict:
    """End-to-end streaming pipe at scene tile size (r10, VERDICT r9
    #5): spool source → wire-format decode → stateful 256x256 tile
    reassembly → versioned exactly-once sink, as ONE streaming query.

    The reassembly-kernel legs above isolate the state operator; this
    leg measures the WHOLE pipe so the next bottleneck is a number,
    not a guess. The producer appends pixel messages (the reference's
    ``label;f1;SpatialKey(c,r);x;y`` wire format, band in label /
    value in f1) in ``n_chunks`` row-band slices with
    processAllAvailable between appends — every tile spans every
    micro-batch, so per-batch state round-trips are real. All message
    bytes are pre-encoded BEFORE the clock starts; the timed loop
    contains only file appends (the producer analog) + the pipe.

    ``stage`` trims the pipe for decomposition runs (recorded in
    SCALING.md): ``source`` = spool+decode only, ``reassemble`` = +
    stateful reassembly, ``full`` = + versioned sink.

    ``n_state_parts`` (r11, VERDICT r10 #2): state-store partition
    count = spark.sql.shuffle.partitions at the stream's FIRST batch
    (the checkpoint pins it). The fixture carries 8 tiles, so the
    session default of 32 meant 24 empty state tasks per stateful
    operator per micro-batch — each paying task scheduling plus an
    HDFS-state-store delta commit; 4 partitions (= the spool
    partition count, 2 tiles each) measured fastest (sweep: 2→61k,
    4→78k, 8→70k, 16→64k rows/s pre-binary-state). Disabling
    no-data micro-batches is safe here — the reassembly operator has
    no watermark/timeout semantics that need them; tiles emit on the
    data batch that completes them. At 100 TB the same sizing rule
    gives the opposite number: shuffle partitions track the in-flight
    tile count, then >> cores, never fewer. Both confs are restored
    after the run.
    """
    from biggis_landuse_spark.shipping import ensure_package_shipped
    from biggis_landuse_spark.sources.codecs import encode_sample
    from biggis_landuse_spark.sources.spool import (
        append_messages,
        atomic_appends,
        register_spool,
    )
    from biggis_landuse_spark.streaming.pixels import (
        reassemble_tiles_stream,
        stream_to_versioned,
    )
    from biggis_landuse_spark.versioning import VersionedLayerStore

    # reassembly kernels need the package on worker paths; the spool
    # source additionally needs BY-VALUE pickling (register_spool) —
    # addPyFile never reaches the driver-side stream-runner process
    ensure_package_shipped(spark)
    register_spool(spark)
    root = tempfile.mkdtemp(prefix="pipe_scene_")
    n_px = n_tiles * size * size
    rows_per_chunk_band = size // n_chunks
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(n_state_parts))
    spark.conf.set(
        "spark.sql.streaming.noDataMicroBatches.enabled", "false"
    )
    try:
        spool = f"{root}/spool"
        import os

        os.makedirs(spool)
        # pre-encode every chunk's messages driver-side (producer prep,
        # off the clock): chunk = a horizontal band of every tile, so
        # no tile can complete before the last chunk arrives
        msgs = spark.range(n_px).select(
            encode_sample(
                label=F.lit(0.0),
                features=F.array((F.col("id") % 251).cast("double")),
                tile_col=(F.col("id") / (size * size)).cast("int"),
                tile_row=F.lit(0),
                px=(F.col("id") % size).cast("int"),
                py=((F.col("id") % (size * size)) / size).cast("int"),
            ).alias("value"),
            F.least(
                ((F.col("id") % (size * size)) / size / rows_per_chunk_band)
                .cast("int"),
                F.lit(n_chunks - 1),
            ).alias("chunk"),
            ((F.col("id") / (size * size)).cast("int") % n_spool_parts)
            .alias("part"),
        )
        chunks: dict[tuple[int, int], list[str]] = {}
        for r in msgs.collect():
            chunks.setdefault((r["chunk"], r["part"]), []).append(r["value"])

        lines = (
            spark.readStream.format("spool").option("path", spool).load()
        )
        from biggis_landuse_spark.sources.kafka import decode_stream

        px = decode_stream(lines).select(
            "tile_col",
            "tile_row",
            F.col("label").cast("int").alias("band"),
            "px",
            "py",
            F.element_at("features", 1).alias("value"),
            F.timestamp_seconds(F.lit(1_700_000_000)).alias("event_ts"),
        )
        if stage == "source":
            out_stream, mode = px, "append"
        else:
            out_stream = reassemble_tiles_stream(px, cols=size, rows=size)
            mode = "append"
        if stage == "full":
            store = VersionedLayerStore(spark, f"{root}/store")
            writer = stream_to_versioned(
                out_stream, store, "scene", cols=size, rows=size,
                checkpoint=f"{root}/ck",
            )
        else:
            writer = (
                out_stream.writeStream.foreachBatch(
                    lambda df, _bid: (df.count(), None)[1]
                )
                .option("checkpointLocation", f"{root}/ck")
                .outputMode(mode)
            )
        q = writer.start()
        t0 = time.perf_counter()
        try:
            for c in range(n_chunks):
                # wave-atomic: all partitions of a chunk land in ONE
                # micro-batch (the producer-transaction analog) — a
                # trigger racing the four appends otherwise fragments
                # the wave into extra batches, each paying the full
                # per-trigger tax
                with atomic_appends(spool):
                    for p in range(n_spool_parts):
                        append_messages(spool, p, chunks.get((c, p), []))
                q.processAllAvailable()
        finally:
            q.stop()
        sec = time.perf_counter() - t0
        result = {
            "rows": n_px,
            "sec": round(sec, 3),
            "rows_per_sec": round(n_px / sec),
            "stage": stage,
        }
        if stage == "full":
            result["versions_committed"] = len(store.versions("scene", 0))
        return result
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", old_nodata
        )
        shutil.rmtree(root, ignore_errors=True)


def run_streaming_bench(
    spark: SparkSession,
    n_events: int = 60_000,
    n_tiles: int = 64,
    tile_size: int = 16,
    n_files: int = 4,
) -> dict:
    """Run the three legs; return {leg: {rows, sec, rows_per_sec}}."""
    from biggis_landuse_spark.streaming.pixels import (
        reassemble_tiles_stream,
    )
    from biggis_landuse_spark.streaming.windows import (
        session_counts,
        tumbling_counts,
    )

    root = tempfile.mkdtemp(prefix="stream_bench_")
    out: dict[str, dict] = {}
    # r11: state partitions sized to the legs' key cardinality
    # (hundreds of window/session keys, 8-64 tiles) instead of the
    # session's 32 — same rationale + sweep as run_pipeline_scene.
    # No-data micro-batches stay ENABLED for the window legs (their
    # append-mode emission is watermark-driven) and are disabled only
    # inside run_pipeline_scene, whose operator needs none.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        ev_src = f"{root}/events"
        _write_event_files(spark, ev_src, n_events, n_files)

        def ev_stream():
            return (
                spark.readStream.schema(EVENT_DDL)
                .option("maxFilesPerTrigger", 1)
                .parquet(ev_src)
            )

        out["canary_stream"] = _streaming_canary(spark, root)

        def ev_leg(builder, mode: str, tag: str):
            def one(i: int) -> dict:
                sec = _drive(builder(ev_stream()), f"{root}/ck_{tag}{i}", mode)
                return {
                    "rows": n_events,
                    "sec": round(sec, 3),
                    "rows_per_sec": round(n_events / sec),
                }

            return _min_of(2, one)

        out["tumbling"] = ev_leg(tumbling_counts, "update", "tumble")
        out["session"] = ev_leg(session_counts, "append", "session")

        px_src = f"{root}/pixels"
        n_px = n_tiles * tile_size * tile_size
        _write_pixel_files(spark, px_src, n_tiles, tile_size, n_files)

        def tile_leg(i: int) -> dict:
            px_stream = (
                spark.readStream.schema(PIXEL_DDL)
                .option("maxFilesPerTrigger", 1)
                .parquet(px_src)
            )
            tiles = reassemble_tiles_stream(
                px_stream, cols=tile_size, rows=tile_size
            )
            sec = _drive(tiles, f"{root}/ck_tiles{i}", "append")
            return {
                "rows": n_px,
                "sec": round(sec, 3),
                "rows_per_sec": round(n_px / sec),
            }

        out["tile_reassembly"] = _min_of(2, tile_leg)

        # scene-tile leg (r9, VERDICT r8 #5): 8 tiles of 256x256 — the
        # tile size real scenes ship. The 16x16 leg above is micro-
        # batch-latency bound (4 batches x ~1.2 s floor, whatever the
        # kernel costs); THIS leg is kernel-bound, where the r9 dense-
        # state numpy-scatter rewrite measured 97x over the r8 dict +
        # per-element map_from_arrays densify (1.2k -> 114k rows/s;
        # SCALING.md "Streaming reassembly profile").
        px2_src = f"{root}/pixels_scene"
        n_px2 = 8 * 256 * 256
        _write_pixel_files(spark, px2_src, 8, 256, n_files)

        def scene_leg(i: int) -> dict:
            px2_stream = (
                spark.readStream.schema(PIXEL_DDL)
                .option("maxFilesPerTrigger", 1)
                .parquet(px2_src)
            )
            tiles2 = reassemble_tiles_stream(px2_stream, cols=256, rows=256)
            sec = _drive(tiles2, f"{root}/ck_tiles_scene{i}", "append")
            return {
                "rows": n_px2,
                "sec": round(sec, 3),
                "rows_per_sec": round(n_px2 / sec),
            }

        out["tile_reassembly_scene"] = _min_of(2, scene_leg)

        # whole-pipe leg (r10, VERDICT r9 #5): spool source → decode →
        # stateful reassembly → versioned sink in one streaming query.
        # min-of-2 after a first run that doubles as warmup (r11): the
        # first pipe of a session pays stream-query setup + kernel JIT
        # (~3 s at this fixture), which the per-query protocol already
        # excludes everywhere else in this harness
        runs = [run_pipeline_scene(spark) for _ in range(2)]
        out["pipeline_scene"] = min(runs, key=lambda r: r["sec"])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(root, ignore_errors=True)
    return out
