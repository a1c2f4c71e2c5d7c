"""Windowed stream aggregation builders (tumbling / sliding / session)
with watermark-driven late-data handling.

Each builder takes any DataFrame — streaming or batch — and returns the
same logical plan; batch runs give the oracle-checkable parity results
(queries/events.py), streaming runs the incremental ones. That batch ≡
stream equivalence is the engine's testing contract for §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None):
    return df.withWatermark(ts_col, watermark) if df.isStreaming and watermark else df


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "5 minutes",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Tumbling window × keys: count + sum(value). Late rows beyond the
    watermark are dropped by the engine (streaming) / included (batch
    reprocessing) — the documented late-data policy."""
    df = _with_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n",
            "sum_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    df = _with_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "n", "avg_value")
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: tuple[str, ...] = ("user_id",),
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Session windows (gap-based). Streaming uses the native
    session_window state; the batch twin is the lag+cumsum form
    (queries/events.py::sessionize)."""
    df = _with_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-per-key admission within the watermark horizon:
    duplicates arriving inside the state retention window are dropped
    (streaming dropDuplicates keeps state per key until the watermark
    passes)."""
    df = _with_watermark(events, ts_col, watermark)
    return df.dropDuplicates([*keys, ts_col])


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on: list,
    how: str = "inner",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    live event stream.

    The static side is broadcast to every task and re-resolved per
    micro-batch — no stream-side state, no shuffle of the stream. This
    is the Structured Streaming form of the reference's broadcast
    model/metadata pattern (SVMMultiClass.scala:25-32 broadcasts the
    trained model to a mapPartitions predict). Works identically on a
    batch DataFrame, which is what the oracle-checked batch twin
    (queries/events.py::stream_enrich_segment) runs.
    """
    from pyspark.sql import functions as F

    return events.join(F.broadcast(dim), on, how)


def join_streams_within(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "60 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream equi-join bounded by an event-time interval:
    rows pair when they share ``key`` and ``right_ts`` lies within
    [left_ts - within, left_ts + within].

    Both sides carry watermarks, and the interval condition is what
    lets the engine EXPIRE state: a buffered left row can only ever
    match right rows inside its interval, so once the right watermark
    passes ``left_ts + within`` the row is dropped from the state
    store. Without the time bound the join would buffer both streams
    forever — the unbounded-state trap the reference's sketched
    Kafka pipeline never addressed (SURVEY.md §2.9). State size is
    O(rate × (watermark + within)), independent of stream length.

    The same call on two batch DataFrames gives the parity oracle
    (an ordinary range join — operators/temporal.py territory).
    """
    lw = _with_watermark(left, left_ts, watermark)
    rw = _with_watermark(right, right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= F.col(left_ts) - F.expr(f"INTERVAL {within}"))
        & (rw[right_ts] <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond).select(
        lw[key].alias(key), F.col(left_ts), F.col(right_ts)
    )
