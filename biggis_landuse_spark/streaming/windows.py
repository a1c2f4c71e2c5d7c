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


_STREAM_JOIN_HOW = ("inner", "left_outer", "right_outer", "full_outer")


def join_streams_within(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "60 seconds",
    watermark: str = "10 minutes",
    how: str = "inner",
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

    ``how`` extends the same state machine to the outer variants
    (left_outer / right_outer / full_outer): an unmatched buffered row
    is emitted null-padded at the moment the opposite watermark closes
    its interval — so outer results are late by up to
    ``watermark + within``, never wrong. Inner pairs still emit on
    match.

    The same call on two batch DataFrames gives the parity oracle
    (an ordinary range join — operators/temporal.py territory).
    """
    if how not in _STREAM_JOIN_HOW:
        raise ValueError(
            f"how={how!r} not supported; one of {_STREAM_JOIN_HOW}"
        )
    # qualified aliases keep the join unambiguous even when both
    # sides derive from the same source DataFrame (self-join lineage)
    lw = _with_watermark(left, left_ts, watermark).alias("_ssl")
    rw = _with_watermark(right, right_ts, watermark).alias("_ssr")
    lk, rk = F.col(f"_ssl.{key}"), F.col(f"_ssr.{key}")
    lt, rt = F.col(f"_ssl.{left_ts}"), F.col(f"_ssr.{right_ts}")
    cond = (
        (lk == rk)
        & (rt >= lt - F.expr(f"INTERVAL {within}"))
        & (rt <= lt + F.expr(f"INTERVAL {within}"))
    )
    # coalesce the key: outer rows carry it only on their own side
    return lw.join(rw, cond, how).select(
        F.coalesce(lk, rk).alias(key),
        lt.alias(left_ts),
        rt.alias(right_ts),
    )
