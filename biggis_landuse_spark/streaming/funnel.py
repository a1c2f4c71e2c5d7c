"""Stateful streaming funnel: the per-user ordered view → click →
purchase state machine, advanced incrementally across micro-batches.

The batch twin (queries/events.py::funnel_stages) recomputes stage
times from the full log; here ``applyInPandasWithState`` keeps ONE
tiny state row per user — (first qualifying view ts, first qualifying
click ts) — and emits a completion record the moment a purchase lands
after both. State is O(active users), not O(events): exactly the
bounded-state discipline of the tile reassembly (streaming/pixels.py),
applied to behavioral analytics. An optional processing-time TTL
clears users idle past the horizon, so abandoned funnels cannot
accrete state forever.

Each micro-batch's rows are sorted by event time before the state
machine consumes them (bounded by the batch, never the stream), so
arbitrary intra-batch delivery order cannot corrupt stage ordering;
across batches the state row carries the progress forward.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("t1", DoubleType()),  # epoch s of first view
        StructField("t2", DoubleType()),  # epoch s of first click > t1
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t1_us", LongType()),
        StructField("t2_us", LongType()),
        StructField("t3_us", LongType()),
    ]
)


def funnel_completions_stream(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    timeout_ms: int | None = None,
) -> DataFrame:
    """event stream (user_id, event_type, ts) → completion stream
    (user_id, t1_us, t2_us, t3_us), one row per user at the moment the
    ordered funnel closes.

    ``timeout_ms`` enables the processing-time TTL that drops idle
    users' state (leave None for finite batch-parity runs — Spark
    keeps scheduling micro-batches while any timeout is pending)."""
    from biggis_landuse_spark.shipping import ensure_package_shipped

    ensure_package_shipped(events.sparkSession)
    use_timeout = timeout_ms is not None

    def advance(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # abandoned funnel: drop the state row
            return
        t1, t2 = state.get if state.exists else (None, None)
        # sort this batch's rows by event time (see module docstring)
        pending = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                pending.append((getattr(r, ts_col).timestamp(), r.event_type))
        pending.sort()
        rows = []
        for ts, et in pending:
            if et == "view" and (t1 is None or ts < t1):
                t1 = ts
                if t2 is not None and t2 <= t1:
                    t2 = None  # click no longer after the view
            elif et == "click" and t1 is not None and ts > t1:
                if t2 is None or ts < t2:
                    t2 = ts
            elif et == "purchase" and t2 is not None and ts > t2:
                rows.append(
                    {
                        "user_id": int(key[0]),
                        "t1_us": int(round(t1 * 1_000_000)),
                        "t2_us": int(round(t2 * 1_000_000)),
                        "t3_us": int(round(ts * 1_000_000)),
                    }
                )
                t1, t2 = None, None  # funnel restarts after close
        state.update((t1, t2))
        if use_timeout:
            state.setTimeoutDuration(timeout_ms)
        if rows:
            yield pd.DataFrame(rows)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            advance,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout,
        )
    )
