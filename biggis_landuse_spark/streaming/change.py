"""Streaming land-use change monitoring: newly classified scene tiles
arrive as a pixel stream and are compared against a static baseline
classification — the continuous-monitoring form of the batch
``land_use_change_matrix`` query (the BigGIS premise: scenes keep
arriving; change accounting should not wait for a batch window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_change_matrix(
    new_px: DataFrame,
    baseline_px: DataFrame,
    broadcast_static: bool = True,
) -> DataFrame:
    """Transition counts between a (streaming) pixel relation
    (gx, gy, cls) and a static baseline classification.

    Stream-static join on pixel coordinates + a class²-bounded
    aggregate, so complete-output-mode state is a handful of rows no
    matter how many scenes stream through. ``broadcast_static=True``
    fits the monitored-region shape (baseline for an AOI rides along
    to every task); for full-scene baselines leave it False — the
    static parquet side is then partition-pruned/bucket-joined by the
    catalog's tile-key layout and only the microbatch (bounded) side
    shuffles. Works identically on a batch DataFrame, which is what
    the oracle-checked batch twin (land_use_change_matrix) runs;
    live parity is asserted in tests/test_streaming.py.
    """
    base = baseline_px.select(
        "gx", "gy", F.col("cls").alias("class_from")
    )
    if broadcast_static:
        base = F.broadcast(base)
    return (
        new_px.select("gx", "gy", F.col("cls").alias("class_to"))
        .join(base, ["gx", "gy"])
        .groupBy("class_from", "class_to")
        .agg(F.count(F.lit(1)).alias("n_pixels"))
        .withColumn(
            "changed", F.col("class_from") != F.col("class_to")
        )
    )
