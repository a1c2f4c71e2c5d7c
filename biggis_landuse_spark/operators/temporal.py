"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded range join.

The reference has no temporal joins (all its joins are SpatialKey
equi-joins, SURVEY.md §2.3); these belong to the extended
training-data-pipeline surface (event-log feature engineering:
"attach the latest prior X to each Y", "find co-occurring events").
Both are expressed as compositions of built-in DataFrame ops — no
UDFs, no per-row subqueries — so Catalyst/Tungsten run them entirely
in whole-stage codegen.

Scale design (100 TB posture):

- ``asof_join``: the naive formulation is a per-left-row correlated
  subquery (quadratic) or an inequality join (no hash strategy —
  Spark falls back to broadcast-nested-loop). Instead: UNION the two
  sides, one window sort per key, carry the last right-side payload
  forward with ``last(..., ignorenulls)``. Exactly ONE shuffle on the
  join key, linear work, AQE-skew-splittable — the same trade
  Flink's temporal join and kdb's aj make.
- ``range_join``: equality on (key, time-bucket) with a two-bucket
  probe replaces the inequality predicate, turning the O(n²)
  theta-join into an equi-join whose fan-out is bounded by events per
  key per window. The exact band predicate is applied as a residual
  filter after the hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_payload: list[str] | None = None,
    tolerance_us: int | None = None,
    direction: str = "backward",
    tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the as-of right row within the same
    ``on`` key: ``direction="backward"`` takes the most recent right
    row with ``right.ts <= left.ts`` (inclusive — DuckDB/kdb ASOF
    semantics); ``"forward"`` takes the earliest right row with
    ``right.ts >= left.ts``; ``"nearest"`` takes whichever of the two
    is closer in time, preferring the prior row on exact-distance ties
    (pandas merge_asof parity for all three).

    Returns the left rows with ``asof_<payload>`` columns (NULL when
    no matching right row exists, or when the match is further than
    ``tolerance_us`` microseconds away).

    ``tiebreak`` names a right column that resolves several right rows
    sharing one timestamp deterministically: backward keeps the
    greatest tiebreak value (the "latest" by the secondary key),
    forward the smallest (the "earliest next").

    Single shuffle every direction: union both sides, window-sort per
    key by (signed epoch, side) — right rows order BEFORE left rows at
    equal ts, which is what makes the join inclusive — then carry the
    latest non-null right payload forward. Forward is the same plan on
    the negated epoch; nearest adds a second sort (the forward frame)
    over the SAME exchange, then picks the closer side per row — still
    one shuffle.
    """
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, ts_col, right_payload, tolerance_us, tiebreak
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest, not {direction!r}"
        )
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, ts_col)]
    tagged_payload = list(right_payload)
    if tiebreak is not None and tiebreak not in tagged_payload:
        tagged_payload.append(tiebreak)
    sign = 1 if direction == "backward" else -1

    l_tagged = left.select(
        F.col(on),
        F.col(ts_col),
        (F.unix_micros(F.col(ts_col)) * sign).alias("_sort_us"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in tagged_payload],
        F.lit(None).cast("long").alias("_r_ts_us"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(ts_col),
        (F.unix_micros(F.col(ts_col)) * sign).alias("_sort_us"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in tagged_payload],
        F.unix_micros(F.col(ts_col)).alias("_r_ts_us"),
    )
    # deterministic total order: equal-ts right rows precede left rows;
    # among equal-ts right rows the carried (last) one is the greatest
    # tiebreak backward / smallest forward
    order_cols = [F.col("_sort_us"), F.col("_side")]
    if tiebreak is not None:
        tb = F.col(f"_r_{tiebreak}")
        order_cols.append(tb.asc_nulls_first() if sign == 1 else tb.desc_nulls_first())
    w = (
        W.partitionBy(on)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_payload
        ],
        F.last("_r_ts_us", ignorenulls=True).over(w).alias("_asof_ts_us"),
    )
    out = carried.where(F.col("_side") == 1)
    if tolerance_us is not None:
        in_tol = (
            F.abs(F.unix_micros(F.col(ts_col)) - F.col("_asof_ts_us"))
        ) <= tolerance_us
        out = out.select(
            "*",
            *[
                F.when(in_tol, F.col(f"_asof_{c}"))
                .otherwise(F.lit(None))
                .alias(f"_tol_{c}")
                for c in right_payload
            ],
            F.when(in_tol, F.col("_asof_ts_us"))
            .otherwise(F.lit(None))
            .alias("_tol_ts_us"),
        )
        sel_prefix = "_tol_"
    else:
        sel_prefix = "_asof_"
    return out.select(
        F.col("_lrow.*"),
        *[
            F.col(f"{sel_prefix}{c}").alias(f"asof_{c}")
            for c in right_payload
        ],
        F.col(f"{sel_prefix}ts_us").alias("asof_ts_us"),
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_payload: list[str] | None,
    tolerance_us: int | None,
    tiebreak: str | None,
) -> DataFrame:
    """nearest-direction as-of: both carries over ONE union/exchange —
    a backward frame (right rows sort before left at equal ts, carry
    last prior) and a forward frame (left before right, take first
    following) share the partitionBy(on) exchange and differ only in
    sort — then the closer side wins per left row (prior on ties)."""
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, ts_col)]
    tagged_payload = list(right_payload)
    if tiebreak is not None and tiebreak not in tagged_payload:
        tagged_payload.append(tiebreak)

    l_tagged = left.select(
        F.col(on),
        F.col(ts_col),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in tagged_payload],
        F.lit(None).cast("long").alias("_r_ts_us"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(ts_col),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in tagged_payload],
        F.unix_micros(F.col(ts_col)).alias("_r_ts_us"),
    )
    tb_asc = (
        [F.col(f"_r_{tiebreak}").asc_nulls_first()] if tiebreak is not None else []
    )
    wb = (
        W.partitionBy(on)
        .orderBy(F.col("_us"), F.col("_side"), *tb_asc)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(on)
        .orderBy(F.col("_us"), F.col("_side").desc(), *tb_asc)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(wb).alias(f"_b_{c}")
            for c in right_payload
        ],
        F.last("_r_ts_us", ignorenulls=True).over(wb).alias("_b_ts"),
        *[
            F.first(f"_r_{c}", ignorenulls=True).over(wf).alias(f"_f_{c}")
            for c in right_payload
        ],
        F.first("_r_ts_us", ignorenulls=True).over(wf).alias("_f_ts"),
    )
    out = carried.where(F.col("_side") == 1)
    l_us = F.unix_micros(F.col(ts_col))
    b_gap = l_us - F.col("_b_ts")
    f_gap = F.col("_f_ts") - l_us
    use_b = F.col("_b_ts").isNotNull() & (
        F.col("_f_ts").isNull() | (b_gap <= f_gap)
    )
    chosen_ts = F.when(use_b, F.col("_b_ts")).otherwise(F.col("_f_ts"))
    in_tol = (
        (F.abs(l_us - chosen_ts) <= tolerance_us)
        if tolerance_us is not None
        else F.lit(True)
    )
    return out.select(
        F.col("_lrow.*"),
        *[
            F.when(
                in_tol,
                F.when(use_b, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}")),
            ).alias(f"asof_{c}")
            for c in right_payload
        ],
        F.when(in_tol, chosen_ts).alias("asof_ts_us"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    band_us: int = 60_000_000,
    strict_after: bool = True,
    band_before_us: int = 0,
) -> DataFrame:
    """Pairs (l, r) with the same ``on`` key and ``r.ts`` in
    ``(l.ts - band_before_us, l.ts + band_us]`` microseconds
    (``strict_after=False`` makes the bounds inclusive on both ends;
    ``band_before_us > 0`` gives the symmetric/backward-looking
    interval, e.g. "events within ±1 minute").

    Bucketed-band equi-join: time is bucketed by the TOTAL window
    width, so every left row's interval spans at most two adjacent
    buckets — each left row probes those buckets, the hash join key is
    (key, bucket), and the band inequality is only a residual filter —
    never a broadcast-nested-loop. Output columns are prefixed
    ``l_`` / ``r_``.
    """
    width = band_us + band_before_us
    if width <= 0:
        raise ValueError("band_us + band_before_us must be positive")
    l_pref = left.select(
        F.col(on).alias("_k"),
        F.unix_micros(F.col(ts_col)).alias("_l_us"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns],
    )
    r_pref = right.select(
        F.col(on).alias("_k"),
        F.unix_micros(F.col(ts_col)).alias("_r_us"),
        (F.unix_micros(F.col(ts_col)) / width).cast("long").alias("_rb"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
    )
    probes = l_pref.select(
        "*",
        F.explode(
            F.array_distinct(
                F.array(
                    ((F.col("_l_us") - band_before_us) / width).cast("long"),
                    ((F.col("_l_us") + band_us) / width).cast("long"),
                )
            )
        ).alias("_rb"),
    )
    if strict_after:
        lower = F.col("_r_us") > F.col("_l_us") - band_before_us
        upper = F.col("_r_us") <= F.col("_l_us") + band_us
    else:
        lower = F.col("_r_us") >= F.col("_l_us") - band_before_us
        upper = F.col("_r_us") <= F.col("_l_us") + band_us
    return (
        probes.join(r_pref, ["_k", "_rb"])
        .where(lower & upper)
        .drop("_k", "_rb", "_l_us", "_r_us")
    )
