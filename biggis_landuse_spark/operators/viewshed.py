"""Line-of-sight viewshed (GRASS ``r.viewshed`` / GDAL viewshed, R3 form).

For every grid cell: is it visible from a fixed observer, i.e. does any
terrain sample along the sight line subtend a vertical angle at least
as large as the target's? The classic R3 algorithm evaluates the full
sight line per cell — O(n·d) samples over an n-cell grid of diameter d
— which is exactly the shape that distributes: the per-(target, step)
sample relation is a bounded explode, terrain heights attach with ONE
hash equi-join on the grid key, and the blocking test partial-
aggregates per target. No window, no iteration, no UDF.

Exactness discipline: the horizontal metric is the CHEBYSHEV step
count (the per-step ray walk every grid viewshed uses), so the
angular comparison
    (h_sample - h_obs) / i   vs   (h_target - h_obs) / S
cross-multiplies to the INTEGER predicate
    (h_sample - h_obs) * S >= (h_target - h_obs) * i
(i, S > 0) — no float enters the visibility decision at all, and the
DuckDB oracle replays it bit-for-bit. Sample coordinates round to the
nearest cell with an explicit floor((2*d*i + S) / (2*S)) form shared
by both engines (floor of an exact small-integer ratio); along the
major axis this advances exactly one cell per step, so samples never
repeat a cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def viewshed(
    cells: DataFrame,
    obs_x: int,
    obs_y: int,
    obs_height: int,
    x_col: str = "gx",
    y_col: str = "gy",
    elev_col: str = "elev",
) -> DataFrame:
    """Visibility of every cell from the observer at (obs_x, obs_y).

    ``cells``: (x_col, y_col, elev_col) with INTEGER elevations.
    ``obs_height``: mast height added to the observer cell's terrain.
    Returns (x_col, y_col, elev, n_steps, n_blockers, visible); cells
    with no intermediate sample (the observer and its 8 neighbours)
    are visible by construction.
    """
    gx, gy = F.col(x_col), F.col(y_col)
    # 1-row observer relation: terrain height + mast height
    obs = cells.where((gx == obs_x) & (gy == obs_y)).select(
        (F.col(elev_col) + F.lit(obs_height)).alias("h0")
    )
    dx = gx - F.lit(obs_x)
    dy = gy - F.lit(obs_y)
    targets = cells.select(
        gx,
        gy,
        F.col(elev_col),
        dx.alias("dx"),
        dy.alias("dy"),
        F.greatest(F.abs(dx), F.abs(dy)).alias("s"),
    )

    # intermediate ray samples i = 1 .. S-1 at the nearest grid cell of
    # the parametric point obs + (d * i / S); floor((2*d*i + S)/(2*S))
    # is round-half-up of d*i/S, exact for these small integers
    def snap(d: str) -> Column:
        return F.floor(
            (2.0 * F.col(d) * F.col("i") + F.col("s")) / (2.0 * F.col("s"))
        ).cast("int")

    rays = (
        targets.where(F.col("s") >= 2)
        .select(
            gx.alias("tx"),
            gy.alias("ty"),
            F.col(elev_col).alias("h_t"),
            "dx",
            "dy",
            "s",
            F.explode(F.sequence(F.lit(1), F.col("s") - 1)).alias("i"),
        )
        .select(
            "tx",
            "ty",
            "h_t",
            "s",
            "i",
            (F.lit(obs_x) + snap("dx")).alias(x_col),
            (F.lit(obs_y) + snap("dy")).alias(y_col),
        )
    )
    sampled = rays.join(
        cells.select(gx, gy, F.col(elev_col).alias("h_i")), [x_col, y_col]
    ).crossJoin(F.broadcast(obs))
    # blocking sample: its angle from the observer is >= the target's —
    # the exact integer cross-multiplied form of (h_i-h0)/i >= (h_t-h0)/s
    blocked = (
        (F.col("h_i") - F.col("h0")) * F.col("s")
        >= (F.col("h_t") - F.col("h0")) * F.col("i")
    ).cast("long")
    per_target = sampled.groupBy(
        F.col("tx").alias(x_col), F.col("ty").alias(y_col)
    ).agg(F.sum(blocked).alias("n_blockers"))
    return (
        targets.join(per_target, [x_col, y_col], "left")
        .select(
            gx,
            gy,
            F.col(elev_col),
            F.col("s").cast("long").alias("n_steps"),
            F.coalesce("n_blockers", F.lit(0)).cast("long").alias("n_blockers"),
        )
        .withColumn("visible", F.col("n_blockers") == 0)
    )
