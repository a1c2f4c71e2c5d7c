"""Independent brute-force references for the proximity and viewshed
operators: plain-Python re-computation from the raw inputs (full
O(cells × targets) distance scan; per-ray float walk), so a formula
bug shared between the Spark implementation and its DuckDB oracle
cannot hide."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from biggis_landuse_spark.operators.proximity import proximity
from biggis_landuse_spark.operators.viewshed import viewshed

N = 16
R = 3
OX, OY, MAST = 7, 7, 10


def _grid(spark):
    rows = [
        (x, y, (x * 31 + y * 17) % 97)
        for x in range(N)
        for y in range(N)
    ]
    return spark.createDataFrame(rows, "gx int, gy int, elev long")


def test_proximity_matches_full_scan(spark):
    cells = _grid(spark).select("gx", "gy")
    targets = _grid(spark).where((F.col("elev") % 13) == 0).select("gx", "gy")
    got = {
        (r["gx"], r["gy"]): r["min_d2"]
        for r in proximity(cells, targets, radius=R).collect()
    }
    tgt = [(x, y) for x in range(N) for y in range(N) if ((x * 31 + y * 17) % 97) % 13 == 0]
    assert tgt, "fixture needs targets"
    for x in range(N):
        for y in range(N):
            d2 = min((x - tx) ** 2 + (y - ty) ** 2 for tx, ty in tgt)
            want = d2 if d2 <= R * R else None
            assert got[(x, y)] == want, (x, y, got[(x, y)], want)


def test_viewshed_matches_rational_ray_walk(spark):
    cells = _grid(spark)
    got = {
        (r["gx"], r["gy"]): r["visible"]
        for r in viewshed(cells, OX, OY, MAST).collect()
    }
    from fractions import Fraction

    elev = {(x, y): (x * 31 + y * 17) % 97 for x in range(N) for y in range(N)}
    h0 = elev[(OX, OY)] + MAST
    for x in range(N):
        for y in range(N):
            dx, dy = x - OX, y - OY
            s = max(abs(dx), abs(dy))
            target_slope = Fraction(elev[(x, y)] - h0, s) if s else None
            visible = True
            for i in range(1, s):
                # same round-half-up sample rule; exact rational slope
                # comparison instead of the operator's cross-multiply
                sx = OX + math.floor(Fraction(2 * dx * i + s, 2 * s))
                sy = OY + math.floor(Fraction(2 * dy * i + s, 2 * s))
                if Fraction(elev[(sx, sy)] - h0, i) >= target_slope:
                    visible = False
                    break
            assert got[(x, y)] == visible, (x, y, got[(x, y)], visible)


def test_viewshed_monotone_in_mast_height(spark):
    """Raising the observer can only ever reveal MORE cells — the
    monotonicity a correct visibility predicate must satisfy."""
    cells = _grid(spark)
    low = {
        (r["gx"], r["gy"])
        for r in viewshed(cells, OX, OY, 0).collect()
        if r["visible"]
    }
    high = {
        (r["gx"], r["gy"])
        for r in viewshed(cells, OX, OY, 40).collect()
        if r["visible"]
    }
    assert low <= high
    assert len(high) > len(low)
