"""Unit tests for operators.temporal (as-of join, bounded range join)
and functions.similarity IVF — semantics the aggregate oracle queries
don't pin down: inclusivity at equal timestamps, tolerance cutoffs,
no-match NULLs, probe multiplicity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from biggis_landuse_spark.operators.temporal import asof_join, range_join


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_asof_picks_latest_prior_inclusive(spark):
    left = _mk(spark, [(1, _ts(10)), (1, _ts(30))], ["k", "ts"])
    right = _mk(
        spark,
        [(1, _ts(5), 50.0), (1, _ts(10), 100.0), (1, _ts(20), 200.0)],
        ["k", "ts", "v"],
    )
    out = {
        r["ts"].second: r["asof_v"]
        for r in asof_join(left, right, on="k").collect()
    }
    # equal timestamp matches (inclusive); later left row sees the newest
    assert out == {10: 100.0, 30: 200.0}


def test_asof_no_prior_is_null(spark):
    left = _mk(spark, [(1, _ts(3)), (2, _ts(30))], ["k", "ts"])
    right = _mk(spark, [(1, _ts(5), 1.0)], ["k", "ts", "v"])
    rows = {r["k"]: r for r in asof_join(left, right, on="k").collect()}
    assert rows[1]["asof_v"] is None  # right row is in the future
    assert rows[2]["asof_v"] is None  # key has no right rows at all
    assert rows[1]["asof_ts_us"] is None


def test_asof_tolerance_drops_stale_matches(spark):
    left = _mk(spark, [(1, _ts(50))], ["k", "ts"])
    right = _mk(spark, [(1, _ts(10), 7.0)], ["k", "ts", "v"])
    ok = asof_join(left, right, on="k", tolerance_us=60_000_000).collect()
    assert ok[0]["asof_v"] == 7.0
    stale = asof_join(left, right, on="k", tolerance_us=30_000_000).collect()
    assert stale[0]["asof_v"] is None


def test_asof_keeps_left_columns_and_keys_separate(spark):
    left = _mk(spark, [(1, _ts(10), "a"), (2, _ts(10), "b")], ["k", "ts", "tag"])
    right = _mk(spark, [(1, _ts(1), 9.0), (2, _ts(2), 8.0)], ["k", "ts", "v"])
    rows = {r["tag"]: r["asof_v"] for r in asof_join(left, right, on="k").collect()}
    assert rows == {"a": 9.0, "b": 8.0}


def test_range_join_band_bounds(spark):
    left = _mk(spark, [(1, _ts(0), "L")], ["k", "ts", "who"])
    right = _mk(
        spark,
        [(1, _ts(0), "same"), (1, _ts(1), "in"), (1, _ts(60), "edge"),
         (1, _ts(61), "out"), (2, _ts(1), "otherkey")],
        ["k", "ts", "who"],
    )
    got = {
        r["r_who"]
        for r in range_join(left, right, on="k", band_us=60_000_000).collect()
    }
    # strict lower bound: equal ts excluded; inclusive upper at +60s
    assert got == {"in", "edge"}
    got_incl = {
        r["r_who"]
        for r in range_join(
            left, right, on="k", band_us=60_000_000, strict_after=False
        ).collect()
    }
    assert got_incl == {"same", "in", "edge"}


def test_range_join_is_hash_join_not_nested_loop(spark):
    e = _mk(spark, [(1, _ts(0), "x")], ["k", "ts", "who"])
    plan = range_join(e, e, on="k")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_ivf_assign_nearest_and_probes(spark):
    from biggis_landuse_spark.functions.similarity import ivf_assign

    vecs = _mk(
        spark,
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.9, 0.1]), (3, [0.1, 0.9])],
        ["vec_id", "vec"],
    )
    cents = _mk(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["cid", "cv"])
    one = {
        r["vec_id"]: r["cid"]
        for r in ivf_assign(vecs, cents, n_probe=1).collect()
    }
    assert one == {0: 0, 1: 1, 2: 0, 3: 1}
    two = ivf_assign(vecs, cents, n_probe=2).collect()
    assert len(two) == 8  # every vector reaches both cells at n_probe=2


def test_ivf_topk_matches_brute_force_with_full_probes(spark):
    from biggis_landuse_spark.functions import similarity as S

    emb = _mk(
        spark,
        [(i, [float(i % 3), float(i % 5), 1.0]) for i in range(12)],
        ["vec_id", "embedding"],
    )
    cents = _mk(
        spark,
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        ["cid", "cv"],
    )
    queries = emb.where(F.col("vec_id") < 2)
    # probing every cell makes IVF exhaustive → must equal brute force
    ivf = S.ivf_topk(queries, emb, cents, k=3, n_probe=2)
    bf = S.brute_force_topk(queries, emb, k=3)
    assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, bf.collect()))


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property check against an independent oracle: pandas
    merge_asof(direction='backward') implements the same inclusive
    as-of semantics; random-ish deterministic event sets must agree."""
    import pandas as pd

    rng = [(k, s) for k in (1, 2, 3) for s in range(0, 600, 7)]
    left_rows = [(k, _ts(s + (k * 13) % 5)) for (k, s) in rng if (s + k) % 3 == 0]
    right_rows = [
        (k, _ts(s + (k * 7) % 11), float(k * 1000 + s))
        for (k, s) in rng
        if (s + k) % 4 == 0
    ]
    left = _mk(spark, left_rows, ["k", "ts"])
    right = _mk(spark, right_rows, ["k", "ts", "v"])
    got = {
        (r["k"], r["ts"]): r["asof_v"]
        for r in asof_join(left, right, on="k").collect()
    }
    lp = pd.DataFrame(left_rows, columns=["k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts")
    want_df = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward", suffixes=("", "_r")
    )
    want = {
        (int(r.k), r.ts.to_pydatetime()): (None if pd.isna(r.v) else float(r.v))
        for r in want_df.itertuples(index=False)
    }
    assert got == want


def test_range_join_matches_plain_inequality_join(spark):
    """The bucketed-band formulation must equal the naive inequality
    join row-for-row on a deterministic event set."""
    rows = [
        (k, _ts((k * 37 + i * 11) % 300))
        for k in (1, 2, 3)
        for i in range(40)
    ]
    e = _mk(spark, rows, ["k", "ts"]).dropDuplicates(["k", "ts"])
    got = (
        range_join(e, e, on="k", band_us=60_000_000)
        .select("l_ts", "r_ts", F.col("l_k").alias("k"))
        .collect()
    )
    a, b = e.alias("a"), e.alias("b")
    want = (
        a.join(b, F.col("a.k") == F.col("b.k"))
        .where(
            (F.col("b.ts") > F.col("a.ts"))
            & (
                F.unix_micros(F.col("b.ts"))
                <= F.unix_micros(F.col("a.ts")) + 60_000_000
            )
        )
        .select(
            F.col("a.ts").alias("l_ts"),
            F.col("b.ts").alias("r_ts"),
            F.col("a.k").alias("k"),
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_asof_forward_picks_earliest_following_inclusive(spark):
    left = _mk(spark, [(1, _ts(10)), (1, _ts(25))], ["k", "ts"])
    right = _mk(
        spark,
        [(1, _ts(5), 50.0), (1, _ts(10), 100.0), (1, _ts(20), 200.0),
         (1, _ts(40), 400.0)],
        ["k", "ts", "v"],
    )
    out = {
        r["ts"].second: r["asof_v"]
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    # equal-ts match is inclusive; next-following otherwise
    assert out == {10: 100.0, 25: 400.0}


def test_asof_forward_tolerance_and_no_following(spark):
    left = _mk(spark, [(1, _ts(10)), (1, _ts(55))], ["k", "ts"])
    right = _mk(spark, [(1, _ts(50), 7.0)], ["k", "ts", "v"])
    rows = {
        r["ts"].second: r
        for r in asof_join(
            left, right, on="k", direction="forward", tolerance_us=30_000_000
        ).collect()
    }
    assert rows[10]["asof_v"] is None  # next is 40s away > 30s tolerance
    assert rows[55]["asof_v"] is None  # nothing follows at all


def test_asof_tiebreak_deterministic_both_directions(spark):
    left = _mk(spark, [(1, _ts(10))], ["k", "ts"])
    right = _mk(
        spark,
        [(1, _ts(10), 101, 1.0), (1, _ts(10), 103, 3.0), (1, _ts(10), 102, 2.0)],
        ["k", "ts", "eid", "v"],
    )
    back = asof_join(
        left, right, on="k", right_payload=["v"], tiebreak="eid"
    ).first()
    assert back["asof_v"] == 3.0  # greatest eid wins backward
    fwd = asof_join(
        left, right, on="k", right_payload=["v"],
        direction="forward", tiebreak="eid",
    ).first()
    assert fwd["asof_v"] == 1.0  # smallest eid wins forward


def test_asof_rejects_unknown_direction(spark):
    import pytest

    left = _mk(spark, [(1, _ts(1))], ["k", "ts"])
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left, on="k", direction="sideways")


def test_asof_nearest_prefers_closer_and_breaks_ties_backward(spark):
    left = _mk(spark, [(1, _ts(10)), (1, _ts(30)), (1, _ts(41))], ["k", "ts"])
    right = _mk(
        spark,
        [(1, _ts(7), 7.0), (1, _ts(12), 12.0), (1, _ts(40), 40.0)],
        ["k", "ts", "v"],
    )
    out = {
        r["ts"].second: r["asof_v"]
        for r in asof_join(left, right, on="k", direction="nearest").collect()
    }
    # t=10: prior at 7 (gap 3) vs next at 12 (gap 2) → forward wins
    # t=30: prior at 12 (gap 18) vs next at 40 (gap 10) → forward wins
    # t=41: prior at 40 (gap 1) vs nothing after → backward
    assert out == {10: 12.0, 30: 40.0, 41: 40.0}
    # exact tie: t=10 between 7 and 13 → prior wins
    right2 = _mk(spark, [(1, _ts(7), 7.0), (1, _ts(13), 13.0)], ["k", "ts", "v"])
    tie = asof_join(left.where(F.col("ts") == _ts(10)), right2, on="k",
                    direction="nearest").first()
    assert tie["asof_v"] == 7.0


def test_asof_nearest_tolerance_and_single_shuffle(spark):
    left = _mk(spark, [(1, _ts(30))], ["k", "ts"])
    right = _mk(spark, [(1, _ts(10), 1.0), (1, _ts(45), 2.0)], ["k", "ts", "v"])
    out = asof_join(
        left, right, on="k", direction="nearest", tolerance_us=10_000_000
    ).first()
    assert out["asof_v"] is None  # nearest (15s away) exceeds 10s tolerance
    plan = (
        asof_join(left, right, on="k", direction="nearest")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # dual sort, ONE shuffle


def test_asof_nearest_matches_pandas_merge_asof(spark):
    import pandas as pd

    rng = [(k, s) for k in (1, 2) for s in range(0, 400, 7)]
    left_rows = [(k, _ts(s + (k * 13) % 5)) for (k, s) in rng if (s + k) % 3 == 0]
    right_rows = [
        (k, _ts(s + (k * 7) % 11), float(k * 1000 + s))
        for (k, s) in rng
        if (s + k) % 4 == 0
    ]
    left = _mk(spark, left_rows, ["k", "ts"])
    right = _mk(spark, right_rows, ["k", "ts", "v"])
    got = {
        (r["k"], r["ts"]): r["asof_v"]
        for r in asof_join(left, right, on="k", direction="nearest").collect()
    }
    lp = pd.DataFrame(left_rows, columns=["k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts")
    want_df = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="nearest", suffixes=("", "_r")
    )
    want = {
        (int(r.k), r.ts.to_pydatetime()): (None if pd.isna(r.v) else float(r.v))
        for r in want_df.itertuples(index=False)
    }
    assert got == want


def test_range_join_symmetric_band_matches_brute_force(spark):
    import itertools

    rows = [(1, _ts(s), s) for s in (0, 5, 12, 19, 26, 33, 47)] + [
        (2, _ts(s), 100 + s) for s in (3, 9, 40)
    ]
    df = _mk(spark, rows, ["k", "ts", "eid"])
    before = after = 10_000_000  # ±10 s
    got = {
        (r["l_eid"], r["r_eid"])
        for r in range_join(
            df, df, on="k", band_us=after, band_before_us=before,
            strict_after=False,
        ).collect()
    }
    want = {
        (l[2], r[2])
        for l, r in itertools.product(rows, rows)
        if l[0] == r[0]
        and -10 <= (r[1] - l[1]).total_seconds() <= 10
    }
    assert got == want and len(want) > len(rows)  # non-trivial overlap
