"""Scale probe: empirical growth curves for the dedup/ANN block queries
and (r9, VERDICT r8 #4) the iterative raster family.

Builds 1x / 4x / 16x corpora from the sf0.1 tables by unioning copies
with offset ids — every copy repeats the SAME vectors and texts, so
the scaled corpus is the worst case for LSH/IVF blocking (all copies
of a row share every band signature / land in one cell). An uncapped
candidate generator does (copies)^2 work per original row and its
runtime grows ~quadratically in the scale factor; the sub-split caps
(functions.similarity.subsplit_cells* / functions.dedup.
subsplit_band_groups) bound every pair block, so runtime must grow
~linearly.

Usage: python tools/scale_probe.py [--write]   (the table only lands in
/root/repo/SCALE_PROBE.md with --write; without it, stdout only)

The probe runs each query END-TO-END through the registry (the same
callable the driver benches), on parquet dirs laid out exactly like a
testdata sf dir. Growth is reported as t(4x)/t(1x) and t(16x)/t(4x);
with fixed per-query overhead the ratio understates the asymptotic
exponent, so any ratio near 4 already means linear work per row and a
ratio near 16 would mean a quadratic blow-up.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/scale_probe"
FACTORS = (1, 4, 16)
PROBES = (
    "embedding_near_dup",
    "semantic_dedup",
    "knn_graph",
    "dedup_minhash",
    "simhash",
    "simhash_hamming_pairs",
)


def build_scaled(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    out = f"{OUT}/x{factor}"
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_emb = emb.count()
    n_docs = docs.count()
    scaled_emb = None
    scaled_docs = None
    for c in range(factor):
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(c * n_emb))
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * n_docs))
        scaled_emb = e if scaled_emb is None else scaled_emb.unionByName(e)
        scaled_docs = d if scaled_docs is None else scaled_docs.unionByName(d)
    scaled_emb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    scaled_docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


# -- iterative raster family (r9, VERDICT r8 #4) ---------------------------
# The registry's flow/strahler/region queries run on a constants-pinned
# 24-wide fixture grid, so scaling the parquet corpus cannot scale them;
# this section scales the GRID instead (side x2 per step -> 1x/4x/16x
# cells) and drives the OPERATORS with the same composition the
# queries use, recording both runtime and the MEASURED round count
# (early_stop/stats) so round-count growth vs grid size is a number,
# not an assertion.
GRID_BASE_W, GRID_BASE_H = 48, 64  # 3072 -> 12288 -> 49152 cells


def _grid_inputs(spark, factor: int):
    from pyspark.sql import functions as F

    side = int(factor ** 0.5)
    w, h = GRID_BASE_W * side, GRID_BASE_H * side
    cells = spark.range(w * h).select(
        (F.col("id") % w).cast("int").alias("gx"),
        (F.col("id") / w).cast("int").alias("gy"),
        (3 * (F.col("id") % w) + 2 * (F.col("id") / w).cast("long")
         + (F.col("id") * 7919) % 13).cast("long").alias("elev"),
    ).localCheckpoint(eager=True)
    return cells, w, h


def _raster_probe_cases():
    """name -> callable(spark, factor) -> rounds-or-None; each call
    runs the operator end-to-end (count() action) on the scaled grid."""
    from pyspark.sql import functions as F

    from biggis_landuse_spark.operators.flow import (
        d8_directions,
        flow_accumulation,
        flow_accumulation_full,
        flow_edges,
        strahler_orders,
        watershed_roots,
    )
    from biggis_landuse_spark.operators.regions import label_regions

    def _edges_ids(spark, factor):
        cells, w, h = _grid_inputs(spark, factor)
        directed = d8_directions(cells)
        edges = flow_edges(directed, w).localCheckpoint(eager=True)
        ids = cells.select(
            (F.col("gy") * w + F.col("gx")).cast("long").alias("u")
        ).localCheckpoint(eager=True)
        return edges, ids, w, h

    def p_flow_bounded(spark, factor):
        edges, _ids, _w, _h = _edges_ids(spark, factor)
        # the registry contract: FIXED depth 12, rounds constant by
        # design — growth here isolates per-round data cost
        flow_accumulation(edges, 12).count()
        return 12

    def p_flow_full(spark, factor):
        edges, _ids, _w, _h = _edges_ids(spark, factor)
        st: dict = {}
        flow_accumulation_full(edges, stats=st).count()
        return st.get("rounds")

    def p_watershed(spark, factor):
        edges, ids, _w, _h = _edges_ids(spark, factor)
        st: dict = {}
        watershed_roots(
            edges, ids, rounds=16, early_stop=True, stats=st
        ).count()
        return st.get("rounds")

    def p_strahler(spark, factor):
        edges, ids, _w, _h = _edges_ids(spark, factor)
        st: dict = {}
        strahler_orders(
            edges, ids, rounds=64, early_stop=True, stats=st
        ).count()
        return st.get("rounds")

    def p_region_labels(spark, factor):
        cells, w, _h = _grid_inputs(spark, factor)
        px = cells.select(
            "gx", "gy", (F.col("elev") % 3).cast("int").alias("cls")
        )
        label_regions(px, w).count()
        return None

    return {
        "flow_accumulation(depth=12)": p_flow_bounded,
        "flow_accumulation_full": p_flow_full,
        "watershed_roots": p_watershed,
        "strahler_orders": p_strahler,
        "label_regions": p_region_labels,
    }


def run_flow_state_probe(spark) -> list[dict]:
    """r10, VERDICT r9 #1: the O(n)-state claim for the Euler-tour
    flow_accumulation_full, measured against the r9 closure form it
    replaced — per-round STATE ROWS side by side, on grids up to 64x
    (side x8) where the closure's O(n·L) curve visibly detaches from
    the rewrite's flat 2n. Euler state comes from the operator's
    stats hook; closure state is Σ_v acc(v) (= total materialized
    (source, downstream) pairs), read off the result itself.

    Terrain: a PURE tilted plane (elev = 3·gx + 2·gy, no noise) —
    deliberately not the registry fixture formula, whose mod-13 noise
    interacts with the grid width (w mod 13 changes per scale step)
    and fragments the 64x grid into tiny basins, breaking cross-scale
    comparability. The plane gives one basin draining to (0,0) with
    flow-path length ~side at every scale: the exact regime (L grows
    with the grid) where the closure's Σ path lengths detaches from
    the rewrite's flat 2n."""
    import time as _t

    from pyspark.sql import functions as F

    from biggis_landuse_spark.operators.flow import (
        d8_directions,
        flow_accumulation_closure,
        flow_accumulation_full,
        flow_edges,
    )

    out = []
    for f in (1, 4, 16, 64):
        side = int(f ** 0.5)
        w, h = GRID_BASE_W * side, GRID_BASE_H * side
        cells = spark.range(w * h).select(
            (F.col("id") % w).cast("int").alias("gx"),
            (F.col("id") / w).cast("int").alias("gy"),
            (3 * (F.col("id") % w)
             + 2 * (F.col("id") / w).cast("long")).cast("long").alias("elev"),
        ).localCheckpoint(eager=True)
        edges = flow_edges(d8_directions(cells), w).localCheckpoint(
            eager=True
        )
        n_cells = w * h
        spark._jvm.System.gc()
        st: dict = {}
        t0 = _t.perf_counter()
        res = flow_accumulation_full(edges, stats=st)
        res.count()
        t_euler = _t.perf_counter() - t0
        spark._jvm.System.gc()
        st_c: dict = {}
        t0 = _t.perf_counter()
        res_c = flow_accumulation_closure(edges, stats=st_c)
        closure_rows = res_c.agg(F.sum("acc")).collect()[0][0] or 0
        t_closure = _t.perf_counter() - t0
        out.append({
            "factor": f, "cells": n_cells,
            "euler_t": t_euler, "euler_rounds": st.get("rounds"),
            "euler_state": st.get("state_rows"),
            "closure_t": t_closure,
            "closure_rounds": st_c.get("rounds"),
            "closure_state": int(closure_rows),
        })
    return out


def run_raster_probes(spark) -> tuple[dict, dict]:
    import time as _t

    cases = _raster_probe_cases()
    times: dict[str, dict[int, float]] = {}
    rounds: dict[str, dict[int, int | None]] = {}
    for name, fn in cases.items():
        times[name] = {}
        rounds[name] = {}
        for f in FACTORS:
            spark._jvm.System.gc()
            fn(spark, f)  # warm up plan + JIT
            best, best_rounds = float("inf"), None
            for _ in range(2):
                t0 = _t.perf_counter()
                r = fn(spark, f)
                dt = _t.perf_counter() - t0
                if dt < best:
                    best, best_rounds = dt, r
            times[name][f] = best
            rounds[name][f] = best_rounds
    return times, rounds


def _parse_args(argv: list[str] | None = None):
    import argparse

    ap = argparse.ArgumentParser(
        description=(
            "Empirical growth probe for the dedup/ANN block queries and "
            "the iterative raster family (1x/4x/16x corpora). Runs for "
            "many minutes. SCALE_PROBE.md is only overwritten with "
            "--write; --help is safe."
        )
    )
    ap.add_argument(
        "--write",
        action="store_true",
        help="overwrite SCALE_PROBE.md with the new table (hand-written "
        "'## ...' analysis sections are preserved); without it the "
        "table goes to stdout only",
    )
    return ap.parse_args(argv)


def main() -> None:
    args = _parse_args()
    from biggis_landuse_spark.queries import (
        REGISTRY,
        _ensure_loaded,
        release_caches,
    )
    from biggis_landuse_spark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    _ensure_loaded()
    dirs = {f: build_scaled(spark, f) for f in FACTORS}
    times: dict[str, dict[int, float]] = {}
    for name in PROBES:
        spec = REGISTRY[name]
        times[name] = {}
        for f in FACTORS:
            # GC before the timed loop: heap garbage from earlier
            # probes otherwise triggers collections inside later timed
            # runs, and with 1-8 s absolutes the RATIOS swing by ±0.7
            # run-to-run (same lesson as bench.py's r8 GC settle)
            spark._jvm.System.gc()
            spec.spark(spark, dirs[f]).count()  # warm up plan + JIT
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                spec.spark(spark, dirs[f]).count()
                best = min(best, time.perf_counter() - t0)
            times[name][f] = best
            release_caches()
    lines = [
        "# SCALE_PROBE — measured growth of the dedup/ANN block queries",
        "",
        "Corpora: sf0.1 unioned with itself 1x/4x/16x under offset ids —",
        "every copy repeats the same vectors/texts, the worst case for",
        "LSH/IVF blocking (maximum bucket skew). An uncapped candidate",
        "generator grows ~quadratically here; the sub-split caps must",
        "keep growth ~linear. Ratios carry fixed per-query overhead, so",
        "anything near the corpus ratio (4) is linear work per row;",
        "near 16 would be the quadratic blow-up.",
        "",
        "Regenerate: `python tools/scale_probe.py` (numbers below from",
        "an otherwise idle local[32]; min-of-3 after warmup + GC).",
        "",
        "| query | t(1x) s | t(4x) s | t(16x) s | 4x/1x | 16x/4x |",
        "|---|---|---|---|---|---|",
    ]
    for name in PROBES:
        t = times[name]
        lines.append(
            f"| {name} | {t[1]:.2f} | {t[4]:.2f} | {t[16]:.2f} "
            f"| {t[4] / t[1]:.1f} | {t[16] / t[4]:.1f} |"
        )
    lines.append("")
    rtimes, rrounds = run_raster_probes(spark)
    lines += [
        "### Iterative raster family (r9): scaled GRIDS, measured rounds",
        "",
        f"Grids: {GRID_BASE_W}x{GRID_BASE_H} cells, side x2 per step",
        "(1x/4x/16x cells) — the registry fixtures pin a constant grid,",
        "so these probes drive the operators on synthesized terrain of",
        "the same formula. `rounds` columns are MEASURED (stats/",
        "early_stop), not the parameter: watershed pointer doubling",
        "grows +~1 round per 4x (log of the 2x longer flow path);",
        "flow_accumulation_full's Euler-tour list ranking grows +~2",
        "per 4x (log of the 4x longer tour — the price of O(n) state);",
        "the monotone strahler fixpoint tracks the longest tributary",
        "chain; bounded accumulation holds its constant 12 rounds and",
        "must scale only in per-round data.",
        "",
        "| operator | t(1x) s | t(4x) s | t(16x) s | 4x/1x | 16x/4x |"
        " rounds 1x/4x/16x |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, t in rtimes.items():
        r = rrounds[name]
        rtxt = "/".join(
            "-" if r[f] is None else str(r[f]) for f in FACTORS
        )
        lines.append(
            f"| {name} | {t[1]:.2f} | {t[4]:.2f} | {t[16]:.2f} "
            f"| {t[4] / t[1]:.1f} | {t[16] / t[4]:.1f} | {rtxt} |"
        )
    lines.append("")
    flow_rows = run_flow_state_probe(spark)
    lines += [
        "### flow_accumulation_full: O(n) state vs the r9 closure "
        "(r10, VERDICT r9 #1)",
        "",
        "Per-round STATE ROWS of the Euler-tour rewrite (measured by",
        "the operator's stats hook — constant 2n arc rows every round)",
        "against the replaced transitive-closure form (state = total",
        "materialized (source, downstream) pairs = Σ acc, read off the",
        "result). Grid side x2 per step up to 64x cells; both forms",
        "return identical counts (equality pinned in tests/test_flow).",
        "",
        "| grid | cells | euler s | rounds | state rows | closure s "
        "| rounds | state rows | closure/euler state |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in flow_rows:
        lines.append(
            f"| {r['factor']}x | {r['cells']} | {r['euler_t']:.2f} "
            f"| {r['euler_rounds']} | {r['euler_state']} "
            f"| {r['closure_t']:.2f} | {r['closure_rounds']} "
            f"| {r['closure_state']} "
            f"| {r['closure_state'] / max(1, r['euler_state']):.1f}x |"
        )
    lines.append("")
    out_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE.md",
    )
    if args.write:
        # the table is generated; any hand-written analysis sections
        # after it ("## ..." onward) are preserved across regenerations
        if os.path.exists(out_md):
            old = open(out_md).read()
            i = old.find("\n## ")
            if i != -1:
                lines.append(old[i + 1:])
        with open(out_md, "w") as fh:
            fh.write("\n".join(lines))
        print(f"wrote {out_md}")
    else:
        print("\n".join(lines))
        print(f"(dry run: pass --write to update {out_md})")
    for name in PROBES:
        t = times[name]
        print(
            f"{name}: {t[1]:.2f} {t[4]:.2f} {t[16]:.2f} "
            f"ratios {t[4] / t[1]:.1f} {t[16] / t[4]:.1f}"
        )
    for name, t in rtimes.items():
        r = rrounds[name]
        print(
            f"{name}: {t[1]:.2f} {t[4]:.2f} {t[16]:.2f} "
            f"ratios {t[4] / t[1]:.1f} {t[16] / t[4]:.1f} "
            f"rounds {[r[f] for f in FACTORS]}"
        )


if __name__ == "__main__":
    main()
