"""sf0.1 → sf1 growth evidence for the LLM-pipeline headliners (r10,
VERDICT r9 #4): run each headline dedup/ANN query once at both scales
(data ratio 10 on its input table) and record time ratios.

Solo-machine discipline applies (the scale_probe lesson: concurrent
Spark work poisons the 1x legs). The sf1 corpus comes from
tools/gen_sf1_pipeline.py (builder-synthesized, seed 42 — TESTDATA.md
forbids regenerating the driver dirs).

Usage: python tools/sf1_growth_probe.py  (appends nothing; prints the
markdown table to paste into SCALING.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1_pipeline"
QUERIES = (
    "dedup_minhash",
    "simhash_hamming_pairs",
    "knn_graph",
    "semantic_dedup",
    "ann_ivf2_persisted_topk",
    "dedup_incremental",
    # iterative heavies (r11, VERDICT r10 #4): rounds x per-round state
    # is where growth surprises hide; gen_sf1_pipeline synthesizes the
    # 10x events/orders/lineitem these read. The raster iteratives
    # (flow/watershed/regions) scale on GRIDS, not sf tables — their
    # growth lives in tools/scale_probe.py's 1x/4x/16x grid section.
    "pagerank_suppliers",
    "concurrent_events",
)


def main() -> None:
    from biggis_landuse_spark.queries import (
        REGISTRY,
        _ensure_loaded,
        release_caches,
    )
    from biggis_landuse_spark.session import get_spark

    if not os.path.isdir(SF1):
        raise SystemExit("run tools/gen_sf1_pipeline.py first")
    spark = get_spark(app_name="sf1-growth")
    _ensure_loaded()
    print("| query | t(sf0.1) s | t(sf1) s | ratio (data x10) |")
    print("|---|---|---|---|")
    for name in QUERIES:
        spec = REGISTRY[name]
        ts = {}
        for tag, d in (("sf0.1", SF01), ("sf1", SF1)):
            spark._jvm.System.gc()
            spec.spark(spark, d).count()  # warm plan + JIT (+ index)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                spec.spark(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            ts[tag] = best
            release_caches()
        print(
            f"| {name} | {ts['sf0.1']:.2f} | {ts['sf1']:.2f} "
            f"| {ts['sf1'] / ts['sf0.1']:.1f} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
