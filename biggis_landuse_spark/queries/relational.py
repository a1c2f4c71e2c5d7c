"""M0 relational operator surface on the driver star schema.

Each query is the star-schema twin of a reference operator
(SURVEY.md §2 mapping column): the reference computes over
``(SpatialKey, Tile)`` collections; the relational shape — scan,
equi-join on keys, per-cell scalar map, global/grouped aggregation,
histogram — is identical, which is what makes a DuckDB oracle
possible.

Float discipline: every floating aggregate is rounded identically on
both sides (2 decimals for currency sums, 4-6 for ratios) so the
order-insensitive value hash is stable across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from biggis_landuse_spark.queries import load_tables, register

# ---------------------------------------------------------------------------
# Flagship: NDVI shape (SURVEY.md §7.3) — J1 join + P1 local op + A1 histogram
# ---------------------------------------------------------------------------


@register(
    "ndvi_shape",
    oracle="""
    SELECT bucket,
           CAST(count(*) AS BIGINT)       AS n_pixels,
           round(avg(ratio), 6)           AS avg_ratio,
           round(sum(net_price), 2)       AS net_revenue
    FROM (
      SELECT CAST(least(greatest(floor(
               ((l.l_extendedprice * (1 - l.l_discount)) / p.p_retailprice)
               / 0.5), 0), 19) AS INT)    AS bucket,
             (l.l_extendedprice * (1 - l.l_discount)) / p.p_retailprice AS ratio,
             l.l_extendedprice * (1 - l.l_discount)  AS net_price
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_retailprice > 0
    )
    GROUP BY bucket
    """,
    doc="""Flagship slice: two-'layer' join on key + per-cell binary op +
    bucketed histogram. Reference twin: NDVI = (nir-red)/(nir+red) after a
    SpatialKey join, then layer histogram
    (/root/reference/src/main/scala/biggis/landuse/spark/examples/
    NDVILayerExample.scala:64-90).""",
    tags=("J1", "P1", "A1"),
    bench=True,
)
def ndvi_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = load_tables(spark, sf_dir, "lineitem", "part")
    ratio = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) / F.col(
        "p_retailprice"
    )
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(
            # no broadcast hint: part is SF-proportional (multi-TB at
            # 100 TB lineitem) — AQE picks broadcast when it fits
            part, lineitem.l_partkey == part.p_partkey, "inner"
        )
        .where(F.col("p_retailprice") > 0)
        .select(
            F.least(
                F.greatest(F.floor(ratio / F.lit(0.5)), F.lit(0)), F.lit(19)
            )
            .cast("int")
            .alias("bucket"),
            ratio.alias("ratio"),
            net.alias("net_price"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_pixels"),
            F.round(F.avg("ratio"), 6).alias("avg_ratio"),
            F.round(F.sum("net_price"), 2).alias("net_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q1 shape — A2 histogram→statistics analog (grouped multi-aggregate)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                            AS sum_qty,
           round(sum(l_extendedprice), 2)                       AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)    AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                                                                AS sum_charge,
           round(avg(l_quantity), 6)                            AS avg_qty,
           round(avg(l_extendedprice), 6)                       AS avg_price,
           round(avg(l_discount), 6)                            AS avg_disc,
           CAST(count(*) AS BIGINT)                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="""Grouped multi-aggregate scan (TPC-H Q1 shape). Reference twin:
    histogram→statistics epilogue of Getis-Ord
    (SpatialGetisOrd.scala:47-53) — mean/stdev/minmax/count over a layer.""",
    tags=("A2",),
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P2 — bit-mask cloud removal analog (bitwise ops + NODATA propagation)
# ---------------------------------------------------------------------------


@register(
    "cloud_mask_shape",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)                    AS n_rows,
           CAST(count(masked_value) AS BIGINT)         AS n_clear,
           round(sum(masked_value), 2)                 AS sum_clear,
           round(avg(masked_value), 6)                 AS avg_clear
    FROM (
      SELECT CASE WHEN (l_linenumber & 4) > 0 OR (l_linenumber & 2) > 0
                  THEN NULL ELSE l_extendedprice END AS masked_value
      FROM lineitem
    )
    """,
    doc="""Bitwise QA mask → NODATA else value. Reference twin: cloud/cirrus
    bit-mask `qa & 0x8000 / & 0x2000 → NODATA`
    (NDVILayerWithCloudMaskExample.scala:54-60). NULL is the engine's
    relational NODATA (SURVEY.md §1.2).""",
    tags=("P2", "P8"),
)
def cloud_mask_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    masked = F.when(
        (F.col("l_linenumber").bitwiseAND(F.lit(4)) > 0)
        | (F.col("l_linenumber").bitwiseAND(F.lit(2)) > 0),
        F.lit(None).cast("double"),
    ).otherwise(F.col("l_extendedprice"))
    return lineitem.select(masked.alias("masked_value")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("masked_value").alias("n_clear"),
        F.round(F.sum("masked_value"), 2).alias("sum_clear"),
        F.round(F.avg("masked_value"), 6).alias("avg_clear"),
    )


# ---------------------------------------------------------------------------
# J2 — 3-layer chained join (NIR ⋈ Red ⋈ QA analog)
# ---------------------------------------------------------------------------


@register(
    "join3_chain",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT)                          AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders   o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="""Chained 3-way equi-join + grouped agg. Reference twin: NIR ⋈ Red ⋈
    QA on SpatialKey (NDVILayerWithCloudMaskExample.scala:73-86). Same-key
    chains share one shuffle under Catalyst. No broadcast hint on customer:
    it grows with SF (multi-TB at 100 TB), so AQE chooses the strategy.""",
    tags=("J2",),
    bench=True,
)
def join3_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# J3 — N-way layer-stack join (fold of joins)
# ---------------------------------------------------------------------------


@register(
    "stack_join",
    oracle="""
    SELECT r.r_name,
           n.n_name,
           CAST(count(*) AS BIGINT)                              AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey   = s.s_suppkey
    JOIN nation   n ON s.s_nationkey = n.n_nationkey
    JOIN region   r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="""N-way fold of equi-joins building a 'multiband stack'. Reference
    twin: ManyLayersToMultibandLayer.scala:193-260 (iterative join +
    band-concat). Small dims are broadcast — no shuffle for the dim side.""",
    tags=("J3", "J4"),
    bench=True,
)
def stack_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier, nation, region = load_tables(
        spark, sf_dir, "lineitem", "supplier", "nation", "region"
    )
    return (
        lineitem.join(
            F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# S6/J6/P12 — layer merge: full-outer join + cell-level coalesce
# ---------------------------------------------------------------------------


@register(
    "merge_coalesce",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_orderkey % 2 = 0
    ), new AS (
      SELECT o_orderkey AS k, o_totalprice * 2 AS v FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT CAST(count(*) AS BIGINT)           AS n_tiles,
           CAST(count(merged) AS BIGINT)      AS n_data,
           round(sum(merged), 2)              AS sum_merged
    FROM (
      SELECT coalesce(old.v, new.v) AS merged
      FROM old FULL OUTER JOIN new ON old.k = new.k
    )
    """,
    doc="""Layer merge/update: full-outer join on the key, prefer existing
    cells, fill NODATA from the update. Reference twin:
    mergeRddIntoLayer (api/package.scala:328-385) + Tile.merge cell
    semantics (P12).""",
    tags=("S6", "J6", "P12"),
)
def merge_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load_tables(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("v_old")
    )
    new = orders.where(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"), (F.col("o_totalprice") * 2).alias("v_new")
    )
    merged = old.join(new, "k", "full_outer").select(
        F.coalesce("v_old", "v_new").alias("merged")
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n_tiles"),
        F.count("merged").alias("n_data"),
        F.round(F.sum("merged"), 2).alias("sum_merged"),
    )


# ---------------------------------------------------------------------------
# A1 — layer histogram (fixed-bin)
# ---------------------------------------------------------------------------


@register(
    "histogram",
    oracle="""
    SELECT CAST(least(greatest(floor(o_totalprice / 25000.0), 0), 19) AS INT)
             AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY 1
    """,
    doc="""Fixed-bin global histogram of a value column. Reference twin:
    `rdd.histogram` written as the layer's histogramData attribute
    (api/package.scala:146).""",
    tags=("A1",),
)
def histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load_tables(spark, sf_dir, "orders")
    bucket = F.least(
        F.greatest(F.floor(F.col("o_totalprice") / 25000.0), F.lit(0)), F.lit(19)
    ).cast("int")
    return (
        orders.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# A2 — global statistics
# ---------------------------------------------------------------------------


@register(
    "layer_stats",
    oracle="""
    SELECT round(avg(l_quantity), 6)    AS mean_v,
           round(stddev(l_quantity), 6) AS stdev_v,
           round(min(l_quantity), 2)    AS min_v,
           round(max(l_quantity), 2)    AS max_v,
           CAST(count(l_quantity) AS BIGINT) AS n
    FROM lineitem
    """,
    doc="""Global mean/stdev/min/max/count. Reference twin: statistics derived
    from the layer histogram for G* standardization
    (SpatialGetisOrd.scala:47-53).""",
    tags=("A2", "P6"),
)
def layer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.round(F.avg("l_quantity"), 6).alias("mean_v"),
        F.round(F.stddev("l_quantity"), 6).alias("stdev_v"),
        F.round(F.min("l_quantity"), 2).alias("min_v"),
        F.round(F.max("l_quantity"), 2).alias("max_v"),
        F.count("l_quantity").alias("n"),
    )


# ---------------------------------------------------------------------------
# A3 — quantile breaks (exact deciles, for the color-map renderer)
# ---------------------------------------------------------------------------

_DECILES = [i / 10 for i in range(1, 10)]


@register(
    "quantile_breaks",
    oracle=" UNION ALL ".join(
        f"SELECT {i} AS decile, round(quantile_cont(o_totalprice, {q}), 4) "
        f"AS break_value FROM orders"
        for i, q in enumerate(_DECILES, start=1)
    ),
    doc="""Exact decile breaks of a value column — the color-map class breaks
    of the tile server. Reference twin: quantileBreaks(10) for PNG render
    (ServeLayerAsMap.scala:91-93). Interpolated percentile on both sides.""",
    tags=("A3", "S18"),
)
def quantile_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load_tables(spark, sf_dir, "orders")
    aggs = [
        F.round(F.percentile("o_totalprice", F.lit(q)), 4).alias(f"d{i}")
        for i, q in enumerate(_DECILES, start=1)
    ]
    wide = orders.agg(*aggs)
    stack_expr = "stack(9, " + ", ".join(
        f"{i}, d{i}" for i in range(1, 10)
    ) + ") as (decile, break_value)"
    return wide.selectExpr(stack_expr)


# ---------------------------------------------------------------------------
# S18 — color-map classification (the render half of the tile server)
# ---------------------------------------------------------------------------

_CM_BREAKS = [10.0, 20.0, 30.0, 40.0]
_CM_PALETTE = (0x30123BFF, 0x3E9BFEFF, 0x46F884FF, 0xFDA531FF, 0x7A0403FF)


@register(
    "color_map_buckets",
    oracle=f"""
    SELECT CAST(CASE
             WHEN l_quantity <= 10 THEN {0x30123BFF}
             WHEN l_quantity <= 20 THEN {0x3E9BFEFF}
             WHEN l_quantity <= 30 THEN {0x46F884FF}
             WHEN l_quantity <= 40 THEN {0xFDA531FF}
             ELSE {0x7A0403FF} END AS BIGINT) AS rgba,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY 1
    """,
    doc="""Color-map classification (value → RGBA class via CASE-WHEN chain)
    aggregated to class counts — the JVM-side bulk-render path of the
    tile server (ServeLayerAsMap.scala:88-94); serving.color_map_expr
    is the same expression the PNG renderer applies per pixel.""",
    tags=("S18",),
)
def color_map_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biggis_landuse_spark.serving import color_map_expr

    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.select(
            color_map_expr("l_quantity", _CM_BREAKS, _CM_PALETTE).alias("rgba")
        )
        .groupBy("rgba")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# A6 — word count (the reference's own WordCount.scala)
# ---------------------------------------------------------------------------


@register(
    "word_count",
    oracle="""
    SELECT word, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
    doc="""Tokenize + count. Reference twin: WordCount.scala:22-26
    (flatMap split → reduceByKey) re-expressed as explode + groupBy.""",
    tags=("A6", "S16"),
)
def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    return (
        documents.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# P9 — distinct / dedup before stitching
# ---------------------------------------------------------------------------


@register(
    "distinct_keys",
    oracle="""
    SELECT p_brand, p_type, CAST(count(*) AS BIGINT) AS n_parts
    FROM (SELECT DISTINCT p_brand, p_type, p_partkey FROM part)
    GROUP BY p_brand, p_type
    """,
    doc="""Key-level dedup then count. Reference twin: `.distinct` on the tile
    RDD before stitching (LayerToGeotiff.scala:76).""",
    tags=("P9",),
)
def distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = load_tables(spark, sf_dir, "part")
    return (
        part.select("p_brand", "p_type", "p_partkey")
        .dropDuplicates()
        .groupBy("p_brand", "p_type")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# P5/P6 — per-group min-max normalization (agg + broadcast-back)
# ---------------------------------------------------------------------------


@register(
    "minmax_normalize",
    oracle="""
    SELECT s_nationkey,
           round(avg(norm), 6)  AS avg_norm,
           round(min(norm), 6)  AS min_norm,
           round(max(norm), 6)  AS max_norm
    FROM (
      SELECT s_nationkey,
             CASE WHEN max(s_acctbal) OVER (PARTITION BY s_nationkey)
                     = min(s_acctbal) OVER (PARTITION BY s_nationkey)
                  THEN 0.0
                  ELSE (s_acctbal - min(s_acctbal) OVER (PARTITION BY s_nationkey))
                     / (max(s_acctbal) OVER (PARTITION BY s_nationkey)
                      - min(s_acctbal) OVER (PARTITION BY s_nationkey))
             END AS norm
      FROM supplier
    )
    GROUP BY s_nationkey
    """,
    doc="""Per-band min-max normalize to [0,1]: grouped min/max then rescale.
    Reference twin: UtilsSVM.NormalizeMultibandTile + findMinMaxDouble
    (UtilsSVM.scala:316-386). Window form here; tile form uses agg+join.""",
    tags=("P5", "P6", "A7"),
)
def minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    (supplier,) = load_tables(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey")
    mn, mx = F.min("s_acctbal").over(w), F.max("s_acctbal").over(w)
    norm = F.when(mx == mn, F.lit(0.0)).otherwise(
        (F.col("s_acctbal") - mn) / (mx - mn)
    )
    return (
        supplier.select("s_nationkey", norm.alias("norm"))
        .groupBy("s_nationkey")
        .agg(
            F.round(F.avg("norm"), 6).alias("avg_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
    )


# ---------------------------------------------------------------------------
# O1/W — top-k per group (window ranking, extended surface)
# ---------------------------------------------------------------------------


@register(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    doc="""Top-k per group via ranking window — the engine's extension beyond
    the reference's driver-side `sortBy(_.zoom).last` (O1,
    NDVILayerExample.scala:96-97). Tie-broken deterministically.""",
    tags=("O1", "W"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load_tables(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# W — running aggregate (cumulative window, deterministic ordering)
# ---------------------------------------------------------------------------


@register(
    "running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
    FROM lineitem
    WHERE l_suppkey % 50 = 0
    """,
    doc="""Cumulative sum per key with a total deterministic order — the
    engine's window surface (absent in the reference, SURVEY.md §2.5).""",
    tags=("W",),
)
def running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return lineitem.where(F.col("l_suppkey") % 50 == 0).select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
    )


# ---------------------------------------------------------------------------
# §2.7 — set operations (engine-extended surface)
# ---------------------------------------------------------------------------


@register(
    "set_ops",
    oracle="""
    SELECT 'union' AS op, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS k FROM customer UNION
      SELECT s_nationkey AS k FROM supplier)
    UNION ALL
    SELECT 'intersect' AS op, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS k FROM customer INTERSECT
      SELECT s_nationkey AS k FROM supplier)
    UNION ALL
    SELECT 'except' AS op, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS k FROM customer EXCEPT
      SELECT s_nationkey AS k FROM supplier)
    """,
    doc="""union/intersect/except — absent in the reference (SURVEY.md §2.7),
    exposed natively by the engine.""",
    tags=("SET",),
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, supplier = load_tables(spark, sf_dir, "customer", "supplier")
    c = customer.select(F.col("c_nationkey").alias("k"))
    s = supplier.select(F.col("s_nationkey").alias("k"))
    rows = [
        ("union", c.union(s).distinct()),
        ("intersect", c.intersect(s)),
        ("except", c.subtract(s)),  # distinct-based EXCEPT, like SQL
    ]
    out = None
    for op, df in rows:
        cnt = df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "n"
        )
        out = cnt if out is None else out.union(cnt)
    return out


# ---------------------------------------------------------------------------
# ROLLUP — hierarchical aggregate (engine-extended; pyramid-adjacent)
# ---------------------------------------------------------------------------


@register(
    "rollup_revenue",
    oracle="""
    SELECT r.r_name, n.n_name,
           round(sum(s.s_acctbal), 2)  AS sum_bal,
           CAST(count(*) AS BIGINT)    AS n
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    HAVING count(*) > 0
    """,
    doc="""ROLLUP grouping-set aggregate — free via Spark SQL
    (SURVEY.md §2.4 note), the relational cousin of the pyramid's
    level-by-level aggregation.""",
    tags=("A8", "SQL"),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier, nation, region = load_tables(
        spark, sf_dir, "supplier", "nation", "region"
    )
    return (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("s_acctbal"), 2).alias("sum_bal"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# A8 shape — one pyramid level: parent key = child key div 2, 4→1 reduction
# ---------------------------------------------------------------------------


@register(
    "pyramid_level",
    oracle="""
    SELECT CAST(floor(l_partkey / 4) AS BIGINT)  AS parent_key,
           CAST(count(*) AS BIGINT)              AS n_children,
           round(sum(l_quantity), 2)             AS sum_qty,
           round(avg(l_quantity), 6)             AS avg_qty
    FROM lineitem
    GROUP BY 1
    """,
    doc="""One pyramid level: children aggregate to parent under integer-
    divided keys — the keying of `Pyramid.upLevels` 2×2→1 downsampling
    (GeotiffToPyramid.scala:58-69; ZoomResampleTEST.scala:29-36 inverse).""",
    tags=("A8",),
    bench=True,
)
def pyramid_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy(
            F.floor(F.col("l_partkey") / 4).cast("long").alias("parent_key")
        )
        .agg(
            F.count(F.lit(1)).alias("n_children"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        )
    )


# ---------------------------------------------------------------------------
# A9/O1 — max-zoom lookup (catalog metadata predicate)
# ---------------------------------------------------------------------------


@register(
    "max_zoom_lookup",
    oracle="""
    SELECT o_orderstatus,
           CAST(max(o_orderkey) AS BIGINT)  AS max_key,
           CAST(count(*) AS BIGINT)         AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="""Per-group max lookup. Reference twin: `layerIds.maxBy(_.zoom)` /
    finestZoom resolution over the catalog (api/package.scala:114-121,
    NDVILayerExample.scala:95-103).""",
    tags=("A9", "P11", "O1"),
)
def max_zoom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load_tables(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.max("o_orderkey").cast("long").alias("max_key"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# P10 — train/test split (content-hash mode: fully oracle-checkable)
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


@register(
    "hash_split_counts",
    oracle=f"""
    WITH b AS (
      SELECT (instr('{_HEX}', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1) * 16
             + instr('{_HEX}', substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) - 1
               AS bucket
      FROM orders
    )
    , c AS (
      SELECT CASE WHEN bucket < 154 THEN 'train' ELSE 'test' END AS split,
             count(*) AS n
      FROM b GROUP BY 1
    ),
    g AS (SELECT 'train' AS split UNION ALL SELECT 'test')
    -- static grid: the engine emits BOTH splits (two global aggregates
    -- unioned), so an empty bucket must appear as 0, not vanish
    SELECT g.split, CAST(coalesce(c.n, 0) AS BIGINT) AS n
    FROM g LEFT JOIN c ON g.split = c.split
    """,
    doc="""60/40 train/test split via ml.classify.split_samples
    (mode="hash"): md5(key) first-byte bucket < round(0.6*256)=154 — a
    pure function of the row key, so the split is reproducible across
    runs, backfills, and engines (this oracle checks the exact
    memberships, which a seeded-RNG split can never offer). The
    reference-compat seeded randomSplit (UtilsSVM.SplitSamples,
    UtilsSVM.scala:57-63, seed 11 per TestClassifierSVM.scala:41-43)
    remains split_samples' default mode, covered by pytest determinism
    + disjointness + fraction-bounds tests.""",
    tags=("P10",),
)
def hash_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biggis_landuse_spark.ml.classify import split_samples

    (orders,) = load_tables(spark, sf_dir, "orders")
    train, test = split_samples(orders, mode="hash", key_col="o_orderkey")
    return (
        train.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("train").alias("split"), "n"
        )
        .union(
            test.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("test").alias("split"), "n"
            )
        )
    )


@register(
    "cube_revenue",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(count(*) AS BIGINT)      AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    HAVING count(*) > 0
    """,
    doc="""CUBE grouping-sets aggregate (flag × status × both margins +
    grand total) — the multi-dimensional rollup surface Spark gives
    the engine for free beyond the reference (SURVEY.md §2.4 note);
    one shuffle, partial-aggregated per grouping set.""",
    tags=("A",),
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "revenue",
        )
    )


@register(
    "rollup_calendar",
    oracle="""
    SELECT COALESCE(CAST(year(o_orderdate) AS BIGINT), -1)  AS yr,
           COALESCE(CAST(month(o_orderdate) AS BIGINT), -1) AS mo,
           CAST(count(*) AS BIGINT)                         AS n_orders,
           round(sum(o_totalprice), 2)                      AS revenue
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
    HAVING count(*) > 0
    """,
    doc="""ROLLUP over the calendar hierarchy (year > month > grand
    total) — the hierarchical cousin of cube_revenue: month rows,
    year subtotals, and the grand total from ONE shuffle with
    per-grouping-set partial aggregation (Expand + hash agg), never
    three scans. Margin keys surface as -1 (dates never yield it).""",
    tags=("A",),
)
def rollup_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load_tables(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("_yr"),
            F.month("o_orderdate").alias("_mo"),
            "o_totalprice",
        )
        .rollup("_yr", "_mo")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce(F.col("_yr").cast("long"), F.lit(-1)).alias("yr"),
            F.coalesce(F.col("_mo").cast("long"), F.lit(-1)).alias("mo"),
            "n_orders",
            "revenue",
        )
    )
