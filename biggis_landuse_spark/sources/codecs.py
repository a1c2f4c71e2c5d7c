"""Pixel-sample codecs: the reference's delimited CSV / Kafka message
format and LibSVM import/export (SURVEY.md §2.1 S10-S13).

Wire format (reference UtilsSVM.scala:170-191, 196-256):

    label;f1;…;fn;SpatialKey(c,r);x;y        (with key)
    label;f1;…;fn                            (without key)

The same string codec feeds the Kafka pixel stream (S14/S15), so
encode/decode are pure Spark SQL expressions usable in batch AND
Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLE_SCHEMA = (
    "tile_col int, tile_row int, px int, py int, "
    "label double, features array<double>"
)


def encode_sample(
    label: Column | None = None,
    features: Column | None = None,
    tile_col: Column | None = None,
    tile_row: Column | None = None,
    px: Column | None = None,
    py: Column | None = None,
) -> Column:
    """Row → ``label;f1;…;fn;SpatialKey(c,r);x;y`` string."""
    label = F.col("label") if label is None else label
    features = F.col("features") if features is None else features
    tile_col = F.col("tile_col") if tile_col is None else tile_col
    tile_row = F.col("tile_row") if tile_row is None else tile_row
    px = F.col("px") if px is None else px
    py = F.col("py") if py is None else py
    feats = F.array_join(
        F.transform(features, lambda f: F.format_string("%s", f)), ";"
    )
    return F.concat_ws(
        ";",
        label.cast("string"),
        feats,
        F.format_string("SpatialKey(%d,%d)", tile_col, tile_row),
        px.cast("string"),
        py.cast("string"),
    )


def decode_sample(line: Column) -> Column:
    """``label;f1;…;fn;SpatialKey(c,r);x;y`` string → struct(tile_col,
    tile_row, px, py, label, features). Pure SQL: split + slice +
    regexp_extract — streaming-safe (no UDF).

    ANSI-safe: malformed lines (too few fields, non-numeric tokens)
    decode to NULL fields instead of failing the job — a poison-pill
    Kafka message must never kill the stream."""
    parts = F.split(line, ";")
    n = F.size(parts)
    valid = n >= 5
    key = F.when(valid, F.element_at(parts, n - 2))
    return F.struct(
        F.regexp_extract(key, r"SpatialKey\((-?\d+),(-?\d+)\)", 1)
        .try_cast("int")
        .alias("tile_col"),
        F.regexp_extract(key, r"SpatialKey\((-?\d+),(-?\d+)\)", 2)
        .try_cast("int")
        .alias("tile_row"),
        F.when(valid, F.element_at(parts, n - 1)).try_cast("int").alias("px"),
        F.when(valid, F.element_at(parts, n)).try_cast("int").alias("py"),
        F.element_at(parts, 1).try_cast("double").alias("label"),
        F.when(
            valid,
            F.transform(
                F.slice(parts, 2, F.greatest(n - 4, F.lit(0))),
                lambda s: s.try_cast("double"),
            ),
        ).alias("features"),
    )


def save_samples_csv(
    samples: DataFrame, path: str, single_file: bool = False
) -> None:
    """CSV export of keyed samples (S10; reference SaveAsCSVFileWithKey
    UtilsSVM.scala:196-256). ``single_file`` reproduces the reference's
    coalesce(1) — explicitly NOT the default (driver-safety,
    SURVEY.md §7.5.6)."""
    lines = samples.select(encode_sample().alias("value"))
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)


def load_samples_csv(spark, path: str) -> DataFrame:
    """CSV import of keyed samples (S12; reference LoadFromCSVFileWithKey
    UtilsSVM.scala:259-303)."""
    return (
        spark.read.text(path)
        .select(decode_sample(F.col("value")).alias("s"))
        .select("s.*")
    )


def save_samples_libsvm(samples: DataFrame, path: str) -> None:
    """LibSVM export (S13; reference UtilsML.SaveAsLibSVMFile
    UtilsML.scala:79-112 — which also filters zero labels). Feature
    indices are 1-based; zero values skipped per the format."""
    line = F.concat_ws(
        " ",
        F.col("label").cast("string"),
        F.array_join(
            F.filter(
                F.transform(
                    F.col("features"),
                    lambda v, i: F.when(
                        v.isNotNull() & (v != 0),
                        F.concat_ws(
                            ":", (i + 1).cast("string"), v.cast("string")
                        ),
                    ),
                ),
                lambda s: s.isNotNull(),
            ),
            " ",
        ),
    )
    (
        samples.where(F.col("label") > 0)
        .select(line.alias("value"))
        .write.mode("overwrite")
        .text(path)
    )


def load_samples_libsvm(spark, path: str, n_features: int) -> DataFrame:
    """LibSVM import (reference: MLUtils.loadLibSVMFile,
    TestClassifierSVM.scala:38). Returns (label, features array) with
    absent indices as 0.0."""
    raw = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    pairs = F.transform(
        F.slice(toks, 2, F.size(toks) - 1),
        lambda t: F.struct(
            F.split(t, ":")[0].cast("int").alias("i"),
            F.split(t, ":")[1].cast("double").alias("v"),
        ),
    )
    m = F.map_from_entries(pairs)
    features = F.transform(
        F.sequence(F.lit(1), F.lit(n_features)),
        lambda i: F.coalesce(m[i], F.lit(0.0)),
    )
    return raw.select(
        F.element_at(toks, 1).cast("double").alias("label"),
        features.alias("features"),
    )
