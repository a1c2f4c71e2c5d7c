"""Multimodal-column queries over the `documents` table.

The testdata has no real media files, so each query synthesizes a
binary `content` column from the document text (even doc_ids get a
PNG magic prefix) — the media handling itself (binary columns, typed
metadata, mapInPandas decode) is exactly the production path; see
biggis_landuse_spark.multimodal for the codec-stub policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biggis_landuse_spark import multimodal as MM
from biggis_landuse_spark.queries import load_tables, register

PNG_MAGIC = "89504E47"
FRAME_SIZE = 16
EVERY_N = 2


def _with_content(documents: DataFrame) -> DataFrame:
    """binary content: raw UTF-8 bytes; even doc_ids get a PNG magic
    prefix so kind inference has both branches to classify."""
    raw = F.encode(F.col("text"), "UTF-8")
    content = F.when(
        F.col("doc_id") % 2 == 0, F.concat(F.unhex(F.lit(PNG_MAGIC)), raw)
    ).otherwise(raw)
    return documents.select("doc_id", content.alias("content"))


_CONTENT_SQL = f"""
      CASE WHEN doc_id % 2 = 0
           THEN unhex('{PNG_MAGIC}') || encode(text)
           ELSE encode(text) END
"""


@register(
    "media_metadata",
    oracle=f"""
    WITH m AS (SELECT doc_id, {_CONTENT_SQL} AS content FROM documents)
    SELECT doc_id,
           CAST(octet_length(content) AS INT) AS n_bytes,
           substring(hex(content), 1, 8) AS magic,
           CASE WHEN substring(hex(content), 1, 8) = '{PNG_MAGIC}'
                THEN 'image/png' ELSE 'unknown' END AS kind
    FROM m
    """,
    doc="""Typed metadata over opaque binary media columns — byte length,
    magic prefix, kind inference — all JVM-side Catalyst expressions
    (no Python boundary), so it runs at ingest speed over any corpus
    (SURVEY.md north-star: multimodal columns).""",
    tags=("multimodal",),
    bench=True,
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    return _with_content(documents).select(
        "doc_id", *MM.media_metadata_cols("content")
    )


@register(
    "media_frame_sample",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, octet_length({_CONTENT_SQL}) AS n_bytes FROM documents
    )
    SELECT doc_id,
           CAST(ceil(ceil(n_bytes / {FRAME_SIZE}.0) / {EVERY_N}.0) AS BIGINT)
             AS n_frames_kept
    FROM m
    """,
    doc="""Video-style frame sampling (split byte stream into fixed-size
    frames, keep every Nth) via a mapInPandas UDTF-shaped generator —
    one row in, many rows out; the oracle checks the fan-out
    arithmetic end-to-end.""",
    tags=("multimodal",),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    frames = MM.sample_frames(
        _with_content(documents), every_n=EVERY_N, frame_size=FRAME_SIZE
    )
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames_kept")
    )


@register(
    "media_decode_features",
    oracle=None,  # byte-level fake decode is not SQL-expressible;
    # rows-only check (the decode math itself is covered by
    # tests/test_multimodal.py determinism + shape assertions)
    doc="""Decode (stubbed codec, real Arrow plumbing) → per-item pixel
    feature extraction; the mapInPandas pipeline a training-data prep
    job runs per media item.""",
    tags=("multimodal",),
)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    decoded = MM.decode_media(_with_content(documents))
    return MM.media_features(decoded)
