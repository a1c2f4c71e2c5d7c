"""Streaming document-quality admission — the Gopher gate as a crawl
ingest stream.

The batch twin (queries/pipeline.py::gopher_rules) censuses the rule
suite per source; here each micro-batch of documents is scored with
the SAME shared rule expressions (functions/text.py
gopher_rule_flags) and the flagged rows land in a parquet sink — the
front gate of a streaming crawl pipeline, upstream of the Bloom /
SimHash dedup admissions (streaming/dedup.py). Scoring is
per-document and batch-local (no state at all beyond the checkpoint),
so stream output equals the batch flags on the union of all
micro-batches — pinned by tests/test_streaming_quality.py parity.

Sink semantics: each micro-batch overwrites its own
``batch_id=<id>`` partition directory, so a retry replaces rather
than duplicates — the exactly-once convention the Bloom/SimHash gates
establish (streaming/dedup.py::_write_scored_batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biggis_landuse_spark.functions.text import gopher_rule_flags, tokens
from biggis_landuse_spark.streaming.dedup import _write_scored_batch


def quality_flags(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Batch-local scoring: (id, 7 rule booleans, passed). Shared by
    the stream gate and the parity test's batch side."""
    prepped = docs.select(
        F.col(id_col),
        F.col(text_col).alias("text"),
        tokens(text_col).alias("_t"),
        F.split(text_col, "\n").alias("_lines"),
    )
    fl = gopher_rule_flags()
    passed = None
    for c in fl.values():
        passed = c if passed is None else (passed & c)
    return prepped.select(
        id_col,
        *[c.alias(name) for name, c in fl.items()],
        passed.alias("passed"),
    )


def stream_quality_admit(
    doc_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    admitted_only: bool = False,
):
    """Score a document stream with the Gopher rule suite and append
    the scored (or only the passing) rows to ``out_path`` — returns
    the DataStreamWriter (caller ``.start()``s it)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        scored = quality_flags(batch_df, id_col, text_col)
        if admitted_only:
            scored = scored.where(F.col("passed"))
        _write_scored_batch(scored, out_path, batch_id)

    return (
        doc_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
