"""Streaming Bloom-filter dedup admission — the rolling crawl as a
stream.

The batch twin (queries/textops.py::dedup_bloom) scores an incoming
batch against the snapshot's Bloom bit relation; here the incoming
batch IS a stream: each micro-batch of documents is scored against the
same static bits relation via ``foreachBatch``, and the scored /
admitted rows append to a parquet sink. This is the Structured
Streaming form of the pipeline the reference sketched but never landed
(Kafka source → dedup → sink, SURVEY.md §2.9): the only state beyond
the checkpoint is the bits relation itself, which is refreshed
out-of-band (the crawl's snapshot compaction), so stream state stays
O(1) in stream length.

Scoring is per-document and batch-local
(:func:`biggis_landuse_spark.functions.dedup.bloom_containment`), so
stream output is IDENTICAL to running the batch twin on the union of
all micro-batches — pinned by test_streaming_bloom parity tests.

Sink semantics (r8, ADVICE): each micro-batch writes to a
``batch_id=<id>`` partition directory with overwrite mode, so a
micro-batch RETRY after a sink failure replaces its own directory
instead of appending duplicate rows — exactly-once at the sink, the
same contract the engine's spool DataSource proves for the Kafka
path. Readers see the batch_id as an ordinary partition column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from biggis_landuse_spark.functions.dedup import (
    BLOOM_K,
    BLOOM_M,
    bloom_containment,
)


def _write_scored_batch(
    scored: DataFrame, out_path: str, batch_id: int
) -> None:
    """Idempotent foreachBatch sink: overwrite THIS batch's partition
    directory (retries replace, never duplicate)."""
    scored.write.mode("overwrite").parquet(
        f"{out_path}/batch_id={batch_id}"
    )


def stream_bloom_admit(
    doc_stream: DataFrame,
    bits: DataFrame,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    thresh: float = 0.5,
    admitted_only: bool = False,
):
    """Score a document stream against a static Bloom bit relation and
    append the scored rows to ``out_path`` (parquet).

    ``admitted_only=True`` keeps only un-flagged docs (the admission
    filter a crawl pipeline actually applies); default emits every doc
    with its containment score so downstream policy stays tunable.
    Returns the DataStreamWriter (caller picks trigger/start).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        scored = bloom_containment(
            batch_df, bits, id_col=id_col, text_col=text_col,
            m=m, k=k, thresh=thresh,
        )
        if admitted_only:
            scored = scored.where(~scored.flagged)
        _write_scored_batch(scored, out_path, batch_id)

    return (
        doc_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def stream_simhash_admit(
    doc_stream: DataFrame,
    index: DataFrame,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: int | None = None,
    admitted_only: bool = False,
):
    """NEAR-duplicate admission for a document stream: each micro-batch
    scores against a static simhash band index
    (functions.dedup.simhash_band_index — the snapshot artifact the
    crawl refreshes out-of-band, exactly like the Bloom bits relation)
    and the scored rows append to ``out_path``.

    The Hamming twin of :func:`stream_bloom_admit`: Bloom flags
    shingle-level CONTAINMENT, this flags fingerprint-level NEAR-dups
    (small edits, boilerplate rewraps) within Hamming distance 3 —
    a crawl gate usually runs both. Scoring is per-document and
    batch-local (simhash_near_dup_flags), so stream output equals the
    batch twin on the union of all micro-batches; state beyond the
    checkpoint is the index relation only, O(1) in stream length.

    ``threshold`` is validated EAGERLY against the pigeonhole no-miss
    bound (``SIMHASH_BANDS - 1``; see simhash_near_dup_flags) so a
    too-loose gate fails at plan time, not inside the first
    micro-batch.
    """
    from biggis_landuse_spark.functions.dedup import (
        SIMHASH_BANDS,
        SIMHASH_HAMMING_T,
        simhash_near_dup_flags,
    )

    t = SIMHASH_HAMMING_T if threshold is None else threshold
    if t > SIMHASH_BANDS - 1:
        raise ValueError(
            f"threshold={t} exceeds the pigeonhole no-miss bound "
            f"({SIMHASH_BANDS} bands ⇒ exact only for threshold <= "
            f"{SIMHASH_BANDS - 1})"
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        scored = simhash_near_dup_flags(
            batch_df, index, id_col=id_col, text_col=text_col, threshold=t
        )
        if admitted_only:
            scored = scored.where(~scored.flagged)
        _write_scored_batch(scored, out_path, batch_id)

    return (
        doc_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
