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

# Totality filter, applied IDENTICALLY on both engines wherever the
# engine side runs a frame/pixel GENERATOR (zero rows out for a
# NULL/empty payload) while the oracle side scans documents (a row per
# doc regardless) — the engine/oracle mismatch class the r6 advisor
# flagged on media_scene_cuts; a nulled-corpus oracle sweep found the
# same latent skew in the decode_media family.
_DOC_FILTER_SQL = "WHERE text IS NOT NULL AND octet_length(encode(text)) > 0"


def _nonempty_docs(documents: DataFrame) -> DataFrame:
    return documents.where(
        F.col("text").isNotNull()
        & (F.octet_length(F.encode(F.col("text"), "UTF-8")) > 0)
    )


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
      {_DOC_FILTER_SQL}
    )
    SELECT doc_id,
           CAST(ceil(ceil(n_bytes / {FRAME_SIZE}.0) / {EVERY_N}.0) AS BIGINT)
             AS n_frames_kept
    FROM m
    """,
    doc="""Video-style frame sampling (split byte stream into fixed-size
    frames, keep every Nth) via a mapInPandas UDTF-shaped generator —
    one row in, many rows out; the oracle checks the fan-out
    arithmetic end-to-end. NULL/empty-text docs are filtered on BOTH
    sides (the generator emits zero frames for them, a bare document
    scan emits a NULL-count row — the totality mismatch class the
    r6 advisor flagged on media_scene_cuts).""",
    tags=("multimodal",),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    docs = _nonempty_docs(documents)
    frames = MM.sample_frames(
        _with_content(docs), every_n=EVERY_N, frame_size=FRAME_SIZE
    )
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames_kept")
    )


_HEXD = "0123456789ABCDEF"


def _byte_sql(hx: str, pos: str) -> str:
    """DuckDB: integer value of byte at 0-based position ``pos`` of the
    blob whose hex string is ``hx``."""
    return (
        f"((instr('{_HEXD}', substr({hx}, 2*({pos})+1, 1))-1)*16"
        f" + instr('{_HEXD}', substr({hx}, 2*({pos})+2, 1))-1)"
    )


@register(
    "media_decode_features",
    oracle=f"""
    WITH m AS (SELECT doc_id, {_CONTENT_SQL} AS content FROM documents
               {_DOC_FILTER_SQL}),
    meta AS (
      SELECT doc_id, hex(content) AS hx, octet_length(content) AS len FROM m
    ),
    dims AS (
      SELECT doc_id, hx, len,
             1 + {_byte_sql("hx", "0")} % 4       AS w,
             1 + {_byte_sql("hx", "len - 1")} % 4 AS h,
             1 + len % 3                           AS c
      FROM meta
    ),
    idx AS (SELECT doc_id, hx, len, unnest(range(w*h*c)) AS i FROM dims),
    px AS (
      SELECT doc_id, {_byte_sql("hx", "i % len")} / 255.0 AS v FROM idx
    ),
    mu AS (SELECT doc_id, avg(v) AS mean FROM px GROUP BY doc_id)
    SELECT p.doc_id,
           CAST(count(*) AS INT) AS n_pixels,
           round(any_value(u.mean), 6) AS mean_px,
           round(sqrt(avg((p.v - u.mean) * (p.v - u.mean))), 6) AS std_px,
           round(avg(CASE WHEN p.v > 0.5 THEN 1.0 ELSE 0.0 END), 6)
             AS p_bright
    FROM px p JOIN mu u ON p.doc_id = u.doc_id
    GROUP BY p.doc_id
    """,
    doc="""Decode (stubbed codec, real Arrow plumbing) → per-item pixel
    feature extraction; the mapInPandas pipeline a training-data prep
    job runs per media item. The oracle replays the deterministic fake
    decode byte-for-byte in SQL (same _byte_sql machinery as
    media_pixel_stats) and mirrors numpy's two-pass population std
    (mean first, then mean of squared deviations, then sqrt) so both
    engines evaluate the same operations; all floats 6dp-rounded at
    the output sync point per SCALING.md.""",
    tags=("multimodal",),
)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    decoded = MM.decode_media(_with_content(_nonempty_docs(documents)))
    feats = MM.media_features(decoded)
    return feats.select(
        "doc_id",
        "n_pixels",
        F.round("mean", 6).alias("mean_px"),
        F.round("std", 6).alias("std_px"),
        F.round("p_bright", 6).alias("p_bright"),
    )


@register(
    "media_pixel_stats",
    oracle=f"""
    WITH m AS (SELECT doc_id, {_CONTENT_SQL} AS content FROM documents
               {_DOC_FILTER_SQL}),
    meta AS (
      SELECT doc_id, hex(content) AS hx, octet_length(content) AS len FROM m
    ),
    dims AS (
      SELECT doc_id, hx, len,
             1 + {_byte_sql("hx", "0")} % 4       AS w,
             1 + {_byte_sql("hx", "len - 1")} % 4 AS h,
             1 + len % 3                           AS c
      FROM meta
    ),
    idx AS (SELECT doc_id, hx, len, unnest(range(w*h*c)) AS i FROM dims),
    px AS (
      SELECT doc_id, {_byte_sql("hx", "i % len")} / 255.0 AS v FROM idx
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_px,
           round(avg(v), 6)         AS mean_px,
           round(avg(CASE WHEN v > 0.5 THEN 1.0 ELSE 0.0 END), 6) AS p_bright
    FROM px
    GROUP BY doc_id
    """,
    doc="""Decode (mapInPandas stub codec, real Arrow plumbing) → JVM-side
    pixel statistics: explode the decoded pixel array and aggregate
    with built-ins. The oracle re-derives the deterministic fake decode
    byte-for-byte in SQL, so the whole Python-decode → JVM-aggregate
    pipeline is hash-checked (upgrade over the rows-only
    media_decode_features check).""",
    tags=("multimodal",),
)
def media_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    decoded = MM.decode_media(_with_content(_nonempty_docs(documents)))
    ex = decoded.select("doc_id", F.explode("pixels").alias("v"))
    return ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_px"),
        F.round(F.avg("v"), 6).alias("mean_px"),
        F.round(
            F.avg((F.col("v") > 0.5).cast("double")), 6
        ).alias("p_bright"),
    )


@register(
    "media_resize_stats",
    oracle=f"""
    WITH m AS (SELECT doc_id, {_CONTENT_SQL} AS content FROM documents
               {_DOC_FILTER_SQL}),
    meta AS (
      SELECT doc_id, hex(content) AS hx, octet_length(content) AS len FROM m
    ),
    dims AS (
      SELECT doc_id, hx, len,
             1 + {_byte_sql("hx", "0")} % 4       AS w,
             1 + {_byte_sql("hx", "len - 1")} % 4 AS h,
             1 + len % 3                           AS c
      FROM meta
    ),
    grid AS (
      SELECT doc_id, hx, len, w, h, c,
             unnest(range(2)) AS oy
      FROM dims
    ),
    grid2 AS (SELECT *, unnest(range(2)) AS ox FROM grid),
    grid3 AS (SELECT *, unnest(range(c)) AS ch FROM grid2),
    src AS (
      SELECT doc_id,
             (least(oy * h // 2, h - 1) * w
              + least(ox * w // 2, w - 1)) * c + ch AS i,
             hx, len
      FROM grid3
    ),
    px AS (
      SELECT doc_id, {_byte_sql("hx", "i % len")} / 255.0 AS v FROM src
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_px,
           round(avg(v), 6)         AS mean_px
    FROM px
    GROUP BY doc_id
    """,
    doc="""Decode → nearest-neighbor resize to 2×2 (multimodal.py
    resize_images: real numpy NN index math, stubbed byte codec) →
    pixel statistics. The oracle replays the decoder AND the resize
    index arithmetic (sy = oy*h//2 clamped, channel-interleaved
    offsets) byte-for-byte in SQL, hash-checking the full
    Python-resize pipeline the way media_pixel_stats checks decode.""",
    tags=("multimodal",),
)
def media_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    decoded = MM.decode_media(_with_content(_nonempty_docs(documents)))
    small = MM.resize_images(decoded, out_w=2, out_h=2)
    ex = small.select("doc_id", F.explode("pixels").alias("v"))
    return ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_px"),
        F.round(F.avg("v"), 6).alias("mean_px"),
    )


@register(
    "media_phash_dedup",
    oracle=f"""
    WITH m AS (SELECT doc_id, {_CONTENT_SQL} AS content FROM documents
               {_DOC_FILTER_SQL}),
    meta AS (
      SELECT doc_id, hex(content) AS hx, octet_length(content) AS len FROM m
    ),
    dims AS (
      SELECT doc_id, hx, len,
             1 + {_byte_sql("hx", "0")} % 4       AS w,
             1 + {_byte_sql("hx", "len - 1")} % 4 AS h,
             1 + len % 3                           AS c
      FROM meta
    ),
    grid AS (SELECT *, unnest(range(2)) AS oy FROM dims),
    grid2 AS (SELECT *, unnest(range(3)) AS ox FROM grid),
    grid3 AS (SELECT *, unnest(range(c)) AS ch FROM grid2),
    src AS (
      SELECT doc_id, oy * 3 + ox AS p,
             (least(oy * h // 2, h - 1) * w
              + least(ox * w // 3, w - 1)) * c + ch AS i,
             hx, len
      FROM grid3
    ),
    g AS (
      SELECT doc_id, p,
             CAST(sum({_byte_sql("hx", "i % len")}) AS BIGINT) AS gi
      FROM src GROUP BY doc_id, p
    ),
    piv AS (
      SELECT doc_id,
             max(CASE WHEN p = 0 THEN gi END) AS g0,
             max(CASE WHEN p = 1 THEN gi END) AS g1,
             max(CASE WHEN p = 2 THEN gi END) AS g2,
             max(CASE WHEN p = 3 THEN gi END) AS g3,
             max(CASE WHEN p = 4 THEN gi END) AS g4,
             max(CASE WHEN p = 5 THEN gi END) AS g5
      FROM g GROUP BY doc_id
    ),
    hashed AS (
      SELECT doc_id,
             CAST(CASE WHEN g1 > g0 THEN 1 ELSE 0 END
                + CASE WHEN g2 > g1 THEN 2 ELSE 0 END
                + CASE WHEN g4 > g3 THEN 4 ELSE 0 END
                + CASE WHEN g5 > g4 THEN 8 ELSE 0 END AS BIGINT) AS phash
      FROM piv
    )
    SELECT phash,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_dup_pairs
    FROM hashed GROUP BY phash
    """,
    doc="""Perceptual-hash (dHash) image dedup: decode → NN-resize to a
    3x2 grayscale thumbnail → 4-bit difference hash (each bit = "is
    the next column brighter", the classic dHash construction at toy
    width; production uses 9x8 → 64 bits with the SAME plan) → bucket
    images by hash. Near-duplicate images (re-encodes, small crops)
    land in one bucket, turning image dedup into an equi-join exactly
    like MinHash does for text. Grayscale is compared as the EXACT
    integer byte sum per thumbnail cell (order-free, engine-portable
    — never an order-dependent float mean), so the bit pattern is
    deterministic. The oracle replays decode, resize index math, and
    the hash byte-for-byte in SQL.

    Scale shape: decode+resize are one Arrow-batched mapInPandas pass
    (constant memory per worker), the hash is a pure column expression
    over the 6c-element thumbnail, and the ONLY shuffle is the final
    partial-aggregated groupBy on the hash value — bucket count is
    bounded by 2^bits, and per-bucket candidate verification (not
    materialized here) would sub-split hot buckets exactly like
    embedding_near_dup's LSH path.""",
    tags=("multimodal", "DEDUP"),
)
def media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    decoded = MM.decode_media(_with_content(_nonempty_docs(documents)))
    small = MM.resize_images(decoded, out_w=3, out_h=2)
    # exact integer byte sum per thumbnail cell: recover the byte from
    # the /255.0 double (round is exact — the double is b/255.0 ± ulp)
    gray = F.expr(
        "transform(sequence(0, 5), p -> aggregate("
        "  slice(pixels, p * channels + 1, channels), 0L,"
        "  (a, x) -> a + cast(round(x * 255.0) as bigint)))"
    ).alias("g")
    bit = lambda hi, lo, v: F.when(  # noqa: E731
        F.element_at("g", hi) > F.element_at("g", lo), F.lit(v)
    ).otherwise(F.lit(0))
    hashed = small.select("doc_id", gray).select(
        "doc_id",
        (bit(2, 1, 1) + bit(3, 2, 2) + bit(5, 4, 4) + bit(6, 5, 8))
        .cast("long")
        .alias("phash"),
    )
    return hashed.groupBy("phash").agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        (F.count(F.lit(1)) * (F.count(F.lit(1)) - 1) / 2)
        .cast("long")
        .alias("n_dup_pairs"),
    )


def _wav_le32(n):
    """Little-endian 32-bit size field as Catalyst expressions."""
    h = F.lpad(F.hex(n), 8, "0")
    return F.unhex(
        F.concat(
            F.substring(h, 7, 2),
            F.substring(h, 5, 2),
            F.substring(h, 3, 2),
            F.substring(h, 1, 2),
        )
    )


def _wav_content(payload, plen):
    """8-bit PCM mono RIFF/WAV container around ``payload`` bytes."""
    return F.concat(
        F.unhex(F.lit("52494646")),       # RIFF
        _wav_le32(plen + 36),
        F.unhex(F.lit(_WAV_FIXED_HEX)),
        _wav_le32(plen),
        payload,
    )


# 8-bit PCM mono WAV header pieces (RIFF spec). After "RIFF" + the
# LE32 riff size comes this fixed 32-byte run: "WAVE", "fmt ", LE32(16),
# the <HHIIHH fmt chunk (PCM=1, mono, 8000 Hz, byte rate 8000,
# block align 1, 8 bits), then "data". Only the two LE32 sizes vary.
_WAV_FIXED_HEX = (
    "57415645"          # WAVE
    "666D7420" "10000000"  # fmt , chunk size 16
    "0100" "0100" "401F0000" "401F0000" "0100" "0800"
    "64617461"          # data
)


@register(
    "media_audio_stats",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS len
      FROM documents
      WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
    ),
    idx AS (SELECT doc_id, len, hx, unnest(range(len)) AS i FROM m),
    s AS (
      SELECT doc_id, len, i,
             {_byte_sql("hx", "i")} - 128 AS q
      FROM idx
    ),
    zc AS (
      SELECT a.doc_id,
             count(*) FILTER (WHERE (a.q < 0) <> (b.q < 0)) AS z
      FROM s a JOIN s b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      GROUP BY a.doc_id
    ),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT)    AS n,
             CAST(sum(abs(q)) AS BIGINT) AS sum_abs,
             CAST(max(abs(q)) AS BIGINT) AS max_abs,
             CAST(sum(q * q) AS BIGINT)  AS energy
      FROM s GROUP BY doc_id
    )
    SELECT agg.doc_id,
           n AS n_samples,
           round(CAST(sum_abs AS DOUBLE) * 1000000.0
                 / (128.0 * CAST(n AS DOUBLE))) / 1000000.0 AS mean_amp,
           round(CAST(max_abs AS DOUBLE) / 128.0 * 1000000.0)
                 / 1000000.0                                AS peak_amp,
           round(sqrt(CAST(energy AS DOUBLE)
                      / (16384.0 * CAST(n AS DOUBLE))) * 1000000.0)
                 / 1000000.0                                AS rms_amp,
           CASE WHEN n > 1
                THEN round(CAST(coalesce(z, 0) AS DOUBLE) * 1000000.0
                           / CAST(n - 1 AS DOUBLE)) / 1000000.0
           END AS zero_cross_rate
    FROM agg LEFT JOIN zc ON agg.doc_id = zc.doc_id
    """,
    doc="""Audio feature extraction through the REAL stdlib WAV codec:
    each document's bytes become an 8-bit PCM mono WAV (RIFF header
    built as pure Catalyst expressions — the two little-endian sizes
    come from byte-swapped hex of the length column), decode_media
    (codec="wav", Arrow-batched mapInPandas) parses the RIFF
    container and normalizes samples to [-1, 1], and the features
    (mean/peak amplitude, RMS energy, zero-crossing rate) are column
    expressions over the sample array. The oracle replays the payload
    byte math — decode(synthesize(text)) == (byte-128)/128 per text
    byte — so the full synthesize → RIFF walk → normalize → featurize
    pipeline is hash-checked.

    Float discipline (SCALING.md): 8-bit samples are 1/128 dyadics,
    so naive 6dp rounding of their means lands EXACTLY on ...5
    boundaries (found at sf0.001: 3348/12800 = 0.2615625) where
    engine round() paths diverge. All statistics are therefore
    aggregated as EXACT integer sums (|q|, q², with q = byte-128) and
    both engines apply the IDENTICAL sync expression
    round(int_sum * 1e6 / denom) / 1e6 — every intermediate double is
    either exact or the correctly-rounded result of the same IEEE
    op, and both engines round halves away from zero for positives.
    NULL/empty text is filtered on both sides — the real-codec path
    raises on torn containers by contract (honest bound), so a
    crawl's failed extractions must be gated before decode.

    Scale shape: one mapInPandas pass (constant memory per worker,
    payloads never cross the driver), features fused in codegen over
    the returned array, NO shuffle at all — the result stays
    co-partitioned with the input file splits.""",
    tags=("multimodal",),
)
def media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    plen = F.octet_length(payload)
    docs = documents.where(F.col("text").isNotNull() & (plen > 0))
    content = _wav_content(payload, plen)
    decoded = MM.decode_media(
        docs.select("doc_id", content.alias("content")), codec="wav"
    )
    # recover the exact integer q = byte-128 from the /128 double
    # (x*128 is exact; round() only strips the cast ulp)
    qs = F.expr(
        "transform(pixels, x -> cast(round(x * 128.0) as bigint))"
    )
    n = F.size("pixels")
    stats = decoded.select(
        "doc_id",
        n.cast("long").alias("n"),
        qs.alias("q"),
    ).select(
        "doc_id",
        "n",
        F.expr("aggregate(q, 0L, (a, x) -> a + abs(x))").alias("sum_abs"),
        F.expr("array_max(transform(q, x -> abs(x)))").alias("max_abs"),
        F.expr("aggregate(q, 0L, (a, x) -> a + x * x)").alias("energy"),
        F.expr(
            "size(filter(zip_with("
            "  slice(q, 1, size(q) - 1), slice(q, 2, size(q) - 1),"
            "  (a, b) -> (a < 0L) != (b < 0L)), x -> x))"
        ).alias("z"),
    )
    sync = lambda c: F.round(c * 1000000.0) / 1000000.0  # noqa: E731
    return stats.select(
        "doc_id",
        F.col("n").alias("n_samples"),
        (
            F.round(
                F.col("sum_abs").cast("double")
                * 1000000.0
                / (128.0 * F.col("n").cast("double"))
            )
            / 1000000.0
        ).alias("mean_amp"),
        sync(F.col("max_abs").cast("double") / 128.0).alias("peak_amp"),
        sync(
            F.sqrt(
                F.col("energy").cast("double")
                / (16384.0 * F.col("n").cast("double"))
            )
        ).alias("rms_amp"),
        F.when(
            F.col("n") > 1,
            F.round(
                F.col("z").cast("double")
                * 1000000.0
                / (F.col("n") - 1).cast("double")
            )
            / 1000000.0,
        ).alias("zero_cross_rate"),
    )


# audio analysis frame: 64 samples = 8 ms at the container's 8 kHz
_FRAME_SAMPLES = 64


@register(
    "media_audio_frames",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS len
      FROM documents
      WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
    ),
    idx AS (SELECT doc_id, len, hx, unnest(range(len)) AS i FROM m),
    s AS (
      SELECT doc_id, CAST(i // {_FRAME_SAMPLES} AS INT) AS frame_id,
             {_byte_sql("hx", "i")} - 128 AS q
      FROM idx
    )
    SELECT doc_id, frame_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           round(CAST(max(abs(q)) AS DOUBLE) / 128.0 * 1000000.0)
                 / 1000000.0 AS peak_amp,
           round(sqrt(CAST(sum(q * q) AS DOUBLE)
                      / (16384.0 * CAST(count(*) AS DOUBLE))) * 1000000.0)
                 / 1000000.0 AS rms_amp
    FROM s GROUP BY 1, 2
    """,
    doc="""Short-time audio analysis frames through the REAL stdlib WAV
    codec: the decoded sample array is sliced into fixed 64-sample
    (8 ms at 8 kHz) windows ENTIRELY inside codegen — transform over a
    frame-index sequence + slice + posexplode, no second decode, no
    Python — and each frame reports peak and RMS amplitude, the
    short-time energy series VAD / silence-trimming / loudness
    normalization pipelines run before feeding audio to a trainer.
    The tail frame keeps its true (shorter) length rather than being
    padded, so frame statistics never mix synthesized zeros into real
    audio. Same integer-exact float discipline as media_audio_stats:
    per-frame statistics aggregate EXACT integer q=byte-128 sums and
    both engines apply the identical round(x*1e6)/1e6 sync expression.
    Scale shape: one mapInPandas decode pass, frames fused in codegen,
    the per-(doc, frame) aggregate is already grouped by construction
    (posexplode emits each frame exactly once) — NO shuffle at all;
    the frame relation stays co-partitioned with the input splits.""",
    tags=("multimodal",),
)
def media_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    plen = F.octet_length(payload)
    docs = documents.where(F.col("text").isNotNull() & (plen > 0))
    decoded = MM.decode_media(
        docs.select("doc_id", _wav_content(payload, plen).alias("content")),
        codec="wav",
    )
    n = _FRAME_SAMPLES
    qs = F.expr("transform(pixels, x -> cast(round(x * 128.0) as bigint))")
    frames = F.expr(
        f"transform(sequence(0, cast(ceil(size(q) / {n}.0) as int) - 1), "
        f"j -> slice(q, j * {n} + 1, {n}))"
    )
    per_frame = decoded.select("doc_id", qs.alias("q")).select(
        "doc_id", F.posexplode(frames).alias("frame_id", "f")
    )
    nf = F.size("f").cast("long")
    energy = F.expr("aggregate(f, 0L, (a, x) -> a + x * x)")
    peak = F.expr("array_max(transform(f, x -> abs(x)))")
    return per_frame.select(
        "doc_id",
        "frame_id",
        nf.alias("n_samples"),
        (F.round(peak.cast("double") / 128.0 * 1000000.0) / 1000000.0).alias(
            "peak_amp"
        ),
        (
            F.round(
                F.sqrt(
                    energy.cast("double") / (16384.0 * nf.cast("double"))
                )
                * 1000000.0
            )
            / 1000000.0
        ).alias("rms_amp"),
    )


# scene-cut threshold: mean byte level must jump by more than this
# many byte units between consecutive frames
_CUT_T = 4


@register(
    "media_scene_cuts",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, hex({_CONTENT_SQL}) AS hx,
             octet_length({_CONTENT_SQL}) AS len
      FROM documents
      {_DOC_FILTER_SQL}
    ),
    fr AS (
      SELECT doc_id, hx, len, unnest(range((len + {FRAME_SIZE - 1})
                                           // {FRAME_SIZE})) AS fno
      FROM m
    ),
    b AS (
      SELECT doc_id, fno, hx,
             unnest(range(CASE WHEN (fno + 1) * {FRAME_SIZE} <= len
                               THEN {FRAME_SIZE}
                               ELSE len - fno * {FRAME_SIZE} END)) AS j
      FROM fr
    ),
    fsum AS (
      SELECT doc_id, fno,
             CAST(count(*) AS BIGINT) AS fb,
             CAST(sum({_byte_sql("hx", f"fno * {FRAME_SIZE} + j")})
                  AS BIGINT)          AS cs
      FROM b GROUP BY doc_id, fno
    ),
    cuts AS (
      SELECT a.doc_id,
             CAST(sum(CASE WHEN abs(a.cs * p.fb - p.cs * a.fb)
                                > {_CUT_T} * a.fb * p.fb
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
             min(CASE WHEN abs(a.cs * p.fb - p.cs * a.fb)
                           > {_CUT_T} * a.fb * p.fb
                      THEN a.fno END)                    AS first_cut
      FROM fsum a JOIN fsum p
        ON a.doc_id = p.doc_id AND p.fno = a.fno - 1
      GROUP BY a.doc_id
    )
    SELECT m.doc_id,
           CAST((len + {FRAME_SIZE - 1}) // {FRAME_SIZE} AS BIGINT)
             AS n_frames,
           coalesce(n_cuts, 0)  AS n_cuts,
           first_cut
    FROM m LEFT JOIN cuts ON m.doc_id = cuts.doc_id
    """,
    doc="""Video scene-cut detection over the frame stream: split each
    byte stream into fixed {FRAME_SIZE}-byte frames (sample_frames,
    the mapInPandas UDTF — every_n=1 keeps all frames), flag a cut
    wherever the mean byte level jumps by more than {_CUT_T} units
    between consecutive frames, and report per-video frame/cut counts
    and the first cut position. The comparison is EXACT integer
    cross-multiplication (|cs_i*fb_prev - cs_prev*fb_i| >
    T*fb_i*fb_prev) — no float mean, no rounding hazard, engine-
    portable. The oracle replays frame split + per-frame byte sums +
    the cut predicate byte-for-byte in SQL.

    Scale shape: frame extraction is one Arrow-batched mapInPandas
    pass; consecutive-frame comparison is a lag window partitioned by
    video id (ONE shuffle, state bounded by frames-per-video), and
    the per-video rollup reuses the same partitioning — Catalyst
    collapses both into a single exchange. At 100 TB, videos hash
    across executors and no pairwise frame join ever forms.""",
    tags=("multimodal",),
)
def media_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (documents,) = load_tables(spark, sf_dir, "documents")
    # totality: a NULL/empty-text doc yields zero frames from
    # sample_frames but a len-row from the oracle's document scan —
    # filter both sides identically (as media_audio_stats does) so the
    # engine/oracle row sets agree on degenerate corpora
    docs = _nonempty_docs(documents)
    frames = MM.sample_frames(
        _with_content(docs), every_n=1, frame_size=FRAME_SIZE
    )
    w = Window.partitionBy("doc_id").orderBy("frame_no")
    fb = F.col("frame_bytes").cast("long")
    cs = F.col("checksum")
    pfb = F.lag(fb).over(w)
    pcs = F.lag(cs).over(w)
    cut = (
        F.abs(cs * pfb - pcs * fb) > F.lit(_CUT_T) * fb * pfb
    ).cast("long")
    flagged = frames.select(
        "doc_id",
        F.col("frame_no").cast("long").alias("fno"),
        cut.alias("c"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_cuts"),
        F.min(F.when(F.col("c") == 1, F.col("fno"))).alias("first_cut"),
    )


# synthesized AVI geometry for media_video_frames: 4x2 BI_RGB frames,
# 3 per document → 24 payload bytes/frame, 72 bytes/document (144 hex
# chars), every container size a constant → the whole RIFF skeleton
# collapses to TWO hex literals the oracle can replay
_VID_W, _VID_H, _VID_N = 4, 2, 3
_VID_FRAME_BYTES = ((_VID_W * 3 + 3) // 4 * 4) * _VID_H  # 24
_VID_HEX = 2 * _VID_FRAME_BYTES  # hex chars per frame slice
_VID_PAD = _VID_N * _VID_HEX  # padded payload hex length


def _avi_const_hex() -> tuple[str, str]:
    from biggis_landuse_spark.sources.avi import avi_header_parts

    prefix, headers = avi_header_parts(
        _VID_W, _VID_H, _VID_N, rate=25, scale=1
    )
    return (prefix + headers[0]).hex().upper(), headers[0].hex().upper()


_AVI_PREFIX_HEX, _AVI_SEP_HEX = _avi_const_hex()
# RGB raveled pixel (0,0).R lives at file offset stride*(h-1)+2 of the
# bottom-up BGR frame payload — the byte that pins row flip + channel
# swap in the oracle
_VID_FIRST_R = ((_VID_W * 3 + 3) // 4 * 4) * (_VID_H - 1) + 2


@register(
    "media_video_frames",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             rpad(hex(encode(text)), {_VID_PAD}, hex(encode(text))) AS px
      FROM documents
      WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
    ),
    b AS (
      SELECT doc_id, j, i,
             {_byte_sql("px", f"{_VID_FRAME_BYTES}*j + i")} AS v
      FROM (SELECT doc_id, px, unnest(range({_VID_N})) AS j FROM m) f,
           (SELECT unnest(range({_VID_FRAME_BYTES})) AS i) ii
    )
    SELECT doc_id,
           CAST(j AS BIGINT)                 AS frame_idx,
           CAST({_VID_W} AS BIGINT)          AS width,
           CAST({_VID_H} AS BIGINT)          AS height,
           CAST(25 AS BIGINT)                AS fps_rate,
           CAST(1 AS BIGINT)                 AS fps_scale,
           CAST(count(*) AS BIGINT)          AS n_px,
           CAST(sum(v) AS BIGINT)            AS sum_b,
           CAST(max(v) AS BIGINT)            AS max_b,
           round(CAST(sum(v) AS DOUBLE) * 1000000.0
                 / {255 * _VID_FRAME_BYTES}.0) / 1000000.0 AS mean_b,
           CAST(max(CASE WHEN i = {_VID_FIRST_R} THEN v END) AS BIGINT)
                                             AS first_px_r
    FROM b GROUP BY doc_id, j
    """,
    doc="""Video decode through the REAL stdlib AVI demuxer: each
    document's bytes become the frame payloads of a {n}-frame
    {w}x{h} BI_RGB AVI whose entire RIFF skeleton (avih/strh/strf
    headers, movi chunk headers) is synthesized as pure Catalyst
    expressions from TWO constant hex literals (every container size
    is fixed), decode_video_frames (sources/avi.py inside
    Arrow-batched mapInPandas) walks the container and emits one row
    per frame — the UDTF fan-out shape of video — and per-frame
    features (byte sum/max, 6dp-synced mean, the flip-and-channel-
    pinning first_px_r) are column expressions over the returned
    array. first_px_r reads RGB-raveled pixel (0,0).R, which lives at
    file offset stride·(h−1)+2 of the bottom-up BGR payload: the
    oracle replays that index arithmetic, so the demuxer's row flip
    and BGR→RGB swap are hash-checked byte-exactly, not just its
    sums. The same demuxer also plays MJPG (per-frame JPEG via
    sources/jpeg.py, tests/test_avi_codec.py) — the container walk
    under test here is codec-independent.

    Scale shape: one mapInPandas pass (constant memory per worker,
    payloads never cross the driver), frame fan-out is {n}x row
    growth inside the generator, features fused in codegen, NO
    shuffle at all. NULL/empty text filtered on both sides (the real
    codec raises on torn containers by contract).""".format(
        n=_VID_N, w=_VID_W, h=_VID_H
    ),
    tags=("multimodal",),
)
def media_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    docs = (
        documents.where(
            F.col("text").isNotNull() & (F.octet_length(payload) > 0)
        )
        .withColumn("_hx", F.hex(payload))
        .withColumn("_px", F.expr(f"rpad(_hx, {_VID_PAD}, _hx)"))
    )
    parts = [F.unhex(F.lit(_AVI_PREFIX_HEX))]
    for j in range(_VID_N):
        if j:
            parts.append(F.unhex(F.lit(_AVI_SEP_HEX)))
        parts.append(
            F.unhex(F.substring(F.col("_px"), 1 + _VID_HEX * j, _VID_HEX))
        )
    decoded = MM.decode_video_frames(
        docs.select("doc_id", F.concat(*parts).alias("content"))
    )
    # recover exact integer bytes from the /255 doubles (x*255 exact)
    q = F.expr("transform(pixels, x -> cast(round(x * 255.0) as bigint))")
    stats = decoded.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("fps_rate").cast("long").alias("fps_rate"),
        F.col("fps_scale").cast("long").alias("fps_scale"),
        F.size("pixels").cast("long").alias("n_px"),
        q.alias("q"),
    )
    return stats.select(
        "doc_id",
        "frame_idx",
        "width",
        "height",
        "fps_rate",
        "fps_scale",
        "n_px",
        F.expr("aggregate(q, 0L, (a, x) -> a + x)").alias("sum_b"),
        F.expr("array_max(q)").alias("max_b"),
        (
            F.round(
                F.expr("aggregate(q, 0L, (a, x) -> a + x)").cast("double")
                * 1000000.0
                / float(255 * _VID_FRAME_BYTES)
            )
            / 1000000.0
        ).alias("mean_b"),
        F.element_at("q", 1).alias("first_px_r"),
    )


# -- EXIF metadata extraction (r8 session 2) --------------------------------
# Four fixed EXIF template blobs (little- and big-endian classic-TIFF
# IFD trees built by sources/exif.build_exif at import time, one
# WITHOUT the Exif sub-IFD so missing tags surface as NULLs); each
# document carries the doc_id % 4 variant. The engine parses with the
# REAL IFD walker (sources/exif.parse_exif, Arrow-batched
# mapInPandas); the oracle replays the extraction by reading the tag
# values straight out of the template bytes at offsets discovered by
# an independent entry scan — byte-level replay, not intent literals.


def _exif_templates():
    from biggis_landuse_spark.sources.exif import build_exif

    specs = [
        ("<", {"make": "CAM0", "orientation": 1, "iso": 100,
               "exposure_time": (1, 125)}),
        ("<", {"make": "CAM1", "orientation": 3, "iso": 200,
               "exposure_time": (1, 250)}),
        (">", {"make": "CAM2", "orientation": 6, "iso": 400,
               "exposure_time": (1, 500)}),
        ("<", {"make": "CAM3", "orientation": 8}),  # no Exif sub-IFD
    ]
    return [(order, build_exif(f, order=order)) for order, f in specs]


def _exif_value_offsets(order: str, blob: bytes):
    """Independent flat entry scan (NOT the parser): byte offsets of
    the orientation/ISO inline SHORTs, the exposure-denominator LE/BE
    32-bit word, and the make string."""
    import struct as _s

    def scan(off):
        (n,) = _s.unpack(order + "H", blob[off : off + 2])
        out = {}
        for i in range(n):
            e = off + 2 + 12 * i
            tag, _t = _s.unpack(order + "HH", blob[e : e + 4])
            out[tag] = e
        return out
    ifd0 = scan(8)
    offs = {"make": None, "orientation": None, "iso": None, "den": None}
    (mk_ptr,) = _s.unpack(order + "I", blob[ifd0[271] + 8 : ifd0[271] + 12])
    offs["make"] = mk_ptr
    offs["orientation"] = ifd0[274] + 8
    if 34665 in ifd0:
        (sub_off,) = _s.unpack(
            order + "I", blob[ifd0[34665] + 8 : ifd0[34665] + 12]
        )
        sub = scan(sub_off)
        offs["iso"] = sub[34855] + 8
        (rat_ptr,) = _s.unpack(
            order + "I", blob[sub[33434] + 8 : sub[33434] + 12]
        )
        offs["den"] = rat_ptr + 4
    return offs


_EXIF_TEMPLATES = _exif_templates()


def _exif_short_sql(hx: str, pos: int, order: str) -> str:
    lo, hi = (pos, pos + 1) if order == "<" else (pos + 1, pos)
    return f"({_byte_sql(hx, str(lo))} + 256 * {_byte_sql(hx, str(hi))})"


def _exif_oracle() -> str:
    arms_make, arms_or, arms_iso, arms_den = [], [], [], []
    for i, (order, blob) in enumerate(_EXIF_TEMPLATES):
        hx = f"'{blob.hex().upper()}'"
        o = _exif_value_offsets(order, blob)
        arms_make.append(
            f"WHEN {i} THEN decode(unhex(substr({hx}, "
            f"2*{o['make']}+1, 8)))"
        )
        arms_or.append(
            f"WHEN {i} THEN {_exif_short_sql(hx, o['orientation'], order)}"
        )
        if o["iso"] is None:
            arms_iso.append(f"WHEN {i} THEN NULL")
            arms_den.append(f"WHEN {i} THEN NULL")
        else:
            arms_iso.append(
                f"WHEN {i} THEN {_exif_short_sql(hx, o['iso'], order)}"
            )
            terms = " + ".join(
                f"{256 ** b} * {_byte_sql(hx, str(o['den'] + (b if order == '<' else 3 - b)))}"
                for b in range(4)
            )
            arms_den.append(f"WHEN {i} THEN ({terms})")
    return f"""
    SELECT doc_id,
           CASE doc_id % 4 {' '.join(arms_make)} END AS make,
           CAST(CASE doc_id % 4 {' '.join(arms_or)} END AS INT)
             AS orientation,
           CAST(CASE doc_id % 4 {' '.join(arms_iso)} END AS INT) AS iso,
           CAST(CASE doc_id % 4 {' '.join(arms_den)} END AS BIGINT)
             AS exposure_den
    FROM documents
    """


@register(
    "media_exif",
    oracle=_exif_oracle(),
    doc="""EXIF extraction over binary media columns: each document
    carries one of four classic-TIFF EXIF blocks (little- AND
    big-endian, one missing the Exif sub-IFD so absent tags surface
    as NULLs), and the REAL IFD walker (sources/exif.parse_exif —
    marker walk, typed entries, out-of-line values, rational pairs,
    private sub-IFD) runs Arrow-batched in mapInPandas to emit
    make / orientation / ISO / exposure denominator. The oracle
    re-reads the tag values straight from the template BYTES at
    offsets found by an independent entry scan. Scale shape: one
    mapInPandas pass, constant memory per worker, no shuffle at all —
    the camera-metadata census shape of a multimodal ingest.""",
    tags=("multimodal",),
    bench=True,
)
def media_exif(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from biggis_landuse_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    (documents,) = load_tables(spark, sf_dir, "documents")
    arms = None
    for i, (_o, blob) in enumerate(_EXIF_TEMPLATES):
        cond = F.col("doc_id") % 4 == i
        val = F.unhex(F.lit(blob.hex().upper()))
        arms = F.when(cond, val) if arms is None else arms.when(cond, val)
    m = documents.select("doc_id", arms.alias("content"))

    def run(batches):
        from biggis_landuse_spark.sources.exif import parse_exif

        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["content"]):
                f = parse_exif(bytes(raw))
                et = f.get("exposure_time")
                rows.append(
                    (
                        doc_id,
                        f.get("make"),
                        f.get("orientation"),
                        f.get("iso"),
                        et[1] if et else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "make", "orientation", "iso", "exposure_den",
                ],
            )

    return m.mapInPandas(
        run,
        "doc_id long, make string, orientation int, iso int, "
        "exposure_den long",
    )


@register(
    "media_png16_stats",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents),
    dims AS (
      SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h FROM d
    ),
    idx AS (SELECT doc_id, unnest(range(w * h)) AS i FROM dims),
    px AS (
      SELECT doc_id, (doc_id * 31 + i * 7919) % 65536 AS v FROM idx
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_px,
           CAST(sum(v) AS BIGINT)   AS sum_v,
           CAST(min(v) AS BIGINT)   AS min_v,
           CAST(max(v) AS BIGINT)   AS max_v
    FROM px
    GROUP BY doc_id
    """,
    doc="""16-bit PNG round-trip statistics (r9 — the deep-raster
    delivery format): per document a deterministic 16-bit grayscale
    image is ENCODED to real PNG bytes and DECODED back
    executor-side (sources/png.py encode_png_gray16 /
    decode_png_deep, Arrow-batched mapInPandas), then exact-integer
    pixel stats come out. The closed-form pixel synthesis
    v(i) = (doc_id·31 + i·7919) mod 65536 lets DuckDB replay the
    pixel math relationally while Spark actually serializes and
    re-parses PNG bytes per item — any codec defect (filtering,
    byte order, depth handling) breaks the value hash. All-integer
    outputs, no float sync. Scale shape: one map-side pass, no
    shuffle before the per-doc aggregate the kernel itself emits.
    Operator: multimodal.png16_roundtrip_stats.""",
    tags=("multimodal",),
    bench=True,
)
def media_png16_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    return MM.png16_roundtrip_stats(documents)


@register(
    "media_cog_pages",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents),
    dims AS (
      SELECT doc_id, 8 + 2 * (doc_id % 4) AS w, 6 + 2 * (doc_id % 3) AS h
      FROM d
    ),
    idx AS (SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM dims),
    px AS (
      SELECT doc_id, w, h, (doc_id * 17 + i * 101) % 4096 AS v FROM idx
    )
    SELECT doc_id,
           CAST(2 AS BIGINT)                    AS n_pages,
           CAST(min(w) * min(h) AS BIGINT)      AS full_px,
           CAST(sum(v) AS BIGINT)               AS full_sum,
           CAST((min(w) // 2) * (min(h) // 2) AS BIGINT) AS ov_px,
           CAST(sum(v) AS BIGINT)               AS ov_sum
    FROM px
    GROUP BY doc_id
    """,
    doc="""Cloud-optimized-GeoTIFF page-chain round trip (r10, VERDICT
    r9 #2 — the multi-IFD surface): per document a deterministic
    full-res uint16 image and its 2x2 BLOCK-SUM overview are written
    as ONE chained-IFD TIFF (encode_tiff_multi, NewSubfileType
    reduced flag) and decoded back page by page (tiff_pages +
    decode_tiff(ifd=…)) executor-side. The overview stores block SUMS
    (max 4·4095 < 2^16), making Σ overview = Σ full-res an intrinsic
    cross-page invariant the value hash enforces; the oracle replays
    the closed-form pixel math relationally while Spark actually
    serializes and re-parses the container — any chain-walk,
    subfile-flag, or page-shape defect raises or breaks the hash.
    All-integer outputs; one map-side pass, no shuffle. Operator:
    multimodal.cog_roundtrip_stats.""",
    tags=("multimodal", "S1"),
    bench=True,
)
def media_cog_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    return MM.cog_roundtrip_stats(documents)
