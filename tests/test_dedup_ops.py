"""Dedup-resolution operator invariants beyond the oracle check."""

from __future__ import annotations

from pyspark.sql import functions as F

from biggis_landuse_spark.functions import dedup as D
from biggis_landuse_spark.queries import load_tables


def test_linear_dropped_ids_equals_pairwise_form(spark, sf_dir):
    # the linear per-group form must select exactly the ids the
    # quadratic pair explosion would mark as dropped
    (documents,) = load_tables(spark, sf_dir, "documents")
    sig = D.minhash_signatures_from_text(documents, "doc_id", "text")
    linear = {
        r["doc_id"] for r in D.lsh_dropped_ids(sig, "doc_id").collect()
    }
    pairwise = {
        r["doc_id"]
        for r in D.lsh_band_pairs(sig, "doc_id")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .collect()
    }
    assert linear == pairwise
    assert linear  # non-trivial on the fixture corpus


def test_dropped_ids_fanout_is_linear_in_group_size(spark):
    # a hot bucket of n identical docs must expand to n-1 rows in the
    # resolution path, not the n(n-1)/2 pairs of the similarity path —
    # the property that keeps boilerplate-heavy corpora tractable
    n = 10
    docs = spark.createDataFrame(
        [(i, "the same boilerplate text repeated here") for i in range(n)],
        "doc_id long, text string",
    )
    sig = D.minhash_signatures_from_text(docs, "doc_id", "text")
    banded = D.banded_signatures(sig, "doc_id")
    linear_rows = (
        banded.groupBy("band_id", "sig")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
        .select(F.explode(F.expr("slice(ids, 2, size(ids) - 1)")))
        .count()
    )
    quad_rows = D.pairs_within_groups(banded, "doc_id").count()
    assert linear_rows == D.N_BANDS * (n - 1)
    assert quad_rows == D.N_BANDS * n * (n - 1) // 2
    # and the final answer is identical: all but the minimum id drop
    dropped = {
        r["doc_id"] for r in D.lsh_dropped_ids(sig, "doc_id").collect()
    }
    assert dropped == set(range(1, n))


def test_semantic_dedup_invariants(spark, sf_dir):
    # every dropped doc keeps a LOWER-id partner in the SAME ivf cell
    # with cosine >= tau — kept_id really is the minimal such partner
    from biggis_landuse_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["semantic_dedup"].spark(spark, sf_dir).collect()
    assert rows, "threshold should fire at sf0.01"
    for r in rows:
        assert r["kept_id"] < r["dropped_id"]
        assert r["max_sim"] >= 0.3


def test_dedup_incremental_reasons_partition(spark, sf_dir):
    # a doc is reported once, with 'exact' shadowing 'near'; only odd
    # (incoming-batch) ids ever appear
    from biggis_landuse_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["dedup_incremental"].spark(spark, sf_dir).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(i % 2 == 1 for i in ids)
    assert all(r["reason"] in ("exact", "near") for r in rows)


def test_band_pair_fanout_capped_on_single_signature_corpus(spark):
    # pathological corpus: every doc is the SAME boilerplate text, so
    # all n docs share all 4 band signatures. The similarity path must
    # sub-split those hot groups BEFORE the in-group pair explosion:
    # pair volume <= ~N_BANDS * n * cap (linear), never the uncapped
    # N_BANDS * n(n-1)/2 quadratic.
    n, cap = 400, 8
    docs = spark.createDataFrame(
        [(i, "the same boilerplate text repeated here") for i in range(n)],
        "doc_id long, text string",
    )
    sig = D.minhash_signatures_from_text(docs, "doc_id", "text")
    banded = D.subsplit_band_groups(
        D.banded_signatures(sig, "doc_id"), "doc_id", cap
    )
    blocks = banded.groupBy("band_id", "sig", "sub").count()
    stats = blocks.agg(
        F.max("count").alias("mx"),
        F.sum(F.col("count") * F.col("count")).alias("pv"),
    ).collect()[0]
    # md5-mixed buckets are multinomial, not exact — small constant slack
    assert stats["mx"] <= 4 * cap
    assert stats["pv"] <= 2 * D.N_BANDS * n * cap  # linear, not n^2
    # the public entry point honors the cap end-to-end
    pairs = D.lsh_band_pairs(sig, "doc_id", group_cap=cap).count()
    assert pairs < D.N_BANDS * n * cap
    assert pairs < n * (n - 1) // 2  # strictly below the all-pairs count


def test_band_pair_subsplit_noop_below_cap(spark, sf_dir):
    # at fixture scale every band group is far below the default cap,
    # so the guard must be a bit-exact no-op (sub = 0 everywhere) —
    # which is also what keeps the DuckDB oracles unchanged there
    (documents,) = load_tables(spark, sf_dir, "documents")
    sig = D.minhash_signatures_from_text(documents, "doc_id", "text")
    banded = D.subsplit_band_groups(
        D.banded_signatures(sig, "doc_id"), "doc_id"
    )
    assert banded.where(F.col("sub") != 0).count() == 0


def test_embedding_near_dup_bucket_blocks_capped(spark):
    # total-skew corpus for the LSH-bucket path: identical vectors all
    # land in ONE of the 2^8 buckets; subsplit_cells must bound the
    # same-(bucket, sub) block so the self-join stays linear
    from biggis_landuse_spark.functions import similarity as S

    n, cap = 500, 8
    v = spark.range(n).select(
        F.col("id").alias("vec_id"), F.lit(3).alias("bucket")
    )
    split = S.subsplit_cells(v, cap, id_col="vec_id", cell_col="bucket")
    sizes = split.groupBy("bucket", "sub").count()
    stats = sizes.agg(
        F.max("count").alias("mx"),
        F.sum(F.col("count") * F.col("count")).alias("pv"),
    ).collect()[0]
    assert stats["mx"] <= 4 * cap
    assert stats["pv"] <= 2 * n * cap


def test_dedup_bloom_no_false_negatives(spark, sf_dir):
    # the Bloom guarantee: a shingle inserted into the filter is
    # always found, so per-doc bloom containment >= exact containment
    # — flags may only be ADDED by false positives, never lost
    from biggis_landuse_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    bloom = {
        r["doc_id"]: r
        for r in REGISTRY["dedup_bloom"].spark(spark, sf_dir).collect()
    }
    assert bloom and all(k % 2 == 1 for k in bloom)

    # exact containment of batch shingles in snapshot shingles
    from biggis_landuse_spark.functions import dedup as D
    from biggis_landuse_spark.functions import text as TX

    (documents,) = load_tables(spark, sf_dir, "documents")
    sh = (
        documents.select("doc_id", TX.tokens("text").alias("_toks"))
        .where(F.size("_toks") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(D.shingles_from_tokens(F.col("_toks")))
            ).alias("shingle"),
        )
    )
    snap = sh.where(F.col("doc_id") % 2 == 0).select("shingle").distinct()
    exact = {
        r["doc_id"]: (r["n"], r["hit"])
        for r in sh.where(F.col("doc_id") % 2 == 1)
        .join(snap.withColumn("_in", F.lit(True)), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_in").isNotNull().cast("long")).alias("hit"),
        )
        .collect()
    }
    assert set(exact) == set(bloom)
    for doc_id, (n, hit) in exact.items():
        b = bloom[doc_id]
        assert b["n_grams"] == n
        assert b["n_hit"] >= hit, doc_id  # no false negatives
        if hit * 1.0 / n >= 0.5:
            assert b["flagged"], doc_id


def test_simhash_band_pairs_exact_at_default_threshold(spark, sf_dir):
    """The pigeonhole guarantee, verified against brute force: with 4
    disjoint 15-bit bands, EVERY pair within Hamming distance 3 shares
    at least one band, so simhash_band_pairs must return exactly the
    brute-force Hamming-ball pair set — no miss, no false positive.
    (This test CAUGHT the 8-bit-band design: correlated SimHash bits
    put 140/500 fixture docs behind one band value, engaging the
    sub-split cap and dropping 62 true pairs — hence the 60-bit
    fingerprint with 15-bit bands.)"""
    (documents,) = load_tables(spark, sf_dir, "documents")
    sig = D.simhash_fp(
        documents, "doc_id", "text", n_hex=D.SIMHASH_BITS // 4
    ).cache()
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in D.simhash_band_pairs(sig, "doc_id").collect()
    }
    fps = {r["doc_id"]: r["simhash"] for r in sig.collect()}
    sig.unpersist()
    ids = sorted(fps)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= D.SIMHASH_HAMMING_T:
                want[(a, b)] = h
    assert got == want


def test_minhash_signatures_match_pure_python_reference(spark):
    """The r11 Arrow-kernel minhash_signatures_from_text against an
    independent pure-Python replay of the salted-min-md5 math (via
    hexdigest string comparison, NOT the kernel's digest-bytes
    shortcut), on the shapes that could diverge: NULL text, < k
    tokens, exactly k tokens, multi-space runs, unicode."""
    import hashlib

    rows = [
        (1, None),
        (2, ""),
        (3, "one two"),
        (4, "one two three"),
        (5, "héllo wörld  x y"),
        (6, "a b c d e"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {}
    for doc_id, text in rows:
        if text is None:
            continue
        toks = [t for t in text.split(" ") if t]
        if len(toks) < D.SHINGLE_WORDS:
            continue
        shingles = [
            " ".join(toks[i : i + D.SHINGLE_WORDS])
            for i in range(len(toks) - D.SHINGLE_WORDS + 1)
        ]
        want[doc_id] = tuple(
            min(
                hashlib.md5(f"{s}|{sh}".encode()).hexdigest()
                for sh in shingles
            )
            for s in range(D.N_MINHASH)
        )
    got = {
        r["doc_id"]: tuple(r[f"h{i}"] for i in range(D.N_MINHASH))
        for r in D.minhash_signatures_from_text(
            df, "doc_id", "text"
        ).collect()
    }
    assert got == want


def test_simhash_fp_matches_pure_python_reference(spark):
    """The r11 Arrow-kernel simhash_fp against an INDEPENDENT pure-
    Python replay of the md5 ±1-vote math (neither the kernel's
    bit-count shortcut nor the old array-HOF fold), on the edge
    shapes that could diverge: NULL text, empty text, spaces-only,
    multi-space runs, unicode, single token, and a tie-heavy doc.
    Pins the kernel's exact semantics: token = non-empty segment of
    split(' '), vote bit j = (digit j//4 of md5 hex >> j%4) & 1,
    fingerprint bit j set iff the vote sum is strictly positive."""
    import hashlib

    rows = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "héllo wörld héllo"),
        (5, "a  b"),
        (6, "single"),
        (7, "x y z x y z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n_hex in (8, D.SIMHASH_BITS // 4):
        want = {}
        for doc_id, text in rows:
            if text is None:
                continue
            toks = [t for t in text.split(" ") if t]
            if not toks:
                continue
            votes = [0] * (4 * n_hex)
            for t in toks:
                h = hashlib.md5(t.encode("utf-8")).hexdigest()[:n_hex]
                for j in range(4 * n_hex):
                    bit = (int(h[j // 4], 16) >> (j % 4)) & 1
                    votes[j] += 1 if bit else -1
            want[doc_id] = sum(
                1 << j for j, s in enumerate(votes) if s > 0
            )
        got = {
            r["doc_id"]: r["simhash"]
            for r in D.simhash_fp(df, "doc_id", "text", n_hex=n_hex).collect()
        }
        assert got == want, n_hex


def test_simhash_band_pairs_fanout_capped_on_identical_corpus(spark):
    """Hot-band guard: a corpus where every doc has the SAME fingerprint
    puts everyone behind one band value in all 4 bands; the md5
    sub-split must cap per-block population so pair volume stays
    ~linear (<= 4 bands * n * cap) instead of n^2/2."""
    n, cap = 600, 8
    sig = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(12345).cast("long").alias("simhash")
    )
    pairs = D.simhash_band_pairs(sig, "doc_id", threshold=32, cap=cap)
    n_pairs = pairs.count()
    assert n_pairs <= 4 * n * cap, n_pairs
    assert n_pairs < n * (n - 1) / 2 / 4, n_pairs  # far from all-pairs
