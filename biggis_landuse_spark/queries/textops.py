"""Text-analysis + deduplication queries on the `documents` table.

The training-data-pipeline surface (driver brief): language-ID,
quality scoring, token counting, fingerprinting, exact dedup,
MinHash+LSH, SimHash, n-gram Jaccard. All built-in Spark SQL
expressions (library: biggis_landuse_spark.functions.{text,dedup}),
each with an exact DuckDB oracle — the hash families are chosen to be
engine-portable (salted md5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from biggis_landuse_spark.functions import dedup as D
from biggis_landuse_spark.functions import similarity as SIM
from biggis_landuse_spark.functions import text as TX
from biggis_landuse_spark.queries import load_tables, register, spread

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


@register(
    "token_count",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT)   AS n_docs,
           CAST(sum(ntok) AS BIGINT)  AS total_tokens,
           round(avg(ntok), 6)        AS avg_tokens
    FROM (SELECT lang, len({_TOKS}) AS ntok FROM documents)
    GROUP BY lang
    """,
    doc="Whitespace token counting per language (training-data pipeline op).",
    tags=("TEXT",),
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    return (
        documents.select("lang", TX.token_count("text").alias("ntok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("long").alias("total_tokens"),
            F.round(F.avg("ntok"), 6).alias("avg_tokens"),
        )
    )


# BPE-style pre-tokenizer: letter runs | single digits | punctuation
# runs — the GPT-2-ish split shape, restricted to a regex subset that
# Java regex (Spark) and RE2 (DuckDB) evaluate identically.
_BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


@register(
    "token_count_bpe",
    oracle=f"""
    SELECT lang,
           CAST(sum(n) AS BIGINT)  AS total_subtokens,
           round(avg(n), 6)        AS avg_subtokens,
           CAST(max(n) AS BIGINT)  AS max_subtokens
    FROM (
      SELECT lang, len(regexp_extract_all(text, '{_BPE_RE}')) AS n
      FROM documents
    )
    GROUP BY lang
    """,
    doc="""Tokenizer-aware counting with a BPE-style pre-tokenizer regex
    (letter runs / digits / punctuation runs) — the sub-token budget
    estimate a training-data pipeline runs next to whitespace counts;
    pure regexp_extract_all, codegen'd.""",
    tags=("TEXT",),
    bench=True,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    counted = documents.select(
        "lang",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0))).alias(
            "n"
        ),
    )
    return counted.groupBy("lang").agg(
        F.sum("n").cast("long").alias("total_subtokens"),
        F.round(F.avg("n"), 6).alias("avg_subtokens"),
        F.max("n").cast("long").alias("max_subtokens"),
    )


@register(
    "tokenizer_fertility",
    oracle=f"""
    SELECT lang,
           CAST(sum(nw) AS BIGINT)   AS total_words,
           CAST(sum(ns) AS BIGINT)   AS total_subtokens,
           round(CAST(sum(ns) AS DOUBLE)
                 / greatest(sum(nw), 1), 6) AS fertility
    FROM (
      SELECT lang,
             len({_TOKS}) AS nw,
             len(regexp_extract_all(text, '{_BPE_RE}')) AS ns
      FROM documents
    )
    GROUP BY lang
    """,
    doc="""Tokenizer fertility per language (subtokens per whitespace
    word — THE cross-lingual tokenizer-quality metric: fertility far
    above ~1.3 means the vocabulary under-serves that language and
    its texts cost proportionally more context window). One scan
    computing both counts side by side, conditional aggregation to a
    |lang|-row result — pure map-side reduce at 100 TB; the ratio is
    a single IEEE division of exact integer sums.""",
    tags=("TEXT",),
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    counted = documents.select(
        "lang",
        TX.token_count("text").alias("nw"),
        F.size(
            F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0))
        ).alias("ns"),
    )
    return counted.groupBy("lang").agg(
        F.sum("nw").cast("long").alias("total_words"),
        F.sum("ns").cast("long").alias("total_subtokens"),
        F.round(
            F.sum("ns").cast("double")
            / F.greatest(F.sum("nw"), F.lit(1)),
            6,
        ).alias("fertility"),
    )


# LSH parameter planning: the closed-form S-curve P(match) =
# 1 − (1 − s^r)^b over a (bands, rows) grid, evaluated at the design
# points a dedup pipeline cares about — the collision threshold
# (1/b)^(1/r), the catch rate at the target similarity, and the
# false-positive rate at a clearly-distinct similarity.
_LSH_PLAN_SIGBITS = 120  # signature budget: b*r <= 120
_LSH_PLAN_TARGET = 0.8  # near-dup similarity the index must catch
_LSH_PLAN_REJECT = 0.4  # distinct-pair similarity it should ignore


@register(
    "lsh_parameter_plan",
    oracle=f"""
    WITH grid AS (
      SELECT b.b, r.r
      FROM (SELECT unnest(range(2, 61)) AS b) b,
           (SELECT unnest(range(2, 13)) AS r) r
      WHERE b.b * r.r <= {_LSH_PLAN_SIGBITS}
    )
    SELECT CAST(b AS BIGINT) AS bands,
           CAST(r AS BIGINT) AS rows_per_band,
           CAST(b * r AS BIGINT) AS signature_size,
           round(pow(1.0 / b, 1.0 / r), 6) AS threshold,
           round(1.0 - pow(1.0 - pow({_LSH_PLAN_TARGET}, CAST(r AS DOUBLE)),
                           CAST(b AS DOUBLE)), 6) AS p_catch,
           round(1.0 - pow(1.0 - pow({_LSH_PLAN_REJECT}, CAST(r AS DOUBLE)),
                           CAST(b AS DOUBLE)), 6) AS p_false
    FROM grid
    WHERE 1.0 - pow(1.0 - pow({_LSH_PLAN_TARGET}, CAST(r AS DOUBLE)),
                    CAST(b AS DOUBLE)) >= 0.9
    """,
    doc="""MinHash-LSH parameter planning: sweep every (bands, rows)
    pair within a {_LSH_PLAN_SIGBITS}-hash signature budget through
    the closed-form S-curve P = 1 − (1 − s^r)^b, keep the
    configurations that catch >= 90% of pairs at the target
    similarity {_LSH_PLAN_TARGET}, and report each one's collision
    threshold and false-positive rate at similarity
    {_LSH_PLAN_REJECT} — the design table an engineer reads before
    committing a 100-TB dedup pass (dedup_precision_eval then
    MEASURES the curve the plan predicts). A few hundred rows of
    pure math: schema-bounded generate + filter, no data tables
    touched at all.""",
    tags=("DEDUP", "PIPELINE"),
)
def lsh_parameter_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = (
        spark.range(2, 61)
        .select(F.col("id").alias("b"))
        .crossJoin(spark.range(2, 13).select(F.col("id").alias("r")))
        .where(F.col("b") * F.col("r") <= _LSH_PLAN_SIGBITS)
    )
    s_r = F.pow(F.lit(_LSH_PLAN_TARGET), F.col("r").cast("double"))
    f_r = F.pow(F.lit(_LSH_PLAN_REJECT), F.col("r").cast("double"))
    p_catch = 1.0 - F.pow(1.0 - s_r, F.col("b").cast("double"))
    p_false = 1.0 - F.pow(1.0 - f_r, F.col("b").cast("double"))
    return (
        grid.where(p_catch >= 0.9)
        .select(
            F.col("b").alias("bands"),
            F.col("r").alias("rows_per_band"),
            (F.col("b") * F.col("r")).alias("signature_size"),
            F.round(
                F.pow(1.0 / F.col("b"), 1.0 / F.col("r")), 6
            ).alias("threshold"),
            F.round(p_catch, 6).alias("p_catch"),
            F.round(p_false, 6).alias("p_false"),
        )
    )


@register(
    "quality_score",
    oracle=f"""
    SELECT source,
           round(avg(punct_ratio), 6)    AS avg_punct_ratio,
           round(avg(stopword_ratio), 6) AS avg_stopword_ratio,
           round(avg(mean_word_len), 6)  AS avg_word_len,
           CAST(count(*) FILTER (WHERE stopword_ratio >= 0.05) AS BIGINT)
             AS n_quality
    FROM (
      SELECT source,
             CASE WHEN length(text) > 0
                  THEN CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
                     / length(text) ELSE 0.0 END AS punct_ratio,
             CASE WHEN len({_TOKS}) > 0
                  THEN CAST(len(list_filter({_TOKS},
                        t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
                       AS DOUBLE) / len({_TOKS}) ELSE 0.0 END AS stopword_ratio,
             CASE WHEN len({_TOKS}) > 0
                  THEN CAST(list_sum(list_transform({_TOKS}, t -> strlen(t))) AS DOUBLE)
                     / len({_TOKS}) ELSE 0.0 END AS mean_word_len
      FROM documents
    )
    GROUP BY source
    """,
    doc="""Document quality scoring: punctuation ratio, stopword ratio, mean
    word length — the length/punct/stopword heuristics of a pretraining
    quality filter.""",
    tags=("TEXT",),
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    tokd = documents.select(
        "source",
        TX.punct_ratio("text").alias("punct_ratio"),
        TX.tokens("text").alias("_toks"),
    )
    scored = tokd.select(
        "source",
        "punct_ratio",
        TX.stopword_ratio_from_tokens(F.col("_toks")).alias("stopword_ratio"),
        TX.mean_word_len_from_tokens(F.col("_toks")).alias("mean_word_len"),
    )
    return scored.groupBy("source").agg(
        F.round(F.avg("punct_ratio"), 6).alias("avg_punct_ratio"),
        F.round(F.avg("stopword_ratio"), 6).alias("avg_stopword_ratio"),
        F.round(F.avg("mean_word_len"), 6).alias("avg_word_len"),
        F.count(F.when(F.col("stopword_ratio") >= 0.05, 1)).alias("n_quality"),
    )


def _lang_score_sql(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_TOKS}, t -> list_contains([{lst}], t)))"


@register(
    "lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT lang,
             {_lang_score_sql(TX.LANG_STOPWORDS["en"])} AS s_en,
             {_lang_score_sql(TX.LANG_STOPWORDS["de"])} AS s_de,
             {_lang_score_sql(TX.LANG_STOPWORDS["es"])} AS s_es,
             {_lang_score_sql(TX.LANG_STOPWORDS["fr"])} AS s_fr
      FROM documents
    )
    SELECT lang,
           CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END      AS predicted,
           CAST(count(*) AS BIGINT) AS n
    FROM scored
    GROUP BY 1, 2
    """,
    doc="""Heuristic language-ID: stopword-set hit counts, deterministic
    argmax (tie-break en>de>es>fr), cross-tabbed against the labeled
    lang column.""",
    tags=("TEXT",),
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    # two-step materialization: tokens once, scores once, then argmax
    # (inline forms re-tokenize per language and per comparison)
    tokd = documents.select("lang", TX.tokens("text").alias("_toks"))
    s = TX.lang_scores_from_tokens(F.col("_toks"))
    scored = tokd.select(
        "lang", *[s[lg].alias(f"s_{lg}") for lg in ("en", "de", "es", "fr")]
    )
    pred = TX.lang_id_from_scores(
        {lg: F.col(f"s_{lg}") for lg in ("en", "de", "es", "fr")}
    )
    return (
        scored.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_FP = "md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))"


@register(
    "doc_fingerprint",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT)             AS n_docs,
           CAST(count(DISTINCT {_FP}) AS BIGINT) AS n_distinct
    FROM documents
    GROUP BY source
    """,
    doc="""Normalized-content fingerprint (md5 of lowercased, whitespace-
    collapsed text) — distinct-content accounting per source.""",
    tags=("TEXT", "DEDUP"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    return (
        documents.select("source", TX.fingerprint("text").alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct"),
        )
    )


@register(
    "dedup_exact",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT)        AS n_groups,
           CAST(sum(n_docs) AS BIGINT)     AS n_docs,
           CAST(sum(n_docs - 1) AS BIGINT) AS n_duplicates
    FROM (SELECT count(*) AS n_docs FROM documents GROUP BY {_FP})
    """,
    doc="""Exact deduplication: hash-groupBy on the content digest; one
    shuffle on the digest with map-side partial aggregation.""",
    tags=("DEDUP",),
    bench=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    return D.exact_dedup_summary(documents, "doc_id", "text")


@register(
    "dedup_keep_best",
    oracle=f"""
    SELECT doc_id AS keeper_id,
           CAST(cluster_size AS BIGINT) AS cluster_size
    FROM (
      SELECT doc_id,
             row_number() OVER (PARTITION BY {_FP}
                                ORDER BY n_chars DESC, doc_id) AS rn,
             count(*)     OVER (PARTITION BY {_FP}) AS cluster_size
      FROM documents
    ) WHERE rn = 1
    """,
    doc="""Quality-aware canonical selection: within each
    exact-duplicate cluster (normalized-content digest) keep the
    longest document, tie-broken by doc_id — the keep-best policy a
    training pipeline applies instead of dedup_exact's keep-any.
    Both window functions share ONE partition key, so Catalyst plans a
    single hash-partition exchange + one sort; state per group is a
    counter, not a buffered cluster.""",
    tags=("DEDUP",),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    digest = TX.fingerprint("text")
    rank_w = W.partitionBy(digest).orderBy(F.desc("n_chars"), F.asc("doc_id"))
    size_w = W.partitionBy(digest)
    return (
        documents.select(
            "doc_id",
            F.row_number().over(rank_w).alias("rn"),
            F.count(F.lit(1)).over(size_w).cast("long").alias("cluster_size"),
        )
        .where(F.col("rn") == 1)
        .select(F.col("doc_id").alias("keeper_id"), "cluster_size")
    )


# BM25 constants (Robertson/Sparck Jones defaults) and a fixed query
# term set; idf is the "+1" (non-negative) variant used by Lucene.
_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_TERMS = ("spark", "join", "stream")


@register(
    "bm25_search",
    oracle=f"""
    WITH dl AS (
      SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS dl FROM documents
    ),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    posting AS (
      SELECT doc_id, dl, term,
             len(list_filter(toks, x -> x = term)) AS tf
      FROM dl, (SELECT unnest(['spark', 'join', 'stream']) AS term)
      WHERE len(list_filter(toks, x -> x = term)) > 0
    ),
    df AS (SELECT term, count(*) AS df FROM posting GROUP BY term)
    SELECT doc_id, round(score, 6) AS score
    FROM (
      SELECT p.doc_id,
             sum(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
                 * p.tf * ({_BM25_K1} + 1)
                 / (p.tf + {_BM25_K1} * (1 - {_BM25_B}
                    + {_BM25_B} * p.dl / s.avgdl))) AS score
      FROM posting p
      JOIN df d USING (term)
      CROSS JOIN stats s
      GROUP BY p.doc_id
    )
    ORDER BY round(score, 6) DESC, doc_id
    LIMIT 10
    """,
    doc="""BM25 keyword relevance over the documents corpus for a fixed
    query-term set: top-10 docs by Okapi BM25 (k1=1.2, b=0.75, Lucene
    +1 idf). Scale shape: the query terms are a compile-time constant,
    so per-term tf becomes a scan-local higher-order array filter (no
    corpus-wide term explode, no per-doc groupBy); pass 1 reduces the
    corpus to ONE row (n_docs, avgdl, per-term df) that is broadcast
    back; pass 2 scores as a pure projection and the top-10 is
    TakeOrderedAndProject. Two scans, zero wide shuffles.""",
    tags=("TEXT",),
    bench=True,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    return (
        _bm25_scored(documents)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def _bm25_scored(documents: DataFrame) -> DataFrame:
    """(doc_id, score): every positive-scoring doc's Okapi BM25 against
    the fixed _BM25_TERMS query — the scoring core shared by
    bm25_search (top-10) and hybrid_retrieval (shortlist stage)."""
    toks = F.filter(F.split("text", " "), lambda x: x != "")

    def tf_of(term: str):
        # NB: a one-arg lambda is required — PySpark passes (element,
        # index) to two-arg lambdas, so a default-arg capture breaks
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = documents.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[tf_of(t).alias(f"tf_{i}") for i, t in enumerate(_BM25_TERMS)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )

    def term_score(i: int):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
            + 1
        )
        return (
            idf
            * tf
            * (_BM25_K1 + 1)
            / (
                tf
                + _BM25_K1
                * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
            )
        )

    score = term_score(0)
    for i in range(1, len(_BM25_TERMS)):
        score = score + term_score(i)
    return (
        base.join(F.broadcast(stats))
        .select("doc_id", F.round(score, 6).alias("score"))
        .where(F.col("score") > 0)
    )


# BM25 scored relation (doc_id, score) — identical math to the
# bm25_search oracle, factored for the hybrid-retrieval oracle
_BM25_SCORED_CTE = f"""
    dl AS (
      SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS dl FROM documents
    ),
    bstats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    posting AS (
      SELECT doc_id, dl, term,
             len(list_filter(toks, x -> x = term)) AS tf
      FROM dl, (SELECT unnest(['spark', 'join', 'stream']) AS term)
      WHERE len(list_filter(toks, x -> x = term)) > 0
    ),
    tdf AS (SELECT term, count(*) AS df FROM posting GROUP BY term),
    scored AS (
      SELECT doc_id, round(score, 6) AS score
      FROM (
        SELECT p.doc_id,
               sum(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
                   * p.tf * ({_BM25_K1} + 1)
                   / (p.tf + {_BM25_K1} * (1 - {_BM25_B}
                      + {_BM25_B} * p.dl / s.avgdl))) AS score
        FROM posting p
        JOIN tdf d USING (term)
        CROSS JOIN bstats s
        GROUP BY p.doc_id
      )
      WHERE round(score, 6) > 0
    )
"""

_HR_SHORTLIST = 20  # BM25 candidates handed to the reranker
_HR_FEEDBACK = 3    # pseudo-relevance docs averaged into the query vector
_HR_K = 10          # final reranked results
_HR_DIM = 64        # embedding dimensionality (TESTDATA.md)


@register(
    "hybrid_retrieval",
    oracle=f"""
    WITH {_BM25_SCORED_CTE},
    short AS (
      SELECT doc_id, score FROM scored
      ORDER BY score DESC, doc_id LIMIT {_HR_SHORTLIST}
    ),
    fb AS (
      SELECT e.vec_id AS doc_id, CAST(e.embedding AS DOUBLE[]) AS v
      FROM embeddings e
      JOIN (SELECT doc_id FROM scored
            ORDER BY score DESC, doc_id LIMIT {_HR_FEEDBACK}) t
        ON e.vec_id = t.doc_id
    ),
    gather AS (SELECT list(v ORDER BY doc_id) AS xs FROM fb),
    cent AS (
      SELECT list_transform(range(0, {_HR_DIM}),
               i -> list_reduce(list_transform(xs, x -> x[i + 1]),
                                (a, b) -> a + b) / len(xs)) AS qv
      FROM gather WHERE len(xs) > 0
    ),
    rer AS (
      SELECT s.doc_id, s.score AS bm25,
             round(list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(cv, cv))), 6) AS cos_sim
      FROM short s
      JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
            FROM embeddings) e ON e.vec_id = s.doc_id
      CROSS JOIN cent
    )
    SELECT CAST(rank AS BIGINT) AS rank, doc_id, bm25, cos_sim
    FROM (
      SELECT *, row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS rank
      FROM rer
    )
    WHERE rank <= {_HR_K}
    """,
    doc="""Two-stage hybrid retrieval — the RAG-serving shape: a cheap
    lexical BM25 pass shortlists 20 candidates, the top-3 candidates'
    embeddings are averaged into a Rocchio pseudo-relevance query
    vector (no runtime encoder needed — the classic blind-feedback
    trick), and the shortlist is reranked by dense cosine against that
    centroid. Scale shape: stage 1 is bm25_search's two-scan
    zero-wide-shuffle plan with TakeOrderedAndProject shortlisting;
    the feedback join touches ONLY 3 embedding rows (broadcast of a
    TakeOrdered result, never the corpus); the centroid is a 1-row
    64-float relation broadcast onto the 20-row shortlist, so the
    expensive dense scoring runs on exactly SHORTLIST rows regardless
    of corpus size — the funnel a production retrieval stack uses to
    keep ANN/rerank cost independent of 100 TB. Element sums fold in
    explicit doc_id order on both engines (deterministic float
    reduction); a corpus with no BM25 hits yields an empty result,
    not a degenerate centroid (len(xs) > 0 guard).""",
    tags=("TEXT", "ANN", "PIPELINE"),
    bench=True,
)
def hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biggis_landuse_spark.queries import hold_cache

    documents, embeddings = load_tables(spark, sf_dir, "documents", "embeddings")
    scored = _bm25_scored(documents)
    # r12 (VERDICT r11 #7): the shortlist and the feedback ids used to
    # be two independent TakeOrdered consumers of the BM25 subtree, so
    # the tokenize+score pipeline (itself two scans) executed TWICE —
    # four corpus passes per query. The feedback top-3 is a prefix of
    # the shortlist top-20 under the SAME deterministic total order
    # (score DESC, doc_id ASC), so it derives from the cached 20-row
    # shortlist instead: BM25 now runs once (two corpus passes total).
    short = hold_cache(
        scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(_HR_SHORTLIST)
    )
    fb_ids = (
        short.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_HR_FEEDBACK)
        .select("doc_id")
    )
    emb = embeddings.select(
        F.col("vec_id").alias("doc_id"), SIM.as_double("embedding").alias("cv")
    )
    gather = (
        fb_ids.join(emb, "doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("doc_id").alias("d"), F.col("cv").alias("v")))
            ).alias("xs")
        )
        .where(F.size("xs") > 0)
    )
    cent = gather.select(
        F.expr(
            f"transform(sequence(0, {_HR_DIM - 1}), "
            "i -> aggregate(xs, 0D, (a, x) -> a + x.v[i]) / size(xs))"
        ).alias("qv")
    )
    rer = short.join(emb, "doc_id").crossJoin(F.broadcast(cent))
    cos = F.round(SIM.cosine(F.col("qv"), F.col("cv")), 6)
    ranked = rer.select(
        F.col("doc_id"),
        F.col("score").alias("bm25"),
        cos.alias("cos_sim"),
    ).withColumn(
        "rank",
        F.row_number()
        .over(W.orderBy(F.desc("cos_sim"), F.asc("doc_id")))
        .cast("long"),
    )
    return ranked.where(F.col("rank") <= _HR_K).select(
        "rank", "doc_id", "bm25", "cos_sim"
    )


_SHINGLES_CTE = f"""
    toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM toks WHERE len(t) >= 3
    )
"""

_MINHASH_AGGS = ",\n             ".join(
    f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(D.N_MINHASH)
)

# hot-band-group sub-split — mirrors D.subsplit_band_groups op-for-op
# (window population count, md5-prefix mix, ceil(pop/cap) sub-buckets).
# A no-op below the cap (sub = anything % 1 = 0); engages on skewed
# signatures so the similarity-path pair volume stays linear.
_BANDS_SUB_CTE = f"""
    bsub AS (
      SELECT doc_id, band_id, sig,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
               % CAST(ceil((count(*) OVER (PARTITION BY band_id, sig))
                           / {D.BAND_GROUP_CAP}.0) AS BIGINT) AS sub
      FROM bands
    )
"""


@register(
    "dedup_minhash",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sig AS (
      SELECT doc_id,
             {_MINHASH_AGGS}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band_id, h0 || h1 AS sig FROM sig
      UNION ALL SELECT doc_id, 1, h2 || h3 FROM sig
      UNION ALL SELECT doc_id, 2, h4 || h5 FROM sig
      UNION ALL SELECT doc_id, 3, h6 || h7 FROM sig
    ),
    {_BANDS_SUB_CTE}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared_bands
    FROM bsub a JOIN bsub b
      ON a.band_id = b.band_id AND a.sig = b.sig AND a.sub = b.sub
      AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
    doc="""MinHash + LSH near-dup candidates: 3-word shingles → 8 salted
    min-hashes (lexicographic min of salted md5 — engine-portable) →
    4 bands of 2 → equi-join on band signature. Candidate generation is
    an equi-join, never an all-pairs product, and hot band groups are
    hard-capped by D.subsplit_band_groups before the in-group pair
    explosion (the 100 TB path even for boilerplate-heavy corpora).""",
    tags=("DEDUP",),
    bench=True,
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    documents = spread(documents)
    sig = D.minhash_signatures_from_text(documents, "doc_id", "text")
    return D.lsh_band_pairs(sig, "doc_id")


@register(
    "ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
    FROM common
    JOIN sizes sa ON common.doc_a = sa.doc_id
    JOIN sizes sb ON common.doc_b = sb.doc_id
    WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.1
    """,
    doc="""n-gram Jaccard near-dup pairs via inverted-index equi-join on the
    shingle. Scale lever: max_doc_freq cap on hot shingles (see
    functions.dedup.ngram_jaccard_pairs).""",
    tags=("DEDUP",),
)
def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    documents = spread(documents)
    return D.ngram_jaccard_pairs(documents, "doc_id", "text", threshold=0.1)


_CONTAIN_T = 0.1


@register(
    "ngram_containment",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(c AS DOUBLE) / sa.n, 6) AS containment_a,
           round(CAST(c AS DOUBLE) / sb.n, 6) AS containment_b
    FROM common
    JOIN sizes sa ON common.doc_a = sa.doc_id
    JOIN sizes sb ON common.doc_b = sb.doc_id
    WHERE greatest(CAST(c AS DOUBLE) / sa.n, CAST(c AS DOUBLE) / sb.n)
          >= {_CONTAIN_T}
    """,
    doc="""Asymmetric n-gram containment pairs — the subset-duplication
    signal Jaccard structurally misses: a short document quoted
    verbatim inside a long one scores |sh(a)∩sh(b)|/|sh(a)| ≈ 1 even
    though the union-normalized Jaccard is tiny, so quote-extraction /
    boilerplate-inclusion dedup (the FineWeb-style containment gate)
    thresholds on this measure. Both directions are reported per pair;
    a pair survives when either clears the threshold. Plan: the
    ngram_jaccard inverted-index shape — shingle equi-join (never a
    pair product), one grouped intersection count, two broadcast-able
    size joins; the per-shingle doc-freq cap bounds hot boilerplate
    shingles at 100 TB (functions/dedup.py:ngram_containment_pairs).""",
    tags=("TEXT", "DEDUP", "PIPELINE"),
)
def ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    documents = spread(documents)
    return D.ngram_containment_pairs(
        documents, "doc_id", "text", threshold=_CONTAIN_T
    )


@register(
    "simhash",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents
    ),
    h AS (SELECT doc_id, substr(md5(tok), 1, 8) AS h8 FROM tok),
    digit AS (
      SELECT doc_id, p AS pos,
             instr('0123456789abcdef', substr(h8, p + 1, 1)) - 1 AS dval
      FROM h, (SELECT unnest(generate_series(0, 7)) AS p)
    ),
    bits AS (
      SELECT doc_id, pos * 4 + b AS j,
             CASE WHEN ((dval >> b) & 1) = 1 THEN 1 ELSE -1 END AS contrib
      FROM digit, (SELECT unnest(generate_series(0, 3)) AS b)
    ),
    per_bit AS (SELECT doc_id, j, sum(contrib) AS s FROM bits GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM per_bit GROUP BY doc_id
    """,
    doc="""32-bit SimHash per document from md5 token hashes — per-bit ±1
    votes folded map-side in an Arrow-batched kernel (hashlib md5 +
    one numpy bit-count per doc; functions.dedup.simhash32 — the r11
    rewrite of the JIT-fragile array-HOF fold, bit-identical).
    Near-dup = small Hamming distance.""",
    tags=("DEDUP",),
)
def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    documents = spread(documents)
    return D.simhash32(documents, "doc_id", "text")


# the 60-bit simhash fingerprint relation (doc_id, simhash) — the
# `simhash` query's math widened to 15 hex digits (D.simhash_fp): wide
# enough that the 15-bit pigeonhole bands below stay under the
# sub-split cap on the fixture's correlated-bit corpus
_SIMHASH_HEX = D.SIMHASH_BITS // 4
_SIMHASH_PER_BAND = D.SIMHASH_BITS // D.SIMHASH_BANDS
_SIMHASH_FP_CTE = f"""
    tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents
    ),
    h AS (SELECT doc_id, substr(md5(tok), 1, {_SIMHASH_HEX}) AS h8 FROM tok),
    digit AS (
      SELECT doc_id, p AS pos,
             instr('0123456789abcdef', substr(h8, p + 1, 1)) - 1 AS dval
      FROM h, (SELECT unnest(generate_series(0, {_SIMHASH_HEX - 1})) AS p)
    ),
    sbits AS (
      SELECT doc_id, pos * 4 + b AS j,
             CASE WHEN ((dval >> b) & 1) = 1 THEN 1 ELSE -1 END AS contrib
      FROM digit, (SELECT unnest(generate_series(0, 3)) AS b)
    ),
    per_bit AS (SELECT doc_id, j, sum(contrib) AS s FROM sbits GROUP BY 1, 2),
    fp AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM per_bit GROUP BY doc_id
    )
"""


@register(
    "simhash_hamming_pairs",
    oracle=f"""
    WITH {_SIMHASH_FP_CTE},
    sbands AS (
      SELECT doc_id, simhash, b AS band_id,
             CAST((simhash >> (b * {_SIMHASH_PER_BAND}))
                  & {(1 << _SIMHASH_PER_BAND) - 1} AS VARCHAR) AS sig
      FROM fp, (SELECT unnest(generate_series(0, {D.SIMHASH_BANDS - 1})) AS b)
    ),
    ssub AS (
      SELECT doc_id, simhash, band_id, sig,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
               % CAST(ceil((count(*) OVER (PARTITION BY band_id, sig))
                           / {D.BAND_GROUP_CAP}.0) AS BIGINT) AS sub
      FROM sbands
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM ssub a JOIN ssub b
      ON a.band_id = b.band_id AND a.sig = b.sig AND a.sub = b.sub
      AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {D.SIMHASH_HAMMING_T}
    """,
    doc="""Hamming-ball near-dup pairs from a 60-bit SimHash fingerprint
    via pigeonhole band blocking (Manku/Jain/Sarma's web-scale dedup
    construction): the fingerprint splits into 4 disjoint 15-bit
    bands, any pair within Hamming distance 3 is bit-identical in ≥1
    band, so candidate generation is an equi-join on (band_id, band
    value) — never a pair product — and each candidate is verified
    with the exact bit_count(a XOR b) distance, so no false positives
    ever. The width is measured, not guessed: SimHash bits are
    correlated over a shared vocabulary, and 8-bit bands saturated on
    the fixture (one band value held 140/500 docs — the sub-split cap
    then drops true pairs); 15-bit bands keep the hottest group at 27,
    under the cap, so the pigeonhole exactness is intact (pinned by a
    brute-force-equality unit test). Scale shape: 4 band rows per doc,
    ONE shuffle on the band key (reused by the hot-group sub-split
    window — pair volume ≤ n·4·cap under any skew), fingerprints ride
    inside the collected structs so there is NO join-back to the
    signature relation. See functions/dedup.py:simhash_band_pairs.""",
    tags=("DEDUP",),
    bench=True,
)
def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    documents = spread(documents)
    sig = D.simhash_fp(documents, "doc_id", "text", n_hex=_SIMHASH_HEX)
    return D.simhash_band_pairs(sig, "doc_id")


@register(
    "lexical_diversity",
    oracle="""
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE text IS NOT NULL
    ),
    tk AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tokens,
             len(list_distinct(list_filter(string_split(text, ' '),
                                           x -> x <> ''))) AS n_distinct
      FROM base
    ),
    chars AS (
      SELECT doc_id, substr(text, i + 1, 1) AS ch
      FROM (SELECT doc_id, text, unnest(range(length(text))) AS i FROM base)
    ),
    freq AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2),
    tot AS (SELECT doc_id, sum(c) AS n FROM freq GROUP BY 1),
    ent AS (
      SELECT f.doc_id,
             round(-sum((c / CAST(n AS DOUBLE))
                        * log2(c / CAST(n AS DOUBLE))), 6) AS char_entropy
      FROM freq f JOIN tot USING (doc_id) GROUP BY 1
    )
    SELECT tk.doc_id,
           CAST(tk.n_tokens AS BIGINT) AS n_tokens,
           CAST(tk.n_distinct AS BIGINT) AS n_distinct,
           CASE WHEN tk.n_tokens > 0
                THEN round(CAST(tk.n_distinct AS DOUBLE) / tk.n_tokens, 6)
           END AS ttr,
           ent.char_entropy
    FROM tk LEFT JOIN ent ON tk.doc_id = ent.doc_id
    """,
    doc="""Per-document lexical-diversity quality signals: type-token
    ratio (distinct/total tokens — collapses on keyword-stuffed or
    looped text) and character-level Shannon entropy (collapses on
    gibberish runs and inflates on binary-ish noise) — two of the
    standard cheap gates (Gopher/C4-family rules) a corpus pipeline
    applies before any model-based scoring. Scale shape: the token
    metrics are a pure scan-local projection (higher-order array
    functions, zero shuffle); the entropy needs one (doc, char)
    partial-aggregated shuffle + a doc-keyed join — all counts exact
    integers, the single transcendental sum rounds at 6dp with ~8
    orders of reordering margin (SCALING float discipline). NULL text
    never reaches either side; empty text keeps its row with
    n_tokens=0 and NULL ttr/entropy (ANSI totality).""",
    tags=("TEXT", "PIPELINE"),
)
def lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    base = documents.where(F.col("text").isNotNull())
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    tk = base.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    # length guard: Spark sequence(1, 0) DESCENDS ([1, 0]) instead of
    # yielding empty, so an empty-text doc would fabricate two '' chars
    # and a 0.0 entropy where the oracle's range(0) yields NULL
    chars = base.where(F.length("text") > 0).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))")
        ).alias("ch"),
    )
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    ent = (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(-F.sum(p * F.log2(p)), 6).alias("char_entropy"))
    )
    return tk.join(ent, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("n_distinct").cast("double") / F.col("n_tokens"), 6),
        ).alias("ttr"),
        "char_entropy",
    )


@register(
    "simhash_incremental",
    oracle=f"""
    WITH {_SIMHASH_FP_CTE},
    snapb AS (
      SELECT doc_id AS snap_id, simhash AS snap_hash, b AS band_id,
             CAST((simhash >> (b * {_SIMHASH_PER_BAND}))
                  & {(1 << _SIMHASH_PER_BAND) - 1} AS VARCHAR) AS sig
      FROM fp, (SELECT unnest(generate_series(0, {D.SIMHASH_BANDS - 1})) AS b)
      WHERE doc_id % 2 = 0
    ),
    newb AS (
      SELECT doc_id, simhash, b AS band_id,
             CAST((simhash >> (b * {_SIMHASH_PER_BAND}))
                  & {(1 << _SIMHASH_PER_BAND) - 1} AS VARCHAR) AS sig
      FROM fp, (SELECT unnest(generate_series(0, {D.SIMHASH_BANDS - 1})) AS b)
      WHERE doc_id % 2 = 1
    ),
    hits AS (
      SELECT DISTINCT n.doc_id,
             CAST(bit_count(xor(n.simhash, s.snap_hash)) AS INT) AS h,
             s.snap_id
      FROM newb n JOIN snapb s ON n.band_id = s.band_id AND n.sig = s.sig
    ),
    best AS (
      SELECT doc_id, h AS min_hamming, snap_id AS nearest_snap_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY h, snap_id) AS rn
        FROM hits
      ) WHERE rn = 1
    )
    SELECT f.doc_id, b.min_hamming, b.nearest_snap_id,
           coalesce(b.min_hamming, {D.SIMHASH_BITS})
             <= {D.SIMHASH_HAMMING_T} AS flagged
    FROM fp f LEFT JOIN best b ON f.doc_id = b.doc_id
    WHERE f.doc_id % 2 = 1
    """,
    doc="""Incremental NEAR-dup admission against a snapshot index — the
    Hamming twin of dedup_incremental/dedup_bloom: odd doc_ids are the
    incoming batch, even doc_ids the crawl snapshot, and each incoming
    doc reports its minimum Hamming distance to any band-colliding
    snapshot fingerprint (NULL = no snapshot doc within the pigeonhole
    reach), the nearest snapshot id (ties to the lower id), and the
    flagged admission verdict at distance ≤ 3. Snapshot-internal and
    batch-internal pairs are NEVER generated — the probe is an
    equi-join on (band, value) against the prebuilt index
    (functions/dedup.py:simhash_band_index) and the per-doc minimum
    partial-aggregates before any pair list materializes, so cost is
    linear in the batch (the rolling-crawl contract). The streaming
    twin (streaming/dedup.py:stream_simhash_admit) scores micro-
    batches against the SAME index with identical per-doc output,
    pinned by tests/test_streaming_bloom.py parity.""",
    tags=("DEDUP", "PIPELINE"),
)
def simhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    documents = spread(documents)
    snap = documents.where(F.col("doc_id") % 2 == 0)
    batch = documents.where(F.col("doc_id") % 2 == 1)
    index = D.simhash_band_index(snap)
    return D.simhash_near_dup_flags(batch, index).select(
        "doc_id", "min_hamming", "nearest_snap_id", "flagged"
    )


_HEX = "0123456789abcdef"


@register(
    "deterministic_split",
    oracle=f"""
    WITH h AS (
      SELECT n_chars, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents
    ),
    b AS (
      SELECT n_chars,
             (instr('{_HEX}', substr(hx, 1, 1)) - 1) * 16
             + instr('{_HEX}', substr(hx, 2, 1)) - 1 AS bucket
      FROM h
    )
    SELECT CASE WHEN bucket < 204 THEN 'train'
                WHEN bucket < 230 THEN 'val'
                ELSE 'test' END        AS split,
           CAST(count(*) AS BIGINT)    AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM b
    GROUP BY 1
    """,
    doc="""Deterministic hash split (~80/10/10 train/val/test) on
    md5(doc_id) — the reproducible, engine-portable alternative to
    randomSplit (P10): membership is a pure function of the key, so
    re-runs, backfills, and other engines agree row-for-row. The
    seeded-RNG compat mode lives in ml.classify.split_samples; the
    oracle-checked split query is `hash_split_counts`.""",
    tags=("ML", "P10"),
)
def deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    split = (
        F.when(bucket < 204, "train")
        .when(bucket < 230, "val")
        .otherwise("test")
    )
    return (
        documents.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@register(
    "dedup_resolve",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sig AS (
      SELECT doc_id,
             {_MINHASH_AGGS}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band_id, h0 || h1 AS sig FROM sig
      UNION ALL SELECT doc_id, 1, h2 || h3 FROM sig
      UNION ALL SELECT doc_id, 2, h4 || h5 FROM sig
      UNION ALL SELECT doc_id, 3, h6 || h7 FROM sig
    ),
    dropped AS (
      SELECT DISTINCT b.doc_id
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.sig = b.sig AND a.doc_id < b.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT)                 AS n_docs,
           CAST(count(*) FILTER (WHERE dropped.doc_id IS NULL) AS BIGINT)
                                                    AS n_kept,
           CAST(sum(n_chars)
                FILTER (WHERE dropped.doc_id IS NULL) AS BIGINT)
                                                    AS kept_chars
    FROM documents LEFT JOIN dropped USING (doc_id)
    GROUP BY source
    """,
    doc="""Dedup RESOLUTION (the step after candidate generation): a doc is
    dropped when any lower-id doc shares an LSH band with it, keeping
    the lowest-id representative per near-dup cluster — the actual
    corpus-shrinking operation a training pipeline runs. Anti-join of
    the corpus against the dropped-id set (broadcast at this
    cardinality; at 100 TB the dropped set is written and the anti-join
    shuffles on doc_id).""",
    tags=("DEDUP",),
    bench=True,
)
def dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    docs = spread(documents)
    sig = D.minhash_signatures_from_text(docs, "doc_id", "text")
    dropped = D.lsh_dropped_ids(sig, "doc_id").withColumn(
        "_dropped", F.lit(1)
    )
    # ONE corpus pass: left join the (small, broadcastable) dropped set
    # and aggregate total + kept in the same groupBy — not two document
    # scans stitched by a second source-keyed join
    flagged = documents.join(dropped, "doc_id", "left")
    keep = F.col("_dropped").isNull()
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(keep, 1)).alias("n_kept"),
        F.sum(F.when(keep, F.col("n_chars"))).cast("long").alias(
            "kept_chars"
        ),
    )


@register(
    "dedup_cc_resolve",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    sig AS (
      SELECT doc_id,
             {_MINHASH_AGGS}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band_id, h0 || h1 AS sig FROM sig
      UNION ALL SELECT doc_id, 1, h2 || h3 FROM sig
      UNION ALL SELECT doc_id, 2, h4 || h5 FROM sig
      UNION ALL SELECT doc_id, 3, h6 || h7 FROM sig
    ),
    {_BANDS_SUB_CTE},
    edges AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM bsub a JOIN bsub b
        ON a.band_id = b.band_id AND a.sig = b.sig AND a.sub = b.sub
        AND a.doc_id < b.doc_id
    ),
    sym AS (
      SELECT src, dst FROM edges
      UNION SELECT dst, src FROM edges
    ),
    reach(node, r) AS (
      SELECT DISTINCT src, src FROM sym
      UNION
      SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.node
    ),
    comp AS (
      SELECT node AS doc_id, min(r) AS component
      FROM reach GROUP BY node
    ),
    dropped AS (SELECT doc_id FROM comp WHERE doc_id <> component)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE dropped.doc_id IS NULL) AS BIGINT)
                                    AS n_kept,
           CAST(count(DISTINCT comp.component) AS BIGINT) AS n_clusters
    FROM documents
    LEFT JOIN dropped USING (doc_id)
    LEFT JOIN comp USING (doc_id)
    GROUP BY source
    """,
    doc="""TRANSITIVE dedup resolution: LSH candidate pairs form a
    graph; connected components (functions/graph.py, iterative
    min-label propagation with per-round localCheckpoint) give the
    true near-dup clusters, and only each cluster's minimum id
    survives. Band-level resolution (dedup_resolve) is not transitive
    — a doc chained to a cluster through an intermediate survives it;
    this query is the full-closure form a training pipeline runs.
    Oracle: DuckDB recursive CTE reachability.""",
    tags=("DEDUP", "ITER"),
)
def dedup_cc_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biggis_landuse_spark.functions.graph import connected_components

    (documents,) = load_tables(spark, sf_dir, "documents")
    docs = spread(documents)
    sig = D.minhash_signatures_from_text(docs, "doc_id", "text")
    edges = D.lsh_band_pairs(sig, "doc_id").select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(edges).select(
        F.col("node").alias("doc_id"), "component"
    )
    labeled = documents.join(comp, "doc_id", "left")
    return labeled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(
                F.col("component").isNull()
                | (F.col("component") == F.col("doc_id")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_kept"),
        F.count_distinct("component").alias("n_clusters"),
    )


@register(
    "dedup_cluster_sizes",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    sig AS (
      SELECT doc_id,
             {_MINHASH_AGGS}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band_id, h0 || h1 AS sig FROM sig
      UNION ALL SELECT doc_id, 1, h2 || h3 FROM sig
      UNION ALL SELECT doc_id, 2, h4 || h5 FROM sig
      UNION ALL SELECT doc_id, 3, h6 || h7 FROM sig
    ),
    {_BANDS_SUB_CTE},
    edges AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM bsub a JOIN bsub b
        ON a.band_id = b.band_id AND a.sig = b.sig AND a.sub = b.sub
        AND a.doc_id < b.doc_id
    ),
    sym AS (
      SELECT src, dst FROM edges
      UNION SELECT dst, src FROM edges
    ),
    reach(node, r) AS (
      SELECT DISTINCT src, src FROM sym
      UNION
      SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.node
    ),
    comp AS (
      SELECT node AS doc_id, min(r) AS component
      FROM reach GROUP BY node
    ),
    sizes AS (
      SELECT component, count(*) AS sz FROM comp GROUP BY component
      UNION ALL
      SELECT d.doc_id, 1 FROM documents d
      LEFT JOIN comp USING (doc_id) WHERE comp.doc_id IS NULL
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz
    """,
    doc="""Near-dup cluster-size histogram — the audit a training
    pipeline reads before committing to a dedup threshold (how much
    boilerplate, how heavy is the tail, what fraction of the corpus
    sits in clusters). Same transitive-closure clusters as
    dedup_cc_resolve (LSH candidates → connected components, linear
    pointer-jumping rounds); docs with no near-dup edge count as
    singleton clusters via one anti-join — the cluster relation stays
    |components|-sized, the corpus never re-shuffles.""",
    tags=("DEDUP", "ITER"),
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biggis_landuse_spark.functions.graph import connected_components

    (documents,) = load_tables(spark, sf_dir, "documents")
    docs = spread(documents)
    sig = D.minhash_signatures_from_text(docs, "doc_id", "text")
    edges = D.lsh_band_pairs(sig, "doc_id").select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(edges).select(
        F.col("node").alias("doc_id"), "component"
    )
    clustered = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("sz")
    )
    singletons = (
        documents.join(comp, "doc_id", "left_anti")
        .select(F.lit(1).alias("sz"))
    )
    sizes = clustered.select("sz").unionByName(singletons)
    return sizes.groupBy("sz").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("sz") * F.count(F.lit(1))).cast("long").alias("n_docs"),
    ).select(
        F.col("sz").cast("long").alias("cluster_size"),
        "n_clusters",
        "n_docs",
    )


@register(
    "dedup_incremental",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sig AS (
      SELECT doc_id,
             {_MINHASH_AGGS}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band_id, h0 || h1 AS sig FROM sig
      UNION ALL SELECT doc_id, 1, h2 || h3 FROM sig
      UNION ALL SELECT doc_id, 2, h4 || h5 FROM sig
      UNION ALL SELECT doc_id, 3, h6 || h7 FROM sig
    ),
    exact AS (
      SELECT DISTINCT doc_id FROM documents
      WHERE doc_id % 2 = 1 AND md5(text) IN (
        SELECT md5(text) FROM documents WHERE doc_id % 2 = 0)
    ),
    near AS (
      SELECT DISTINCT i.doc_id
      FROM bands i JOIN bands s
        ON i.band_id = s.band_id AND i.sig = s.sig
      WHERE i.doc_id % 2 = 1 AND s.doc_id % 2 = 0
    )
    SELECT doc_id, 'exact' AS reason FROM exact
    UNION ALL
    SELECT doc_id, 'near' AS reason FROM near
    WHERE doc_id NOT IN (SELECT doc_id FROM exact)
    """,
    doc="""Incremental (cross-snapshot) dedup — the shape every rolling
    crawl pipeline needs: dedup the NEW batch against the EXISTING
    corpus without re-pairing the existing corpus with itself. Even
    doc_ids stand in for the already-ingested snapshot, odd for the
    incoming batch. Exact matches probe a content-digest semi-join;
    survivors probe the snapshot's MinHash LSH band signatures with a
    second semi-join. Scale shape: both probes are equi-shuffles keyed
    on digest/band signature and the snapshot side ships only its
    (band_id, sig) distinct relation — at 100 TB that signature index
    is the persisted artifact (written bucketed by sig), so each new
    batch joins against it without touching snapshot text, and
    snapshot-internal pairs are never generated.""",
    tags=("DEDUP",),
    bench=True,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    documents = spread(documents)
    snap = documents.where(F.col("doc_id") % 2 == 0)
    inc = documents.where(F.col("doc_id") % 2 == 1)

    from biggis_landuse_spark.queries import hold_cache

    snap_digests = snap.select(F.md5("text").alias("digest")).distinct()
    # exact is referenced twice (its own branch + the near branch's
    # anti-join), but ReuseExchange already shares its shuffle — an
    # explicit persist was MEASURED SLOWER here (1.86 → 2.22 s: cache
    # build cost without a second computation to save)
    exact = (
        inc.select("doc_id", F.md5("text").alias("digest"))
        .join(snap_digests, "digest", "leftsemi")
        .select("doc_id")
        .distinct()
    )

    # ONE signature pipeline over the whole corpus, split by parity
    # afterwards: the |docs|x8 signature relation persists so the
    # shingle+hash pass runs once, not once per side. (At scale the
    # snapshot side is a precomputed signature index on disk; this is
    # the fresh-build twin.) hold_cache registers it for the
    # harnesses' release_caches() so a long session doesn't
    # accumulate caches (ADVICE r4).
    sig = hold_cache(
        D.minhash_signatures_from_text(documents, "doc_id", "text")
    )
    bands = D.banded_signatures(sig, "doc_id")
    snap_bands = (
        bands.where(F.col("doc_id") % 2 == 0)
        .select("band_id", "sig")
        .distinct()
    )
    inc_bands = bands.where(F.col("doc_id") % 2 == 1)
    near = (
        inc_bands.join(snap_bands, ["band_id", "sig"], "leftsemi")
        .select("doc_id")
        .distinct()
    )

    return exact.select(
        "doc_id", F.lit("exact").alias("reason")
    ).unionByName(
        near.join(exact, "doc_id", "left_anti").select(
            "doc_id", F.lit("near").alias("reason")
        )
    )


_VOCAB_K = 100  # top-K vocabulary size


@register(
    "vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest({_TOKS}) AS term FROM documents
    ),
    counts AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
    vocab AS (
      SELECT term FROM counts
      ORDER BY n DESC, term LIMIT {_VOCAB_K}
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (term IN (SELECT term FROM vocab))
                AS BIGINT)          AS n_covered,
           round(count(*) FILTER (term IN (SELECT term FROM vocab))
                 / CAST(count(*) AS DOUBLE), 6) AS coverage
    FROM tok GROUP BY lang
    """,
    doc="""Vocabulary coverage / OOV-rate audit: the fraction of corpus
    token occurrences covered by the top-K most frequent terms,
    per language — the fixed-vocab tokenizer sizing question. Pass 1
    reduces the corpus to term counts (one partial-aggregated shuffle
    on term, vocab is sublinear in corpus) and takes the top-K with
    TakeOrderedAndProject; the K-term vocab broadcasts back and
    membership is a scan-local semi-join on the second pass. The
    (n desc, term) ordering makes the vocab cut deterministic across
    engines.""",
    tags=("TEXT",),
    bench=True,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    tok = spread(documents).select(
        "lang", F.explode(TX.tokens("text")).alias("term")
    )
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(_VOCAB_K)
        .select("term")
    )
    flagged = tok.join(
        F.broadcast(vocab.withColumn("_inv", F.lit(1))), "term", "left"
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count("_inv").alias("n_covered"),
        F.round(
            F.count("_inv") / F.count(F.lit(1)).cast("double"), 6
        ).alias("coverage"),
    )


_SIG_EQ = " + ".join(
    f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(D.N_MINHASH)
)


@register(
    "minhash_estimate_error",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sig AS (
      SELECT doc_id,
             {_MINHASH_AGGS}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band_id, h0 || h1 AS sig FROM sig
      UNION ALL SELECT doc_id, 1, h2 || h3 FROM sig
      UNION ALL SELECT doc_id, 2, h4 || h5 FROM sig
      UNION ALL SELECT doc_id, 3, h6 || h7 FROM sig
    ),
    {_BANDS_SUB_CTE},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bsub a JOIN bsub b
        ON a.band_id = b.band_id AND a.sig = b.sig AND a.sub = b.sub
        AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT cand.doc_a, cand.doc_b,
           round(({_SIG_EQ}) / {D.N_MINHASH}.0, 6) AS est_jaccard,
           round(COALESCE(c, 0)
                 / CAST(sa.n + sb.n - COALESCE(c, 0) AS DOUBLE), 6)
             AS exact_jaccard
    FROM cand
    JOIN sig a  ON cand.doc_a = a.doc_id
    JOIN sig b  ON cand.doc_b = b.doc_id
    JOIN sizes sa ON cand.doc_a = sa.doc_id
    JOIN sizes sb ON cand.doc_b = sb.doc_id
    LEFT JOIN common ON cand.doc_a = common.doc_a
                    AND cand.doc_b = common.doc_b
    """,
    doc="""MinHash estimator calibration: for every LSH candidate pair,
    the signature-agreement Jaccard estimate (matching minhashes / 8)
    next to the exact shingle-set Jaccard — the audit that tells you
    whether 8 hashes / 4 bands is enough before trusting the dedup
    threshold at scale. All joins are key equi-joins (band signature,
    doc id, shingle inverted index); the exact side is computed only
    for candidates, never all pairs.""",
    tags=("DEDUP",),
)
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    documents = spread(documents)
    sig = D.minhash_signatures_from_text(documents, "doc_id", "text")
    cand = D.lsh_band_pairs(sig, "doc_id").select("doc_a", "doc_b")

    est = sum(
        (F.col(f"a.h{i}") == F.col(f"b.h{i}")).cast("int")
        for i in range(D.N_MINHASH)
    ) / float(D.N_MINHASH)

    # exact Jaccard is over shingle SETS: dedupe (minhash itself
    # never needs the distinct, so _shingle_rows keeps duplicates)
    sh = D._shingle_rows(documents, "doc_id", "text").distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a_sh = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a_sh.join(b_sh, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        cand.join(sig.alias("a"), cand.doc_a == F.col("a.doc_id"))
        .join(sig.alias("b"), cand.doc_b == F.col("b.doc_id"))
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .join(common, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.round(est, 6).alias("est_jaccard"),
            F.round(
                F.coalesce(F.col("c"), F.lit(0))
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("c"), F.lit(0))).cast("double"),
                6,
            ).alias("exact_jaccard"),
        )
    )


_PMI_MIN_PAIR = 25  # min bigram occurrences to score


@register(
    "collocations_pmi",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    uni AS (
      SELECT unnest(t) AS w FROM toks
    ),
    ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
    n1 AS (SELECT sum(c) AS n FROM ucnt),
    bi AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i+1])) AS b
      FROM toks WHERE len(t) >= 2
    ),
    bcnt AS (SELECT b, count(*) AS c FROM bi GROUP BY b),
    n2 AS (SELECT sum(c) AS n FROM bcnt),
    scored AS (
      SELECT b AS bigram, bcnt.c AS pair_count,
             round(ln(
               (bcnt.c / CAST(n2.n AS DOUBLE))
               / ((a.c / CAST(n1.n AS DOUBLE))
                  * (w2.c / CAST(n1.n AS DOUBLE)))), 6) AS pmi
      FROM bcnt
      JOIN ucnt a  ON a.w = string_split(b, ' ')[1]
      JOIN ucnt w2 ON w2.w = string_split(b, ' ')[2]
      CROSS JOIN n1 CROSS JOIN n2
      WHERE bcnt.c >= {_PMI_MIN_PAIR}
    )
    SELECT bigram, CAST(pair_count AS BIGINT) AS pair_count, pmi
    FROM scored
    ORDER BY pmi DESC, bigram LIMIT 20
    """,
    doc="""Collocation mining by pointwise mutual information:
    PMI(a,b) = ln(p(ab) / (p(a)p(b))) over corpus bigrams, top-20
    above a support floor — the phrase-detection pass (word2vec-style
    phrase joining) a tokenizer pipeline runs before vocab induction.
    Unigram and bigram counts are two partial-aggregated shuffles;
    the probability join hits the (vocab-sized, sublinear) count
    relations, never the corpus; the final cut is
    TakeOrderedAndProject. The support floor keeps rare-pair noise
    (PMI's known failure mode) out of the ranking.""",
    tags=("TEXT",),
)
def collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    toks = spread(documents).select(TX.tokens("text").alias("t"))
    uni = toks.select(F.explode("t").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n1 = ucnt.agg(F.sum("c").alias("n1"))
    bi = toks.where(F.size("t") >= 2).select(
        F.explode(D.shingles_from_tokens(F.col("t"), k=2)).alias("b")
    )
    bcnt = bi.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    n2 = bcnt.agg(F.sum("c").alias("n2"))
    w1 = F.split(F.col("b"), " ")[0]
    w2 = F.split(F.col("b"), " ")[1]
    scored = (
        bcnt.where(F.col("c") >= _PMI_MIN_PAIR)
        .withColumns({"w1": w1, "w2": w2})
        .join(ucnt.select(F.col("w").alias("w1"), F.col("c").alias("ca")), "w1")
        .join(ucnt.select(F.col("w").alias("w2"), F.col("c").alias("cb")), "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            F.col("b").alias("bigram"),
            F.col("c").cast("long").alias("pair_count"),
            F.round(
                F.log(
                    (F.col("c") / F.col("n2").cast("double"))
                    / (
                        (F.col("ca") / F.col("n1").cast("double"))
                        * (F.col("cb") / F.col("n1").cast("double"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(20)


@register(
    "bpe_merge_candidates",
    oracle=f"""
    WITH words AS (
      SELECT unnest({_TOKS}) AS w FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, len(w)),
                    i -> substr(w, i, 1) || substr(w, i + 1, 1))) AS pair
      FROM words WHERE len(w) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 20
    """,
    doc="""First BPE training iteration: corpus-wide adjacent-symbol
    pair counts over character sequences, top-20 merge candidates —
    the step a byte-pair-encoding tokenizer repeats to build its merge
    table (Sennrich et al. 2016). Character explosion and pair
    assembly are scan-local array expressions; the count is one
    partial-aggregated shuffle on the pair (vocab-sized, sublinear in
    corpus) and the cut is TakeOrderedAndProject. Subsequent
    iterations re-run the same plan over re-paired symbols — same
    shape, no new machinery.""",
    tags=("TEXT", "ML"),
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    words = spread(documents).select(
        F.explode(TX.tokens("text")).alias("w")
    ).where(F.length("w") >= 2)
    # dynamic-position substring needs the expr form (the Python
    # F.substring API takes literal positions); same codegen either way
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), "
                "i -> substring(w, i, 1) || substring(w, i + 1, 1))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


_WS_K = 20  # weighted-sample size


@register(
    "weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             pow(
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|ws'), 1, 8))
                    AS BIGINT) / 4294967296.0,
               1.0 / n_chars
             ) AS k
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, round(k, 6) AS sort_key
    FROM keyed
    ORDER BY k DESC, doc_id LIMIT {_WS_K}
    """,
    doc="""Distributed weighted sampling without replacement
    (Efraimidis-Spirakis A-Res): each doc draws key = u^(1/w) from a
    content-hash uniform u (md5 → [0,1)) with weight w = n_chars, and
    the sample is the global top-K keys — one TakeOrderedAndProject,
    no per-partition reservoir state, deterministic across runs and
    partitionings. This is the quality-weighted corpus selection step
    of a data-mixing pipeline (sample documents proportional to a
    quality/length weight) in its scale-correct form: at 100 TB the
    per-partition heads are K-sized and only K rows reach the driver
    merge.""",
    tags=("TEXT", "A"),
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|ws"))), 1, 8),
        16,
        10,
    ).cast("double") / F.lit(4294967296.0)
    k = F.pow(u, F.lit(1.0) / F.col("n_chars"))
    return (
        documents.where(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            F.round(k, 6).alias("sort_key"),
            k.alias("_k"),
        )
        .orderBy(F.desc("_k"), F.asc("doc_id"))
        .limit(_WS_K)
        .drop("_k")
    )


@register(
    "nb_lang_confusion",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest({_TOKS}) AS term FROM documents
    ),
    cnt AS (SELECT lang, term, count(*) AS c FROM toks GROUP BY 1, 2),
    tot AS (SELECT lang, sum(c) AS t FROM cnt GROUP BY lang),
    vocab AS (SELECT count(DISTINCT term) AS v FROM toks),
    prior AS (
      SELECT lang, count(*) AS nd FROM documents GROUP BY lang
    ),
    ndocs AS (SELECT count(*) AS n FROM documents),
    dt AS (
      SELECT doc_id, term, count(*) AS nt FROM toks GROUP BY 1, 2
    ),
    scored AS (
      SELECT dt.doc_id, tot.lang,
             round(
               sum(dt.nt * ln((COALESCE(cnt.c, 0) + 1.0)
                              / (tot.t + vocab.v)))
               + any_value(ln(prior.nd / CAST(ndocs.n AS DOUBLE))), 6) AS s
      FROM dt
      CROSS JOIN tot CROSS JOIN vocab CROSS JOIN ndocs
      JOIN prior ON prior.lang = tot.lang
      LEFT JOIN cnt ON cnt.lang = tot.lang AND cnt.term = dt.term
      GROUP BY dt.doc_id, tot.lang
    ),
    pred AS (
      SELECT doc_id, lang AS predicted FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY s DESC, lang) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT d.lang AS actual, p.predicted,
           CAST(count(*) AS BIGINT) AS n
    FROM pred p JOIN documents d USING (doc_id)
    GROUP BY 1, 2
    """,
    doc="""Multinomial Naive Bayes language classifier trained and
    evaluated on the corpus (Laplace smoothing, log-space scoring):
    token likelihood and prior tables come from two partial-aggregated
    shuffles and stay vocab-sized; scoring joins each document's
    distinct-term counts against the per-language likelihoods (an
    equi-join on term — documents never collide with each other), and
    the per-doc argmax uses the 6dp-rounded score with a language
    tie-break. Output is the 5×5 confusion matrix against the ground-
    truth lang column — the trainable-classifier counterpart of the
    stopword-heuristic lang_id.""",
    tags=("TEXT", "ML"),
)
def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W2

    (documents,) = load_tables(spark, sf_dir, "documents")
    toks = spread(documents).select(
        "doc_id", "lang", F.explode(TX.tokens("text")).alias("term")
    )
    cnt = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("t"))
    vocab = toks.agg(F.count_distinct("term").alias("v"))
    prior = documents.groupBy("lang").agg(F.count(F.lit(1)).alias("nd"))
    ndocs = documents.agg(F.count(F.lit(1)).alias("n"))
    dt = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("nt"))

    cand = (
        dt.crossJoin(F.broadcast(tot.join(prior, "lang")))
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ndocs))
        .join(cnt, ["lang", "term"], "left")
    )
    term_ll = F.col("nt") * F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("t") + F.col("v"))
    )
    scored = cand.groupBy("doc_id", "lang").agg(
        F.round(
            F.sum(term_ll)
            + F.first(F.log(F.col("nd") / F.col("n").cast("double"))),
            6,
        ).alias("s")
    )
    w = W2.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("lang"))
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("predicted"))
    )
    return (
        pred.join(documents.select("doc_id", "lang"), "doc_id")
        .groupBy(F.col("lang").alias("actual"), "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# -- PII scrubbing (training-data prep) --------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}-\d{4}\b"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# synthesized PII suffix: the corpus text itself carries no PII, so each
# doc gets a deterministic contact line (same trick as the media queries'
# synthesized binary column) — the scrubbing machinery is the real path
_PII_TEXT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'"
)

_PII_ORACLE = f"""
    WITH t AS (SELECT doc_id, {_PII_TEXT_SQL} AS txt FROM documents),
    r AS (
      SELECT doc_id,
             len(regexp_extract_all(txt, '{_PII_EMAIL}'))        AS n_emails,
             len(regexp_extract_all(txt, '{_PII_PHONE}'))        AS n_phones,
             regexp_replace(
               regexp_replace(txt, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g') AS stage2
      FROM t
    )
    SELECT doc_id,
           CAST(n_emails AS INT) AS n_emails,
           CAST(n_phones AS INT) AS n_phones,
           CAST(len(regexp_extract_all(stage2, '{_PII_IP}')) AS INT) AS n_ips,
           md5(regexp_replace(stage2, '{_PII_IP}', '<IP>', 'g')) AS digest,
           CAST(length(regexp_replace(stage2, '{_PII_IP}', '<IP>', 'g'))
                AS INT) AS n_chars
    FROM r
"""


@register(
    "pii_redaction",
    oracle=_PII_ORACLE,
    doc="""PII scrubbing for training corpora: count and redact email /
    phone / IPv4 patterns in one scan-local regexp pass per document —
    no shuffle at all, the embarrassingly-parallel shape that runs at
    ingest speed over 100 TB. Redaction applies sequentially (email →
    phone → IP) identically on both engines; the redacted text is
    compared by md5 digest so the oracle checks the exact output
    string, not just the counts. Patterns stay in the common
    Java-regex/RE2 subset (no lookaround, no backrefs).""",
    tags=("TEXT", "PIPELINE"),
    bench=True,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    txt = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1"),
    )
    stage1 = F.regexp_replace(txt, F.lit(_PII_EMAIL), F.lit("<EMAIL>"))
    stage2 = F.regexp_replace(stage1, F.lit(_PII_PHONE), F.lit("<PHONE>"))
    stage3 = F.regexp_replace(stage2, F.lit(_PII_IP), F.lit("<IP>"))
    return documents.select(
        "doc_id",
        F.size(F.regexp_extract_all(txt, F.lit(_PII_EMAIL), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(
            F.regexp_extract_all(stage1, F.lit(_PII_PHONE), F.lit(0))
        ).alias("n_phones"),
        F.size(F.regexp_extract_all(stage2, F.lit(_PII_IP), F.lit(0))).alias(
            "n_ips"
        ),
        F.md5(stage3.cast("binary")).alias("digest"),
        F.length(stage3).alias("n_chars"),
    )


_SPAN_N = 3  # fixture-sized n-gram span (real pipelines use 8-13)


@register(
    "dup_ngram_spans",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    ex AS (
      SELECT doc_id,
             unnest(list_transform(
               range(greatest(len(toks) - {_SPAN_N - 1}, 0)),
               i -> array_to_string(toks[i+1:i+{_SPAN_N}], ' '))) AS g
      FROM t
    ),
    dfq AS (SELECT g, count(DISTINCT doc_id) AS dfc FROM ex GROUP BY g)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN dfc > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_grams,
           round(sum(CASE WHEN dfc > 1 THEN 1.0 ELSE 0.0 END) / count(*), 6)
             AS dup_frac
    FROM ex JOIN dfq USING (g)
    GROUP BY doc_id
    """,
    doc="""Fine-grained duplicated-span measurement: for every document,
    the fraction of its word n-grams that also occur in ANOTHER
    document — the corpus-containment signal FineWeb/RefinedWeb-style
    pipelines threshold on, complementing the pairwise dedup family
    (one number per doc, no pair enumeration at all). Plan: explode
    spans (UDTF-shape transform+explode, scan-local), ONE
    partial-aggregated shuffle on the gram for document frequency,
    one gram-keyed equi-join back, one per-doc aggregate — at 100 TB
    the gram relation shuffles on content hash (vocabulary-bounded
    partial aggregation, no hot-key pair blow-up because nothing is
    ever paired). Span length 3 matches the fixture's vocabulary
    (production uses 8-13-gram spans — a constant in the same
    expression).""",
    tags=("TEXT", "DEDUP", "PIPELINE"),
    bench=True,
)
def dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    # tokenize ONCE into a projected column — inlining the filter(split())
    # into the transform lambda re-tokenizes the document per gram
    tokd = documents.select(
        "doc_id", F.expr("filter(split(text, ' '), x -> x <> '')").alias("toks")
    )
    grams = F.expr(
        f"transform(sequence(1, greatest(size(toks) - {_SPAN_N - 1}, 0)), "
        f"i -> concat_ws(' ', slice(toks, i, {_SPAN_N})))"
    )
    # r11 (guide §2.3/§2.4): pre-aggregate to (g, doc_id, c) once, get
    # the document frequency as a count window on the SAME g-keyed
    # exchange, and weight the per-doc rollup by c — the old form
    # computed the tokenize+explode subtree TWICE (dfq + join probe)
    # and shuffled every raw gram instance by g for the join; now one
    # explode, one g-exchange of (g, doc)-distinct rows (strictly
    # fewer under hot grams), one doc-keyed rollup. Counts are the
    # same integers, so the 6dp division is unchanged.
    ex = tokd.select("doc_id", F.explode(grams).alias("g"))
    per_doc = ex.groupBy("g", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    dfw = per_doc.withColumn(
        "dfc", F.count(F.lit(1)).over(W.partitionBy("g"))
    )
    dup = F.when(F.col("dfc") > 1, F.col("c")).otherwise(F.lit(0))
    return dfw.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.sum(dup).alias("n_dup_grams"),
        F.round(
            F.sum(dup.cast("double")) / F.sum("c"), 6
        ).alias("dup_frac"),
    )


_BLOOM_M = D.BLOOM_M       # filter bits (sized to snapshot shingles; 2^33+ at scale)
_BLOOM_K = D.BLOOM_K       # hash functions (8-hex-char slices of one md5)
_BLOOM_THRESH = 0.5        # containment fraction that flags a doc


@register(
    "dedup_bloom",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    pos AS (
      SELECT doc_id, shingle, unnest([
        CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) % {_BLOOM_M},
        CAST('0x' || substr(md5(shingle), 9, 8) AS BIGINT) % {_BLOOM_M},
        CAST('0x' || substr(md5(shingle), 17, 8) AS BIGINT) % {_BLOOM_M}
      ]) AS p
      FROM sh
    ),
    bits AS (SELECT DISTINCT p FROM pos WHERE doc_id % 2 = 0),
    marked AS (
      SELECT pos.doc_id, pos.shingle, bits.p IS NOT NULL AS inb
      FROM pos LEFT JOIN bits ON pos.p = bits.p
      WHERE pos.doc_id % 2 = 1
    ),
    grams AS (
      SELECT doc_id, shingle, bool_and(inb) AS hit
      FROM marked GROUP BY doc_id, shingle
    ),
    d AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT)            AS n_grams,
             CAST(count(*) FILTER (hit) AS BIGINT) AS n_hit
      FROM grams GROUP BY doc_id
    )
    SELECT doc_id, n_grams, n_hit,
           round(n_hit * 1.0 / n_grams, 6)        AS hit_frac,
           n_hit * 1.0 / n_grams >= {_BLOOM_THRESH} AS flagged
    FROM d
    """,
    doc="""Bloom-filter shingle-containment dedup — the constant-memory
    rolling-crawl primitive (the Dolma pipeline's paragraph dedup
    uses exactly this shape): the snapshot's shingles are inserted
    into an M-bit Bloom filter (K bit positions carved from one md5,
    so both engines derive identical bits); each incoming-batch doc
    is scored by the fraction of its shingles whose K bits are ALL
    set, and flagged when containment >= 0.5. False positives are
    possible (that's the Bloom tradeoff, visible here as hit_frac
    above the exact containment), false negatives are impossible by
    construction.

    Scale: the filter is the <=M-row distinct bit relation — the
    persisted artifact a rolling crawl keeps instead of the corpus
    (2^33 bits = 1 GiB at 1e9 shingles); the probe is one equi-join
    on an int key plus a doc-keyed aggregate, linear in the batch. On
    a real cluster the same logic compiles to Spark's native
    bloom_filter_agg/might_contain pair; the relational form here is
    its exact logical twin and stays DuckDB-checkable. Complements
    dedup_incremental (exact digest + MinHash-band semi-joins) with
    the approximate-membership branch.""",
    tags=("DEDUP",),
    bench=True,
)
def dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    documents = spread(documents)
    snap = documents.where(F.col("doc_id") % 2 == 0)
    batch = documents.where(F.col("doc_id") % 2 == 1)
    bits = D.bloom_bits(snap, m=_BLOOM_M, k=_BLOOM_K)
    return D.bloom_containment(
        batch, bits, m=_BLOOM_M, k=_BLOOM_K, thresh=_BLOOM_THRESH
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training loop (multi-round)
# ---------------------------------------------------------------------------

_BPE_TRAIN_ROUNDS = 4
# truncate the merge-loop lineage every N rounds (vocab-sized
# localCheckpoint; see _bpe_train) — large enough that the registry's
# 4-round training never pays it, small enough that a
# thousands-of-merges tokenizer run keeps a bounded plan
_BPE_CHECKPOINT_EVERY = 16

# Canonical symbol-string form shared by both engines: every symbol is
# flanked by its own spaces (" a  b  c "), so the merge of pair (L, R)
# is replace(s, " L  R ", " LR ") — non-overlapping left-to-right in
# both Spark and DuckDB, and adjacent replacements re-establish the
# double-space boundary automatically (" LR " + " X " == " LR  X ").


def _bpe_rounds_cte() -> str:
    """The WITH body shared by the BPE train/encode oracles: word
    vocabulary → canonical symbol string → _BPE_TRAIN_ROUNDS rounds of
    (pair counts p{r}, adopted merge m{r}, merged vocabulary w{r})."""
    parts = [f"""
    WITH words AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest({_TOKS}) AS w FROM documents)
      GROUP BY w
    ),
    w0 AS (
      SELECT w, c,
             ' ' || array_to_string(
               list_transform(range(len(w)), i -> w[CAST(i + 1 AS INT)]),
               '  ') || ' ' AS s
      FROM words
    )"""]
    for r in range(1, _BPE_TRAIN_ROUNDS + 1):
        parts.append(f""",
    l{r} AS (
      SELECT w, c, list_filter(string_split(s, ' '), x -> x <> '') AS lst,
             s
      FROM w{r - 1}
    ),
    p{r} AS (
      SELECT lst[CAST(i AS INT)] AS ls, lst[CAST(i + 1 AS INT)] AS rs,
             CAST(sum(c) AS BIGINT) AS n
      FROM (SELECT c, lst, unnest(range(1, len(lst))) AS i FROM l{r})
      GROUP BY 1, 2
    ),
    m{r} AS (SELECT ls, rs, n FROM p{r} ORDER BY n DESC, ls, rs LIMIT 1),
    w{r} AS (
      SELECT w, c, replace(s, ' ' || m.ls || '  ' || m.rs || ' ',
                              ' ' || m.ls || m.rs || ' ') AS s
      FROM l{r}, m{r} m
    )""")
    return "".join(parts)


def _bpe_train_oracle() -> str:
    selects = [
        f"SELECT CAST({r} AS BIGINT) AS round, ls AS left_sym, "
        f"rs AS right_sym, n AS pair_count FROM m{r}"
        for r in range(1, _BPE_TRAIN_ROUNDS + 1)
    ]
    return _bpe_rounds_cte() + "\n" + "\nUNION ALL\n".join(selects)


@register(
    "bpe_train_merges",
    oracle=_bpe_train_oracle(),
    doc="""Distributed BPE tokenizer TRAINING (Sennrich et al. 2016),
    multi-round: build the word-frequency vocabulary once (the one
    corpus-sized shuffle), then per round count adjacent symbol pairs
    weighted by word frequency, adopt the most frequent pair as the
    next merge rule (ties broken lexicographically — deterministic,
    engine-portable), and apply it leftmost-non-overlapping to every
    word. Emits the learned merge table (round, pair, count) — the
    artifact a tokenizer trainer persists. Extends the single-round
    bpe_merge_candidates into the actual training loop.

    Scale shape: the classic BPE trick — after the initial vocabulary
    groupBy, EVERY per-round relation is vocab-sized, not
    corpus-sized (pair counts partial-aggregate map-side; the merge
    rule is ONE row collected driver-side per round, the same
    model-sized-state discipline as kmeans_lloyd); the merge itself
    is a narrow string replace over the cached vocabulary. Both
    engines share the canonical double-spaced symbol string, so the
    non-overlapping replace semantics are identical by construction.
    The oracle unrolls the same rounds as CTEs.""",
    tags=("TEXT", "ML"),
    bench=True,
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    rules, _state = _bpe_train(documents)
    from biggis_landuse_spark.session import local_df

    return local_df(
        spark,
        rules,
        "round bigint, left_sym string, right_sym string, pair_count bigint",
    )


def _bpe_train(documents: DataFrame):
    """Shared BPE training loop: → (merge rules, final vocabulary
    state (w, c, s) with s the canonical merged symbol string)."""
    from biggis_landuse_spark.queries import hold_cache

    words = (
        spread(documents)
        .select(F.explode(TX.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    chars = F.expr("filter(split(w, ''), x -> x != '')")
    # r12 (VERDICT r11 #9): the cached vocabulary state froze at the
    # static shuffle partition count (32 sub-MB partitions at fixture
    # scale — cached plans keep their partitioning), so every training
    # round paid a 32-task wave plus an AQE map-stage job over near-
    # empty partitions: 11 jobs/query. Sizing the state to its actual
    # volume cuts it to 7 jobs and ~25% wall (A/B in
    # OPTIMIZATION_r12.md). The count is parameterized, NOT a local
    # constant: a vocabulary is Zipf-bounded (a 100 TB corpus still
    # has ≤ ~100M distinct words ≈ a few GB), so production sets
    # SPARK_GRAFT_BPE_STATE_PARTS ≈ vocab_bytes / 64 MB — tens of
    # partitions — while the fixture default (1) matches its sub-MB
    # vocabulary.
    import os

    state_parts = int(os.environ.get("SPARK_GRAFT_BPE_STATE_PARTS", "1"))
    state = hold_cache(
        words.select(
            "w",
            "c",
            F.concat(
                F.lit(" "), F.array_join(chars, "  "), F.lit(" ")
            ).alias("s"),
        ).coalesce(max(1, state_parts))
    )
    rules: list[tuple[int, str, str, int]] = []
    for r in range(1, _BPE_TRAIN_ROUNDS + 1):
        lst = F.expr("filter(split(s, ' '), x -> x != '')")
        pairs = (
            state.select("c", lst.alias("lst"))
            .where(F.size("lst") >= 2)
            .select(
                "c",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(lst) - 1), i -> "
                        "struct(element_at(lst, i) AS ls, "
                        "element_at(lst, i + 1) AS rs))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.ls").alias("ls"), F.col("p.rs").alias("rs"))
            .agg(F.sum("c").alias("n"))
        )
        top = (
            pairs.orderBy(F.desc("n"), F.asc("ls"), F.asc("rs"))
            .limit(1)
            .collect()
        )
        if not top:
            break  # degenerate corpus: no pairs at all
        ls, rs, n = top[0]["ls"], top[0]["rs"], int(top[0]["n"])
        rules.append((r, ls, rs, n))
        state = state.select(
            "w",
            "c",
            F.replace(
                "s",
                F.lit(f" {ls}  {rs} "),
                F.lit(f" {ls}{rs} "),
            ).alias("s"),
        )
        # lineage discipline (r8, VERDICT r7 wrong-#2): each round
        # stacks an F.replace projection on the same relation; at a
        # real tokenizer's thousands of merges the un-truncated plan
        # would blow up analysis. Same per-round cut as
        # connected_components — a vocab-sized localCheckpoint every
        # N rounds (no-op at the registry's 4-round configuration).
        if r % _BPE_CHECKPOINT_EVERY == 0 and r < _BPE_TRAIN_ROUNDS:
            state = state.localCheckpoint(eager=True)
    return rules, state


@register(
    "bpe_encode_stats",
    oracle=_bpe_rounds_cte() + f"""
    , enc AS (
      SELECT w,
             CAST(len(list_filter(string_split(s, ' '), x -> x <> ''))
                  AS BIGINT) AS n_syms
      FROM w{_BPE_TRAIN_ROUNDS}
    ),
    toks AS (SELECT lang, unnest({_TOKS}) AS w FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT)           AS n_tokens,
           CAST(sum(n_syms) AS BIGINT)        AS total_symbols,
           round(CAST(sum(len(toks.w)) AS DOUBLE)
                 / CAST(sum(n_syms) AS DOUBLE), 6) AS chars_per_symbol
    FROM toks JOIN enc ON toks.w = enc.w
    GROUP BY lang
    """,
    doc="""The ENCODE half of the BPE pipeline: apply the merge table
    bpe_train_merges learns to the corpus and report per-language
    token/symbol budgets and the chars-per-symbol compression the
    tokenizer achieves — the number a training-data pipeline uses to
    convert byte budgets into token budgets.

    Scale shape: encoding happens on the VOCABULARY (each distinct
    word's symbol string is already merged by the training loop), so
    the corpus is touched exactly twice — once by the vocabulary
    groupBy and once by the word→n_syms equi-join, whose build side is
    vocab-sized (AQE broadcasts when it fits; at 100 TB a 100M-word
    vocabulary shuffles as a normal hash join, never a forced
    broadcast). Per-language rollup partial-aggregates map-side.""",
    tags=("TEXT", "ML"),
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    _rules, state = _bpe_train(documents)
    enc = state.select(
        "w",
        F.size(F.expr("filter(split(s, ' '), x -> x != '')"))
        .cast("long")
        .alias("n_syms"),
    )
    toks = documents.select(
        "lang", F.explode(TX.tokens("text")).alias("w")
    )
    return (
        toks.join(enc, "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("n_syms").cast("long").alias("total_symbols"),
            F.round(
                F.sum(F.length("w")).cast("double")
                / F.sum("n_syms").cast("double"),
                6,
            ).alias("chars_per_symbol"),
        )
    )


_VG_BUCKETS = 10


@register(
    "vocab_growth",
    oracle=f"""
    WITH mx AS (SELECT max(doc_id) AS m FROM documents),
    first_seen AS (
      SELECT w, min(doc_id) AS fs
      FROM (SELECT doc_id, unnest({_TOKS}) AS w FROM documents)
      GROUP BY w
    ),
    bucketed AS (
      -- bucket k holds words first seen in prefix k (1-based decile
      -- of the doc_id range); ceil maps fs=0 to bucket 1 via greatest
      SELECT greatest(1, CAST(ceil(fs * {_VG_BUCKETS}.0
                                   / (m + 1)) AS BIGINT)) AS bucket,
             count(*) AS nw
      FROM first_seen, mx GROUP BY 1
    ),
    grid AS (SELECT unnest(range(1, {_VG_BUCKETS + 1})) AS bucket)
    SELECT grid.bucket,
           CAST(coalesce(nw, 0) AS BIGINT) AS new_words,
           CAST(sum(coalesce(nw, 0)) OVER (ORDER BY grid.bucket)
                AS BIGINT)                 AS vocab_size
    FROM grid LEFT JOIN bucketed ON grid.bucket = bucketed.bucket
    """,
    doc="""Heaps'-law vocabulary growth: how many NEW distinct words
    each tenth of the corpus contributes, and the cumulative
    vocabulary size — the curve a tokenizer/vocab-size decision reads
    (flattening growth → vocabulary saturated; linear growth → noisy
    OCR/boilerplate worth inspecting upstream).

    Scale shape: ONE vocab-sized shuffle (min(doc_id) per word
    partial-aggregates map-side), a 10-row bucket rollup, and the
    cumulative sum runs over those 10 rows — never a corpus-sized
    window. The prefix key is the stable doc_id, so the curve is
    deterministic across runs and partitionings.""",
    tags=("TEXT", "PIPELINE"),
)
def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (documents,) = load_tables(spark, sf_dir, "documents")
    mx = documents.agg(F.max("doc_id").alias("m"))
    first_seen = (
        spread(documents)
        .select("doc_id", F.explode(TX.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("fs"))
    )
    bucketed = (
        first_seen.crossJoin(F.broadcast(mx))
        .select(
            F.greatest(
                F.lit(1),
                F.ceil(
                    F.col("fs") * _VG_BUCKETS / (F.col("m") + 1)
                ).cast("long"),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("nw"))
    )
    grid = spark.range(1, _VG_BUCKETS + 1).select(
        F.col("id").alias("bucket")
    )
    joined = grid.join(bucketed, "bucket", "left").select(
        "bucket", F.coalesce("nw", F.lit(0)).alias("nw")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "bucket",
        F.col("nw").cast("long").alias("new_words"),
        F.sum("nw").over(w).cast("long").alias("vocab_size"),
    )


@register(
    "data_card",
    oracle=f"""
    WITH agg AS (
      SELECT CAST(count(*) AS BIGINT)                       AS n_docs,
             CAST(sum(len({_TOKS})) AS BIGINT)              AS total_tokens,
             round(avg(len({_TOKS})), 6)                    AS avg_tokens,
             round(avg(n_chars), 6)                         AS avg_chars,
             round(avg(CASE WHEN lang = 'en' THEN 1.0
                            ELSE 0.0 END), 6)               AS en_share,
             round(1.0 - count(DISTINCT md5(text))
                         / CAST(count(*) AS DOUBLE), 6)     AS exact_dup_rate
      FROM documents
    )
    SELECT 'n_docs' AS stat, CAST(n_docs AS DOUBLE) AS value FROM agg
    UNION ALL SELECT 'total_tokens', CAST(total_tokens AS DOUBLE) FROM agg
    UNION ALL SELECT 'avg_tokens', avg_tokens FROM agg
    UNION ALL SELECT 'avg_chars', avg_chars FROM agg
    UNION ALL SELECT 'en_share', en_share FROM agg
    UNION ALL SELECT 'exact_dup_rate', exact_dup_rate FROM agg
    """,
    doc="""Dataset card: the one-screen corpus summary a training-data
    release publishes (docs, token budget, language share, exact
    duplication rate). One corpus scan computes every stat as a
    partial-aggregated fold (the md5-distinct for the dup rate is the
    only key shuffle, digest-sized); the 6-row unpivot is driver-free.
    At 100 TB: same single pass — the card is the cheap artifact that
    gates the expensive pipeline stages behind it.""",
    tags=("TEXT", "PIPELINE"),
)
def data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    ntok = F.size(TX.tokens("text"))
    agg = documents.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(ntok).cast("long").alias("total_tokens"),
        F.round(F.avg(ntok), 6).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(
            F.avg((F.col("lang") == "en").cast("double")), 6
        ).alias("en_share"),
        F.round(
            1.0
            - F.countDistinct(F.md5("text"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("exact_dup_rate"),
    )
    return agg.select(
        F.expr(
            "stack(6, "
            "'n_docs', cast(n_docs as double), "
            "'total_tokens', cast(total_tokens as double), "
            "'avg_tokens', avg_tokens, "
            "'avg_chars', avg_chars, "
            "'en_share', en_share, "
            "'exact_dup_rate', exact_dup_rate) AS (stat, value)"
        )
    )


_DPE_T = 0.5  # true-duplicate Jaccard threshold for the precision gate


@register(
    "dedup_precision_eval",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sig AS (
      SELECT doc_id,
             {_MINHASH_AGGS}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band_id, h0 || h1 AS sig FROM sig
      UNION ALL SELECT doc_id, 1, h2 || h3 FROM sig
      UNION ALL SELECT doc_id, 2, h4 || h5 FROM sig
      UNION ALL SELECT doc_id, 3, h6 || h7 FROM sig
    ),
    {_BANDS_SUB_CTE}
    , cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_shared_bands
      FROM bsub a JOIN bsub b
        ON a.band_id = b.band_id AND a.sig = b.sig AND a.sub = b.sub
        AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, c.n_shared_bands, count(sb.shingle) AS cc
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      LEFT JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT n_shared_bands,
             round(CAST(cc AS DOUBLE) / (za.n + zb.n - cc), 6) AS j
      FROM common
      JOIN sizes za ON common.doc_a = za.doc_id
      JOIN sizes zb ON common.doc_b = zb.doc_id
    )
    SELECT n_shared_bands,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) FILTER (WHERE j >= {_DPE_T}) AS BIGINT)
             AS n_true_dups,
           round(count(*) FILTER (WHERE j >= {_DPE_T})
                 / CAST(count(*) AS DOUBLE), 6) AS precision,
           round(avg(j), 6) AS avg_jaccard
    FROM scored GROUP BY n_shared_bands
    """,
    doc="""Dedup-quality evaluation: empirical precision of the
    MinHash/LSH candidate generator against exact shingle Jaccard,
    bucketed by shared-band count — the measured S-curve a dedup
    pipeline reads before committing a (bands, rows) configuration,
    as a first-class query (the dedup twin of ann_recall_eval). A
    candidate pair counts as a true duplicate at Jaccard >= {t}.

    Scale shape: exact Jaccard is computed ONLY for candidate pairs
    (the LSH output, already sub-split-capped), via a shingle
    equi-join restricted to candidate docs — never all-pairs; the
    rollup is a handful of band-count rows. At 100 TB the evaluation
    is proportional to the candidate volume the pipeline would verify
    anyway.""".replace("{t}", str(_DPE_T)),
    tags=("DEDUP", "ML"),
)
def dedup_precision_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    documents = spread(documents)
    sig = D.minhash_signatures_from_text(documents, "doc_id", "text")
    cand = D.lsh_band_pairs(sig, "doc_id")
    sh = D.exploded_shingles(documents, "doc_id", "text")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(
        F.col("doc_id").alias("_db"), F.col("shingle").alias("_shb")
    )
    common = (
        cand.join(sa, "doc_a")
        .join(
            sb,
            (F.col("doc_b") == F.col("_db"))
            & (F.col("shingle") == F.col("_shb")),
            "left",
        )
        .groupBy("doc_a", "doc_b", "n_shared_bands")
        .agg(F.count("_shb").alias("cc"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    scored = (
        common.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "n_shared_bands",
            F.round(
                F.col("cc").cast("double")
                / (F.col("na") + F.col("nb") - F.col("cc")),
                6,
            ).alias("j"),
        )
    )
    return scored.groupBy("n_shared_bands").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.count(F.when(F.col("j") >= _DPE_T, 1)).cast("long").alias(
            "n_true_dups"
        ),
        F.round(
            F.count(F.when(F.col("j") >= _DPE_T, 1))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("precision"),
        F.round(F.avg("j"), 6).alias("avg_jaccard"),
    )


@register(
    "dedup_recall_eval",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sig AS (
      SELECT doc_id,
             {_MINHASH_AGGS}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band_id, h0 || h1 AS sig FROM sig
      UNION ALL SELECT doc_id, 1, h2 || h3 FROM sig
      UNION ALL SELECT doc_id, 2, h4 || h5 FROM sig
      UNION ALL SELECT doc_id, 3, h6 || h7 FROM sig
    ),
    {_BANDS_SUB_CTE}
    , cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bsub a JOIN bsub b
        ON a.band_id = b.band_id AND a.sig = b.sig AND a.sub = b.sub
        AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT doc_a, doc_b,
             round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS j
      FROM common
      JOIN sizes sa ON common.doc_a = sa.doc_id
      JOIN sizes sb ON common.doc_b = sb.doc_id
      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.1
    ),
    banded AS (
      SELECT CASE WHEN j >= 0.7 THEN '0.7+'
                  WHEN j >= 0.5 THEN '0.5-0.7'
                  WHEN j >= 0.3 THEN '0.3-0.5'
                  ELSE '0.1-0.3' END AS j_band,
             CASE WHEN cand.doc_a IS NOT NULL THEN 1 ELSE 0 END AS caught
      FROM truth LEFT JOIN cand
        ON truth.doc_a = cand.doc_a AND truth.doc_b = cand.doc_b
    )
    SELECT j_band,
           CAST(count(*) AS BIGINT)      AS n_true_pairs,
           CAST(sum(caught) AS BIGINT)   AS n_caught,
           round(sum(caught) / CAST(count(*) AS DOUBLE), 6) AS recall
    FROM banded GROUP BY j_band
    """,
    doc="""The recall half of the dedup evaluation pair
    (dedup_precision_eval measures precision): of the TRUE near-dup
    pairs (exact shingle Jaccard >= 0.1, the inverted-index join),
    what fraction does the MinHash/LSH candidate generator catch, per
    similarity band — the measured miss rate that tells a pipeline
    whether its band/row configuration leaks duplicates into the
    training set.

    Scale shape: truth generation is the same doc-freq-capped
    inverted-index equi-join ngram_jaccard runs (never all-pairs);
    the candidate set is the sub-split-capped LSH output; their
    left join is pair-keyed; the rollup is 4 band rows. At 100 TB
    recall is estimated on a sampled partition of the corpus — the
    plan is identical, only the input shrinks.""",
    tags=("DEDUP", "ML"),
)
def dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    documents = spread(documents)
    sig = D.minhash_signatures_from_text(documents, "doc_id", "text")
    cand = (
        D.lsh_band_pairs(sig, "doc_id")
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("_caught", F.lit(1))
    )
    truth = D.ngram_jaccard_pairs(
        documents, "doc_id", "text", threshold=0.1
    )
    j = F.col("jaccard")
    banded = (
        truth.join(cand, ["doc_a", "doc_b"], "left")
        .select(
            F.when(j >= 0.7, "0.7+")
            .when(j >= 0.5, "0.5-0.7")
            .when(j >= 0.3, "0.3-0.5")
            .otherwise("0.1-0.3")
            .alias("j_band"),
            F.coalesce("_caught", F.lit(0)).alias("caught"),
        )
    )
    return banded.groupBy("j_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_true_pairs"),
        F.sum("caught").cast("long").alias("n_caught"),
        F.round(
            F.sum("caught") / F.count(F.lit(1)).cast("double"), 6
        ).alias("recall"),
    )


# ---------------------------------------------------------------------------
# CCNet-style chunk-level dedup strip + PII scrub — r8
# ---------------------------------------------------------------------------


_PARA_W = 10          # words per chunk ("paragraph" unit)
_PARA_BOILER_K = 3    # chunk appearing in >= K distinct docs = boilerplate


@register(
    "paragraph_dedup_strip",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
    ),
    c AS (
      SELECT doc_id, source, i AS cidx,
             md5(array_to_string(
               ws[i * {_PARA_W} + 1 : i * {_PARA_W} + {_PARA_W}], ' '
             )) AS h
      FROM d, (SELECT unnest(range(256)) AS i) g
      -- fixed grid (DuckDB range() can't be a lateral): 256 chunks
      -- covers docs to 2560 words; fixture max is 100 words, and the
      -- WHERE filter makes any grid >= ceil(len/W) exactly equal to
      -- the Spark side's exact-length sequence()
      WHERE i * {_PARA_W} < len(ws)
    ),
    freq AS (
      SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM c GROUP BY h
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN f.n_docs < {_PARA_BOILER_K} THEN 1 ELSE 0 END)
                AS BIGINT)          AS n_kept,
           round(sum(CASE WHEN f.n_docs < {_PARA_BOILER_K} THEN 1 ELSE 0 END)
                 * 1e6 / count(*)) / 1e6 AS retention
    FROM c JOIN freq f USING (h)
    GROUP BY source
    """,
    doc=f"""Chunk-level (paragraph) dedup strip — the CCNet/RefinedWeb
    boilerplate-removal pass: documents split into non-overlapping
    {_PARA_W}-word chunks, each md5-hashed; a chunk whose hash appears
    in ≥{_PARA_BOILER_K} distinct documents is boilerplate (nav bars,
    license footers, quoted headers) and is stripped; per-source
    retention ratios are the pipeline's data-loss accounting. Finer
    grain than whole-doc dedup_exact and cheaper than MinHash — the
    standard first pass of a web-corpus pipeline (CCNet dedups at the
    paragraph hash level before model-based filtering). Scale shape:
    one narrow map (split+slice+hash inside codegen — chunking via
    slice() on the split array, no per-word explode), then a groupBy
    and an equi-join BOTH keyed on the chunk hash — the shuffle
    partitioning is reused across the two stages, so the corpus pays
    one hash-keyed redistribution. Retention rounds at 6dp from exact
    integer counts (cross-engine sync).""",
    tags=("TEXT", "DEDUP"),
    bench=True,
)
def paragraph_dedup_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    nch = F.ceil(F.size(arr) / F.lit(_PARA_W)).cast("int")
    chunks = documents.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), nch - 1),
                lambda i: F.md5(
                    F.array_join(F.slice(arr, i * _PARA_W + 1, _PARA_W), " ")
                ),
            )
        ).alias("h"),
    )
    freq = chunks.groupBy("h").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs")
    )
    kept = F.when(F.col("n_docs") < _PARA_BOILER_K, 1).otherwise(0)
    return (
        chunks.join(freq, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(kept).cast("long").alias("n_kept"),
            (
                F.round(F.sum(kept) * F.lit(1e6) / F.count(F.lit(1)))
                / F.lit(1e6)
            ).alias("retention"),
        )
    )


_SCRUB_PHONE = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
_SCRUB_EMAIL = "[A-Za-z0-9]+@[A-Za-z0-9.]+"


@register(
    "pii_scrub_stats",
    oracle=f"""
    WITH lines AS (
      SELECT c_mktsegment,
             c_name
               || CASE WHEN c_custkey % 3 <> 0
                  THEN ' call ' || printf('%02d-%03d-%03d-%04d',
                         c_custkey % 89 + 10, c_custkey % 887 + 100,
                         (c_custkey * 7) % 853 + 100,
                         (c_custkey * 31) % 8963 + 1000)
                  ELSE ' nophone 12-34' END
               || CASE WHEN c_custkey % 2 = 0
                  THEN ' mail user' || CAST(c_custkey AS VARCHAR)
                       || '@example.com'
                  ELSE ' nomail at example com' END AS line
      FROM customer
    ),
    scrubbed AS (
      SELECT c_mktsegment, line,
             regexp_replace(
               regexp_replace(line, '{_SCRUB_PHONE}', '[PHONE]', 'g'),
               '{_SCRUB_EMAIL}', '[EMAIL]', 'g'
             ) AS red
      FROM lines
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(len(regexp_extract_all(line, '{_SCRUB_PHONE}')))
                AS BIGINT)          AS n_phones,
           CAST(sum(len(regexp_extract_all(line, '{_SCRUB_EMAIL}')))
                AS BIGINT)          AS n_emails,
           CAST(sum(length(line) - length(red)) AS BIGINT)
                                    AS chars_redacted
    FROM scrubbed
    GROUP BY c_mktsegment
    """,
    doc="""PII scrub accounting — complements pii_redaction (the
    per-document scan-local redact+digest pass) with the AGGREGATE
    side a pipeline reports on: per-segment redaction counts and
    redacted character volume, over a corpus that contains decoy
    near-matches the detectors must reject.
    The corpus is synthesized from the customer table: a
    deterministic xx-xxx-xxx-xxxx phone (printf over custkey residues
    — identical printf semantics on both engines) on 2/3 of rows, a
    per-customer email on half, plus decoy fragments ('12-34',
    'at example com') that the detectors must NOT match.
    Patterns are dialect-portable (plain character classes — same
    semantics in Java regex and RE2); counting via
    size(regexp_extract_all(...)) on both engines; DuckDB's
    regexp_replace needs the 'g' flag to match Spark's replace-all
    default. Scale shape: pure map-side regex inside codegen + one
    partial-aggregated groupBy on a 5-value key — no data-sized
    shuffle.""",
    tags=("TEXT", "QUALITY"),
    bench=True,
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = load_tables(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    phone = F.format_string(
        "%02d-%03d-%03d-%04d",
        (ck % 89 + 10).cast("int"), (ck % 887 + 100).cast("int"),
        ((ck * 7) % 853 + 100).cast("int"),
        ((ck * 31) % 8963 + 1000).cast("int"),
    )
    line = F.concat(
        F.col("c_name"),
        F.when(ck % 3 != 0, F.concat(F.lit(" call "), phone))
        .otherwise(F.lit(" nophone 12-34")),
        F.when(ck % 2 == 0, F.concat(
            F.lit(" mail user"), ck.cast("string"), F.lit("@example.com")
        )).otherwise(F.lit(" nomail at example com")),
    )
    red = F.regexp_replace(
        F.regexp_replace(line, _SCRUB_PHONE, "[PHONE]"),
        _SCRUB_EMAIL, "[EMAIL]",
    )
    return (
        customer.select(
            "c_mktsegment",
            line.alias("line"),
            red.alias("red"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.size(F.regexp_extract_all(F.col("line"), F.lit(_SCRUB_PHONE), 0)))
            .cast("long").alias("n_phones"),
            F.sum(F.size(F.regexp_extract_all(F.col("line"), F.lit(_SCRUB_EMAIL), 0)))
            .cast("long").alias("n_emails"),
            F.sum(F.length("line") - F.length("red"))
            .cast("long").alias("chars_redacted"),
        )
    )
