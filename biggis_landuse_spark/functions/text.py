"""Text analysis operators (language-ID, quality, tokens, fingerprint).

All pure Spark SQL expressions (whole-stage codegen; no UDF). Each has
a DuckDB-equivalent formulation used by the oracle in
``queries/textops.py`` — deterministic by construction on both engines.

Expression-inlining discipline: functions taking a token ARRAY column
(`*_from_tokens`) expect a *materialized* column reference. Passing
the tokenizer expression itself makes Catalyst inline
``filter(split(text))`` at every use site inside the lambdas — the
doc is re-tokenized many times per row (measured 9× slowdown on the
shingle pipeline). Hot paths project ``tokens(text).alias("_toks")``
first and pass ``F.col("_toks")``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Language-characteristic stopword sets for the heuristic language-ID.
# Deterministic argmax with fixed tie-break order (en > de > es > fr).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
}

STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

PUNCT_CLASS = "[^.!?,;:]"  # complement: keep only punctuation

# Gopher document-quality rules (Rae et al. 2021, arXiv:2112.11446
# Appendix A1.1) — the PUBLISHED thresholds, shared by the batch
# query (queries/pipeline.py::gopher_rules) and the streaming
# admission gate (streaming/quality.py):
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_MAX_SYMBOL = 0.1  # '#' + '...' per word
GOPHER_MAX_BULLET = 0.9  # frac lines starting with a bullet
GOPHER_MAX_ELLIPSIS = 0.3  # frac lines ending with '...'
GOPHER_MIN_ALPHA = 0.8  # frac words containing a letter
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOP = 2  # distinct required stop words present


def gopher_rule_flags(
    text: Column | str = "text",
    toks: Column | str = "_t",
    lines: Column | str = "_lines",
) -> dict[str, Column]:
    """The 7 Gopher rule booleans over a document whose token array
    (``toks``) and line array (``lines``) are already materialized
    (one select upstream — the flags reference them several times).
    NULL text coalesces to rule FAILURE; every ratio is a single IEEE
    division of exact integers, so a DuckDB oracle replaying the same
    expressions matches bit-for-bit."""
    text, toks, lines = (
        F.col(c) if isinstance(c, str) else c for c in (text, toks, lines)
    )
    n = F.size(toks)
    n1 = F.greatest(n, F.lit(1)).cast("double")
    nl1 = F.greatest(F.size(lines), F.lit(1)).cast("double")
    mwl = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n1
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ell = (
        (
            F.length(text)
            - F.length(F.replace(text, F.lit("..."), F.lit("")))
        )
        / F.lit(3)
    ).cast("long")
    bullet = F.size(
        F.filter(
            lines, lambda l: F.ltrim(l).like("•%") | F.ltrim(l).like("- %")
        )
    )
    ell_end = F.size(F.filter(lines, lambda l: l.like("%...")))
    alpha = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            lambda w: F.array_contains(toks, w),
        )
    )
    rb = lambda c: F.coalesce(c, F.lit(False))  # noqa: E731
    return {
        "r_words": rb((n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)),
        "r_word_len": rb((mwl >= GOPHER_MIN_MWL) & (mwl <= GOPHER_MAX_MWL)),
        # the paper thresholds EACH symbol ratio separately (hash-to-
        # word AND ellipsis-to-word), not their sum
        "r_symbol": rb(
            ((n_hash / n1) <= GOPHER_MAX_SYMBOL)
            & ((n_ell / n1) <= GOPHER_MAX_SYMBOL)
        ),
        "r_bullet": rb((bullet / nl1) <= GOPHER_MAX_BULLET),
        "r_ellipsis": rb((ell_end / nl1) <= GOPHER_MAX_ELLIPSIS),
        "r_alpha": rb((alpha / n1) >= GOPHER_MIN_ALPHA),
        "r_stopword": rb(stop_hits >= GOPHER_MIN_STOP),
    }


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization with empty-token removal (codegen'd)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, " "), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    col = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(F.regexp_replace(col, PUNCT_CLASS, ""))
    return F.when(F.length(col) > 0, n_punct / F.length(col)).otherwise(F.lit(0.0))


def stopword_ratio_from_tokens(
    toks: Column, stopwords: tuple[str, ...] = STOPWORDS_EN
) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, n_sw / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(
    text: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN
) -> Column:
    return stopword_ratio_from_tokens(tokens(text), stopwords)


def mean_word_len_from_tokens(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def mean_word_len(text: Column | str) -> Column:
    return mean_word_len_from_tokens(tokens(text))


def lang_scores_from_tokens(toks: Column) -> dict[str, Column]:
    """Per-language stopword hit counts over a materialized token col."""
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return out


def lang_id_from_scores(s: dict[str, Column]) -> Column:
    """Deterministic argmax over *materialized* score columns, fixed
    tie-break order. Score expressions are referenced up to 3× each —
    callers project them first (see module docstring)."""
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )


def lang_id(text: Column | str) -> Column:
    """Single-expression language-ID (convenience; hot paths use the
    two-step materialized form in queries/textops.py)."""
    return lang_id_from_scores(lang_scores_from_tokens(tokens(text)))


def fingerprint(text: Column | str) -> Column:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed text (rolling-hash family; stable across engines)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.regexp_replace(col, r"\s+", " ")))
