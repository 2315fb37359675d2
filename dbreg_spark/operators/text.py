"""Text-analysis operators for training-data pipelines.

All metrics are plain column expressions (JVM-side, codegen-friendly — no
Python UDFs) built from the cross-dialect templates in
:mod:`dbreg_spark.functions.xdialect`, so each operator has a DuckDB oracle
that is the same computation by construction.

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length/punctuation/stopword/repetition signals), n-gram-heuristic language
ID, and document fingerprinting (normalized md5 + rolling word hash).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.xdialect import DUCK, SPARK, X

# BPE-ish tokenization: letter runs, single digits, punctuation marks
BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
PUNCT_RE = r"[!-/:-@\[-`{-~]"

STOPWORDS_EN = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "that"]
# tiny marker lists for the language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "y", "los", "es"],
    "it": ["il", "la", "e", "che", "di"],
}


def _in_list(words: list[str]) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def text_stats_exprs(x: X, col: str) -> list[tuple[str, str]]:
    """(alias, expression) pairs for the per-document text statistics."""
    words = x.split_ws(col)
    n_tok = f"CASE WHEN length(trim({col})) = 0 THEN 0 ELSE {x.size(words)} END"
    n_stop = x.size(x.filter(words, f"t -> lower(t) IN {_in_list(STOPWORDS_EN)}"))
    n_uniq = x.size(x.array_distinct(words))
    exprs = [
        ("n_chars_c", f"CAST(length({col}) AS BIGINT)"),
        ("n_tokens", f"CAST({n_tok} AS BIGINT)"),
        ("n_tokens_bpe", f"CAST({x.regexp_count(col, BPE_RE)} AS BIGINT)"),
        (
            "punct_ratio",
            f"CAST(length({col}) - length({x.regexp_replace_all(col, PUNCT_RE, '')}) AS DOUBLE)"
            f" / greatest(length({col}), 1)",
        ),
        (
            "digit_ratio",
            f"CAST(length({col}) - length({x.regexp_replace_all(col, '[0-9]', '')}) AS DOUBLE)"
            f" / greatest(length({col}), 1)",
        ),
        (
            "stopword_ratio",
            f"CAST({n_stop} AS DOUBLE) / greatest({n_tok}, 1)",
        ),
        (
            "unique_token_ratio",
            f"CAST({n_uniq} AS DOUBLE) / greatest({n_tok}, 1)",
        ),
        (
            "mean_token_len",
            f"CAST(length({x.regexp_replace_all(col, chr(92) + 's', '')}) AS DOUBLE)"
            f" / greatest({n_tok}, 1)",
        ),
    ]
    return exprs


def quality_score_expr(x: X, col: str) -> str:
    """Composite quality score in [0, 1]: favors mid-length documents with
    some stopwords, low punctuation/digit noise, and lexical diversity."""
    words = x.split_ws(col)
    n_tok = f"CASE WHEN length(trim({col})) = 0 THEN 0 ELSE {x.size(words)} END"
    n_stop = x.size(x.filter(words, f"t -> lower(t) IN {_in_list(STOPWORDS_EN)}"))
    n_uniq = x.size(x.array_distinct(words))
    len_score = f"least(CAST({n_tok} AS DOUBLE) / 100.0, 1.0)"
    stop_score = f"least(CAST({n_stop} AS DOUBLE) / greatest({n_tok}, 1) * 5.0, 1.0)"
    div_score = f"CAST({n_uniq} AS DOUBLE) / greatest({n_tok}, 1)"
    punct = (
        f"CAST(length({col}) - length({x.regexp_replace_all(col, PUNCT_RE, '')}) AS DOUBLE)"
        f" / greatest(length({col}), 1)"
    )
    return (
        f"0.25 * {len_score} + 0.25 * {stop_score} + 0.25 * {div_score} "
        f"+ 0.25 * (1.0 - least({punct} * 10.0, 1.0))"
    )


def lang_id_expr(x: X, col: str) -> str:
    """Greatest-marker-hit language guess; 'und' when nothing matches."""
    words = f"__w"
    scores = {
        lang: x.size(x.filter(x.split_ws(col), f"t -> lower(t) IN {_in_list(ms)}"))
        for lang, ms in LANG_MARKERS.items()
    }
    langs = list(scores)
    best = f"greatest({', '.join(scores.values())})"
    cases = " ".join(
        f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in langs
    )
    return f"CASE WHEN {best} = 0 THEN 'und' ELSE CASE {cases} END END"


def fingerprint_exprs(x: X, col: str) -> list[tuple[str, str]]:
    """Document fingerprints: md5 of whitespace-normalized lowercase text,
    plus a rolling 40-bit polynomial hash over word hashes (order-sensitive,
    overflow-free on both engines)."""
    norm = f"lower({x.regexp_replace_all(f'trim({col})', chr(92) + 's+', ' ')})"
    words = x.split_ws(col)
    word_h = x.transform(words, f"w -> {x.md5int('lower(w)')} % 1099511627776")
    rolling = x.reduce_bigint(
        word_h, "0", "(acc, h) -> (acc * 31 + h) % 1099511627776"
    )
    return [
        ("fp_md5", f"md5({norm})"),
        ("fp_rolling", f"CAST({rolling} AS BIGINT)"),
    ]


# --------------------------------------------------------------------------
# Spark-side entry points
# --------------------------------------------------------------------------


def text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    x = X(SPARK)
    keep = [c for c in df.columns if c != col]
    return df.select(
        *keep,
        *[F.expr(e).alias(a) for a, e in text_stats_exprs(x, col)],
        F.expr(quality_score_expr(x, col)).alias("quality_score"),
        F.expr(lang_id_expr(x, col)).alias("lang_pred"),
    )


def fingerprints(df: DataFrame, col: str = "text") -> DataFrame:
    x = X(SPARK)
    keep = [c for c in df.columns if c != col]
    return df.select(
        *keep, *[F.expr(e).alias(a) for a, e in fingerprint_exprs(x, col)]
    )


# --------------------------------------------------------------------------
# DuckDB oracle SQL
# --------------------------------------------------------------------------


def text_stats_sql(table: str, col: str = "text", id_col: str = "doc_id") -> str:
    x = X(DUCK)
    cols = [f"{id_col}"]
    cols += [f"{e} AS {a}" for a, e in text_stats_exprs(x, col)]
    cols.append(f"{quality_score_expr(x, col)} AS quality_score")
    cols.append(f"{lang_id_expr(x, col)} AS lang_pred")
    return "SELECT " + ",\n  ".join(cols) + f" FROM {table}"


def fingerprints_sql(table: str, col: str = "text", id_col: str = "doc_id") -> str:
    x = X(DUCK)
    cols = [id_col] + [f"{e} AS {a}" for a, e in fingerprint_exprs(x, col)]
    return "SELECT " + ",\n  ".join(cols) + f" FROM {table}"
