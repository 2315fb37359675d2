"""Web-corpus cleaning — C4-style line filtering and URL/domain analytics.

The C4 dataset's cleaning heuristics (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning", §2.2) are the canonical first-pass filter
for web-crawled LLM training text: keep only lines that end in terminal
punctuation and have enough words, drop boilerplate lines ("javascript",
cookie/privacy notices), and drop whole documents containing "lorem
ipsum" or curly braces (code/templating residue). URL extraction +
per-domain statistics drive the other standard pass: domain blocklists
and per-domain mixture weights (cf. RefinedWeb / FineWeb source curation).

All of it is pure column expressions over one scan — array lambdas and
regexes inside whole-stage codegen, zero shuffles for the line filter and
URL explode, one counted aggregation for domain stats. Every expression
is rendered for Spark and DuckDB from the same template (xdialect.X), so
the oracle twin is the same computation by construction.

At 100 TB: the line filter is stateless and row-local (streaming-safe,
partition-preserving). ``extract_urls`` fans out by URL count per doc
(bounded by text length — no skew surface beyond the corpus itself).
``domain_stats`` shuffles (domain, partial counts) only — map-side
combine keeps the exchange tiny — and the top-N is a TakeOrdered, never
a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dbreg_spark.functions.xdialect import DUCK, SPARK, X

# C4's line-level blocklist (lowercased substring match) — lines mentioning
# javascript plus the cookie/policy boilerplate family.
C4_LINE_BLOCKLIST = [
    "javascript",
    "cookie policy",
    "privacy policy",
    "terms of use",
    "uses cookies",
]

# Terminal punctuation a kept line must end with (C4 keeps lines ending in
# . ! ? or a closing quote).
# \z, not $: Java's $ also matches before a final line terminator (incl.
# U+0085), RE2's does not — \z is end-of-input on both.
_TERMINAL_RE = "[.!?\"']\\z"

# Full URL match: scheme (case-insensitive — crawled text shouts) +
# everything up to whitespace/quote/bracket.
# U+0085/U+2028/U+2029 are excluded too: they are line terminators to Java
# regex (affecting `.` and `$`) but not to RE2 — keeping them out of URLs
# makes every downstream URL regex engine-identical.
URL_RE = (
    "[Hh][Tt][Tt][Pp][Ss]?://"
    "[^ \\t\\n\\r\\f\\x{85}\\x{2028}\\x{2029}\"'<>]+"
)


def c4_exprs(
    x: X,
    col: str,
    min_words: int = 3,
    min_lines: int = 1,
    blocklist: list[str] | None = None,
) -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """Two projection stages for the C4 filter: stage 1 evaluates the
    expensive per-line filter tree ONCE (kept-lines array, line count,
    doc flags); stage 2 derives the outputs from the stage-1 columns.
    Inlining the kept-array into every output would evaluate the lambda
    tree (regexes × lines) three times per row — the same
    double-evaluation class quality_classify measured at 4.1×.

    Blocklist entries are lowercased in Python and escaped via
    ``lit_str``; matching uses ``instr`` (plain substring — no LIKE
    wildcard surprises, no quote injection)."""
    bl = C4_LINE_BLOCKLIST if blocklist is None else blocklist
    lines = x.split_re(col, "\\n")
    preds = [
        x.rlike(x.trim_ws("l"), _TERMINAL_RE),
        f"{x.size(x.split_ws('l'))} >= {min_words}",
    ]
    preds += [
        f"instr(lower(l), {x.lit_str(p.lower())}) = 0" for p in bl
    ]
    # kept lines are emitted TRIMMED (a CRLF doc would otherwise carry
    # stray \r into clean_text; the keep-rules already judge trimmed text)
    kept = x.transform(
        x.filter(lines, "l -> " + " AND ".join(preds)),
        f"l -> {x.trim_ws('l')}",
    )
    stage1 = [
        ("__c4_kept", kept),
        ("__c4_nl", x.size(lines)),
        ("__c4_lorem", f"(instr(lower({col}), 'lorem ipsum') > 0)"),
        ("__c4_brace", f"(instr({col}, '{{') > 0)"),
    ]
    n_kept = x.size("__c4_kept")
    stage2 = [
        ("clean_text", x.array_join_expr("__c4_kept", "chr(10)")),
        ("n_lines", "__c4_nl"),
        ("n_lines_kept", n_kept),
        ("has_lorem_ipsum", "__c4_lorem"),
        ("has_brace", "__c4_brace"),
        (
            "keep",
            f"(NOT __c4_lorem AND NOT __c4_brace AND {n_kept} >= {min_lines})",
        ),
    ]
    return stage1, stage2


def c4_filter(
    df: DataFrame,
    col: str = "text",
    min_words: int = 3,
    min_lines: int = 1,
    blocklist: list[str] | None = None,
) -> DataFrame:
    """C4-style cleaning: per-line keep rules (terminal punctuation,
    ``min_words`` whitespace words, no blocklisted substring — entries
    are case-insensitive plain substrings) plus document-level flags
    (``has_lorem_ipsum``, ``has_brace``) and the overall ``keep`` verdict
    (no doc flag AND ≥ ``min_lines`` surviving lines). Returns every
    input column except ``col`` plus (clean_text, n_lines, n_lines_kept,
    flags, keep) — filter on ``keep`` and train on ``clean_text`` (kept
    lines, trimmed, rejoined with \\n).

    One stateless scan, zero shuffles (streaming-safe); the per-line
    filter tree is evaluated once per row (two chained projections)."""
    x = X(SPARK)
    stage1, stage2 = c4_exprs(x, col, min_words, min_lines, blocklist)
    keep_cols = [c for c in df.columns if c != col]
    base = df.select(
        *keep_cols, *[F.expr(e).alias(a) for a, e in stage1]
    )
    casts = {"n_lines": "long", "n_lines_kept": "long"}
    return base.select(
        *keep_cols,
        *[
            F.expr(e).cast(casts[a]).alias(a) if a in casts else F.expr(e).alias(a)
            for a, e in stage2
        ],
    )


def c4_filter_sql(
    table: str,
    col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    min_lines: int = 1,
    blocklist: list[str] | None = None,
) -> str:
    x = X(DUCK)
    stage1, stage2 = c4_exprs(x, col, min_words, min_lines, blocklist)
    inner = (
        f"SELECT {id_col}, "
        + ", ".join(f"{e} AS {a}" for a, e in stage1)
        + f" FROM {table}"
    )
    casts = {"n_lines", "n_lines_kept"}
    cols = [id_col] + [
        f"CAST({e} AS BIGINT) AS {a}" if a in casts else f"{e} AS {a}"
        for a, e in stage2
    ]
    return "SELECT " + ",\n  ".join(cols) + f" FROM ({inner}) __c4s1"


# --------------------------------------------------------------------------
# URL extraction / domain statistics
# --------------------------------------------------------------------------


def url_part_exprs(x: X, url: str) -> list[tuple[str, str]]:
    """(alias, expression) for url_norm / host / domain from a url string.

    Normalization: strip the fragment, then trailing sentence punctuation
    (a URL at the end of a sentence drags its period along in the regex
    match). Host is lowercased (DNS is case-insensitive); domain is the
    last two dot-labels of the host — a registered-domain approximation
    (no public-suffix list in either engine; co.uk-style suffixes group
    by suffix, documented)."""
    norm = x.regexp_replace_all(url, "#.*\\z", "")
    norm = x.regexp_replace_all(norm, "[.,;:!?)\\]]+\\z", "")
    host = (
        f"lower({x.regexp_extract(norm, '^[Hh][Tt][Tt][Pp][Ss]?://([^/:?#]+)', 1)})"
    )
    domain = x.regexp_extract(host, "([^.]+[.][^.]+)\\z", 1)
    return [("url_norm", norm), ("host", host), ("domain", domain)]


def extract_urls(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """All URLs in ``col``, one output row per occurrence:
    (``id_col``, url, url_norm, host, domain). A row-local explode — fanout
    is the per-doc URL count, no shuffle."""
    x = X(SPARK)
    ex = df.select(
        F.col(id_col),
        F.explode(F.expr(x.regexp_extract_all(col, URL_RE))).alias("url"),
    )
    return ex.select(
        id_col,
        "url",
        *[F.expr(e).alias(a) for a, e in url_part_exprs(x, "url")],
    )


def extract_urls_sql(
    table: str, col: str = "text", id_col: str = "doc_id"
) -> str:
    x = X(DUCK)
    inner = (
        f"SELECT {id_col}, unnest({x.regexp_extract_all(col, URL_RE)}) AS url "
        f"FROM {table}"
    )
    parts = [f"{e} AS {a}" for a, e in url_part_exprs(x, "url")]
    return (
        f"SELECT {id_col}, url, " + ", ".join(parts) + f" FROM ({inner})"
    )


def domain_stats(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 100,
) -> DataFrame:
    """Per-domain link statistics over the corpus: occurrence count and
    distinct-document count, deterministic top-``top_n`` by volume
    (ties broken by domain). The aggregation shuffles (domain, partials)
    only; the top-N is a TakeOrdered on the aggregated table — never a
    global sort of URLs."""
    urls = extract_urls(df, col=col, id_col=id_col)
    agg = urls.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct(id_col).cast("long").alias("n_docs"),
    )
    return agg.orderBy(F.desc("n_urls"), F.asc("domain")).limit(top_n)


def domain_stats_sql(
    table: str,
    col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 100,
) -> str:
    inner = extract_urls_sql(table, col=col, id_col=id_col)
    return (
        f"SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_urls, "
        f"CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS n_docs "
        f"FROM ({inner}) GROUP BY domain "
        f"ORDER BY n_urls DESC, domain ASC LIMIT {top_n}"
    )
