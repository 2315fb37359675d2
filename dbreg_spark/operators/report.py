"""Corpus statistics report — the monitoring/dashboard stage of a
training-data pipeline: one row per source/shard with volume, length
distribution, quality, and duplication-rate aggregates.

Single groupBy over per-row column expressions; length percentiles use the
EXACT interpolated percentile (Spark ``percentile`` ≡ DuckDB
``quantile_cont``, verified bit-equal), so the DuckDB twin is the same
computation. The per-group duplicate rate counts distinct normalized
content hashes — exact by default (right for a per-source report whose
group count is small); at extreme cardinalities swap in
``approx_count_distinct`` via ``exact_distinct=False`` (the gate keeps the
exact path).

The scale shape is one corpus scan into a partial-aggregated shuffle keyed
by the group column; COUNT(DISTINCT) adds the usual expand, bounded per
group. No driver involvement beyond the tiny per-group result.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.xdialect import DUCK, SPARK, WS, X
from .text import quality_score_expr


def _report_row_exprs(x: X, col: str) -> dict[str, str]:
    """Per-row expressions the report aggregates over. NULL text is counted
    by ``is_null`` and contributes 0 tokens (explicit guard: Spark's
    ``size(NULL)`` is -1 while DuckDB's ``len(NULL)`` is NULL — both
    engines get the same CASE)."""
    n_tok = (
        f"CASE WHEN {col} IS NULL OR length({x.trim_ws(col)}) = 0 THEN 0 "
        f"ELSE {x.size(x.split_ws(col))} END"
    )
    norm = f"lower({x.regexp_replace_all(x.trim_ws(col), WS + '+', ' ')})"
    return {
        "__ntok": f"CAST({n_tok} AS BIGINT)",
        "__len": f"CAST(length({col}) AS DOUBLE)",
        "__null": f"CAST({col} IS NULL AS INT)",
        "__q": quality_score_expr(x, col),
        # sentinel '' groups NULL-text docs together (matching
        # exact_duplicates): md5(NULL) is NULL, which COUNT DISTINCT
        # SKIPS — every NULL doc would otherwise count as a duplicate
        "__h": f"COALESCE(md5({norm}), '')",
    }


def corpus_report(
    df: DataFrame,
    group_col: str = "source",
    col: str = "text",
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-``group_col`` corpus statistics: document/NULL counts, token
    volume, exact p50/p95 character lengths, mean quality score, and the
    exact-duplicate rate (1 − distinct normalized hashes / docs)."""
    x = X(SPARK)
    rows = _report_row_exprs(x, col)
    base = df.select(
        F.col(group_col), *[F.expr(e).alias(a) for a, e in rows.items()]
    )
    distinct_h = (
        F.count_distinct(F.col("__h"))
        if exact_distinct
        else F.approx_count_distinct(F.col("__h"))
    )
    n = F.count(F.lit(1))
    return (
        base.groupBy(group_col)
        .agg(
            n.cast("long").alias("n_docs"),
            F.sum("__null").cast("long").alias("n_null"),
            F.sum("__ntok").cast("long").alias("total_tokens"),
            F.round(F.avg("__ntok"), 6).alias("mean_tokens"),
            F.expr("percentile(__len, 0.5)").alias("p50_chars"),
            F.expr("percentile(__len, 0.95)").alias("p95_chars"),
            F.round(F.avg("__q"), 6).alias("mean_quality"),
            F.round(
                1.0 - distinct_h.cast("double") / n,
                6,
            ).alias("dup_rate"),
        )
    )


def corpus_report_sql(
    table: str, group_col: str = "source", col: str = "text"
) -> str:
    """DuckDB twin of :func:`corpus_report` (exact-distinct path)."""
    x = X(DUCK)
    rows = _report_row_exprs(x, col)
    sel = ",\n    ".join(f"{e} AS {a}" for a, e in rows.items())
    return f"""
WITH base AS (
  SELECT {group_col},
    {sel}
  FROM {table}
)
SELECT {group_col},
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(__null) AS BIGINT) AS n_null,
       CAST(SUM(__ntok) AS BIGINT) AS total_tokens,
       ROUND(AVG(__ntok), 6) AS mean_tokens,
       quantile_cont(__len, 0.5) AS p50_chars,
       quantile_cont(__len, 0.95) AS p95_chars,
       ROUND(AVG(__q), 6) AS mean_quality,
       ROUND(1.0 - CAST(COUNT(DISTINCT __h) AS DOUBLE) / COUNT(*), 6) AS dup_rate
FROM base
GROUP BY {group_col}
"""
