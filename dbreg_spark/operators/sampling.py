"""Deterministic sampling / splitting for training-data pipelines.

``F.rand()`` sampling is irreproducible across retries, partitionings and
engines — a 100 TB pipeline that re-runs a failed stage must land every row
in the same split. These operators key every decision on a 60-bit md5
integer of (id, seed) — the same ``md5int`` convention the dedup/LSH
operators use (functions/xdialect.py) — so assignment is a pure column
expression, identical on Spark and DuckDB, stable under repartitioning,
and joins/filters push down normally.

No counterpart in the reference (an estimation library); these are the
pipeline-side additions a training corpus needs (train/val/test carve-outs,
per-stratum downsampling for source mixing).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.xdialect import DUCK, SPARK, X

_MOD = 1_000_000  # ppm resolution for fractions


def _bucket_expr(x: X, id_col: str, seed: int) -> str:
    return f"{x.md5int(f'({x.str_cast(id_col)} || {chr(39)}|{seed}{chr(39)})')} % {_MOD}"


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Assign every row to a named split by hash bucket: ``fractions`` maps
    split name → fraction (must sum to ≤ 1; the remainder gets the last
    listed split's complement name ``rest`` if uncovered). Appends a
    ``split`` column; deterministic in (id, seed) only."""
    if any(f < 0 for f in fractions.values()) or sum(fractions.values()) > 1 + 1e-9:
        raise ValueError("fractions must be non-negative and sum to <= 1")
    x = X(SPARK)
    bucket = F.expr(_bucket_expr(x, id_col, seed))
    expr = None
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(round(frac * _MOD))
        cond = (bucket >= F.lit(lo)) & (bucket < F.lit(hi))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    expr = expr.otherwise(F.lit("rest")) if expr is not None else F.lit("rest")
    return df.withColumn("split", expr)


def hash_split_sql(
    table: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
) -> str:
    x = X(DUCK)
    bucket = _bucket_expr(x, id_col, seed)
    cases = []
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(round(frac * _MOD))
        cases.append(f"WHEN {bucket} >= {lo} AND {bucket} < {hi} THEN {x.lit_str(name)}")
        lo = hi
    ladder = "CASE " + " ".join(cases) + " ELSE 'rest' END" if cases else "'rest'"
    return f"SELECT *, {ladder} AS split FROM {table}"


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum downsampling (source mixing): keep a row of
    stratum s iff its hash bucket < fractions[s]·10⁶. Strata absent from
    ``fractions`` are dropped (explicit mixing weights only). Pure column
    expression — one scan, no shuffle, reproducible under retries."""
    x = X(SPARK)
    bucket = F.expr(_bucket_expr(x, id_col, seed))
    expr = None
    for s, frac in fractions.items():
        cond = (F.col(strata_col) == F.lit(s)) & (
            bucket < F.lit(int(round(frac * _MOD)))
        )
        expr = cond if expr is None else (expr | cond)
    return df.where(expr if expr is not None else F.lit(False))


def stratified_sample_sql(
    table: str,
    fractions: dict,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> str:
    x = X(DUCK)
    bucket = _bucket_expr(x, id_col, seed)
    conds = [
        f"({strata_col} = {x.lit_str(s)} AND {bucket} < {int(round(frac * _MOD))})"
        for s, frac in fractions.items()
    ] or ["FALSE"]
    return f"SELECT * FROM {table} WHERE " + " OR ".join(conds)


def plan_mixture(
    available_tokens: dict,
    target_weights: dict,
    token_budget: int | None = None,
) -> dict:
    """Plan per-source sampling fractions to hit a target mixture under a
    token budget — the data-mixing step (fixed-weight mixtures à la The
    Pile / Dolma source weighting). Pure driver-side arithmetic over
    per-source token counts (get them from
    :func:`~dbreg_spark.operators.report.corpus_report`'s
    ``total_tokens``).

    ``target_weights`` (source → weight, normalized internally) defines
    the desired token SHARE of each source in the output. The feasible
    output size is capped by the scarcest source — budget* = min over
    sources of available_s / weight_s — and by ``token_budget`` when
    given; sampling never upsamples (fractions ≤ 1). Returns
    {source: fraction} for :func:`stratified_sample` — sources with zero
    weight are omitted (dropped by the sampler). Raises when a weighted
    source has no tokens."""
    w_sum = sum(target_weights.values())
    if w_sum <= 0:
        raise ValueError("plan_mixture: target weights sum to zero")
    weights = {s: w / w_sum for s, w in target_weights.items() if w > 0}
    missing = [s for s in weights if available_tokens.get(s, 0) <= 0]
    if missing:
        raise ValueError(
            f"plan_mixture: weighted sources with no available tokens: {missing}"
        )
    feasible = min(available_tokens[s] / w for s, w in weights.items())
    if token_budget is not None:
        feasible = min(feasible, float(token_budget))
    return {
        s: min(1.0, (w * feasible) / available_tokens[s])
        for s, w in weights.items()
    }


def sample_mixture(
    df: DataFrame,
    target_weights: dict,
    token_budget: int | None = None,
    token_col: str = "n_chars",
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """One-call mixture sampling: aggregate per-source token counts (one
    tiny groupBy), :func:`plan_mixture`, then the deterministic
    :func:`stratified_sample`. The realized mixture converges to the
    target as documents-per-source grows (hash sampling is exact in
    expectation; per-doc token variance adds noise)."""
    counts = {
        r[0]: int(r[1])
        for r in df.groupBy(strata_col)
        .agg(F.sum(token_col).alias("t"))
        .collect()
        if r[1] is not None
    }
    fractions = plan_mixture(counts, target_weights, token_budget)
    return stratified_sample(
        df, fractions, strata_col=strata_col, id_col=id_col, seed=seed
    )


def top_fraction_by_group(
    df: DataFrame,
    score_col: str,
    frac: float,
    group_col: str | None = None,
    keep_ties: bool = True,
) -> DataFrame:
    """Keep (approximately) the best ``frac`` of rows by ``score_col``,
    per ``group_col`` (or globally) — the selection step after quality
    scoring: "train on the top 20% of each source".

    Implemented as a per-group quantile THRESHOLD (exact interpolated
    percentile at 1−frac, the same Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` primitive corpus_report uses) broadcast-joined back
    and applied as a filter. This is the skew-safe shape at 100 TB: a
    window ``row_number`` over PARTITION BY source sorts a handful of
    enormous partitions, while the threshold is one partial-aggregated
    pass + a map-side filter. The trade: ties at the threshold all pass
    (``keep_ties=True``, default — deterministic) or all fail, so the
    kept fraction is approximate at score granularity. NULL scores never
    pass.
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    q = 1.0 - frac
    cmp_op = ">=" if keep_ties else ">"
    if group_col is None:
        thr = df.agg(
            F.expr(f"percentile({score_col}, {q!r})").alias("__thr")
        )
        out = df.crossJoin(F.broadcast(thr))
    else:
        thr = df.groupBy(group_col).agg(
            F.expr(f"percentile({score_col}, {q!r})").alias("__thr")
        )
        out = df.join(F.broadcast(thr), group_col)
    return out.where(F.expr(f"{score_col} {cmp_op} __thr")).drop("__thr")


def top_fraction_by_group_sql(
    table: str,
    score_col: str,
    frac: float,
    group_col: str | None = None,
    keep_ties: bool = True,
    select_cols: str = "*",
) -> str:
    """DuckDB twin of :func:`top_fraction_by_group`."""
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    q = 1.0 - frac
    cmp_op = ">=" if keep_ties else ">"
    if group_col is None:
        return f"""
SELECT {select_cols} FROM {table}
WHERE {score_col} {cmp_op} (SELECT quantile_cont({score_col}, {q!r}) FROM {table})
"""
    sel = "d.*" if select_cols == "*" else select_cols  # never leak __t
    return f"""
WITH __thr AS (
  SELECT {group_col}, quantile_cont({score_col}, {q!r}) AS __t
  FROM {table} GROUP BY {group_col}
)
SELECT {sel} FROM {table} d JOIN __thr USING ({group_col})
WHERE d.{score_col} {cmp_op} __thr.__t
"""
