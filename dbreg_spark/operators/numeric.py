"""Numeric column preparation: winsorization, standardization, robust
(median/MAD) outlier flagging — the feature-hygiene steps before a
regression or a quality-classifier fit.

Each operator is TWO jobs at any scale: one tiny aggregation probe
(quantiles / mean-sd / median-MAD — a handful of doubles to the driver)
whose results are embedded as literals into pure column expressions, then
the stateless transform scan. Nothing shuffles except the probe's own
single-row aggregate.

Quantile probes default to ``percentile_approx`` (mergeable sketch —
the 100 TB path); ``exact=True`` switches to exact ``percentile``
(continuous interpolation, identical to DuckDB's ``quantile_cont``) for
oracle-matched results — exact percentile buffers values per group, so
reserve it for bounded inputs.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_PCTL = {True: "percentile", False: "percentile_approx"}


def _probe_value(col: str, v, what: str = "quantile") -> float:
    """A probe that comes back None (all-NULL column) or NaN must raise a
    clear error here — interpolated into a SQL expression it becomes
    ``... - None`` (a parse error) or a NaN literal that poisons every
    comparison."""
    if v is None:
        raise ValueError(
            f"column {col!r} has no non-null values; cannot compute its {what}"
        )
    v = float(v)
    if not math.isfinite(v):
        raise ValueError(
            f"column {col!r} {what} probe returned {v!r} (NaN/inf values "
            "in the column?); clean or filter the column first"
        )
    return v


def _quantile_probe(
    df: DataFrame, cols: list[str], ps: list[float], exact: bool
) -> dict:
    """{col: [q_p for p in ps]} from one aggregation pass."""
    fn = _PCTL[bool(exact)]
    arr = "array(" + ", ".join(repr(float(p)) for p in ps) + ")"
    aggs = [
        F.expr(f"{fn}(CAST({c} AS DOUBLE), {arr})").alias(f"__q_{i}")
        for i, c in enumerate(cols)
    ]
    row = df.agg(*aggs).collect()[0]
    # an all-NULL column yields a NULL array (not an array of NULLs)
    return {
        c: list(v) if (v := row[f"__q_{i}"]) is not None else [None] * len(ps)
        for i, c in enumerate(cols)
    }


def winsorize(
    df: DataFrame,
    cols: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
    suffix: str = "_w",
    exact: bool = False,
) -> DataFrame:
    """Clamp each column to its [lower, upper] quantiles; clamped values
    land in ``col + suffix`` (pass ``suffix=""`` to replace in place).
    NULLs pass through untouched."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError("need 0 <= lower < upper <= 1")
    qs = _quantile_probe(df, cols, [lower, upper], exact)
    out = df
    for c in cols:
        lo = _probe_value(c, qs[c][0])
        hi = _probe_value(c, qs[c][1])
        cd = F.col(c).cast("double")
        # guard NULLs explicitly: Spark's greatest/least SKIP nulls (they
        # return null only when ALL args are null), so an unguarded clamp
        # would silently turn NULL into the lower bound. Guard NaN too:
        # greatest/least order NaN above every real, so least(NaN, hi) = hi
        # would silently clamp NaN to the upper bound — pass it through.
        out = out.withColumn(
            c + suffix,
            F.when(
                cd.isNotNull() & ~F.isnan(cd),
                F.least(
                    F.greatest(cd, F.lit(lo)), F.lit(hi)
                ),
            ).otherwise(cd),
        )
    return out


def winsorize_sql(
    from_clause: str,
    cols: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
    suffix: str = "_w",
) -> str:
    """DuckDB twin (exact ``quantile_cont`` ≡ Spark's exact percentile)."""
    q = ",\n    ".join(
        f"quantile_cont(CAST({c} AS DOUBLE), {lower!r}) AS lo_{i},\n"
        f"    quantile_cont(CAST({c} AS DOUBLE), {upper!r}) AS hi_{i}"
        for i, c in enumerate(cols)
    )
    clamps = ",\n  ".join(
        f"CASE WHEN b.{c} IS NOT NULL AND NOT isnan(CAST(b.{c} AS DOUBLE)) THEN "
        f"LEAST(GREATEST(CAST(b.{c} AS DOUBLE), q.lo_{i}), q.hi_{i}) "
        f"ELSE CAST(b.{c} AS DOUBLE) END AS {c}{suffix}"
        for i, c in enumerate(cols)
    )
    return (
        f"WITH q AS (\n  SELECT\n    {q}\n  {from_clause}\n)\n"
        f"SELECT b.*,\n  {clamps}\nFROM (SELECT * {from_clause}) b, q"
    )


def standardize(
    df: DataFrame, cols: list[str], suffix: str = "_z", ddof: int = 1
) -> DataFrame:
    """z-score each column ((x − mean)/sd) into ``col + suffix``; constant
    columns yield NULL (0/0) rather than inf."""
    aggs = []
    for i, c in enumerate(cols):
        cd = F.col(c).cast("double")
        aggs += [
            F.avg(cd).alias(f"__m_{i}"),
            (F.stddev_samp(cd) if ddof else F.stddev_pop(cd)).alias(f"__s_{i}"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = df
    for i, c in enumerate(cols):
        m, s = row[f"__m_{i}"], row[f"__s_{i}"]
        # s == s rejects NaN (a NaN stddev from NaN inputs would emit NaN,
        # not the documented NULL, through the division)
        good = s is not None and math.isfinite(float(s)) and float(s) != 0.0
        denom = F.lit(float(s)) if good else F.lit(None).cast("double")
        out = out.withColumn(
            c + suffix, (F.col(c).cast("double") - F.lit(float(m or 0.0))) / denom
        )
    return out


def standardize_sql(
    from_clause: str, cols: list[str], suffix: str = "_z", ddof: int = 1
) -> str:
    sd = "stddev_samp" if ddof else "stddev_pop"
    q = ",\n    ".join(
        f"AVG(CAST({c} AS DOUBLE)) AS m_{i},\n"
        f"    {sd}(CAST({c} AS DOUBLE)) AS s_{i}"
        for i, c in enumerate(cols)
    )
    zs = ",\n  ".join(
        f"(CAST(b.{c} AS DOUBLE) - q.m_{i}) / NULLIF(q.s_{i}, 0) AS {c}{suffix}"
        for i, c in enumerate(cols)
    )
    return (
        f"WITH q AS (\n  SELECT\n    {q}\n  {from_clause}\n)\n"
        f"SELECT b.*,\n  {zs}\nFROM (SELECT * {from_clause}) b, q"
    )


def mad_outliers(
    df: DataFrame,
    cols: list[str],
    k: float = 3.5,
    exact: bool = False,
) -> DataFrame:
    """Flag robust outliers per column: |x − median| > k · 1.4826 · MAD
    (the modified z-score rule; 1.4826 scales MAD to σ under normality).
    Adds ``col + "_outlier"`` boolean columns (NULL input → NULL flag).
    Two probe passes (median, then MAD around it) + the stateless scan."""
    med = _quantile_probe(df, cols, [0.5], exact)
    meds = {c: _probe_value(c, med[c][0], "median") for c in cols}
    fn = _PCTL[bool(exact)]
    aggs = [
        F.expr(
            f"{fn}(ABS(CAST({c} AS DOUBLE) - {meds[c]!r}), 0.5)"
        ).alias(f"__mad_{i}")
        for i, c in enumerate(cols)
    ]
    row = df.agg(*aggs).collect()[0]
    out = df
    for i, c in enumerate(cols):
        m = meds[c]
        mad = float(row[f"__mad_{i}"] or 0.0)
        thresh = k * 1.4826 * mad
        cd = F.col(c).cast("double")
        flag = (
            F.abs(cd - F.lit(m)) > F.lit(thresh)
            if mad > 0
            else (cd != F.lit(m))  # degenerate: anything off the median
        )
        out = out.withColumn(c + "_outlier", flag)
    return out


def mad_outliers_sql(
    from_clause: str, cols: list[str], k: float = 3.5
) -> str:
    meds = ",\n    ".join(
        f"quantile_cont(CAST({c} AS DOUBLE), 0.5) AS med_{i}"
        for i, c in enumerate(cols)
    )
    mads = ",\n    ".join(
        f"quantile_cont(ABS(CAST(b.{c} AS DOUBLE) - m.med_{i}), 0.5) AS mad_{i}"
        for i, c in enumerate(cols)
    )
    flags = ",\n  ".join(
        f"CASE WHEN d.mad_{i} > 0 THEN "
        f"ABS(CAST(b.{c} AS DOUBLE) - m.med_{i}) > {k!r} * 1.4826 * d.mad_{i} "
        f"ELSE CAST(b.{c} AS DOUBLE) <> m.med_{i} END AS {c}_outlier"
        for i, c in enumerate(cols)
    )
    return (
        f"WITH m AS (\n  SELECT\n    {meds}\n  {from_clause}\n),\n"
        f"d AS (\n  SELECT\n    {mads}\n  FROM (SELECT * {from_clause}) b, m\n)\n"
        f"SELECT b.*,\n  {flags}\nFROM (SELECT * {from_clause}) b, m, d"
    )


def correlation_matrix(df: DataFrame, cols: list[str]):
    """Pairwise Pearson correlations from ONE moment pass (the same
    sufficient-statistics shape the regression engine uses: n, Σx, Σxᵢxⱼ —
    p(p+3)/2 aggregates, map-side combined). Returns a pandas DataFrame
    indexed/columned by ``cols``. Rows with a NULL in ANY listed column are
    dropped (listwise deletion, matching a joint moment pass)."""
    import numpy as np
    import pandas as pd

    d = df
    for c in cols:
        d = d.where(F.col(c).isNotNull())
    aggs = [F.count(F.lit(1)).cast("double").alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).cast("double")).alias(f"__s_{i}"))
        for j2 in range(i, len(cols)):
            aggs.append(
                F.sum(
                    F.col(c).cast("double") * F.col(cols[j2]).cast("double")
                ).alias(f"__x_{i}_{j2}")
            )
    row = d.agg(*aggs).collect()[0]
    n = float(row["__n"])
    p = len(cols)
    s = np.array([float(row[f"__s_{i}"]) for i in range(p)])
    M = np.zeros((p, p))
    for i in range(p):
        for j2 in range(i, p):
            M[i, j2] = M[j2, i] = float(row[f"__x_{i}_{j2}"])
    cov = M / n - np.outer(s / n, s / n)
    sd = np.sqrt(np.clip(np.diag(cov), 0, None))
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = cov / np.outer(sd, sd)
    corr[~np.isfinite(corr)] = np.nan
    np.fill_diagonal(corr, 1.0)
    return pd.DataFrame(corr, index=cols, columns=cols)


def vif(df: DataFrame, cols: list[str]):
    """Variance inflation factors from the same single moment pass:
    VIF_j = [R⁻¹]_jj with R the correlation matrix — the standard
    multicollinearity diagnostic before a regression."""
    import numpy as np
    import pandas as pd

    corr = correlation_matrix(df, cols).to_numpy()
    inv = np.linalg.pinv(corr)
    return pd.Series(np.diag(inv), index=cols, name="vif")


def correlation_matrix_sql(from_clause: str, cols: list[str]) -> str:
    """DuckDB twin: one row of all pairwise CORR() values (corr_i_j),
    listwise-deleted like the Spark path."""
    where = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    terms = ",\n  ".join(
        f"corr(CAST({cols[i]} AS DOUBLE), CAST({cols[j]} AS DOUBLE)) AS corr_{i}_{j}"
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    )
    return f"SELECT {terms}\n{from_clause}\nWHERE {where}"
