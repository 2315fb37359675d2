"""Binning operators for binscatter (reference: R/dbbinsreg.R:747-884,
1129-1201).

Scale-first design (SURVEY §7.4): the reference's quantile path uses
``NTILE(B) OVER (ORDER BY x)`` — a single-partition global window that DuckDB
parallelizes but Spark cannot. We therefore compute *breaks* (exact numpy
quantiles when the data is small, a capped random sample otherwise — the
reference itself switches to a 1% sample above 1e6 rows,
R/dbbinsreg.R:486-572) and assign bins with a literal CASE ladder, which is
embarrassingly parallel and whole-stage-codegen friendly. An exact NTILE mode
is kept for small-data parity testing.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


@dataclass
class BreakInfo:
    breaks: np.ndarray
    method: str  # quantile | equal | log_equal | manual
    sampled: bool
    n_rows: int | None
    # full collected x column when the quantile path read it anyway (≤ 1e6
    # rows) — lets the caller compute bin geometry in numpy, one less job
    xs: np.ndarray | None = None


def compute_breaks(
    df: DataFrame,
    x: str,
    nbins: int,
    method: str = "quantile",
    randcut: float | None = None,
    sample_cap: int = 1_000_000,
    seed: int = 42,
    extra_notnull: list[str] | None = None,
) -> BreakInfo:
    """Compute bin breakpoints for ``x``.

    - quantile: numpy type-7 quantiles (R ``quantile()`` default) of either
      the full column (≤1e6 rows) or a random sample (auto 1%, ≥10k rows);
    - equal: linspace(min, max);
    - log_equal: exp(linspace(ln min, ln max)) over positive x.
    """
    cond = F.col(x).isNotNull()
    for v in extra_notnull or []:
        cond = cond & F.col(v).isNotNull()
    base = df.where(cond)
    if method == "log_equal":
        base = base.where(F.col(x) > 0)

    n_rows = base.count()
    if randcut is None:
        frac = 0.01 if n_rows > 1_000_000 else 1.0
    else:
        frac = randcut
    sampled = frac < 1.0

    if method in ("equal", "log_equal") and not sampled:
        # exact min/max via one aggregation — no row collection at all
        r = base.agg(F.min(x).alias("lo"), F.max(x).alias("hi")).collect()[0]
        lo, hi = float(r["lo"]), float(r["hi"])
        if method == "equal":
            return BreakInfo(np.linspace(lo, hi, nbins + 1), method, False, n_rows)
        return BreakInfo(
            np.exp(np.linspace(np.log(lo), np.log(hi), nbins + 1)), method, False, n_rows
        )

    sdf = base.select(x)
    # Bernoulli sample at the EXACT target fraction, no limit(): limit()
    # takes rows in partition order, so oversample-then-limit would trim
    # the trailing partitions entirely — on sorted data (time-ordered
    # parquet) that systematically excludes the largest x and biases the
    # top breaks low. A pure fraction is order-free; the collected size
    # concentrates within ±3·sqrt(target) of target.
    if sampled:
        target = min(max(10_000, int(np.ceil(n_rows * frac))), sample_cap)
        sdf = sdf.sample(fraction=min(1.0, target / max(n_rows, 1)), seed=seed)
    elif n_rows > sample_cap:
        sdf = sdf.sample(fraction=sample_cap / n_rows, seed=seed)
        sampled = True
    xs = sdf.toPandas()[x].to_numpy(dtype=float)

    if method == "quantile":
        breaks = np.quantile(xs, np.linspace(0, 1, nbins + 1))  # type-7
    elif method == "equal":
        breaks = np.linspace(xs.min(), xs.max(), nbins + 1)
    elif method == "log_equal":
        xs = xs[xs > 0]
        breaks = np.exp(np.linspace(np.log(xs.min()), np.log(xs.max()), nbins + 1))
    else:
        raise ValueError(f"unknown break method {method!r}")
    return BreakInfo(
        np.asarray(breaks, dtype=float),
        method,
        sampled,
        n_rows,
        xs=None if sampled else xs,
    )


def bin_case_column(x: str, breaks: np.ndarray):
    """CASE-ladder bin id (1-based): [bᵢ, bᵢ₊₁) left-closed right-open, last
    bin closed (reference: R/dbbinsreg.R:810-832). Returns a Column."""
    breaks = np.asarray(breaks, dtype=float)
    nb = len(breaks) - 1
    col = None
    for i in range(nb):
        lo, hi = float(breaks[i]), float(breaks[i + 1])
        if i == nb - 1:
            cond = (F.col(x) >= F.lit(lo)) & (F.col(x) <= F.lit(hi))
        else:
            cond = (F.col(x) >= F.lit(lo)) & (F.col(x) < F.lit(hi))
        col = F.when(cond, F.lit(i + 1)) if col is None else col.when(cond, F.lit(i + 1))
    return col


def bin_case_sql(x: str, breaks: np.ndarray) -> str:
    """The same CASE ladder as ANSI SQL (17-digit literals)."""
    breaks = np.asarray(breaks, dtype=float)
    nb = len(breaks) - 1
    parts = []
    for i in range(nb):
        lo, hi = repr(float(breaks[i])), repr(float(breaks[i + 1]))
        op = "<=" if i == nb - 1 else "<"
        parts.append(f"WHEN {x} >= {lo} AND {x} {op} {hi} THEN {i + 1}")
    return "CASE " + " ".join(parts) + " END"


def assign_bins(
    df: DataFrame,
    x: str,
    y: str | None,
    breaks: np.ndarray,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Project to the needed columns + a ``bin`` id; rows outside the break
    range (or with null x/y) are dropped, mirroring the reference's WHERE
    clause (R/dbbinsreg.R:846-866)."""
    cols = list(dict.fromkeys(([y] if y else []) + [x] + (keep_cols or [])))
    cond = F.col(x).isNotNull()
    if y:
        cond = cond & F.col(y).isNotNull()
    for v in keep_cols or []:
        cond = cond & F.col(v).isNotNull()
    lo, hi = float(breaks[0]), float(breaks[-1])
    cond = cond & (F.col(x) >= F.lit(lo)) & (F.col(x) <= F.lit(hi))
    return df.where(cond).select(*cols, bin_case_column(x, breaks).alias("bin"))


def assign_bins_ntile(df: DataFrame, x: str, y: str | None, nbins: int) -> DataFrame:
    """Exact equal-count bins via a global NTILE window. Single-partition —
    small data / parity testing only (the scale path is compute_breaks +
    assign_bins)."""
    cond = F.col(x).isNotNull()
    if y:
        cond = cond & F.col(y).isNotNull()
    w = Window.orderBy(F.col(x))
    return df.where(cond).withColumn("bin", F.ntile(nbins).over(w))


def bin_geometry_np(xs: np.ndarray, breaks: np.ndarray) -> pd.DataFrame:
    """Bin geometry from an already-collected x column — same assignment
    semantics as :func:`bin_case_column` (left-closed, last bin closed),
    identical break doubles, zero Spark jobs."""
    breaks = np.asarray(breaks, dtype=float)
    xs = xs[(xs >= breaks[0]) & (xs <= breaks[-1])]
    idx = np.searchsorted(breaks, xs, side="right") - 1
    idx = np.clip(idx, 0, len(breaks) - 2)
    df = pd.DataFrame({"bin": idx + 1, "x": xs})
    geo = (
        df.groupby("bin")["x"]
        .agg(x_left="min", x_right="max", x_mean="mean", n="count")
        .reset_index()
    )
    geo["x_mid"] = (geo["x_left"] + geo["x_right"]) / 2.0
    geo["n"] = geo["n"].astype("int64")
    geo["bin"] = geo["bin"].astype(int)
    return geo[["bin", "x_left", "x_right", "x_mid", "x_mean", "n"]].sort_values(
        "bin"
    ).reset_index(drop=True)


def bin_geometry(binned: DataFrame, x: str) -> pd.DataFrame:
    """Per-bin geometry: min/max/mid/mean/n, ordered by bin
    (reference: R/dbbinsreg.R:1190-1201). One tiny aggregate out."""
    geo = (
        binned.groupBy("bin")
        .agg(
            F.min(x).alias("x_left"),
            F.max(x).alias("x_right"),
            ((F.min(x) + F.max(x)) / 2.0).alias("x_mid"),
            F.avg(x).alias("x_mean"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("bin")
        .toPandas()
    )
    geo["bin"] = geo["bin"].astype(int)
    return geo


def bin_geometry_sql(from_clause: str, x: str, bin_expr: str, where: str) -> str:
    """Oracle SQL mirror of :func:`bin_geometry`."""
    return (
        f"WITH binned AS (\n  SELECT {x}, {bin_expr} AS bin\n  {from_clause}\n  WHERE {where}\n)\n"
        f"SELECT bin,\n  MIN({x}) AS x_left,\n  MAX({x}) AS x_right,\n"
        f"  (MIN({x}) + MAX({x})) / 2.0 AS x_mid,\n  AVG({x}) AS x_mean,\n"
        f"  CAST(COUNT(*) AS BIGINT) AS n\nFROM binned\nGROUP BY bin\nORDER BY bin"
    )
