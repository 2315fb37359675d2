"""`dbbinsreg` — database-side binscatter, Spark-native.

Re-implements the reference's binscatter estimator
(R/dbbinsreg.R:245-1783, Cattaneo-Crump-Farrell-Feir 2024 style):
quantile/equal-width/manual binning, piecewise-polynomial (unconstrained,
s=0) or regression-spline (constrained, s>0) fits, pointwise CIs and sup-t
confidence bands.

Differences from the reference, all scale-motivated (SURVEY §7.4):

- bin breaks come from exact numpy quantiles (small data) or a capped random
  sample (large data) and are applied as a literal CASE ladder — never a
  global NTILE window;
- the unconstrained path NEVER pulls row-level data to the driver (the
  reference fetches the binned rows into R, R/dbbinsreg.R:881): bin dummies
  and per-bin polynomial columns are Spark column expressions fed to the
  moments/demean strategies, so the whole fit is one aggregation pass;
- sup-t confidence bands use the full fit-covariance quadratic form for any
  degree (the reference's simulation covers degree 0 only).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from . import stats as _tstats
from .api import dbreg
from .formula import parse_formula, parse_weights
from .model import DbregModel
from .operators.binning import (
    BreakInfo,
    assign_bins,
    bin_geometry,
    bin_geometry_np,
    compute_breaks,
)
from .plans.common import resolve_source


@dataclass
class BinsregResult:
    points: pd.DataFrame | None
    line: pd.DataFrame | None
    bins: pd.DataFrame
    model: DbregModel
    opt: dict
    knots: np.ndarray | None = None

    def __repr__(self) -> str:
        o = self.opt
        lines = [
            f"dbbinsreg  |  {o['y_var']} ~ {o['x_var']}  nbins={o['nbins']} "
            f"binspos={o['binspos']}  points={o['points']}  line={o['line']}",
            f"N = {o['N']:,}",
        ]
        if self.points is not None:
            with pd.option_context("display.float_format", lambda v: f"{v:.5g}"):
                lines.append(str(self.points.head(25)))
        return "\n".join(lines)

    PLOT_RECIPE = (
        "fig, ax = plt.subplots()\n"
        "p = r.points  # x, bin, fit, se, lwr, upr[, cb_lwr, cb_upr]\n"
        "if p is not None and 'cb_lwr' in p:  # sup-t confidence band\n"
        "    ax.fill_between(p['x'], p['cb_lwr'], p['cb_upr'], alpha=0.15)\n"
        "if p is not None and 'lwr' in p:     # pointwise CIs\n"
        "    ax.errorbar(p['x'], p['fit'],\n"
        "                yerr=[p['fit'] - p['lwr'], p['upr'] - p['fit']],\n"
        "                fmt='o', capsize=2)\n"
        "elif p is not None:\n"
        "    ax.plot(p['x'], p['fit'], 'o')\n"
        "if r.line is not None:               # smooth fit per bin segment\n"
        "    for _, seg in r.line.groupby('bin'):\n"
        "        ax.plot(seg['x'], seg['fit'], color='C1')\n"
    )

    def plot(self, ax=None):
        """Render the binscatter (the reference's plot/tinyplot.dbbinsreg,
        plot.r:31-131): fitted points at bin means with pointwise CI
        whiskers, the sup-t confidence band as a shaded region, and the
        smooth line drawn per bin segment (spline pieces are only
        continuous to their smoothness order — never connect across bins
        for s=0).

        matplotlib is imported lazily — it is not part of this engine's
        runtime (the plottable artifacts are the plain pandas frames
        ``points``/``line``/``bins``); without it this raises ImportError
        carrying the self-contained recipe in ``PLOT_RECIPE``."""
        try:
            import matplotlib.pyplot as plt
        except ImportError as exc:
            raise ImportError(
                "matplotlib is not installed; dbbinsreg results are "
                "plottable from plain pandas frames — r.points "
                "(x, bin, fit, se, lwr, upr[, cb_lwr, cb_upr]), r.line "
                "(x, bin, fit), r.bins (id, left, right). Recipe:\n"
                + self.PLOT_RECIPE
            ) from exc
        r = self
        if ax is None:
            _, ax = plt.subplots()
        p = r.points
        if p is not None and "cb_lwr" in p:
            ax.fill_between(p["x"], p["cb_lwr"], p["cb_upr"], alpha=0.15)
        if p is not None and "lwr" in p:
            ax.errorbar(
                p["x"],
                p["fit"],
                yerr=[p["fit"] - p["lwr"], p["upr"] - p["fit"]],
                fmt="o",
                capsize=2,
            )
        elif p is not None:
            ax.plot(p["x"], p["fit"], "o")
        if r.line is not None:
            for _, seg in r.line.groupby("bin"):
                ax.plot(seg["x"], seg["fit"], color="C1")
        o = self.opt
        ax.set_xlabel(o["x_var"])
        ax.set_ylabel(o["y_var"])
        return ax


def _parse_ps(val, name: str, default=None):
    if val is None or val is False:
        return default
    if val is True:
        return (0, 0)
    p, s = int(val[0]), int(val[1])
    if s > p:
        raise ValueError(f"{name}: smoothness s must be <= degree p (got ({p}, {s}))")
    return (p, s)


def dbbinsreg(
    fml: str,
    data=None,
    *,
    spark: SparkSession | None = None,
    table: str | None = None,
    path: str | None = None,
    points=(0, 0),
    line=None,
    linegrid: int = 20,
    nbins: int = 20,
    binspos="qs",
    randcut: float | None = None,
    sample_fit: bool | None = None,
    ci: bool = True,
    cb: bool = False,
    vcov=None,
    weights: str | None = None,
    level: float = 0.95,
    nsims: int = 500,
    seed: int = 42,
    strategy: str = "auto",
    verbose: bool = False,
) -> BinsregResult:
    """Binned scatterplot estimator on a Spark-resident table.

    ``fml`` is ``y ~ x [+ controls] [| fe]`` — the first RHS variable is the
    running variable. ``points``/``line`` are (degree, smoothness) pairs.

    ``sample_fit`` (reference: R/dbbinsreg.R:40-49, 517-535) controls whether
    spline (s > 0) regressions reuse the same random sample drawn for the
    bin breaks — the only way to bound the spline pass on huge data, since
    the truncated-power design is incompressible. ``None`` auto-enables it
    (with a message) whenever break sampling applies (n over the 1e6 auto
    threshold, or an explicit ``randcut`` < 1); ``True`` enables silently;
    ``False`` always fits on the full data. Ignored for s = 0 fits, which
    the compress strategy already handles efficiently.

    ``weights`` (beyond the reference; R binsreg's ``weights=``): strictly
    positive observation weights — every bin/spline regression runs as WLS
    through :func:`dbreg`'s weighted paths, so fitted points, CIs, and the
    sup-t band all reflect the weighting. Bin BREAKS and geometry stay
    unweighted data quantiles/means (the x-axis is data geometry, not
    estimator state — matching R binsreg, whose quantile knots ignore
    weights).
    """
    pts = _parse_ps(points, "points", default=None)
    lns = _parse_ps(line, "line", default=None)
    points_on = pts is not None
    line_on = lns is not None
    if not points_on and not line_on:
        pts, points_on = (0, 0), True
    if line is True and pts is not None:
        lns = pts

    if not 0.0 < level < 1.0:
        raise ValueError("level must be in (0, 1)")
    alpha = 1 - level
    if vcov is None and ci:
        vcov = "hc1"
    elif vcov is None:
        vcov = "iid"
    if isinstance(vcov, str) and vcov.strip().lower().startswith("dk"):
        raise NotImplementedError(
            "dbbinsreg does not support Driscoll-Kraay standard errors"
        )

    parsed = parse_formula(fml)
    if parsed.has_interactions:
        raise ValueError(
            "dbbinsreg does not support interaction terms; specify controls "
            "as separate additive terms."
        )
    y = parsed.yvar
    x = parsed.xvars[0]
    controls = parsed.xvars[1:]
    fe = parsed.fe

    if spark is None and isinstance(data, DataFrame):
        spark = data.sparkSession
    source = resolve_source(spark=spark, data=data, table=table, path=path)
    df = source.df
    from .api import _require_columns

    weight_col = parse_weights(weights)
    _require_columns(df, [y, x] + controls + fe + ([weight_col] if weight_col else []))

    # ---- sample_fit: one sample reused for breaks AND spline fits --------
    # (reference: R/dbbinsreg.R:517-535 materializes a sampled temp table of
    # ALL regression columns when s > 0 and sampling applies)
    any_spline = (points_on and pts[1] > 0) or (line_on and lns is not None and lns[1] > 0)
    sample_df = None
    if any_spline and sample_fit is not False and isinstance(binspos, str):
        import warnings

        cond = F.col(x).isNotNull() & F.col(y).isNotNull()
        for c in controls + fe + ([weight_col] if weight_col else []):
            cond = cond & F.col(c).isNotNull()
        n_rows = df.where(cond).count()
        frac = randcut if randcut is not None else (0.01 if n_rows > 1_000_000 else 1.0)
        if frac < 1.0:
            if sample_fit is None:
                warnings.warn(
                    "Note: Using sampled data for spline regression (s > 0).\n"
                    "  Silence this message by explicitly setting sample_fit=True.\n"
                    "  Or, use the full dataset by setting sample_fit=False."
                )
            target = max(10_000, int(np.ceil(n_rows * frac)))
            sample_df = (
                df.where(cond)
                .sample(fraction=min(1.0, 1.2 * target / max(n_rows, 1)), seed=seed)
                .limit(target)
                .cache()
            )

    # ---- breaks ---------------------------------------------------------
    if isinstance(binspos, str):
        method = {"qs": "quantile", "es": "equal", "log": "log_equal"}.get(binspos)
        if method is None:
            raise ValueError("binspos must be 'qs', 'es', 'log', or a numeric vector")
        bi = compute_breaks(
            # when a regression sample exists, breaks come from THE SAME
            # sample (reference: x_sample read back from the sample table)
            sample_df if sample_df is not None else df,
            x, nbins, method=method,
            randcut=None if sample_df is not None else randcut,
            seed=seed, extra_notnull=[y],
        )
        breaks = bi.breaks
        n_rows_orig = bi.n_rows if sample_df is None else None
        # full column already on the driver and no extra filter columns ->
        # geometry is computable in numpy (one less Spark job)
        xs_full = bi.xs if not controls and not fe and sample_df is None else None
    else:
        breaks = np.sort(np.asarray(binspos, dtype=float))
        if len(breaks) < 2:
            raise ValueError("binspos needs at least 2 break values")
        n_rows_orig = None
        xs_full = None
    B = len(breaks) - 1

    common = dict(
        y=y, x=x, controls=controls, fe=fe, breaks=breaks, vcov=vcov,
        ci=ci, strategy=strategy, xs_full=xs_full, verbose=verbose,
        weight_col=weight_col,
    )

    def _fit(p, s):
        if s == 0:
            return _unconstrained(df=df, degree=p, **common)
        return _constrained(
            df=sample_df if sample_df is not None else df,
            degree=p, smooth=s, **common,
        )

    opt = dict(
        points=pts,
        line=lns,
        nbins=B,
        binspos=binspos if isinstance(binspos, str) else "manual",
        x_var=x,
        y_var=y,
        level=level,
        ci=ci,
        cb=cb,
        vcov=vcov,
        N=None,
        N_orig=n_rows_orig,
        sample_fit=sample_df is not None,
    )

    try:
        if points_on and line_on and pts != lns:
            fit_p, geo_p, eval_p, se_p, knots_p = _fit(*pts)
            fit_l, geo_l, eval_l, se_l, _ = _fit(*lns)
            return _build_output(
                fit_p, geo_p, eval_p, se_p, knots_p, opt, alpha, linegrid, cb, nsims,
                seed, points_on, line_on, line_eval=(geo_l, eval_l),
            )
        p, s = pts if points_on else lns
        fit, geo, eval_fn, se_fn, knots = _fit(p, s)
        return _build_output(
            fit, geo, eval_fn, se_fn, knots, opt, alpha, linegrid, cb, nsims, seed,
            points_on, line_on,
        )
    finally:
        if sample_df is not None:
            sample_df.unpersist()


# --------------------------------------------------------------------------
# unconstrained path (s = 0): piecewise polynomial via bin dummies
# (reference: R/dbbinsreg.R:959-1085 — but fully distributed here)
# --------------------------------------------------------------------------


def _unconstrained(
    df, y, x, controls, fe, breaks, degree, vcov, ci, strategy, xs_full,
    verbose, weight_col=None,
):
    wk = [weight_col] if weight_col else []
    binned = assign_bins(df, x, y, breaks, keep_cols=controls + fe + wk)
    geo = bin_geometry_np(xs_full, breaks) if xs_full is not None else bin_geometry(binned, x)

    # drop bins with too few observations for the requested degree
    min_obs = degree + 1
    bad = geo[geo["n"] < min_obs]["bin"].tolist()
    if bad:
        binned = binned.where(~F.col("bin").isin(bad))
        geo = geo[~geo["bin"].isin(bad)].reset_index(drop=True)
    present = geo["bin"].tolist()

    cols = [F.col(y)]
    sel_names = [y]
    cols.append(F.col("bin").cast("string").alias("bin"))
    sel_names.append("bin")
    rhs_terms = ["bin"]

    if degree > 0:
        left = dict(zip(geo["bin"], geo["x_left"]))
        width = dict(zip(geo["bin"], geo["x_right"] - geo["x_left"]))
        for b in present:
            h = width[b] if width[b] != 0 else 1.0
            u = (F.col(x) - F.lit(float(left[b]))) / F.lit(float(h))
            for d in range(1, degree + 1):
                cname = f"u_{b}" if d == 1 else f"u{d}_{b}"
                cols.append(
                    F.when(F.col("bin") == b, u**d).otherwise(F.lit(0.0)).alias(cname)
                )
                sel_names.append(cname)
                rhs_terms.append(cname)

    for c in controls:
        cols.append(F.col(c))
        sel_names.append(c)
        rhs_terms.append(c)
    for f_ in fe:
        cols.append(F.col(f_))
        sel_names.append(f_)
    if weight_col:
        cols.append(F.col(weight_col))
        sel_names.append(weight_col)

    frame = binned.select(*cols)
    fml = f"{y} ~ {' + '.join(rhs_terms)}"
    if fe:
        fml += " | " + " + ".join(fe)
    # the design is known by construction, so skip the auto-chooser's probe
    # pass: a degree-0 bin-dummy design (no continuous controls) compresses
    # to ≤ B·ΠG cells; polynomial u-columns / controls are incompressible →
    # moments (no FE). Anything else genuinely needs the probe.
    # (The reference recurses into dbreg the same way, R/dbbinsreg.R:1069.)
    if strategy == "auto":
        if degree == 0 and not controls:
            strategy = "compress"
        elif not controls and not fe:
            strategy = "moments"
    fit = dbreg(
        fml, frame, strategy=strategy, vcov=vcov if ci else "iid",
        verbose=verbose, weights=weight_col,
    )

    coefs = fit.coef()
    has_intercept = "(Intercept)" in coefs.index
    V = fit.vcov() if ci else None

    def _weights(x_val, b):
        """coefficient-space weight vector for the fitted value at (x, bin)."""
        w = pd.Series(0.0, index=coefs.index)
        if has_intercept:
            w["(Intercept)"] = 1.0
        bc = f"bin{b}"
        if bc in w.index:
            w[bc] = 1.0
        if degree > 0:
            row = geo[geo["bin"] == b]
            if len(row):
                x_left = float(row["x_left"].iloc[0])
                h = float(row["x_right"].iloc[0] - x_left) or 1.0
                u = (x_val - x_left) / h
                for d in range(1, degree + 1):
                    cname = f"u_{b}" if d == 1 else f"u{d}_{b}"
                    if cname in w.index:
                        w[cname] = u**d
        return w

    def eval_fn(x_val, b):
        return float(_weights(x_val, b) @ coefs)

    def se_fn(x_val, b):
        if V is None:
            return np.nan
        w = _weights(x_val, b).to_numpy()
        v = float(w @ V.to_numpy() @ w)
        return np.sqrt(max(v, 0.0))

    se_fn.weights_of = lambda xv, b: _weights(xv, b).to_numpy()
    return fit, geo, eval_fn, se_fn, None


# --------------------------------------------------------------------------
# constrained path (s > 0): truncated-power regression splines
# (reference: R/dbbinsreg.R:1094-1319)
# --------------------------------------------------------------------------


def _constrained(
    df, y, x, controls, fe, breaks, degree, smooth, vcov, ci, strategy,
    xs_full, verbose, weight_col=None,
):
    wk = [weight_col] if weight_col else []
    binned = assign_bins(df, x, y, breaks, keep_cols=controls + fe + wk)
    geo = bin_geometry_np(xs_full, breaks) if xs_full is not None else bin_geometry(binned, x)
    knots = geo["x_right"].to_numpy(dtype=float)[:-1]

    cols = [F.col(y)]
    rhs_terms = []
    for d in range(1, degree + 1):
        cname = f"x{d}_spline"
        cols.append((F.col(x) ** d).alias(cname))
        rhs_terms.append(cname)
    for j, kappa in enumerate(knots, start=1):
        for r in range(smooth, degree + 1):
            cname = f"knot{j}_pow{r}"
            if r == 0:
                e = F.when(F.col(x) > F.lit(float(kappa)), F.lit(1.0)).otherwise(F.lit(0.0))
            else:
                e = F.when(
                    F.col(x) > F.lit(float(kappa)),
                    (F.col(x) - F.lit(float(kappa))) ** r,
                ).otherwise(F.lit(0.0))
            cols.append(e.alias(cname))
            rhs_terms.append(cname)
    for c in controls:
        cols.append(F.col(c))
        rhs_terms.append(c)
    for f_ in fe:
        cols.append(F.col(f_))
    if weight_col:
        cols.append(F.col(weight_col))

    frame = binned.select(*cols)
    fml = f"{y} ~ {' + '.join(rhs_terms)}"
    if fe:
        fml += " | " + " + ".join(fe)
    # spline bases are continuous by construction: no probe needed when the
    # strategy is determined (moments for the no-FE case)
    if strategy == "auto" and not fe:
        strategy = "moments"
    fit = dbreg(
        fml, frame, strategy=strategy, vcov=vcov if ci else "iid",
        verbose=verbose, weights=weight_col,
    )

    coefs = fit.coef()
    has_intercept = "(Intercept)" in coefs.index
    V = fit.vcov() if ci else None
    basis_names = [t for t in rhs_terms if t.endswith("_spline") or t.startswith("knot")]

    def _weights(x_val, b=None):
        w = pd.Series(0.0, index=coefs.index)
        if has_intercept:
            w["(Intercept)"] = 1.0
        for d in range(1, degree + 1):
            cname = f"x{d}_spline"
            if cname in w.index:
                w[cname] = x_val**d
        for j, kappa in enumerate(knots, start=1):
            for r in range(smooth, degree + 1):
                cname = f"knot{j}_pow{r}"
                if cname in w.index:
                    if r == 0:
                        w[cname] = 1.0 if x_val > kappa else 0.0
                    else:
                        w[cname] = max(0.0, x_val - kappa) ** r
        return w

    def eval_fn(x_val, b=None):
        return float(_weights(x_val) @ coefs)

    def se_fn(x_val, b=None):
        if V is None:
            return np.nan
        w = _weights(x_val).to_numpy()
        v = float(w @ V.to_numpy() @ w)
        return np.sqrt(max(v, 0.0))

    se_fn.weights_of = lambda xv, b=None: _weights(xv).to_numpy()
    return fit, geo, eval_fn, se_fn, knots


# --------------------------------------------------------------------------
# output assembly (reference: R/dbbinsreg.R:1648-1783)
# --------------------------------------------------------------------------


def _build_output(
    fit,
    geo,
    eval_fn,
    se_fn,
    knots,
    opt,
    alpha,
    linegrid,
    cb,
    nsims,
    seed,
    points_on,
    line_on,
    line_eval=None,
):
    B = len(geo)
    crit = _tstats.t_ppf(1 - alpha / 2, fit.df_residual)

    points_df = None
    if points_on:
        xm = geo["x_mean"].to_numpy(dtype=float)
        bins = geo["bin"].tolist()
        fits = np.array([eval_fn(xm[i], bins[i]) for i in range(B)])
        points_df = pd.DataFrame({"x": xm, "bin": bins, "fit": fits})
        ses = np.array([se_fn(xm[i], bins[i]) for i in range(B)])
        if np.isfinite(ses).any():
            points_df["se"] = ses
            points_df["lwr"] = fits - crit * ses
            points_df["upr"] = fits + crit * ses
            if cb:
                crit_cb = _supt_critical(fit, geo, eval_fn, se_fn, alpha, nsims, seed)
                points_df["cb_lwr"] = fits - crit_cb * ses
                points_df["cb_upr"] = fits + crit_cb * ses

    line_df = None
    if line_on:
        lg, le = (geo, eval_fn) if line_eval is None else line_eval
        rows = []
        for _, r in lg.iterrows():
            b = int(r["bin"])
            xs = np.linspace(r["x_left"], r["x_right"], linegrid)
            for xv in xs:
                rows.append((xv, b, le(xv, b)))
        line_df = pd.DataFrame(rows, columns=["x", "bin", "fit"])

    bins_df = pd.DataFrame(
        {"id": geo["bin"], "left": geo["x_left"], "right": geo["x_right"]}
    )
    opt = dict(opt)
    opt["N"] = int(geo["n"].sum())
    opt["nbins"] = B
    return BinsregResult(
        points=points_df, line=line_df, bins=bins_df, model=fit, opt=opt, knots=knots
    )


def _supt_critical(fit, geo, eval_fn, se_fn, alpha, nsims, seed):
    """sup-t critical value via simulation from N(0, C) where C is the
    covariance of the fitted values at the bin means (any degree — the
    full W V W' quadratic form)."""
    V = fit.vcov().to_numpy()
    coefs = fit.coef()
    B = len(geo)
    W = np.zeros((B, len(coefs)))
    xm = geo["x_mean"].to_numpy(dtype=float)
    bins = geo["bin"].tolist()
    # re-derive weight vectors through the se machinery: finite diff not
    # needed — eval/se closures carry _weights, but to stay generic we build
    # W from the covariance diagonal structure via per-bin perturbation.
    # Instead: rebuild from se_fn being w'Vw — we need w itself, so we expose
    # the closure attribute if present.
    weights_of = getattr(se_fn, "weights_of", None)
    if weights_of is None:
        # fall back: independent normal draws scaled by se (degree-0 behavior,
        # matching the reference's simulation R/dbbinsreg.R:1675-1686)
        ses = np.array([se_fn(xm[i], bins[i]) for i in range(B)])
        rng = np.random.default_rng(seed)
        draws = rng.standard_normal((nsims, B))
        sup_t = np.abs(draws).max(axis=1)
        return float(np.quantile(sup_t, 1 - alpha))
    for i in range(B):
        W[i] = weights_of(xm[i], bins[i])
    C = W @ V @ W.T
    ses = np.sqrt(np.clip(np.diag(C), 1e-300, None))
    rng = np.random.default_rng(seed)
    draws = rng.multivariate_normal(np.zeros(B), C, size=nsims, method="svd")
    sup_t = np.abs(draws / ses).max(axis=1)
    return float(np.quantile(sup_t, 1 - alpha))


# --------------------------------------------------------------------------
# serialization (same json+parquet scheme as save_model / save_split)
# --------------------------------------------------------------------------


def save_binsreg(r: BinsregResult, path: str) -> None:
    """Serialize a binscatter result to directory ``path``: ``binsreg.json``
    (options + knots — json floats round-trip bit-exactly via repr),
    ``points/line/bins.parquet`` (exact doubles), and the underlying model
    under ``model/`` (so wald/predict still work after reload). Restore
    with :func:`load_binsreg` / ``BinsregResult.load`` /
    ``model.load_any_model``."""
    import json
    import os

    from .model import _json_default

    os.makedirs(path, exist_ok=True)
    opt = {
        k: (list(v) if isinstance(v, tuple) else v) for k, v in r.opt.items()
    }
    meta = {
        "format": "dbreg_spark.binsreg/1",
        "opt": opt,
        "knots": [float(v) for v in r.knots] if r.knots is not None else None,
        "has_points": r.points is not None,
        "has_line": r.line is not None,
    }
    with open(os.path.join(path, "binsreg.json"), "w") as f:
        json.dump(meta, f, allow_nan=True, default=_json_default)
    if r.points is not None:
        r.points.to_parquet(os.path.join(path, "points.parquet"))
    if r.line is not None:
        r.line.to_parquet(os.path.join(path, "line.parquet"))
    r.bins.to_parquet(os.path.join(path, "bins.parquet"))
    r.model.save(os.path.join(path, "model"))


def load_binsreg(path: str, spark=None) -> BinsregResult:
    import json
    import os

    from .model import load_model

    with open(os.path.join(path, "binsreg.json")) as f:
        meta = json.load(f)
    if meta.get("format") != "dbreg_spark.binsreg/1":
        raise ValueError(f"unrecognized binsreg format in {path}")
    opt = meta["opt"]
    # the two bin-spec options are (degree, smooth) tuples in-memory
    for k in ("points", "line"):
        if isinstance(opt.get(k), list):
            opt[k] = tuple(opt[k])
    return BinsregResult(
        points=(
            pd.read_parquet(os.path.join(path, "points.parquet"))
            if meta["has_points"]
            else None
        ),
        line=(
            pd.read_parquet(os.path.join(path, "line.parquet"))
            if meta["has_line"]
            else None
        ),
        bins=pd.read_parquet(os.path.join(path, "bins.parquet")),
        model=load_model(os.path.join(path, "model"), spark),
        opt=opt,
        knots=(
            np.asarray(meta["knots"], dtype=float)
            if meta["knots"] is not None
            else None
        ),
    )


BinsregResult.save = save_binsreg
BinsregResult.load = staticmethod(load_binsreg)


# --------------------------------------------------------------------------
# GLM binscatter (beyond the reference; fixest-world binscatter for
# logit / poisson / negbin outcomes)
# --------------------------------------------------------------------------


def dbbinsglm(
    fml: str,
    data=None,
    *,
    family: str = "binomial",
    spark: SparkSession | None = None,
    table: str | None = None,
    path: str | None = None,
    nbins: int = 20,
    binspos="qs",
    randcut: float | None = None,
    ci: bool = True,
    cb: bool = False,
    nsims: int = 500,
    vcov=None,
    level: float = 0.95,
    scale: str = "response",
    theta: float | None = None,
    offset: str | None = None,
    weights: str | None = None,
    seed: int = 42,
    verbose: bool = False,
    line: int | tuple | None = None,
    linegrid: int = 20,
) -> BinsregResult:
    """GLM binned scatterplot: degree-0 bin dummies through
    :func:`dbreg_spark.dbglm` (``y ~ bin [+ controls]``, the natural
    composition of the compress-style binned design with the GLM tier).

    The fitted point per bin is the GLM fitted value at that bin's dummy
    with controls at 0 (the same partialling convention as
    :func:`dbbinsreg`'s points): on the LINK scale eta_b = icpt + beta_b,
    with delta-method SEs; ``scale='response'`` maps through the inverse
    link (CIs transform monotonically from the link scale, so they stay
    inside the family's range — e.g. [0, 1] for binomial). With no
    controls, the binomial/poisson fitted value per bin is exactly the bin
    mean of y (bin dummies saturate the design) — pinned by tests against
    a dense numpy IRLS oracle, controls included.

    Absorbed ``| fe`` parts are supported for ``family='poisson'`` via
    dbglm's fepois/PPML path (the log link's FE profile is closed-form):
    the link-scale point per bin is its coefficient RELATIVE to the
    reference bin with the FE profiled out — dbbinsreg's OLS ``| fe``
    partialling convention — and ``scale='response'`` is then the rate
    ratio vs the reference bin. Other families refuse ``| fe`` (compose
    low-cardinality groups as factor controls).

    ``line=p`` (or ``(p, 0)``) adds a smooth per-bin degree-``p``
    polynomial fit: a SECOND dbglm on bin dummies + per-bin scaled
    ``u^d`` columns (dbbinsreg's unconstrained design, fed through the
    GLM link), evaluated on a ``linegrid``-point grid per bin. The line
    carries delta-method bands on the link scale, transformed
    monotonically for ``scale='response'`` — r.line columns
    (x, bin, fit, se, lwr, upr). Constrained splines (smoothness s > 0)
    are OLS-only (:func:`dbbinsreg`)."""
    from .glm import dbglm, get_family

    if not 0.0 < level < 1.0:
        raise ValueError("level must be in (0, 1)")
    if scale not in ("response", "link"):
        raise ValueError("scale must be 'response' or 'link'")
    alpha = 1 - level
    if vcov is None:
        vcov = "hc1" if ci else "iid"
    line_deg = None
    if line is not None:
        if isinstance(line, (tuple, list)):
            if len(line) != 2 or int(line[1]) != 0:
                raise NotImplementedError(
                    "dbbinsglm line= supports per-bin polynomials only "
                    "(smoothness s = 0); constrained splines are OLS-only "
                    "(dbbinsreg)"
                )
            line_deg = int(line[0])
        else:
            line_deg = int(line)
        if line_deg < 1:
            raise ValueError("line degree must be >= 1")
        if linegrid < 2:
            raise ValueError("linegrid must be >= 2")

    parsed = parse_formula(fml)
    if parsed.has_interactions:
        raise ValueError(
            "dbbinsglm does not support interaction terms; specify "
            "controls as separate additive terms."
        )
    if parsed.fe and family != "poisson":
        raise NotImplementedError(
            "dbbinsglm absorbs `| fe` parts for family='poisson' only "
            "(the fepois/PPML profile is closed-form — dbglm's FE path); "
            "for other families include low-cardinality groups as factor "
            "controls"
        )
    fe = list(parsed.fe)
    y = parsed.yvar
    x = parsed.xvars[0]
    controls = parsed.xvars[1:]

    if spark is None and isinstance(data, DataFrame):
        spark = data.sparkSession
    source = resolve_source(spark=spark, data=data, table=table, path=path)
    df = source.df
    from .api import _require_columns

    weight_col = parse_weights(weights)
    aux = [c for c in (offset, weight_col) if c]
    _require_columns(df, [y, x] + controls + fe + aux)

    if isinstance(binspos, str):
        method = {"qs": "quantile", "es": "equal", "log": "log_equal"}.get(
            binspos
        )
        if method is None:
            raise ValueError(
                "binspos must be 'qs', 'es', 'log', or a numeric vector"
            )
        bi = compute_breaks(
            df, x, nbins, method=method, randcut=randcut, seed=seed,
            extra_notnull=[y],
        )
        breaks = bi.breaks
    else:
        breaks = np.sort(np.asarray(binspos, dtype=float))
        if len(breaks) < 2:
            raise ValueError("binspos needs at least 2 break values")

    binned = assign_bins(df, x, y, breaks, keep_cols=controls + fe + aux)
    geo = bin_geometry(binned, x)
    present = geo["bin"].tolist()

    frame = binned.withColumn("bin", F.col("bin").cast("string"))
    rhs = ["bin"] + list(controls)
    # the binned design is pure compression fodder whenever the controls
    # are discrete (factor dummies) and the offset doesn't explode the
    # cells: route through dbglm's cells strategy — ONE groupBy pass +
    # driver IRLS on <= nbins x control-level cells instead of ~10 full
    # raw-frame scans (identical estimates, pinned by parity tests)
    from .design import classify_columns

    glm_strategy = "auto"
    if offset is None and not fe:
        ctypes = classify_columns(binned, list(controls)) if controls else {}
        if all(t != "numeric" for t in ctypes.values()):
            glm_strategy = "cells"
    # bin levels are already enumerated (geo is the per-bin aggregate of
    # the SAME complete-case frame assign_bins built), so dbglm can skip
    # factor_levels' probe + distinct scans for the bin factor; the string
    # sort matches factor_levels' lexicographic orderBy
    bin_levels = sorted(
        str(int(b)) if float(b).is_integer() else str(b) for b in present
    )
    fml_fit = f"{y} ~ {' + '.join(rhs)}"
    if fe:
        # poisson only (guarded above): dbglm's fepois/PPML path profiles
        # the FE out, so the link-scale points below are RELATIVE to the
        # reference bin with the FE absorbed — the same partialling
        # convention as dbbinsreg's OLS `| fe` points (response scale is
        # then a rate ratio vs the reference bin)
        fml_fit += " | " + " + ".join(fe)
    fit = dbglm(
        fml_fit, frame, family=family,
        vcov=vcov if ci else "iid", theta=theta, offset=offset,
        weights=weights, verbose=verbose, strategy=glm_strategy,
        _known_levels={"bin": bin_levels},
    )

    fam = get_family(
        family,
        theta=(theta if isinstance(theta, (int, float)) else 1.0)
        if family == "negbin"
        else None,
    )
    link = "identity" if fam.name == "gaussian" else (
        "logit" if fam.name == "binomial" else "log"
    )

    def inv_link(eta):
        if link == "logit":
            return 1.0 / (1.0 + np.exp(-eta))
        if link == "log":
            return np.exp(eta)
        return eta

    coefs = fit.coeftable["estimate"]
    names = list(coefs.index)
    V = np.asarray(fit.vcov_, dtype=float) if ci else None
    crit = float(_tstats.norm_ppf(1 - alpha / 2))

    def _lvl(b):
        # geo carries bins as pandas floats; the factor level (hence the
        # coefficient name) is the STRING of the integer bin id
        fb = float(b)
        return str(int(fb)) if fb.is_integer() else str(b)

    rows = []
    W_rows, etas, ses = [], [], []
    for _, g in geo.iterrows():
        b = g["bin"]
        w = np.zeros(len(names))
        if "(Intercept)" in names:
            w[names.index("(Intercept)")] = 1.0
        bc = f"bin{_lvl(b)}"
        if bc in names:
            w[names.index(bc)] = 1.0
        eta = float(w @ coefs.to_numpy())
        se_eta = (
            float(np.sqrt(max(w @ V @ w, 0.0))) if V is not None else np.nan
        )
        W_rows.append(w)
        etas.append(eta)
        ses.append(se_eta)
        lo_eta, hi_eta = eta - crit * se_eta, eta + crit * se_eta
        if scale == "response":
            mu = float(inv_link(eta))
            dmu = (
                mu * (1 - mu) if link == "logit"
                else (mu if link == "log" else 1.0)
            )
            row = dict(
                x=g["x_mean"], bin=b, fit=mu, se=abs(dmu) * se_eta,
                lwr=float(inv_link(lo_eta)), upr=float(inv_link(hi_eta)),
            )
        else:
            row = dict(
                x=g["x_mean"], bin=b, fit=eta, se=se_eta,
                lwr=lo_eta, upr=hi_eta,
            )
        if not ci:
            row.pop("se"), row.pop("lwr"), row.pop("upr")
        rows.append(row)
    if cb and ci and V is not None and len(W_rows):
        # sup-t band (the same simulation as _supt_critical, link scale):
        # draws from N(0, WVW'), crit = (1-alpha) quantile of max |z|/se,
        # bounds transformed monotonically like the pointwise CIs
        Wm = np.vstack(W_rows)
        C = Wm @ V @ Wm.T
        se_arr = np.sqrt(np.clip(np.diag(C), 1e-300, None))
        rng = np.random.default_rng(seed)
        draws = rng.multivariate_normal(
            np.zeros(len(W_rows)), C, size=nsims, method="svd"
        )
        crit_cb = float(
            np.quantile(np.abs(draws / se_arr).max(axis=1), 1 - alpha)
        )
        for i, row in enumerate(rows):
            lo = etas[i] - crit_cb * ses[i]
            hi = etas[i] + crit_cb * ses[i]
            if scale == "response":
                lo, hi = float(inv_link(lo)), float(inv_link(hi))
            row["cb_lwr"], row["cb_upr"] = lo, hi
    points = pd.DataFrame(rows).sort_values("x").reset_index(drop=True)

    line_df = None
    if line_deg is not None:
        # per-bin degree-p polynomial through the link: a SECOND dbglm on
        # bin dummies + per-bin scaled u^d columns (the unconstrained OLS
        # design of dbbinsreg._unconstrained, GLM-linked), evaluated on a
        # linegrid-point grid per bin with delta-method link-scale bands
        left = dict(zip(geo["bin"], geo["x_left"]))
        width = dict(zip(geo["bin"], geo["x_right"] - geo["x_left"]))
        lsel = [F.col(y), F.col("bin").cast("string").alias("bin")] + [
            F.col(c) for c in list(controls) + fe + aux
        ]
        ucols = []
        for b in present:
            h = float(width[b]) if width[b] != 0 else 1.0
            u = (F.col(x) - F.lit(float(left[b]))) / F.lit(h)
            for d in range(1, line_deg + 1):
                cname = f"u_{_lvl(b)}" if d == 1 else f"u{d}_{_lvl(b)}"
                lsel.append(
                    F.when(F.col("bin") == b, u ** d)
                    .otherwise(F.lit(0.0)).alias(cname)
                )
                ucols.append(cname)
        lframe = binned.select(*lsel)
        rhs2 = ["bin"] + ucols + list(controls)
        fml2 = f"{y} ~ {' + '.join(rhs2)}"
        if fe:
            fml2 += " | " + " + ".join(fe)
        fit2 = dbglm(
            fml2, lframe, family=family, vcov=vcov if ci else "iid",
            theta=theta, offset=offset, weights=weights, verbose=verbose,
            _known_levels={"bin": bin_levels},
        )
        c2 = fit2.coeftable["estimate"].to_numpy()
        n2 = list(fit2.coeftable.index)
        V2 = np.asarray(fit2.vcov_, dtype=float) if ci else None
        pos2 = {nm: i for i, nm in enumerate(n2)}
        lrows = []
        for _, g2 in geo.iterrows():
            b = g2["bin"]
            bl = _lvl(b)
            xl, xr = float(g2["x_left"]), float(g2["x_right"])
            h = (xr - xl) or 1.0
            for xv in np.linspace(xl, xr, linegrid):
                w = np.zeros(len(n2))
                if "(Intercept)" in pos2:
                    w[pos2["(Intercept)"]] = 1.0
                if f"bin{bl}" in pos2:
                    w[pos2[f"bin{bl}"]] = 1.0
                uu = (xv - xl) / h
                for d in range(1, line_deg + 1):
                    cn = f"u_{bl}" if d == 1 else f"u{d}_{bl}"
                    if cn in pos2:
                        w[pos2[cn]] = uu ** d
                eta = float(w @ c2)
                se_eta = (
                    float(np.sqrt(max(w @ V2 @ w, 0.0)))
                    if V2 is not None else np.nan
                )
                lo, hi = eta - crit * se_eta, eta + crit * se_eta
                if scale == "response":
                    muv = float(inv_link(eta))
                    dmu = (
                        muv * (1 - muv) if link == "logit"
                        else (muv if link == "log" else 1.0)
                    )
                    rowd = dict(
                        x=xv, bin=b, fit=muv, se=abs(dmu) * se_eta,
                        lwr=float(inv_link(lo)), upr=float(inv_link(hi)),
                    )
                else:
                    rowd = dict(
                        x=xv, bin=b, fit=eta, se=se_eta, lwr=lo, upr=hi
                    )
                if not ci:
                    rowd.pop("se"), rowd.pop("lwr"), rowd.pop("upr")
                lrows.append(rowd)
        line_df = (
            pd.DataFrame(lrows).sort_values(["bin", "x"])
            .reset_index(drop=True)
        )

    bins_df = pd.DataFrame(
        dict(
            id=geo["bin"],
            left=geo["x_left"],
            right=geo["x_right"],
            n=geo["n"],
        )
    )
    return BinsregResult(
        points=points,
        line=line_df,
        bins=bins_df,
        model=fit,
        opt=dict(
            y_var=y, x_var=x, nbins=len(breaks) - 1,
            binspos=binspos if isinstance(binspos, str) else "manual",
            points=(0, 0),
            line=(line_deg, 0) if line_deg is not None else None,
            N=int(fit.nobs),
            family=fit.family, scale=scale, level=level,
        ),
        knots=breaks,
    )
