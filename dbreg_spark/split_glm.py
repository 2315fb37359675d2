"""Split-sample GLM estimation — G generalized linear models fitted in
LOCKSTEP from grouped IRLS passes.

The naive approach runs the IRLS loop per level: G × iterations full
scans. Here every level shares each pass: the per-level coefficient
vectors ride a broadcast (level → β) lookup into the linear predictor, so
one ``groupBy(split)`` aggregation advances ALL levels' Newton steps at
once. Total full-data passes ≈ max iterations over levels (+1 for a
robust/clustered meat) — independent of G. Levels converge (and can
misbehave) independently: step-halving, validity checks, and collinearity
handling are per-level driver-side state; converged levels simply stop
updating while the scan continues (their β is frozen, the extra rows cost
nothing but I/O already being paid).

Families: binomial / poisson / gaussian, with ``offset=`` and prior
``weights=`` (R's glm semantics, matching :func:`dbreg_spark.dbglm`);
vcov: model-based (iid), HC1, clustered (1-3 way CGM), or Driscoll-Kraay
(``"dk ~ t"``) via one more grouped score pass over the finest key. Fixed effects are
refused (concentrated-FE profiles do not share a lockstep frame); fit
per level with ``dbglm`` for those.
"""

from __future__ import annotations

import math
import warnings

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .design import build_design, standardize_coef_names
from .formula import parse_formula, parse_vcov, parse_weights
from .glm import GlmModel, _decode_pass, get_family
from .plans.common import resolve_source
from .plans.exprs import (
    Func,
    Lit,
    Var,
    agg_to_spark,
    amax,
    amin,
    asum,
    count_star,
    to_spark,
)
from .plans.frames import build_base_frame
from .solve import (
    compute_vcov,
    detect_collinearity,
    gen_coeftable,
    solve_with_fallback,
)
from .split import DbregSplit, beta_schema


def _d(e):
    from .plans.exprs import Cast

    return Cast(e, "double")


class GlmSplit(DbregSplit):
    """``{split_level: GlmModel}`` with the stacked ``tidy()`` view."""


def _col_eta(x_names, icpt, offset):
    """η from per-level coefficient COLUMNS __b0..__bk (broadcast-joined),
    instead of the literal-β η the single-model IRLS uses."""
    off = 1 if icpt else 0
    e = _d(Var("__b0")) if icpt else Lit(0.0)
    for j, xn in enumerate(x_names):
        e = e + _d(Var(f"__b{j + off}")) * _d(Var(xn))
    if offset is not None:
        e = _d(Var(offset)) + e
    return e


def _grouped_pass(
    j: DataFrame, fam, split, x_names, icpt, offset, weights, first: bool
):
    """One grouped IRLS aggregation over a frame already carrying the
    per-level __b* coefficient columns. Same spec names as
    glm.irls_pass_plan so ``_decode_pass`` reads each level's row."""
    y = _d(Var("__y_raw"))
    eta_x = _col_eta(x_names, icpt, None)
    off_e = _d(Var(offset)) if offset is not None else None
    eta = off_e + eta_x if off_e is not None else eta_x
    mu = fam.mu(eta)
    w = fam.w(eta, mu)
    wz = fam.wz(eta_x, mu, y, w, off_e)
    ll = fam.ll(eta, mu, y)
    om = _d(Var(weights)) if weights is not None else None
    if om is not None:
        w = om * w
        wz = om * wz
        ll = om * ll
    proj_exprs = [
        ("__w", _d(w)),
        ("__wz", _d(wz)),
        ("__ll", _d(ll)),
        ("__p2", _d(
            fam.pearson_sq(mu, y) if om is None else om * fam.pearson_sq(mu, y)
        )),
    ]
    if first:
        llsat = fam.ll_sat(y)
        proj_exprs.append(("__llsat", _d(llsat if om is None else om * llsat)))
        proj_exprs.append(("__yv", y))
        proj_exprs.append(("__wt", _d(om) if om is not None else Lit(1.0)))
        if fam.name == "binomial":
            proj_exprs.append(("__ybad", Func("abs", (y * (Lit(1.0) - y),))))
    proj = j.select(
        F.col(split).alias("__sp"),
        *[to_spark(e).alias(n) for n, e in proj_exprs],
        *[F.col(n) for n in x_names],
    )
    cols = ([Lit(1.0)] if icpt else []) + [Var(n) for n in x_names]
    p = len(cols)
    spec = [
        ("n_total", count_star()),
        ("ll", asum(Var("__ll"))),
        ("pearson", asum(Var("__p2"))),
    ]
    if first:
        spec += [
            ("ll_sat", asum(Var("__llsat"))),
            ("sum_wt", asum(Var("__wt"))),
            ("wt_min", amin(Var("__wt"))),
            ("sum_y", asum(Var("__wt") * Var("__yv"))),
            ("sum_y_sq", asum(Var("__wt") * Var("__yv") * Var("__yv"))),
            ("y_min", amin(Var("__yv"))),
            ("y_max", amax(Var("__yv"))),
        ]
        if fam.name == "binomial":
            spec.append(("y_bad", asum(Var("__ybad"))))
    wv = Var("__w")
    for i in range(p):
        for k in range(i, p):
            spec.append((f"a_{i}_{k}", asum(wv * _d(cols[i]) * _d(cols[k]))))
    for i in range(p):
        spec.append((f"b_{i}", asum(Var("__wz") * _d(cols[i]))))
    rows = proj.groupBy("__sp").agg(
        *[agg_to_spark(a).alias(n) for n, a in spec]
    ).collect()
    return {r["__sp"]: r.asDict() for r in rows}, p


def _beta_frame(spark, lvl_type, states, p_all):
    """Broadcastable (level, __b0..__b{p_all-1}) lookup from driver state.
    Full design space: collinearity-dropped columns carry 0. ``lvl_type`` is
    the split column's Spark DataType (explicit schema — inference fails on
    an all-None level)."""
    rows = []
    for lvl, st in states.items():
        full = np.zeros(p_all)
        full[np.asarray(st["keep_idx"], dtype=int)] = st["cand"]
        rows.append((lvl,) + tuple(float(v) for v in full))
    return spark.createDataFrame(rows, schema=beta_schema(lvl_type, p_all))


def dbglm_split(
    fml: str,
    data=None,
    *,
    split: str,
    family: str = "binomial",
    spark: SparkSession | None = None,
    table: str | None = None,
    path: str | None = None,
    vcov="iid",
    cluster=None,
    weights: str | None = None,
    hac_lag: int | None = None,
    offset: str | None = None,
    drop_missings: bool = True,
    max_iter: int = 25,
    tol: float = 1e-8,
    split_nmax: int = 1000,
    verbose: bool = False,
) -> GlmSplit:
    """Fit one GLM per level of ``split`` in lockstep grouped IRLS passes
    (see module docstring). Returns ``{level: GlmModel}``."""
    # parse_vcov caps clustering at 3 variables (CGM subsets grow as 2^k)
    vcov_type, cluster_vars = parse_vcov(vcov, cluster)

    weight_col = parse_weights(weights)
    fam = get_family(family)
    if fam.quasi:
        raise NotImplementedError(
            "dbglm_split supports binomial/poisson/gaussian (no quasi)"
        )
    parsed = parse_formula(fml)
    if parsed.fe:
        raise NotImplementedError(
            "dbglm_split does not absorb fixed effects (the concentrated "
            "profile cannot share a lockstep frame); fit per level with "
            "dbglm"
        )
    if spark is None and isinstance(data, DataFrame):
        spark = data.sparkSession
    source = resolve_source(spark=spark, data=data, table=table, path=path)
    sess = source.df.sparkSession

    design = build_design(source.df, parsed, expand="all", fe_vars=None)
    extra = [split] + (cluster_vars or []) + ([offset] if offset else [])
    base = build_base_frame(
        source, parsed, design, drop_missings,
        extra_cols=extra, want_sql=False, weight_col=weight_col,
    )
    icpt = parsed.intercept
    x_names = list(base.x_cols)
    p_all = (1 if icpt else 0) + len(x_names)
    names_all = (["(Intercept)"] if icpt else []) + [
        standardize_coef_names(n) for n in x_names
    ]
    frame_df = base.df.withColumn(
        "__y_raw", F.col(base.y_col).cast("double")
    ).cache()

    try:
        return _fit_lockstep(
            frame_df, sess, fam, parsed, split, x_names, names_all, icpt,
            offset, weight_col, vcov_type, cluster_vars, max_iter, tol,
            split_nmax, verbose, p_all, design, hac_lag,
        )
    finally:
        frame_df.unpersist()


def _fit_lockstep(
    frame_df, sess, fam, parsed, split, x_names, names_all, icpt, offset,
    weight_col, vcov_type, cluster_vars, max_iter, tol, split_nmax, verbose,
    p_all, design, hac_lag=None,
):
    # ---- first pass at β = 0 for every level (no join needed) ------------
    zero = frame_df
    for i in range(p_all):
        zero = zero.withColumn(f"__b{i}", F.lit(0.0))
    first_rows, _p = _grouped_pass(
        zero, fam, split, x_names, icpt, offset, weight_col, first=True
    )
    if len(first_rows) > split_nmax:
        raise ValueError(
            f"split variable {split!r} has more than {split_nmax:,} levels"
        )

    states = {}
    for lvl, row in first_rows.items():
        _validate_level(fam, parsed, weight_col, lvl, row)
        a0, b0, ll0, _n = _decode_pass(row, p_all)
        collin = detect_collinearity(a0, b0, names_all)
        keep = list(collin.keep_idx)
        sol = solve_with_fallback(collin.xtx, collin.xty)
        states[lvl] = dict(
            keep_idx=keep,
            names=list(collin.keep_names),
            collin_drop=list(collin.drop_names),
            cand=sol.betahat,            # candidate β for the NEXT pass
            accepted=np.zeros(len(keep)),
            prev=np.zeros(len(keep)),
            ll_prev=ll0,
            halvings=0,
            converged=False,
            gave_up=False,
            n_iter=1,
            final_row=row,
            final_a=collin.xtx,
            first=row,
        )

    # ---- lockstep Newton passes ------------------------------------------
    it = 1
    while it < max_iter:
        active = {l: s for l, s in states.items() if not s["converged"] and not s["gave_up"]}
        if not active:
            break
        bt = _beta_frame(
            sess, frame_df.schema[split].dataType, active, p_all
        )
        scan = frame_df
        # prune frozen levels from the scan when possible (None-keyed
        # levels can't ride isin; keep scanning everything in that case)
        frozen = [l for l in states if l not in active]
        if frozen and None not in states:
            scan = scan.where(F.col(split).isin(list(active.keys())))
        j = scan.join(
            F.broadcast(bt), on=F.col(split).eqNullSafe(F.col("__lvl"))
        ).drop("__lvl")
        rows, _ = _grouped_pass(
            j, fam, split, x_names, icpt, offset, weight_col, first=False
        )
        it += 1
        for lvl, st in active.items():
            row = rows.get(lvl)
            if row is None:
                st["gave_up"] = True
                continue
            ki = np.asarray(st["keep_idx"], dtype=int)
            a_f, b_f, ll_i, _n = _decode_pass(row, p_all)
            a_i, b_i = a_f[np.ix_(ki, ki)], b_f[ki]
            st["n_iter"] += 1
            if not math.isfinite(ll_i) or ll_i < st["ll_prev"] - 1e-10 * (
                abs(st["ll_prev"]) + 1.0
            ):
                st["halvings"] += 1
                if st["halvings"] > 12:
                    warnings.warn(
                        f"[dbglm_split] level {lvl!r}: step-halving failed; "
                        "stopping at the last accepted coefficients"
                    )
                    st["gave_up"] = True
                    st["cand"] = st["accepted"]
                    continue
                st["cand"] = 0.5 * (st["cand"] + st["prev"])
                continue
            st["halvings"] = 0
            st["final_row"], st["final_a"] = row, a_i
            st["accepted"] = st["cand"]
            if verbose:
                print(f"[dbglm_split] {lvl!r} iter {st['n_iter']}: ll = {ll_i:.10g}")
            if abs(ll_i - st["ll_prev"]) <= tol * (abs(ll_i) + 0.1):
                st["ll_prev"] = ll_i
                st["converged"] = True
                continue
            sol = solve_with_fallback(a_i, b_i)
            st["prev"], st["cand"] = st["cand"], sol.betahat
            st["ll_prev"] = ll_i
    for lvl, st in states.items():
        if not st["converged"] and not st["gave_up"]:
            st["cand"] = st["accepted"]
            warnings.warn(
                f"[dbglm_split] level {lvl!r}: IRLS did not converge in "
                f"{max_iter} iterations; estimates are the last accepted step"
            )
        st["beta"] = st["accepted"]

    # ---- sandwiches: one more grouped pass at the FINAL β ----------------
    meats = {}
    n_clusters = {}
    if vcov_type in ("hc1", "cluster", "dk"):
        meats, n_clusters = _grouped_glm_meat(
            frame_df, sess, fam, split, states, x_names, icpt, offset,
            weight_col, vcov_type, cluster_vars, p_all, hac_lag,
        )

    out = GlmSplit()
    out.split_var = split
    for lvl, st in states.items():
        out[lvl] = _finish_level(
            lvl, st, fam, parsed, icpt, offset, weight_col, vcov_type,
            cluster_vars, meats.get(lvl), n_clusters.get(lvl), split, design,
        )
    return out


def _validate_level(fam, parsed, weight_col, lvl, row):
    tag = f" in split level {lvl!r}"
    if weight_col is not None:
        # Spark MIN sorts NaN above every real, so a NaN weight slips past a
        # wt_min probe and poisons every IRLS sum — check the (NaN-absorbing)
        # Σw too, matching api._check_weights_valid / split.py
        if not (float(row["wt_min"]) > 0.0) or not math.isfinite(
            float(row["sum_wt"])
        ):
            raise ValueError(
                f"weights column contains non-positive or NaN values{tag}; "
                "weights must be strictly positive"
            )
    if fam.name == "binomial":
        if weight_col is None and float(row.get("y_bad") or 0.0) > 0:
            raise ValueError(
                f"binomial needs a 0/1 outcome; {parsed.yvar} has other "
                f"values{tag}"
            )
    if fam.name == "poisson" and float(row["y_min"]) < 0:
        raise ValueError(f"poisson needs a non-negative outcome{tag}")


def _grouped_glm_meat(
    frame_df, sess, fam, split, states, x_names, icpt, offset, weight_col,
    vcov_type, cluster_vars, p_all, hac_lag=None,
):
    bt = _beta_frame(
        sess, frame_df.schema[split].dataType,
        {l: dict(s, cand=s["beta"]) for l, s in states.items()},
        p_all,
    )
    j = frame_df.join(
        F.broadcast(bt), on=F.col(split).eqNullSafe(F.col("__lvl"))
    ).drop("__lvl")
    y = _d(Var("__y_raw"))
    eta = _col_eta(x_names, icpt, offset)
    mu = fam.mu(eta)
    s = y - mu
    if weight_col is not None:
        s = _d(Var(weight_col)) * s
    cols = ([Lit(1.0)] if icpt else []) + [Var(n) for n in x_names]
    p = len(cols)
    keep_sets = {l: np.asarray(st["keep_idx"], dtype=int) for l, st in states.items()}

    if vcov_type == "hc1":
        proj = j.select(
            F.col(split).alias("__sp"),
            to_spark(_d(s)).alias("__s"),
            *[F.col(n) for n in x_names],
        )
        sv = Var("__s")
        aggs = []
        for i in range(p):
            for k in range(i, p):
                aggs.append(
                    agg_to_spark(asum(sv * sv * _d(cols[i]) * _d(cols[k]))).alias(
                        f"m_{i}_{k}"
                    )
                )
        rows = proj.groupBy("__sp").agg(*aggs).collect()
        meats = {}
        for r in rows:
            lvl = r["__sp"]
            M = np.zeros((p, p))
            for i in range(p):
                for k in range(i, p):
                    M[i, k] = M[k, i] = float(r[f"m_{i}_{k}"] or 0.0)
            ki = keep_sets[lvl]
            meats[lvl] = M[np.ix_(ki, ki)]
        return meats, {}

    # ONE grouped pass over the FINEST key (all cluster variables): scores
    # are additive, so every CGM subset component re-aggregates the same
    # collected rows driver-side — mirroring split.py's _split_meats
    proj = j.select(
        F.col(split).alias("__sp"),
        *[F.col(c) for c in cluster_vars],
        to_spark(_d(s)).alias("__s"),
        *[F.col(n) for n in x_names],
    )
    sv = Var("__s")
    aggs = [
        agg_to_spark(asum(sv * _d(c))).alias(f"s_{i}") for i, c in enumerate(cols)
    ]
    scores_df = proj.groupBy("__sp", *cluster_vars).agg(*aggs)
    cap = 2_000_000
    rows = scores_df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"split x cluster score table exceeds {cap:,} rows; use a "
            "coarser split or cluster variable (or fit levels separately)"
        )
    per_level: dict = {}
    for r in rows:
        kt = tuple(r[c] for c in cluster_vars)
        vec = np.array([float(r[f"s_{i}"] or 0.0) for i in range(p)])
        per_level.setdefault(r["__sp"], []).append((kt, vec))
    meats, ncl = {}, {}
    if vcov_type == "dk":
        from .plans.meat import nw_combine

        for lvl, pairs in per_level.items():
            pairs.sort(key=lambda e: (e[0][0] is None, e[0][0]))
            S = np.vstack([vec for _, vec in pairs])
            meats[lvl], ncl[lvl], _ = nw_combine(S, hac_lag)
    elif len(cluster_vars) == 1:
        for lvl, pairs in per_level.items():
            M = np.zeros((p, p))
            for _, vec in pairs:
                M += np.outer(vec, vec)
            meats[lvl], ncl[lvl] = M, len(pairs)
    else:
        # CGM inclusion-exclusion per level (api._cluster_meat_any
        # convention: effective meat rescaled to G = min single-variable G)
        from itertools import combinations

        k = len(cluster_vars)
        for lvl, pairs in per_level.items():
            comps, g_single = [], {}
            for r_sz in range(1, k + 1):
                for S_idx in combinations(range(k), r_sz):
                    groups: dict = {}
                    for kt, vec in pairs:
                        sub = tuple(kt[i] for i in S_idx)
                        acc = groups.get(sub)
                        groups[sub] = vec if acc is None else acc + vec
                    g_S = len(groups)
                    if g_S < 2:
                        raise ValueError(
                            "multiway clustering needs >= 2 clusters per "
                            "dimension within each split level; "
                            f"{'x'.join(cluster_vars[i] for i in S_idx)} "
                            f"has {g_S} in level {lvl!r}"
                        )
                    M = np.zeros((p, p))
                    for sv2 in groups.values():
                        M += np.outer(sv2, sv2)
                    comps.append((r_sz, M, g_S))
                    if r_sz == 1:
                        g_single[S_idx[0]] = g_S
            g_min = min(g_single.values())
            scale_ref = g_min / (g_min - 1)
            M_eff = np.zeros((p, p))
            for r_sz, M, g_S in comps:
                sign = 1.0 if r_sz % 2 == 1 else -1.0
                M_eff += sign * ((g_S / (g_S - 1)) / scale_ref) * M
            meats[lvl], ncl[lvl] = M_eff, g_min
    for lvl in list(meats):
        ki = keep_sets[lvl]
        meats[lvl] = meats[lvl][np.ix_(ki, ki)]
    return meats, ncl


def _finish_level(
    lvl, st, fam, parsed, icpt, offset, weight_col, vcov_type, cluster_vars,
    meat, n_cl, split, design,
):
    row, first = st["final_row"], st["first"]
    p = len(st["names"])
    n_total = float(row["n_total"])
    ll_final = float(row["ll"])
    ll_sat = float(first["ll_sat"])
    sum_wt = float(first["sum_wt"])
    sum_y = float(first["sum_y"])
    sum_y_sq = float(first["sum_y_sq"])
    deviance = 2.0 * (ll_sat - ll_final)
    ybar = sum_y / sum_wt if sum_wt > 0 else float("nan")
    if offset is not None:
        null_dev = float("nan")
    elif fam.name == "binomial":
        null_ll = (
            sum_y * math.log(ybar) + (sum_wt - sum_y) * math.log(1 - ybar)
            if icpt and 0.0 < ybar < 1.0
            else (0.0 if icpt else -sum_wt * math.log(2.0))
        )
        null_dev = 2.0 * (ll_sat - null_ll)
    elif fam.name == "poisson":
        null_ll = (
            (sum_y * math.log(ybar) - sum_wt * ybar)
            if icpt and ybar > 0
            else (0.0 if icpt else -sum_wt)
        )
        null_dev = 2.0 * (ll_sat - null_ll)
    else:
        null_dev = sum_y_sq - (sum_y**2 / sum_wt if icpt else 0.0)
    if fam.name == "gaussian":
        deviance = -2.0 * ll_final

    df_res = max(n_total - p, 1.0)
    info_inv = solve_with_fallback(st["final_a"], np.zeros(p)).xtx_inv
    pearson = float(row["pearson"])
    dispersion = pearson / df_res if fam.name == "gaussian" else 1.0
    if vcov_type == "iid":
        V = dispersion * info_inv
    else:
        V = compute_vcov(
            vcov_type, info_inv, deviance, df_res, n_total, p, meat, n_cl
        )
    use_t = fam.name == "gaussian"
    ct = gen_coeftable(st["beta"], V, df_res, st["names"], use_z=not use_t)
    return GlmModel(
        coeftable=ct,
        vcov_=V,
        coef_names=st["names"],
        family=fam.label,
        link=fam.link,
        yvar=parsed.yvar,
        vcov_type=vcov_type,
        cluster_var="+".join(cluster_vars) if cluster_vars else None,
        nobs=int(n_total),
        df_residual=df_res,
        loglik=ll_final,
        deviance=deviance,
        null_deviance=null_dev,
        dispersion=dispersion,
        pearson_chi2=pearson,
        n_iter=st["n_iter"],
        converged=bool(st["converged"]),
        collin_vars=st["collin_drop"],
        n_clusters=n_cl,
        design_info=design,
        parsed=parsed,
        offset=offset,
        weights_col=weight_col,
        inference="t" if use_t else "z",
        _betahat=np.asarray(st["beta"], dtype=float),
    )
