"""Split-sample estimation — fixest's ``split=``: one regression per level
of a splitting variable, ALL levels estimated from ONE grouped moment scan.

The naive approach (loop ``dbreg`` over ``df.where(split == level)``) scans
the data once per level — G full passes. Here the per-level sufficient
statistics come from a single ``groupBy(split)`` aggregation (map-side
combined, the shuffle carries G moment rows of O(p²) doubles), the driver
solves G tiny normal-equation systems, and robust/clustered sandwiches add
at most ONE more grouped pass (the per-level β̂ vector rides a broadcast
(level → β) lookup into the residual expression). Total full-data passes:
1 (iid) or 2 (HC1/cluster) — independent of G.

Supported: strategies "moments" (no FE), "demean" (1-2 FEs absorbed within
each split level — group means over (split × fe); the 2-FE case is the
same balanced-panel double-demean identity as ``dbreg(strategy='demean')``
and shares its unbalanced-panel caveat), "compress" (split joins the cell
key; per-level WLS on the collected cells); vcov iid / hc1 / cluster
(1-3 way, CGM inclusion-exclusion from ONE finest-key score pass) /
Driscoll-Kraay (``"dk ~ t"``, per-level NW weighting of the same score
rows); observation ``weights=``. Auto picks demean when FEs are present,
else moments.

No reference counterpart (the reference has no split); semantics follow
fixest: each level is its own regression, as if the data were filtered.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .design import build_design, standardize_coef_names
from .formula import parse_formula, parse_vcov, parse_weights
from .model import DbregModel
from .plans.common import (
    assemble_normal_eqs,
    moment_spec,
    resolve_source,
)
from .plans.exprs import Var, agg_to_sql, aggs_to_spark_fast
from .plans.frames import _wmean_col, build_base_frame
from .solve import (
    compute_vcov,
    detect_collinearity,
    gen_coeftable,
    rss_from_moments,
    solve_with_fallback,
    tss_from_moments,
)

SPLIT_NMAX = 10_000  # max split levels collected to the driver


def beta_schema(lvl_type, n_beta: int):
    """Explicit StructType for a broadcast (level, __b0..__b{n-1}) lookup.

    Name-only schemas lean on type inference for ``__lvl``, which fails when
    the split column is entirely NULL in the driver rows (one all-None
    level) — take the level's type from the frame's schema instead."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    return StructType(
        [StructField("__lvl", lvl_type, True)]
        + [StructField(f"__b{i}", DoubleType(), False) for i in range(n_beta)]
    )


class DbregSplit(dict):
    """``{split_level: DbregModel}`` with a stacked ``tidy()`` view."""

    split_var: str = ""

    def tidy(self) -> pd.DataFrame:
        frames = []
        for lvl, m in self.items():
            t = m.tidy().copy()
            t.insert(0, self.split_var or "split", lvl)
            frames.append(t)
        return pd.concat(frames, ignore_index=True)

    def coef_table(self) -> pd.DataFrame:
        """(level × coefficient) estimate matrix."""
        return pd.DataFrame(
            {lvl: m.coef() for lvl, m in self.items()}
        ).T.sort_index()


def dbreg_split(
    fml: str,
    data=None,
    *,
    split: str,
    spark: SparkSession | None = None,
    table: str | None = None,
    path: str | None = None,
    vcov="iid",
    cluster=None,
    weights: str | None = None,
    hac_lag: int | None = None,
    strategy: str = "auto",
    drop_missings: bool = True,
    verbose: bool = False,
    split_nmax: int = SPLIT_NMAX,
    include_full: bool = False,
    conley_cutoff: float | None = None,
    conley_kernel: str = "uniform",
    conley_distance: str = "haversine",
) -> DbregSplit:
    """Fit ``fml`` separately for every level of ``split`` — see module
    docstring for the pass-count contract. NULL split values form their own
    level (matching groupBy semantics); levels beyond ``split_nmax`` raise.

    ``include_full=True`` (fixest's ``fsplit``) adds the full-sample fit
    under the key ``"(full)"`` — one extra :func:`dbreg` call with the same
    strategy/vcov/weights (its own pass; per-level demeaning cannot share a
    frame with full-sample demeaning).
    """
    # parse_vcov caps clustering at 3 variables (CGM subsets grow as 2^k)
    vcov_type, cluster_vars = parse_vcov(
        vcov, cluster, valid=("iid", "hc1", "hc2", "hc3")
    )
    conley_opts = None
    if vcov_type in ("hc2", "hc3"):
        # batched leverage: each level's kept inverse-Gram rides a second
        # broadcast (level -> Minv upper triangle) table next to the beta
        # table; one grouped pass returns every level's corrected meat
        if strategy == "compress":
            raise NotImplementedError(
                f"vcov={vcov_type!r} needs row-level leverage; use "
                "strategy moments/demean"
            )
    if vcov_type == "conley":
        # batched: every level's spatial meat rides ONE exploded cell join
        # (the level joins the cell key — see plans/conley.py:
        # conley_pair_agg_batched); per-level betas enter as a broadcast
        # (level -> beta) table exactly like _split_meats
        if conley_cutoff is None:
            raise ValueError(
                "vcov='conley ~ lat + lon' needs conley_cutoff= (km for "
                "distance='haversine', coordinate units for 'euclidean')"
            )
        if strategy == "compress":
            raise NotImplementedError(
                "conley vcov needs row-level scores; use strategy "
                "moments/demean (cells drop the coordinates)"
            )
        conley_opts = (conley_cutoff, conley_kernel, conley_distance)
    weight_col = parse_weights(weights)
    parsed = parse_formula(fml)
    if parsed.yvar is None:
        raise ValueError("Formula needs an outcome variable.")
    if spark is None and isinstance(data, DataFrame):
        spark = data.sparkSession
    source = resolve_source(spark=spark, data=data, table=table, path=path)
    if split in parsed.fe or split == parsed.yvar:
        raise ValueError(
            f"split variable {split!r} cannot also be the outcome or a "
            "fixed effect"
        )

    valid = ("auto", "moments", "demean", "compress")
    if strategy not in valid:
        raise ValueError(
            f"split= supports strategy in {valid[1:]} (or 'auto'); "
            f"got {strategy!r}"
        )
    if strategy == "auto":
        strategy = "demean" if parsed.fe else "moments"
    if strategy == "moments" and parsed.fe:
        raise ValueError("moments strategy cannot absorb fixed effects")
    if strategy == "demean" and not parsed.fe:
        raise ValueError("demean strategy requires at least one fixed effect")
    if strategy == "demean" and len(parsed.fe) > 2:
        raise NotImplementedError(
            "split= absorbs at most 2 FEs (per-level double demeaning); "
            "for k>2 filter per level and use dbreg(strategy='demean_iter')"
        )
    if vcov_type in ("hc2", "hc3") and len(parsed.fe) > 1:
        raise NotImplementedError(
            f"vcov={vcov_type!r} absorbs at most ONE fixed effect (the "
            "k-FE LSDV leverage has no closed per-row decomposition)"
        )

    if vcov_type == "cr3":
        if parsed.fe or strategy not in ("auto", "moments"):
            raise NotImplementedError(
                "split= with vcov='cr3 ~ g' supports strategy='moments' "
                "(no absorbed FEs); fit levels separately with dbreg for "
                "the nested-FE CV3"
            )
        strategy = "moments"
    if strategy == "compress" and vcov_type == "dk":
        raise NotImplementedError(
            "split= with strategy='compress' does not support Driscoll-"
            "Kraay; use moments/demean"
        )
    if strategy == "compress":
        out = _split_compress(
            source, parsed, split, vcov_type, cluster_vars, weight_col,
            drop_missings, split_nmax, verbose,
        )
        out.split_var = split
        if include_full:
            out["(full)"] = _full_fit(
                source, parsed, strategy, vcov, cluster, weights,
                drop_missings,
            )
        return out

    design = build_design(source.df, parsed, expand="all", fe_vars=parsed.fe)
    extra = [split] + (cluster_vars or [])
    base = build_base_frame(
        source,
        parsed,
        design,
        drop_missings,
        extra_cols=extra,
        want_sql=False,
        weight_col=weight_col,
    )

    fe = parsed.fe
    intercept = strategy == "moments"
    frame_df = base.df
    fe_counts = None
    cached = None
    if strategy == "demean":
        frame_df, fe_counts, cached = _demean_within_split(
            base, split, fe, weight_col
        )

    try:
        models = _grouped_fit(
            frame_df, base, split, intercept, fe, fe_counts, vcov_type,
            cluster_vars, weight_col, split_nmax, parsed, design, strategy,
            hac_lag=hac_lag, conley_opts=conley_opts,
        )
    finally:
        if cached is not None:
            cached.unpersist()
    out = DbregSplit(models)
    out.split_var = split
    if include_full:
        out["(full)"] = _full_fit(
            source, parsed, strategy, vcov, cluster, weights, drop_missings,
            hac_lag=hac_lag, conley_opts=conley_opts,
        )
    return out


def _full_fit(
    source, parsed, strategy, vcov, cluster, weights, drop_missings,
    hac_lag=None, conley_opts=None,
):
    from .api import dbreg

    fml = f"{parsed.yvar} ~ " + " + ".join(
        ":".join(t.vars) for t in parsed.terms
    )
    if not parsed.intercept:
        fml += " + 0"
    if parsed.fe:
        fml += " | " + " + ".join(parsed.fe)
    ck = {}
    if conley_opts is not None:
        ck = dict(
            conley_cutoff=conley_opts[0],
            conley_kernel=conley_opts[1],
            conley_distance=conley_opts[2],
        )
    return dbreg(
        fml, data=source.df, vcov=vcov, cluster=cluster, weights=weights,
        hac_lag=hac_lag, strategy=strategy, drop_missings=drop_missings,
        **ck,
    )


def _demean_within_split(base, split, fe, weight_col):
    """Demean y/X within (split × fe) cells: per-level FWL with the same
    broadcast-means shape as the global demean path. Returns (demeaned_df,
    per-split FE-level counts, the cached means table to release)."""
    vals = [base.y_col] + base.x_cols

    def mean_agg(c, alias):
        if weight_col is not None:
            return _wmean_col(c, weight_col).alias(alias)
        return F.avg(c).alias(alias)

    # key_cols = fe + split + cluster (+ weight): cluster keys must survive
    # the demeaning projection for the grouped score pass
    keep = list(base.key_cols)
    df = base.df
    if len(fe) == 1:
        fe1 = fe[0]
        mg = df.groupBy(
            F.col(split).alias("__s1"), F.col(fe1).alias("__f1")
        ).agg(*[mean_agg(c, f"{c}__m1") for c in vals]).persist()
        counts = {
            r["__s1"]: {"n_fe1": int(r["cnt"]), "n_fe2": 1}
            for r in mg.groupBy("__s1").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        # null-safe on the split side: a NULL level keeps its rows
        dm = df.join(
            F.broadcast(mg),
            on=F.col(split).eqNullSafe(F.col("__s1"))
            & (F.col(fe1) == F.col("__f1")),
        ).select(
            *keep,
            *[(F.col(c) - F.col(f"{c}__m1")).alias(c) for c in vals],
        )
        return dm, counts, mg

    fe1, fe2 = fe
    m1 = df.groupBy(
        F.col(split).alias("__s1"), F.col(fe1).alias("__f1")
    ).agg(*[mean_agg(c, f"{c}__m1") for c in vals]).persist()
    m2 = df.groupBy(
        F.col(split).alias("__s2"), F.col(fe2).alias("__f2")
    ).agg(*[mean_agg(c, f"{c}__m2") for c in vals]).persist()
    mo = df.groupBy(F.col(split).alias("__s3")).agg(
        *[mean_agg(c, f"{c}__mo") for c in vals]
    ).persist()
    c1 = {
        r["__s1"]: int(r["cnt"])
        for r in m1.groupBy("__s1").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    c2 = {
        r["__s2"]: int(r["cnt"])
        for r in m2.groupBy("__s2").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    counts = {
        k: {"n_fe1": c1.get(k, 1), "n_fe2": c2.get(k, 1)} for k in c1
    }
    dm = (
        df.join(
            F.broadcast(m1),
            on=F.col(split).eqNullSafe(F.col("__s1"))
            & (F.col(fe1) == F.col("__f1")),
        )
        .join(
            F.broadcast(m2),
            on=F.col(split).eqNullSafe(F.col("__s2"))
            & (F.col(fe2) == F.col("__f2")),
        )
        .join(F.broadcast(mo), on=F.col(split).eqNullSafe(F.col("__s3")))
        .select(
            *keep,
            *[
                (
                    F.col(c)
                    - F.col(f"{c}__m1")
                    - F.col(f"{c}__m2")
                    + F.col(f"{c}__mo")
                ).alias(c)
                for c in vals
            ],
        )
    )

    class _Multi:
        def __init__(self, frames):
            self.frames = frames

        def unpersist(self):
            for f in self.frames:
                f.unpersist()

    return dm, counts, _Multi([m1, m2, mo])


def _grouped_fit(
    frame_df, base, split, intercept, fe, fe_counts, vcov_type, cluster_vars,
    weight_col, split_nmax, parsed, design, strategy, hac_lag=None,
    conley_opts=None,
):
    x_cols = base.x_cols
    spec = moment_spec(
        Var(base.y_col),
        [Var(n) for n in x_cols],
        intercept=intercept,
        weight=Var(weight_col) if weight_col else None,
    )
    rows = (
        frame_df.groupBy(split)
        .agg(*aggs_to_spark_fast(spec))
        .limit(split_nmax + 1)
        .collect()
    )
    if len(rows) > split_nmax:
        raise ValueError(
            f"split variable {split!r} has more than {split_nmax:,} levels; "
            "raise split_nmax or choose a coarser split"
        )

    names_all = ([f"(Intercept)"] if intercept else []) + [
        standardize_coef_names(n) for n in x_cols
    ]
    sols = {}
    for r in rows:
        row = r.asDict()
        lvl = row.pop(split)
        if weight_col is not None:
            w_min, sum_w = row.get("w_min"), row.get("sum_w")
            bad = (sum_w is not None and not np.isfinite(float(sum_w))) or (
                w_min is not None and not (float(w_min) > 0.0)
            )
            if bad:
                raise ValueError(
                    f"weights column '{weight_col}' contains non-positive "
                    f"or NaN values in split level {lvl!r}"
                )
        xtx, xty, n_total, sum_y, sum_y_sq = assemble_normal_eqs(
            row, len(x_cols), intercept=intercept
        )
        collin = detect_collinearity(xtx, xty, names_all)
        sol = solve_with_fallback(collin.xtx, collin.xty)
        rss = rss_from_moments(sum_y_sq, sol.betahat, collin.xtx, collin.xty)
        if intercept:
            tss_n = float(row["sum_w"]) if weight_col else n_total
            tss = tss_from_moments(sum_y_sq, sum_y, tss_n)
        else:
            tss = sum_y_sq
        sols[lvl] = dict(
            row=row, collin=collin, sol=sol, rss=rss, tss=tss,
            n_total=n_total,
        )

    meats = {}
    n_clusters = {}
    if vcov_type in ("hc1", "cluster", "dk") and sols:
        meats, n_clusters = _split_meats(
            frame_df, split, base.y_col, x_cols, intercept, sols, vcov_type,
            cluster_vars, weight_col, hac_lag=hac_lag,
        )
    if vcov_type in ("hc2", "hc3") and sols:
        meats = _split_hck_meats(
            frame_df, split, base.y_col, x_cols, intercept, sols, vcov_type,
            weight_col, fe,
        )
    if vcov_type == "conley" and sols:
        meats = _split_conley_meats(
            frame_df, split, base.y_col, x_cols, intercept, sols,
            cluster_vars, weight_col, conley_opts,
        )
    cr3_V: dict = {}
    if vcov_type == "cr3" and sols:
        cr3_V, n_clusters = _split_cr3(
            frame_df, split, base.y_col, x_cols, intercept, sols,
            cluster_vars[0], weight_col,
        )

    models = DbregSplit()
    for lvl, s in sols.items():
        collin, sol = s["collin"], s["sol"]
        p = len(collin.keep_names)
        n_total = s["n_total"]
        if strategy == "demean":
            cs = (fe_counts or {}).get(lvl, {"n_fe1": 1, "n_fe2": 1})
            df_fe = cs["n_fe1"] + (cs["n_fe2"] - 1 if len(fe) == 2 else 0)
        else:
            cs = {"n_fe1": 1, "n_fe2": 1}
            df_fe = 0
        df_res = max(n_total - p - df_fe, 1)
        nc = n_clusters.get(lvl)
        if vcov_type == "cr3":
            V = cr3_V[lvl]
        else:
            V = compute_vcov(
                vcov_type, sol.xtx_inv, s["rss"], df_res, n_total, p + df_fe,
                meats.get(lvl), nc,
            )
        ct = gen_coeftable(sol.betahat, V, df_res, collin.keep_names)
        models[lvl] = DbregModel(
            coeftable=ct,
            vcov_=V,
            coef_names=collin.keep_names,
            yvar=parsed.yvar,
            xvars=standardize_coef_names(parsed.xvars),
            fe=fe,
            strategy=strategy,
            vcov_type=vcov_type,
            cluster_var="+".join(cluster_vars) if cluster_vars else None,
            nobs=1,
            nobs_orig=int(n_total),
            df_residual=df_res,
            rss=s["rss"],
            tss=s["tss"],
            n_fe1=cs["n_fe1"],
            n_fe2=cs["n_fe2"],
            n_clusters=nc,
            collin_vars=collin.drop_names,
            design_info=design,
            parsed=parsed,
            intercept=intercept,
            weight_col=weight_col,
        )
    return models


def _split_hck_meats(
    frame_df, split, y_col, x_cols, intercept, sols, kind, weight_col, fe
):
    """Every level's HC2/HC3 leverage-corrected meat from ONE grouped
    pass: per-level betas AND per-level kept inverse-Grams ride broadcast
    (level -> values) tables (dropped-column entries are 0, so the full-
    layout quadratic form equals the kept-design leverage); 1-FE demean
    adds the exact w/W_(level,g) hat-matrix term from a tiny
    (level, fe) weight table — the same decomposition as
    plans/meat.py:hck_meat."""
    from pyspark.sql import types as T

    spark = frame_df.sparkSession
    p_x = len(x_cols)
    off = 1 if intercept else 0
    p = off + p_x
    names_all = (["(Intercept)"] if intercept else []) + [
        standardize_coef_names(n) for n in x_cols
    ]
    pos = {}
    beta_rows = []
    minv_rows = []
    for lvl, s in sols.items():
        collin, sol = s["collin"], s["sol"]
        full = np.zeros(p)
        keep = []
        for name, b in zip(collin.keep_names, sol.betahat):
            full[names_all.index(name)] = b
        beta_rows.append((lvl,) + tuple(float(v) for v in full))
        Mfull = np.zeros((p, p))
        ki = np.asarray(collin.keep_idx, dtype=int)
        Mfull[np.ix_(ki, ki)] = sol.xtx_inv
        tri = [
            float(Mfull[a, b_]) for a in range(p) for b_ in range(a, p)
        ]
        minv_rows.append((lvl,) + tuple(tri))
        pos[lvl] = collin
    bt = spark.createDataFrame(
        beta_rows,
        schema=beta_schema(frame_df.schema[split].dataType, p),
    )
    n_tri = p * (p + 1) // 2
    mt_fields = [T.StructField("__lvl", frame_df.schema[split].dataType)] + [
        T.StructField(f"__q{i}", T.DoubleType()) for i in range(n_tri)
    ]
    mt = spark.createDataFrame(minv_rows, schema=T.StructType(mt_fields))
    j = (
        frame_df.join(
            F.broadcast(bt), on=F.col(split).eqNullSafe(F.col("__lvl"))
        )
        .drop("__lvl")
        .join(
            F.broadcast(mt), on=F.col(split).eqNullSafe(F.col("__lvl"))
        )
        .drop("__lvl")
    )
    bcols = [f"__b{i}" for i in range(p)]
    fitted = F.col("__b0") if intercept else F.lit(0.0)
    for i, xc in enumerate(x_cols):
        fitted = fitted + F.col(bcols[off + i]) * F.col(xc).cast("double")
    e = F.col(y_col).cast("double") - fitted
    wcol = (
        F.col(weight_col).cast("double") if weight_col is not None else None
    )
    if wcol is not None:
        e = wcol * e

    score_cols = ([F.lit(1.0)] if intercept else []) + [
        F.col(xc).cast("double") for xc in x_cols
    ]
    h = F.lit(0.0)
    qi = 0
    for a in range(p):
        for b_ in range(a, p):
            mult = F.lit(1.0) if a == b_ else F.lit(2.0)
            h = h + mult * F.col(f"__q{qi}") * score_cols[a] * score_cols[b_]
            qi += 1
    if wcol is not None:
        h = wcol * h
    if fe:
        # exact 1-FE LSDV leverage: + w / W_(level, g)
        fe1 = fe[0]
        wsum = (
            F.sum(F.col(weight_col).cast("double"))
            if weight_col is not None
            else F.count(F.lit(1)).cast("double")
        )
        gt = frame_df.groupBy(
            F.col(split).alias("__s1"), F.col(fe1).alias("__f1")
        ).agg(wsum.alias("__Wg"))
        j = j.join(
            F.broadcast(gt),
            on=F.col(split).eqNullSafe(F.col("__s1"))
            & (F.col(fe1) == F.col("__f1")),
        ).drop("__s1", "__f1")
        h = h + (wcol if wcol is not None else F.lit(1.0)) / F.col("__Wg")

    k = 1 if kind == "hc2" else 2
    denom = F.greatest(F.lit(1.0) - h, F.lit(1e-12))
    psi2 = (e * e) / denom**k
    aggs = []
    for a in range(p):
        for b_ in range(a, p):
            aggs.append(
                F.sum(psi2 * score_cols[a] * score_cols[b_]).alias(
                    f"m_{a}_{b_}"
                )
            )
    rows = j.groupBy(split).agg(*aggs).collect()
    meats = {}
    for r in rows:
        lvl = r[split]
        Mf = np.zeros((p, p))
        for a in range(p):
            for b_ in range(a, p):
                v = r[f"m_{a}_{b_}"]
                Mf[a, b_] = Mf[b_, a] = float(v) if v is not None else 0.0
        ki = np.asarray(pos[lvl].keep_idx, dtype=int)
        meats[lvl] = Mf[np.ix_(ki, ki)]
    return meats


def _split_conley_meats(
    frame_df, split, y_col, x_cols, intercept, sols, cluster_vars,
    weight_col, conley_opts,
):
    """Every level's Conley spatial meat from ONE exploded cell join
    (plans/conley.py:conley_pair_agg_batched, group_col=split): per-level
    betas ride the same broadcast (level -> beta) table as _split_meats,
    the level joins the cell key so no cross-level pair is ever evaluated,
    and the grouped aggregation returns one meat row per level, sliced to
    each level's kept coefficient layout driver-side."""
    from .plans.conley import conley_pair_agg_batched

    cutoff, kernel, distance = conley_opts
    lat_col, lon_col = cluster_vars
    spark = frame_df.sparkSession
    p_x = len(x_cols)
    off = 1 if intercept else 0
    names_all = (["(Intercept)"] if intercept else []) + [
        standardize_coef_names(n) for n in x_cols
    ]
    pos = {}
    beta_rows = []
    for lvl, s in sols.items():
        collin, sol = s["collin"], s["sol"]
        full = np.zeros(off + p_x)
        for name, b in zip(collin.keep_names, sol.betahat):
            full[names_all.index(name)] = b
        beta_rows.append((lvl,) + tuple(float(v) for v in full))
        pos[lvl] = collin
    bcols = [f"__b{i}" for i in range(off + p_x)]
    bt = spark.createDataFrame(
        beta_rows,
        schema=beta_schema(frame_df.schema[split].dataType, off + p_x),
    )
    j = frame_df.join(
        F.broadcast(bt), on=F.col(split).eqNullSafe(F.col("__lvl"))
    ).drop("__lvl")
    fitted = F.col("__b0") if intercept else F.lit(0.0)
    for i, xc in enumerate(x_cols):
        fitted = fitted + F.col(bcols[off + i]) * F.col(xc).cast("double")
    e = F.col(y_col).cast("double") - fitted
    if weight_col is not None:
        e = F.col(weight_col).cast("double") * e  # WLS score s = w·u·x
    proj = j.select(
        F.col(split),
        e.alias("__e"),
        *[F.col(c) for c in x_cols],
        F.col(lat_col).cast("double").alias("__lat"),
        F.col(lon_col).cast("double").alias("__lon"),
    )
    agg_df, ps, cached = conley_pair_agg_batched(
        proj, [("__e", list(x_cols), intercept)], cutoff, kernel, distance,
        cache=True, group_col=split,
    )
    rows = agg_df.collect()
    if cached is not None:
        cached.unpersist()
    p = ps[0]
    meats = {}
    for r in rows:
        lvl = r[split]
        Mfull = np.zeros((p, p))
        for a in range(p):
            for b in range(a, p):
                v = r[f"m0_{a}_{b}"]
                Mfull[a, b] = Mfull[b, a] = float(v) if v is not None else 0.0
        keep = np.asarray(pos[lvl].keep_idx, dtype=int)
        meats[lvl] = Mfull[np.ix_(keep, keep)]
    return meats


def _split_cr3(
    frame_df, split, y_col, x_cols, intercept, sols, cluster, weight_col
):
    """Per-level CV3 cluster jackknife from ONE grouped pass keyed
    (level, cluster): each level's leave-one-cluster-out estimates are
    Gram-block subtractions in that level's full-sample kept layout —
    the split twin of boot.cr3_vcov."""
    import pyspark.sql.functions as F

    cols = ([F.lit(1.0)] if intercept else []) + [
        F.col(c).cast("double") for c in x_cols
    ]
    p_all = len(cols)
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    y = F.col(y_col).cast("double")
    aggs = [F.sum(w).alias("n_g")]
    for i in range(p_all):
        for k2 in range(i, p_all):
            aggs.append(F.sum(w * cols[i] * cols[k2]).alias(f"a_{i}_{k2}"))
    for i in range(p_all):
        aggs.append(F.sum(w * cols[i] * y).alias(f"b_{i}"))
    cap = 2_000_000
    rows = (
        frame_df.groupBy(split, cluster).agg(*aggs).limit(cap + 1).collect()
    )
    if len(rows) > cap:
        raise ValueError(
            f"split x cluster Gram table exceeds {cap:,} rows; use a "
            "coarser split or cluster variable (or fit levels separately)"
        )
    per_level: dict = {}
    for r in rows:
        A_g = np.zeros((p_all, p_all))
        b_g = np.zeros(p_all)
        for i in range(p_all):
            b_g[i] = float(r[f"b_{i}"] or 0.0)
            for k2 in range(i, p_all):
                v = float(r[f"a_{i}_{k2}"] or 0.0)
                A_g[i, k2] = A_g[k2, i] = v
        per_level.setdefault(r[split], []).append((r[cluster], A_g, b_g))
    Vs: dict = {}
    ncl: dict = {}
    for lvl, blocks in per_level.items():
        if len(blocks) < 2:
            raise ValueError(
                f"cr3 needs >= 2 clusters within each split level; "
                f"{cluster!r} has {len(blocks)} in level {lvl!r}"
            )
        collin, sol = sols[lvl]["collin"], sols[lvl]["sol"]
        keep = np.asarray(collin.keep_idx, dtype=int)
        A = np.sum([bl[1] for bl in blocks], axis=0)[np.ix_(keep, keep)]
        b = np.sum([bl[2] for bl in blocks], axis=0)[keep]
        G = len(blocks)
        devs = np.zeros((G, len(keep)))
        for gi, (gkey, A_g, b_g) in enumerate(blocks):
            try:
                devs[gi] = (
                    np.linalg.solve(
                        A - A_g[np.ix_(keep, keep)], b - b_g[keep]
                    )
                    - sol.betahat
                )
            except np.linalg.LinAlgError:
                raise ValueError(
                    f"cr3: leaving out cluster {gkey!r} in level {lvl!r} "
                    "makes the design singular; use '~cluster' CR1"
                ) from None
        Vs[lvl] = ((G - 1) / G) * (devs.T @ devs)
        ncl[lvl] = G
    return Vs, ncl

def combine_level_scores(per_level, key_cols, vcov_type, hac_lag, p):
    """Driver-side reduction of per-(level, key-tuple) score vectors into
    per-level meats — shared by the linear, GLM and FE-Poisson split paths.

    ``per_level``: {level: [(key_tuple, score_vec p,)]} from ONE grouped
    pass over the finest key. DK sorts by the (single) period key and
    Newey-West-combines; 1-way sums outer products; multiway runs the CGM
    inclusion-exclusion with each subset's g_S/(g_S-1) folded into an
    effective meat (compute_vcov then applies the G=min single-variable G
    convention, the n/(n-p) factors cancelling within a level). Degenerate
    levels (one period / one cluster / g_S<2) raise a clear per-level error
    instead of a downstream ZeroDivisionError (ADVICE r06). Returns
    (meats, n_clusters) keyed by level.
    """
    meats: dict = {}
    n_clusters: dict = {}
    if vcov_type == "dk":
        from .plans.meat import nw_combine

        for lvl, pairs in per_level.items():
            if len(pairs) < 2:
                raise ValueError(
                    f"Driscoll-Kraay needs >= 2 time periods within each "
                    f"split level; {key_cols[0]!r} has {len(pairs)} in "
                    f"level {lvl!r}"
                )
            pairs.sort(key=lambda e: (e[0][0] is None, e[0][0]))
            S = np.vstack([sv for _, sv in pairs])
            meats[lvl], n_clusters[lvl], _ = nw_combine(S, hac_lag)
        return meats, n_clusters
    if len(key_cols) == 1:
        for lvl, pairs in per_level.items():
            if len(pairs) < 2:
                raise ValueError(
                    f"clustered vcov needs >= 2 clusters within each split "
                    f"level; {key_cols[0]!r} has {len(pairs)} in level "
                    f"{lvl!r}"
                )
            M = np.zeros((p, p))
            for _, sv in pairs:
                M += np.outer(sv, sv)
            meats[lvl] = M
            n_clusters[lvl] = len(pairs)
        return meats, n_clusters
    from itertools import combinations

    k = len(key_cols)
    for lvl, pairs in per_level.items():
        comps = []
        g_single = {}
        for r_sz in range(1, k + 1):
            for S_idx in combinations(range(k), r_sz):
                groups: dict = {}
                for kt, sv in pairs:
                    sub = tuple(kt[i] for i in S_idx)
                    acc = groups.get(sub)
                    groups[sub] = sv if acc is None else acc + sv
                g_S = len(groups)
                if g_S < 2:
                    raise ValueError(
                        f"multiway clustering needs >= 2 clusters per "
                        f"dimension within each split level; "
                        f"{'x'.join(key_cols[i] for i in S_idx)} has "
                        f"{g_S} in level {lvl!r}"
                    )
                M = np.zeros((p, p))
                for svv in groups.values():
                    M += np.outer(svv, svv)
                comps.append((r_sz, M, g_S))
                if r_sz == 1:
                    g_single[S_idx[0]] = g_S
        g_min = min(g_single.values())
        scale_ref = g_min / (g_min - 1)
        M_eff = np.zeros((p, p))
        for r_sz, M, g_S in comps:
            sign = 1.0 if r_sz % 2 == 1 else -1.0
            M_eff += sign * ((g_S / (g_S - 1)) / scale_ref) * M
        meats[lvl] = M_eff
        n_clusters[lvl] = g_min
    return meats, n_clusters


def _split_meats(
    frame_df, split, y_col, x_cols, intercept, sols, vcov_type, cluster_vars,
    weight_col, hac_lag=None,
):
    """One grouped pass for every level's HC1 meat (or per-(level, key)
    scores for cluster/CGM/DK): the per-level β̂ rides a broadcast (level → β) table into the
    residual expression. Dropped-by-collinearity columns carry β = 0 —
    fitted values are unchanged (the dropped column is a linear combination
    of kept ones), so the residual is exact; the driver then slices each
    level's meat to its kept coefficient layout."""
    spark = frame_df.sparkSession
    p_x = len(x_cols)
    pos = {}
    off = 1 if intercept else 0
    beta_rows = []
    for lvl, s in sols.items():
        collin, sol = s["collin"], s["sol"]
        full = np.zeros(off + p_x)
        names_all = (["(Intercept)"] if intercept else []) + [
            standardize_coef_names(n) for n in x_cols
        ]
        for name, b in zip(collin.keep_names, sol.betahat):
            full[names_all.index(name)] = b
        beta_rows.append((lvl,) + tuple(float(v) for v in full))
        pos[lvl] = collin
    bcols = [f"__b{i}" for i in range(off + p_x)]
    bt = spark.createDataFrame(
        beta_rows, schema=beta_schema(frame_df.schema[split].dataType, off + p_x)
    )

    # null-safe: a NULL split value is a real level and must match its row
    j = frame_df.join(
        F.broadcast(bt), on=F.col(split).eqNullSafe(F.col("__lvl"))
    ).drop("__lvl")
    fitted = (F.col("__b0") if intercept else F.lit(0.0))
    for i, xc in enumerate(x_cols):
        fitted = fitted + F.col(bcols[off + i]) * F.col(xc).cast("double")
    e = F.col(y_col).cast("double") - fitted
    if weight_col is not None:
        e = F.col(weight_col).cast("double") * e  # WLS score factor w·u
    j = j.withColumn("__e", e)

    score_cols = ([F.lit(1.0)] if intercept else []) + [
        F.col(xc).cast("double") for xc in x_cols
    ]
    p = len(score_cols)

    if vcov_type == "hc1":
        aggs = []
        for a in range(p):
            for b in range(a, p):
                aggs.append(
                    F.sum(
                        F.col("__e") * F.col("__e") * score_cols[a] * score_cols[b]
                    ).alias(f"m_{a}_{b}")
                )
        rows = j.groupBy(split).agg(*aggs).collect()
        meats = {}
        for r in rows:
            lvl = r[split]
            Mfull = np.zeros((p, p))
            for a in range(p):
                for b in range(a, p):
                    v = float(r[f"m_{a}_{b}"] or 0.0)
                    Mfull[a, b] = Mfull[b, a] = v
            keep = np.asarray(pos[lvl].keep_idx, dtype=int)
            meats[lvl] = Mfull[np.ix_(keep, keep)]
        return meats, {}

    # cluster (1-way or CGM multiway) and Driscoll-Kraay all reduce to
    # per-(level, key-tuple) score vectors from ONE grouped pass over the
    # FINEST key (all cluster variables together, or the period column) —
    # scores are additive, so every CGM subset component is a driver-side
    # re-aggregation of the same rows. The collect is Σ_g (finest cells)
    # rows of p doubles — bounded explicitly (a silent full collect could
    # exceed the driver at extreme level × cluster cardinalities).
    key_cols = list(cluster_vars)
    aggs = [F.sum(F.col("__e") * score_cols[a]).alias(f"s_{a}") for a in range(p)]
    scores_df = j.groupBy(split, *key_cols).agg(*aggs)
    cap = 2_000_000
    rows = scores_df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"split x cluster score table exceeds {cap:,} rows; use a "
            "coarser split or cluster variable (or fit levels separately)"
        )
    per_level: dict = {}
    for r in rows:
        lvl = r[split]
        kt = tuple(r[c] for c in key_cols)
        s = np.array([float(r[f"s_{a}"] or 0.0) for a in range(p)])
        per_level.setdefault(lvl, []).append((kt, s))

    meats, n_clusters = combine_level_scores(
        per_level, key_cols, vcov_type, hac_lag, p
    )
    for lvl in list(meats):
        keep = np.asarray(pos[lvl].keep_idx, dtype=int)
        meats[lvl] = meats[lvl][np.ix_(keep, keep)]
    return meats, n_clusters


def _split_compress(
    source, parsed, split, vcov_type, cluster_vars, weight_col,
    drop_missings, split_nmax, verbose,
):
    """Compress with ``split`` joined into the cell key: ONE cell pass, then
    per-level driver WLS slices of the collected cells."""
    from .api import _collect_cells_guarded, compress_plan
    from .wls import CellDesign

    if vcov_type == "cluster":
        raise NotImplementedError(
            "split= with strategy='compress' supports iid/hc1; use "
            "strategy='moments'/'demean' for clustered split fits"
        )
    design = build_design(
        source.df, parsed, expand="interactions", fe_vars=parsed.fe
    )
    split_parsed = type(parsed)(
        yvar=parsed.yvar,
        terms=parsed.terms,
        fe=parsed.fe + [split],
        intercept=parsed.intercept,
    )
    comp, group_cols, _sql = compress_plan(
        source, split_parsed, design, drop_missings, weight_col
    )
    pdf = _collect_cells_guarded(comp, 10_000_000)
    if pdf is None:
        raise ValueError(
            "split compress cells exceed the driver cap; use "
            "strategy='moments' or 'demean' (fully grouped passes)"
        )
    models = DbregSplit()
    models.split_var = split
    levels = pdf[split].unique()
    if len(levels) > split_nmax:
        raise ValueError(
            f"split variable {split!r} has more than {split_nmax:,} levels"
        )
    for lvl in levels:
        sub = pdf[pdf[split].isna()] if pd.isna(lvl) else pdf[pdf[split] == lvl]
        sub = sub.reset_index(drop=True)
        cd = CellDesign(sub, design.names, parsed.fe)
        # predict()/coef(fe=)/wald() need the FE-dummy bookkeeping the
        # single-model compress path records (model.py relies on both)
        cat_levels = {b.var: list(b.levels) for b in cd.blocks if b.kind == "cat"}
        fe_coef_names = frozenset(
            f"{v}{lv}" for v in parsed.fe for lv in cat_levels.get(v, [])
        )
        if weight_col is not None:
            if not (sub["w_min"].to_numpy(dtype=float).min() > 0.0) or not (
                np.isfinite(sub["sum_w"].to_numpy(dtype=float)).all()
            ):
                raise ValueError(
                    f"weights column '{weight_col}' contains non-positive "
                    f"or NaN values in split level {lvl!r}"
                )
            n_vec = sub["sum_w"].to_numpy(dtype=float)
            sum_y = sub["sum_wy"].to_numpy(dtype=float)
            sum_y_sq = sub["sum_wy_sq"].to_numpy(dtype=float)
        else:
            n_vec = sub["n"].to_numpy(dtype=float)
            sum_y = sub["sum_y"].to_numpy(dtype=float)
            sum_y_sq = sub["sum_y_sq"].to_numpy(dtype=float)
        nobs_orig = int(sub["n"].sum())
        xtx = cd.gram(n_vec)
        xty = cd.weighted_col_sums(sum_y)
        collin = detect_collinearity(xtx, xty, cd.col_names)
        sol = solve_with_fallback(collin.xtx, collin.xty)
        yhat = cd.matvec(sol.betahat, collin.keep_idx)
        rss_g = sum_y_sq - 2.0 * yhat * sum_y + n_vec * yhat**2
        rss = float(rss_g.sum())
        p = len(collin.keep_names)
        df_res = max(nobs_orig - p, 1)
        tss = float(sum_y_sq.sum() - (sum_y.sum() ** 2) / n_vec.sum())
        meat = None
        if vcov_type == "hc1":
            if weight_col is not None:
                w2 = sub["sum_w2"].to_numpy(dtype=float)
                w2y = sub["sum_w2y"].to_numpy(dtype=float)
                w2yy = sub["sum_w2y_sq"].to_numpy(dtype=float)
                meat_g = w2yy - 2.0 * yhat * w2y + w2 * yhat**2
            else:
                meat_g = rss_g
            meat = cd.gram(meat_g)[np.ix_(collin.keep_idx, collin.keep_idx)]
        V = compute_vcov(vcov_type, sol.xtx_inv, rss, df_res, nobs_orig, p, meat)
        ct = gen_coeftable(sol.betahat, V, df_res, collin.keep_names)
        models[lvl] = DbregModel(
            coeftable=ct,
            vcov_=V,
            coef_names=collin.keep_names,
            yvar=parsed.yvar,
            xvars=standardize_coef_names(parsed.xvars),
            fe=parsed.fe,
            strategy="compress",
            vcov_type=vcov_type,
            cluster_var=None,
            nobs=len(sub),
            nobs_orig=nobs_orig,
            df_residual=df_res,
            rss=rss,
            tss=tss,
            collin_vars=collin.drop_names,
            design_info=design,
            parsed=parsed,
            weight_col=weight_col,
            cells=sub,
            spark_session=source.df.sparkSession,
            cat_levels=cat_levels,
            fe_coef_names=fe_coef_names,
        )
    return models


def split_moments_sql(
    fml: str,
    split: str,
    from_clause: str = "FROM lineitem",
    weights: str | None = None,
) -> str:
    """Oracle SQL for the grouped moment pass (moments strategy): one
    GROUP BY over the split variable with the standard moment sums."""
    parsed = parse_formula(fml)
    weight_col = parse_weights(weights)
    spec = moment_spec(
        Var(parsed.yvar),
        [Var(v) for v in parsed.xvars],
        intercept=True,
        weight=Var(weight_col) if weight_col else None,
    )
    cols = ",\n  ".join(f"{agg_to_sql(a)} AS {n}" for n, a in spec)
    needed = [parsed.yvar] + parsed.xvars + (
        [weight_col] if weight_col else []
    )
    where = " AND ".join(f"{c} IS NOT NULL" for c in needed)
    return (
        f"SELECT {split},\n  {cols}\n{from_clause}\n"
        f"WHERE {where}\nGROUP BY {split}"
    )


# --------------------------------------------------------------------------
# persistence — one member directory per level + a type-tagged key index
# --------------------------------------------------------------------------


def save_split(res: DbregSplit, path: str) -> None:
    """Serialize a split-sample result: each level's model saves into its
    own subdirectory (via the member's save — OLS and GLM members share
    the directory scheme), and ``split.json`` records the level keys with
    type tags (levels can be None/numeric/str and must round-trip
    exactly)."""
    import json
    import os

    from .model import encode_key

    os.makedirs(path, exist_ok=True)
    levels = []
    for i, (lvl, m) in enumerate(res.items()):
        sub = f"level_{i:05d}"
        m.save(os.path.join(path, sub))
        levels.append({"dir": sub, "key": encode_key(lvl)})
    with open(os.path.join(path, "split.json"), "w") as f:
        json.dump(
            {
                "format": "dbreg_spark.split/1",
                "class": type(res).__name__,
                "split_var": res.split_var,
                "levels": levels,
            },
            f,
        )


def load_split(path: str, spark=None) -> DbregSplit:
    """Restore a result saved by :func:`save_split` (``DbregSplit.load`` /
    ``GlmSplit.load``); members dispatch on their own saved format."""
    import json
    import os

    from .model import decode_key, load_any_model

    with open(os.path.join(path, "split.json")) as f:
        obj = json.load(f)
    if obj.get("format") != "dbreg_spark.split/1":
        raise ValueError(f"unrecognized split format in {path}")
    cls = DbregSplit
    if obj.get("class") == "GlmSplit":
        from .split_glm import GlmSplit

        cls = GlmSplit
    out = cls()
    out.split_var = obj.get("split_var", "")
    for e in obj["levels"]:
        out[decode_key(e["key"])] = load_any_model(
            os.path.join(path, e["dir"]), spark
        )
    return out


DbregSplit.save = lambda self, path: save_split(self, path)
DbregSplit.load = staticmethod(load_split)
