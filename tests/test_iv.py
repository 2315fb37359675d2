"""dbiv (2SLS/IV) tests: numpy parity for every vcov flavor, FE absorption
vs explicit-dummy LSDV 2SLS, first-stage diagnostics, predict, formula
refusals, and a DuckDB cross-engine check of the emitted Gram SQL."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dbreg_spark import dbiv, dbreg
from dbreg_spark.iv import parse_iv_formula


# --------------------------------------------------------------------------
# fixtures
# --------------------------------------------------------------------------


def _gen(seed=7, n=3000, n_g=10, n_cl=25):
    rng = np.random.default_rng(seed)
    z1 = rng.normal(size=n)
    z2 = rng.normal(size=n)
    u = rng.normal(size=n)
    x_end = 0.8 * z1 + 0.4 * z2 + 0.5 * u + rng.normal(size=n)
    x_ex = rng.normal(size=n)
    g = rng.integers(0, n_g, size=n)
    h = rng.integers(0, 6, size=n)
    cl = rng.integers(0, n_cl, size=n)
    cl2 = rng.integers(0, 12, size=n)
    alpha = rng.normal(size=n_g)[g]
    y = 1.0 + 2.0 * x_end - 1.5 * x_ex + alpha + u + rng.normal(size=n)
    return pd.DataFrame(
        dict(
            y=y, x_end=x_end, x_ex=x_ex, z1=z1, z2=z2,
            g=[f"g{i}" for i in g], h=[f"h{i}" for i in h],
            cl=[f"c{i}" for i in cl], cl2=[f"d{i}" for i in cl2],
        )
    )


@pytest.fixture(scope="module")
def iv_sdf(spark):
    pdf = _gen()
    return spark.createDataFrame(pdf), pdf


def _np_2sls(y, X, Z):
    """Direct dense 2SLS: beta, (X'PzX)^-1, Gamma=(Z'Z)^-1 Z'X, resid."""
    ZtZ = Z.T @ Z
    Pz_X = Z @ np.linalg.solve(ZtZ, Z.T @ X)
    M = X.T @ Pz_X
    beta = np.linalg.solve(M, Pz_X.T @ y)
    return beta, np.linalg.inv(M), np.linalg.solve(ZtZ, Z.T @ X), y - X @ beta


# --------------------------------------------------------------------------
# formula parsing
# --------------------------------------------------------------------------


def test_parse_iv_formula_full():
    f = parse_iv_formula("y ~ a + b | g1 + g2 | e1 + e2 ~ i1 + i2")
    assert f.yvar == "y"
    assert [t.label for t in f.exog_terms] == ["a", "b"]
    assert f.fe == ["g1", "g2"]
    assert [t.label for t in f.endog_terms] == ["e1", "e2"]
    assert [t.label for t in f.inst_terms] == ["i1", "i2"]
    assert f.intercept


def test_parse_iv_formula_no_exog_no_fe():
    f = parse_iv_formula("y ~ 1 | e ~ i")
    assert f.exog_terms == [] and f.intercept and f.fe == []


def test_parse_iv_formula_refusals():
    with pytest.raises(ValueError, match="instrument part"):
        parse_iv_formula("y ~ x")
    with pytest.raises(ValueError, match="exogenous"):
        parse_iv_formula("y ~ e | e ~ i")
    with pytest.raises(ValueError, match="instrument itself"):
        parse_iv_formula("y ~ x | e ~ e + i")
    with pytest.raises(ValueError, match="included instruments"):
        parse_iv_formula("y ~ x | e ~ x + i")


# --------------------------------------------------------------------------
# no-FE parity
# --------------------------------------------------------------------------


def test_iv_nofe_iid_matches_numpy(iv_sdf):
    sdf, pdf = iv_sdf
    m = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, vcov="iid")
    n = len(pdf)
    X = np.column_stack([np.ones(n), pdf.x_ex, pdf.x_end])
    Z = np.column_stack([np.ones(n), pdf.x_ex, pdf.z1, pdf.z2])
    beta, Minv, _, u = _np_2sls(pdf.y.to_numpy(), X, Z)
    V = (u @ u / (n - 3)) * Minv
    for i, name in enumerate(["(Intercept)", "x_ex", "x_end"]):
        assert m.coef()[name] == pytest.approx(beta[i], rel=1e-10)
        assert m.se()[name] == pytest.approx(np.sqrt(V[i, i]), rel=1e-9)
    assert m.df_residual == n - 3
    # overidentified: 2 instruments, 1 endog; F is large by construction
    assert m.first_stage_F["x_end"] > 100


def test_iv_nofe_hc1_matches_numpy(iv_sdf):
    sdf, pdf = iv_sdf
    m = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, vcov="hc1")
    n = len(pdf)
    X = np.column_stack([np.ones(n), pdf.x_ex, pdf.x_end])
    Z = np.column_stack([np.ones(n), pdf.x_ex, pdf.z1, pdf.z2])
    beta, Minv, G, u = _np_2sls(pdf.y.to_numpy(), X, Z)
    S = (Z * (u**2)[:, None]).T @ Z
    V = (n / (n - 3)) * Minv @ (G.T @ S @ G) @ Minv
    for i, name in enumerate(["(Intercept)", "x_ex", "x_end"]):
        assert m.coef()[name] == pytest.approx(beta[i], rel=1e-10)
        assert m.se()[name] == pytest.approx(np.sqrt(V[i, i]), rel=1e-9)


def test_iv_nofe_cluster_matches_numpy(iv_sdf):
    sdf, pdf = iv_sdf
    m = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, vcov="~cl")
    n = len(pdf)
    X = np.column_stack([np.ones(n), pdf.x_ex, pdf.x_end])
    Z = np.column_stack([np.ones(n), pdf.x_ex, pdf.z1, pdf.z2])
    beta, Minv, G, u = _np_2sls(pdf.y.to_numpy(), X, Z)
    S = np.zeros((4, 4))
    for c in pdf.cl.unique():
        idx = (pdf.cl == c).to_numpy()
        s = (Z[idx] * u[idx, None]).sum(axis=0)
        S += np.outer(s, s)
    Gc = pdf.cl.nunique()
    V = (Gc / (Gc - 1)) * (n / (n - 3)) * Minv @ (G.T @ S @ G) @ Minv
    assert m.n_clusters == Gc
    for i, name in enumerate(["(Intercept)", "x_ex", "x_end"]):
        assert m.coef()[name] == pytest.approx(beta[i], rel=1e-10)
        assert m.se()[name] == pytest.approx(np.sqrt(V[i, i]), rel=1e-9)


def test_iv_just_identified_equals_ratio(iv_sdf):
    """Just-identified 1-endog IV is the classic covariance ratio."""
    sdf, pdf = iv_sdf
    m = dbiv("y ~ 1 | x_end ~ z1", sdf, vcov="iid")
    zc = pdf.z1 - pdf.z1.mean()
    b1 = (zc * pdf.y).sum() / (zc * pdf.x_end).sum()
    assert m.coef()["x_end"] == pytest.approx(b1, rel=1e-10)


def test_iv_self_instrumented_equals_ols(iv_sdf):
    """When Z spans X exactly (instrument = a copy of the endog column),
    2SLS degenerates to OLS — pin against dbreg."""
    sdf, pdf = iv_sdf
    sdf2 = sdf.withColumn("x_copy", sdf.x_end * 1.0)
    m_iv = dbiv("y ~ x_ex | x_end ~ x_copy", sdf2, vcov="iid")
    m_ols = dbreg("y ~ x_ex + x_end", sdf, strategy="moments", vcov="iid")
    for name in ["(Intercept)", "x_ex", "x_end"]:
        assert m_iv.coef()[name] == pytest.approx(m_ols.coef()[name], rel=1e-9)


# --------------------------------------------------------------------------
# FE absorption
# --------------------------------------------------------------------------


def _lsdv_parity(pdf, fe_cols, vcov, cluster=None):
    n = len(pdf)
    D = np.column_stack(
        [pd.get_dummies(pdf[f]).to_numpy(float) for f in fe_cols]
    ) if len(fe_cols) == 1 else np.column_stack(
        [pd.get_dummies(pdf[fe_cols[0]]).to_numpy(float),
         pd.get_dummies(pdf[fe_cols[1]]).to_numpy(float)[:, 1:]]
    )
    X = np.column_stack([pdf.x_ex, pdf.x_end, D])
    Z = np.column_stack([pdf.x_ex, pdf.z1, pdf.z2, D])
    beta, Minv, G, u = _np_2sls(pdf.y.to_numpy(), X, Z)
    k = X.shape[1]
    if vcov == "iid":
        V = (u @ u / (n - k)) * Minv
    elif vcov == "hc1":
        S = (Z * (u**2)[:, None]).T @ Z
        V = (n / (n - k)) * Minv @ (G.T @ S @ G) @ Minv
    else:
        S = np.zeros((Z.shape[1], Z.shape[1]))
        for c in pdf[cluster].unique():
            idx = (pdf[cluster] == c).to_numpy()
            s = (Z[idx] * u[idx, None]).sum(axis=0)
            S += np.outer(s, s)
        Gc = pdf[cluster].nunique()
        V = (Gc / (Gc - 1)) * (n / (n - k)) * Minv @ (G.T @ S @ G) @ Minv
    return beta[:2], np.sqrt(np.diag(V))[:2]


@pytest.mark.parametrize("vcov", ["iid", "hc1"])
def test_iv_1fe_matches_lsdv(iv_sdf, vcov):
    sdf, pdf = iv_sdf
    m = dbiv("y ~ x_ex | g | x_end ~ z1 + z2", sdf, vcov=vcov)
    beta, se = _lsdv_parity(pdf, ["g"], vcov)
    assert m.coef()["x_ex"] == pytest.approx(beta[0], rel=1e-8)
    assert m.coef()["x_end"] == pytest.approx(beta[1], rel=1e-8)
    assert m.se()["x_ex"] == pytest.approx(se[0], rel=1e-7)
    assert m.se()["x_end"] == pytest.approx(se[1], rel=1e-7)


def test_iv_1fe_cluster_matches_lsdv(iv_sdf):
    sdf, pdf = iv_sdf
    m = dbiv("y ~ x_ex | g | x_end ~ z1 + z2", sdf, vcov="~cl")
    beta, se = _lsdv_parity(pdf, ["g"], "cluster", cluster="cl")
    assert m.coef()["x_end"] == pytest.approx(beta[1], rel=1e-8)
    assert m.se()["x_end"] == pytest.approx(se[1], rel=1e-7)


def test_iv_multiway_cluster_runs_and_brackets(iv_sdf):
    """Multiway CGM: between the two one-way SEs is not guaranteed in
    theory, but the point estimates must be identical and the vcov finite."""
    sdf, pdf = iv_sdf
    m1 = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, vcov="~cl")
    m2 = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, vcov="~cl + cl2")
    assert m2.coef()["x_end"] == pytest.approx(m1.coef()["x_end"], rel=1e-12)
    assert np.isfinite(m2.se()["x_end"]) and m2.se()["x_end"] > 0


def test_iv_2fe_balancedish_close_to_lsdv(iv_sdf):
    """2-FE double demeaning is exact only for balanced panels; on a large
    random crossing it should agree with LSDV 2SLS to ~1e-2 relative."""
    sdf, pdf = iv_sdf
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m = dbiv("y ~ x_ex | g + h | x_end ~ z1 + z2", sdf, vcov="iid")
    beta, _ = _lsdv_parity(pdf, ["g", "h"], "iid")
    assert m.coef()["x_end"] == pytest.approx(beta[1], rel=2e-2)


# --------------------------------------------------------------------------
# diagnostics, edge cases
# --------------------------------------------------------------------------


def test_iv_weak_instrument_warns(spark):
    rng = np.random.default_rng(3)
    n = 2000
    z = rng.normal(size=n)
    x = rng.normal(size=n)  # instrument irrelevant
    y = x + rng.normal(size=n)
    sdf = spark.createDataFrame(pd.DataFrame(dict(y=y, x=x, z=z)))
    with pytest.warns(UserWarning, match="weak instruments"):
        m = dbiv("y ~ 1 | x ~ z", sdf, vcov="iid")
    assert m.first_stage_F["x"] < 10


def test_iv_collinear_instrument_dropped(iv_sdf):
    sdf, pdf = iv_sdf
    sdf2 = sdf.withColumn("z1_dup", sdf.z1 * 2.0)
    m = dbiv("y ~ x_ex | x_end ~ z1 + z1_dup + z2", sdf2, vcov="iid")
    m0 = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, vcov="iid")
    # the pivoted rank detection keeps ONE of the duplicated pair (by pivot
    # magnitude, so possibly the scaled copy) — either way exactly one drops
    assert len({"z1", "z1_dup"} & set(m.collin_vars)) == 1
    assert m.coef()["x_end"] == pytest.approx(m0.coef()["x_end"], rel=1e-10)


def test_iv_underidentified_raises(iv_sdf):
    sdf, _ = iv_sdf
    # two endogenous regressors, one instrument: order condition fails
    with pytest.raises(ValueError, match="under-identified"):
        dbiv("y ~ x_ex | x_end + z2 ~ z1", sdf, vcov="iid")
    # two instruments that are copies of each other: rank condition fails
    sdf2 = sdf.withColumn("z1_dup", sdf.z1 * 2.0)
    with pytest.raises(ValueError, match="under-identified"):
        dbiv("y ~ x_ex | x_end + z2 ~ z1 + z1_dup", sdf2, vcov="iid")


def test_iv_factor_exog(iv_sdf):
    """A factor exogenous control expands to dummies in both X and Z."""
    sdf, pdf = iv_sdf
    m = dbiv("y ~ x_ex + h | x_end ~ z1 + z2", sdf, vcov="iid")
    n = len(pdf)
    H = pd.get_dummies(pdf.h, drop_first=True).to_numpy(float)
    X = np.column_stack([np.ones(n), pdf.x_ex, H, pdf.x_end])
    Z = np.column_stack([np.ones(n), pdf.x_ex, H, pdf.z1, pdf.z2])
    beta, Minv, _, u = _np_2sls(pdf.y.to_numpy(), X, Z)
    assert m.coef()["x_end"] == pytest.approx(beta[-1], rel=1e-9)


def test_iv_predict_structural_fit(iv_sdf):
    sdf, pdf = iv_sdf
    m = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, vcov="iid")
    out = m.predict(sdf).select("x_ex", "x_end", "fit").toPandas()
    b = m.coef()
    expect = (
        b["(Intercept)"] + b["x_ex"] * out.x_ex + b["x_end"] * out.x_end
    )
    assert np.allclose(out.fit, expect, rtol=1e-10)


def test_iv_gram_sql_matches_duckdb(iv_sdf, duck):
    """Cross-engine: the emitted Gram SQL run in DuckDB equals the Spark
    data_only row to 1e-9 relative."""
    sdf, pdf = iv_sdf
    sdf.createOrReplaceTempView("iv_fixture")
    spark = sdf.sparkSession
    sql = dbiv(
        "y ~ x_ex | x_end ~ z1 + z2", spark=spark, table="iv_fixture",
        sql_only=True,
    )
    row_spark = dbiv(
        "y ~ x_ex | x_end ~ z1 + z2", spark=spark, table="iv_fixture",
        data_only=True,
    ).iloc[0]
    duck.register("iv_fixture", pdf)
    row_duck = duck.execute(sql).fetchdf().iloc[0]
    for k in row_spark.index:
        if k.startswith("__"):
            continue
        assert float(row_spark[k]) == pytest.approx(
            float(row_duck[k]), rel=1e-9
        ), k
    duck.unregister("iv_fixture")


def test_iv_missing_rows_dropped_consistently(spark):
    """A null anywhere in y/X/Z drops the row from BOTH sides of the fit."""
    pdf = _gen(seed=5, n=500)
    pdf.loc[::17, "z2"] = np.nan
    pdf.loc[::23, "x_ex"] = np.nan
    sdf = spark.createDataFrame(pdf)
    # pandas NaN arrives as Spark NaN, not NULL — convert so the SQL-style
    # missing filter (IS NOT NULL, as in the reference) applies
    from pyspark.sql import functions as F

    for c in ("z2", "x_ex"):
        sdf = sdf.withColumn(
            c, F.when(F.isnan(c), F.lit(None)).otherwise(F.col(c))
        )
    m = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, vcov="iid")
    sub = pdf.dropna(subset=["y", "x_ex", "x_end", "z1", "z2"])
    n = len(sub)
    X = np.column_stack([np.ones(n), sub.x_ex, sub.x_end])
    Z = np.column_stack([np.ones(n), sub.x_ex, sub.z1, sub.z2])
    beta, *_ = _np_2sls(sub.y.to_numpy(), X, Z)
    assert m.nobs_orig == n
    assert m.coef()["x_end"] == pytest.approx(beta[2], rel=1e-9)


# --------------------------------------------------------------------------
# specification diagnostics: Sargan J + Wu-Hausman (computed free from the
# Gram blocks — these tests pin them against dense numpy formulas)
# --------------------------------------------------------------------------


def test_iv_sargan_matches_numpy(iv_sdf):
    sdf, pdf = iv_sdf
    m = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, vcov="iid")
    n = len(pdf)
    X = np.column_stack([np.ones(n), pdf.x_ex, pdf.x_end])
    Z = np.column_stack([np.ones(n), pdf.x_ex, pdf.z1, pdf.z2])
    beta, _, _, u = _np_2sls(pdf.y.to_numpy(), X, Z)
    Zu = Z.T @ u
    J = n * (Zu @ np.linalg.solve(Z.T @ Z, Zu)) / (u @ u)
    stat, df, p = m.sargan
    assert df == 1  # 2 excluded instruments, 1 endogenous
    assert stat == pytest.approx(J, rel=1e-8)
    # instruments are valid by construction: do not expect rejection
    assert 0.0 < p <= 1.0 and p > 1e-4


def test_iv_sargan_none_when_just_identified(iv_sdf):
    sdf, _ = iv_sdf
    m = dbiv("y ~ x_ex | x_end ~ z1", sdf, vcov="iid")
    assert m.sargan is None
    assert m.wu_hausman is not None


def test_iv_wu_hausman_matches_numpy(iv_sdf):
    sdf, pdf = iv_sdf
    m = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, vcov="iid")
    n = len(pdf)
    y = pdf.y.to_numpy()
    X = np.column_stack([np.ones(n), pdf.x_ex, pdf.x_end])
    Z = np.column_stack([np.ones(n), pdf.x_ex, pdf.z1, pdf.z2])
    gam = np.linalg.solve(Z.T @ Z, Z.T @ pdf.x_end.to_numpy())
    v = pdf.x_end.to_numpy() - Z @ gam
    Xa = np.column_stack([X, v])
    rss_a = float(y @ y - (Xa.T @ y) @ np.linalg.solve(Xa.T @ Xa, Xa.T @ y))
    rss_r = float(y @ y - (X.T @ y) @ np.linalg.solve(X.T @ X, X.T @ y))
    dof = n - X.shape[1] - 1
    F = ((rss_r - rss_a) / 1) / (rss_a / dof)
    stat, d1, d2, p = m.wu_hausman
    assert (d1, d2) == (1.0, float(dof))
    assert stat == pytest.approx(F, rel=1e-7)
    # x_end is endogenous by construction (shares u with y): strong rejection
    assert p < 1e-6


def test_iv_wu_hausman_exogenous_parity(spark):
    """When the 'endogenous' regressor is in fact exogenous, the statistic
    still matches numpy and is small (no evidence of endogeneity)."""
    rng = np.random.default_rng(11)
    n = 2000
    z = rng.normal(size=n)
    x = 0.9 * z + rng.normal(size=n)  # independent of the outcome error
    y = 1.0 + 2.0 * x + rng.normal(size=n)
    pdf = pd.DataFrame(dict(y=y, x=x, z=z))
    m = dbiv("y ~ 1 | x ~ z", spark.createDataFrame(pdf), vcov="iid")
    X = np.column_stack([np.ones(n), x])
    Z = np.column_stack([np.ones(n), z])
    gam = np.linalg.solve(Z.T @ Z, Z.T @ x)
    v = x - Z @ gam
    Xa = np.column_stack([X, v])
    rss_a = float(y @ y - (Xa.T @ y) @ np.linalg.solve(Xa.T @ Xa, Xa.T @ y))
    rss_r = float(y @ y - (X.T @ y) @ np.linalg.solve(X.T @ X, X.T @ y))
    dof = n - 2 - 1
    F = ((rss_r - rss_a) / 1) / (rss_a / dof)
    stat, _, _, p = m.wu_hausman
    assert stat == pytest.approx(F, rel=1e-7)
    assert p > 0.01  # seed-checked: no spurious endogeneity signal


def test_iv_diagnostics_under_fe_match_demeaned_numpy(iv_sdf):
    """1-FE absorption: Sargan and Wu-Hausman computed on the demeaned
    moments must equal the dense formulas on within-transformed data."""
    sdf, pdf = iv_sdf
    m = dbiv("y ~ x_ex | g | x_end ~ z1 + z2", sdf, vcov="iid")
    d = pdf.copy()
    cols = ["y", "x_ex", "x_end", "z1", "z2"]
    for c in cols:
        d[c] = d[c] - d.groupby("g")[c].transform("mean")
    n = len(d)
    G = pdf.g.nunique()
    y = d.y.to_numpy()
    X = np.column_stack([d.x_ex, d.x_end])
    Z = np.column_stack([d.x_ex, d.z1, d.z2])
    beta, _, _, u = _np_2sls(y, X, Z)
    Zu = Z.T @ u
    J = n * (Zu @ np.linalg.solve(Z.T @ Z, Zu)) / (u @ u)
    stat, df, _ = m.sargan
    assert df == 1
    assert stat == pytest.approx(J, rel=1e-6)

    gam = np.linalg.solve(Z.T @ Z, Z.T @ d.x_end.to_numpy())
    v = d.x_end.to_numpy() - Z @ gam
    Xa = np.column_stack([X, v])
    rss_a = float(y @ y - (Xa.T @ y) @ np.linalg.solve(Xa.T @ Xa, Xa.T @ y))
    rss_r = float(y @ y - (X.T @ y) @ np.linalg.solve(X.T @ X, X.T @ y))
    dof = n - 3 - G
    F = ((rss_r - rss_a) / 1) / (rss_a / dof)
    stat_h, d1, d2, _ = m.wu_hausman
    assert (d1, d2) == (1.0, float(dof))
    assert stat_h == pytest.approx(F, rel=1e-6)


# --------------------------------------------------------------------------
# observation weights (WLS-2SLS: identical to 2SLS on sqrt(w)-scaled data)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def iv_wdf(spark):
    pdf = _gen(seed=11)
    rng = np.random.default_rng(99)
    pdf["w"] = rng.uniform(0.2, 3.0, len(pdf))
    return spark.createDataFrame(pdf), pdf


def _scaled(pdf, cols):
    """sqrt(w)-scale the columns (incl. the intercept column of ones)."""
    sw = np.sqrt(pdf.w.to_numpy())
    n = len(pdf)
    X = np.column_stack([np.ones(n)] + [pdf[c].to_numpy() for c in cols])
    return X * sw[:, None], sw


def test_iv_weighted_iid_matches_numpy(iv_wdf):
    sdf, pdf = iv_wdf
    m = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, weights="w", vcov="iid")
    n = len(pdf)
    Xs, sw = _scaled(pdf, ["x_ex", "x_end"])
    Zs, _ = _scaled(pdf, ["x_ex", "z1", "z2"])
    ys = pdf.y.to_numpy() * sw
    beta, Minv, _, us = _np_2sls(ys, Xs, Zs)
    V = (us @ us / (n - 3)) * Minv
    for i, name in enumerate(["(Intercept)", "x_ex", "x_end"]):
        assert m.coef()[name] == pytest.approx(beta[i], rel=1e-9)
        assert m.se()[name] == pytest.approx(np.sqrt(V[i, i]), rel=1e-8)
    assert m.nobs_orig == n  # raw rows, not sum(w)
    assert m.weight_col == "w"


def test_iv_weighted_hc1_matches_numpy(iv_wdf):
    sdf, pdf = iv_wdf
    m = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, weights="w", vcov="hc1")
    n = len(pdf)
    Xs, sw = _scaled(pdf, ["x_ex", "x_end"])
    Zs, _ = _scaled(pdf, ["x_ex", "z1", "z2"])
    ys = pdf.y.to_numpy() * sw
    beta, Minv, G, us = _np_2sls(ys, Xs, Zs)
    S = (Zs * (us**2)[:, None]).T @ Zs
    V = (n / (n - 3)) * Minv @ (G.T @ S @ G) @ Minv
    for i, name in enumerate(["(Intercept)", "x_ex", "x_end"]):
        assert m.coef()[name] == pytest.approx(beta[i], rel=1e-9)
        assert m.se()[name] == pytest.approx(np.sqrt(V[i, i]), rel=1e-8)


def test_iv_weighted_cluster_matches_numpy(iv_wdf):
    sdf, pdf = iv_wdf
    m = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, weights="w", vcov="~cl")
    n = len(pdf)
    Xs, sw = _scaled(pdf, ["x_ex", "x_end"])
    Zs, _ = _scaled(pdf, ["x_ex", "z1", "z2"])
    ys = pdf.y.to_numpy() * sw
    beta, Minv, G, us = _np_2sls(ys, Xs, Zs)
    cl = pdf.cl.to_numpy()
    S = np.zeros((Zs.shape[1], Zs.shape[1]))
    for c in np.unique(cl):
        s = (Zs[cl == c] * us[cl == c][:, None]).sum(axis=0)
        S += np.outer(s, s)
    Gn = len(np.unique(cl))
    V = (Gn / (Gn - 1)) * (n / (n - 3)) * Minv @ (G.T @ S @ G) @ Minv
    for i, name in enumerate(["(Intercept)", "x_ex", "x_end"]):
        assert m.coef()[name] == pytest.approx(beta[i], rel=1e-9)
        assert m.se()[name] == pytest.approx(np.sqrt(V[i, i]), rel=1e-8)
    assert m.n_clusters == Gn


def test_iv_weighted_1fe_matches_scaled_lsdv(iv_wdf):
    sdf, pdf = iv_wdf
    m = dbiv("y ~ x_ex | g | x_end ~ z1 + z2", sdf, weights="w", vcov="iid")
    # scaled-data LSDV-IV oracle: dummies also scaled by sqrt(w)
    sw = np.sqrt(pdf.w.to_numpy())
    D = pd.get_dummies(pdf.g).to_numpy(dtype=float)
    X = np.column_stack([pdf.x_ex, pdf.x_end, D]) * sw[:, None]
    Z = np.column_stack([pdf.x_ex, pdf.z1, pdf.z2, D]) * sw[:, None]
    ys = pdf.y.to_numpy() * sw
    beta, Minv, _, us = _np_2sls(ys, X, Z)
    n, G = len(pdf), D.shape[1]
    dfres = n - 2 - G
    V = (us @ us / dfres) * Minv
    assert m.coef()["x_ex"] == pytest.approx(beta[0], rel=1e-8)
    assert m.coef()["x_end"] == pytest.approx(beta[1], rel=1e-8)
    assert m.se()["x_ex"] == pytest.approx(np.sqrt(V[0, 0]), rel=1e-7)
    assert m.se()["x_end"] == pytest.approx(np.sqrt(V[1, 1]), rel=1e-7)
    assert m.df_residual == dfres


def test_iv_weighted_2fe_routes_iterative(iv_wdf, recwarn):
    sdf, pdf = iv_wdf
    m = dbiv("y ~ x_ex | g + h | x_end ~ z1 + z2", sdf, weights="w")
    assert m.demean_iterated
    assert not [w for w in recwarn.list if "unbalanced" in str(w.message)]
    sw = np.sqrt(pdf.w.to_numpy())
    Dg = pd.get_dummies(pdf.g).to_numpy(dtype=float)
    Dh = pd.get_dummies(pdf.h, drop_first=True).to_numpy(dtype=float)
    X = np.column_stack([pdf.x_ex, pdf.x_end, Dg, Dh]) * sw[:, None]
    Z = np.column_stack([pdf.x_ex, pdf.z1, pdf.z2, Dg, Dh]) * sw[:, None]
    beta, *_ = _np_2sls(pdf.y.to_numpy() * sw, X, Z)
    assert m.coef()["x_ex"] == pytest.approx(beta[0], rel=1e-7)
    assert m.coef()["x_end"] == pytest.approx(beta[1], rel=1e-7)


def test_iv_weighted_nonpositive_raises(spark):
    pdf = _gen(seed=13, n=300)
    pdf["w"] = 1.0
    pdf.loc[5, "w"] = -2.0
    sdf = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="non-positive"):
        dbiv("y ~ x_ex | x_end ~ z1", sdf, weights="w")


def test_iv_dk_lag0_equals_cluster_by_time(spark):
    rng = np.random.default_rng(23)
    n = 2500
    z1 = rng.normal(size=n)
    u = rng.normal(size=n)
    x_end = 0.8 * z1 + 0.5 * u + rng.normal(size=n)
    t = rng.integers(0, 30, n)
    pdf = pd.DataFrame(
        {"y": 1 + 2 * x_end + u + rng.normal(size=n), "x_end": x_end,
         "z1": z1, "t": t}
    )
    sdf = spark.createDataFrame(pdf)
    mdk = dbiv("y ~ 1 | x_end ~ z1", sdf, vcov="dk ~ t", hac_lag=0)
    mcl = dbiv("y ~ 1 | x_end ~ z1", sdf, vcov="~t")
    np.testing.assert_allclose(
        mdk.se().to_numpy(), mcl.se().to_numpy(), rtol=1e-10
    )
    # a positive lag changes the SEs (time-correlated scores by chance
    # structure alone would not guarantee it, so inject a common shock)
    pdf2 = pdf.copy()
    shock = np.cumsum(rng.normal(size=30)) * 0.5
    pdf2["y"] = pdf2["y"] + shock[pdf2.t]
    sdf2 = spark.createDataFrame(pdf2)
    a = dbiv("y ~ 1 | x_end ~ z1", sdf2, vcov="dk ~ t", hac_lag=0)
    b = dbiv("y ~ 1 | x_end ~ z1", sdf2, vcov="dk ~ t", hac_lag=4)
    assert not np.allclose(a.se().to_numpy(), b.se().to_numpy(), rtol=1e-3)


def test_iv_first_stage_tables_match_dense_ols(iv_sdf):
    sdf, pdf = iv_sdf
    m = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, vcov="iid")
    fs = m.first_stage("x_end")
    n = len(pdf)
    Z = np.column_stack([np.ones(n), pdf.x_ex, pdf.z1, pdf.z2])
    g = np.linalg.solve(Z.T @ Z, Z.T @ pdf.x_end.to_numpy())
    u = pdf.x_end.to_numpy() - Z @ g
    V = (u @ u / (n - 4)) * np.linalg.inv(Z.T @ Z)
    order = ["(Intercept)", "x_ex", "z1", "z2"]
    np.testing.assert_allclose(
        fs.loc[order, "estimate"].to_numpy(), g, rtol=1e-9
    )
    np.testing.assert_allclose(
        fs.loc[order, "std.error"].to_numpy(), np.sqrt(np.diag(V)), rtol=1e-8
    )
    with pytest.raises(ValueError, match="unknown endogenous"):
        m.first_stage("nope")


def test_iv_save_load_roundtrip(iv_sdf, tmp_path):
    """Bit-exact coef/vcov/predict round trip plus the IV diagnostics
    (first-stage F + tables, Sargan, Wu-Hausman)."""
    sdf, pdf = iv_sdf
    m = dbiv("y ~ x_ex | x_end ~ z1 + z2", sdf, vcov="hc1")
    p = str(tmp_path / "iv_model")
    m.save(p)
    from dbreg_spark.iv import IvModel

    m2 = IvModel.load(p, sdf.sparkSession)
    assert type(m2) is IvModel
    np.testing.assert_array_equal(m.coef().to_numpy(), m2.coef().to_numpy())
    np.testing.assert_array_equal(m.vcov_, m2.vcov_)
    assert m2.endog == m.endog and m2.instruments == m.instruments
    assert m2.first_stage_F == m.first_stage_F
    assert m2.sargan == m.sargan and m2.wu_hausman == m.wu_hausman
    for k in m.first_stage_tables:
        pd.testing.assert_frame_equal(
            m.first_stage_tables[k], m2.first_stage_tables[k],
            check_exact=True,
        )
    a = m.predict(sdf).toPandas().sort_values("y").reset_index(drop=True)
    b = m2.predict(sdf).toPandas().sort_values("y").reset_index(drop=True)
    np.testing.assert_array_equal(
        a["fit"].to_numpy(), b["fit"].to_numpy()
    )
    # generic loader dispatches on the format tag
    from dbreg_spark.model import load_any_model

    assert type(load_any_model(p, sdf.sparkSession)) is IvModel


def test_iv_cr3_matches_delete_one_2sls(spark):
    """vcov='cr3 ~ g' on dbiv: CV3 jackknife from one per-cluster Gram
    pass must equal dense leave-one-cluster-out 2SLS refits; with one
    nested absorbed FE the demeaned block subtraction stays exact."""
    rng = np.random.default_rng(17)
    n, G = 1000, 10
    g = rng.integers(0, G, n)
    z = rng.normal(size=n)
    u = rng.normal(size=n) + 0.5 * rng.normal(size=G)[g]
    d = 0.8 * z + 0.5 * u + rng.normal(size=n)
    x1 = rng.normal(size=n)
    y = 1.0 + 0.7 * d + 0.3 * x1 + u
    pdf = pd.DataFrame({"y": y, "d": d, "x1": x1, "z": z, "g": g})
    df = spark.createDataFrame(pdf)
    m = dbiv("y ~ x1 | d ~ z", df, vcov="cr3 ~ g")

    X = np.column_stack([np.ones(n), x1, d])
    Z = np.column_stack([np.ones(n), x1, z])

    def tsls(Xs, Zs, ys):
        Pz = Zs @ np.linalg.pinv(Zs.T @ Zs) @ Zs.T
        return np.linalg.solve(Xs.T @ Pz @ Xs, Xs.T @ Pz @ ys)

    beta = tsls(X, Z, y)
    devs = np.asarray(
        [tsls(X[g != gi], Z[g != gi], y[g != gi]) - beta for gi in range(G)]
    )
    V_ref = (G - 1) / G * (devs.T @ devs)
    np.testing.assert_allclose(m.coef().to_numpy(), beta, rtol=1e-9)
    np.testing.assert_allclose(m.vcov().to_numpy(), V_ref, rtol=1e-8)
    assert m.n_clusters == G

    # one nested FE: exact; spanning FE: clean refusal
    unit = g * 3 + rng.integers(0, 3, n)
    y2 = 0.7 * d + 0.5 * rng.normal(size=30)[unit] + u
    pdf2 = pd.DataFrame({"y": y2, "d": d, "z": z, "g": g, "unit": unit})
    df2 = spark.createDataFrame(pdf2)
    m2 = dbiv("y ~ 1 | unit | d ~ z", df2, vcov="cr3 ~ g")
    Du = np.zeros((n, 30))
    Du[np.arange(n), unit] = 1.0
    X2 = np.column_stack([d[:, None], Du])
    Z2 = np.column_stack([z[:, None], Du])

    def tsls0(Xs, Zs, ys):
        Pz = Zs @ np.linalg.pinv(Zs.T @ Zs) @ Zs.T
        return np.linalg.lstsq(
            Xs.T @ Pz @ Xs, Xs.T @ Pz @ ys, rcond=None
        )[0][0]

    b2 = tsls0(X2, Z2, y2)
    devs2 = []
    for gi in range(G):
        keep = g != gi
        cols = [0] + [1 + u2 for u2 in range(30) if u2 // 3 != gi]
        devs2.append(
            tsls0(X2[keep][:, cols], Z2[keep][:, cols], y2[keep]) - b2
        )
    V2_ref = (G - 1) / G * float(np.asarray(devs2) @ np.asarray(devs2))
    assert float(m2.coef().iloc[0]) == pytest.approx(b2, rel=1e-8)
    assert m2.vcov().to_numpy()[0, 0] == pytest.approx(V2_ref, rel=1e-7)

    pdf2["f_span"] = rng.integers(0, 5, n)
    with pytest.raises(NotImplementedError, match="nested"):
        dbiv(
            "y ~ 1 | f_span | d ~ z", spark.createDataFrame(pdf2),
            vcov="cr3 ~ g",
        )
