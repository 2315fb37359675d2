"""dbglm: distributed-IRLS GLMs vs a pure-numpy IRLS oracle.

The oracle below is a straight textbook IRLS on the collected design matrix
(dense numpy, z-form with explicit division) — an independent derivation
path from the division-free w·z aggregation the engine runs, so agreement
to ~1e-8 pins both the algebra and the distributed execution.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dbreg_spark import dbglm, dbreg


# ---------------------------------------------------------------------------
# numpy IRLS oracle
# ---------------------------------------------------------------------------


def _np_irls(X, y, family, max_iter=50, tol=1e-12, offset=None, prior_w=None):
    n, p = X.shape
    o = np.zeros(n) if offset is None else np.asarray(offset, dtype=float)
    pw = np.ones(n) if prior_w is None else np.asarray(prior_w, dtype=float)
    beta = np.zeros(p)

    def _wm(beta):
        eta = o + X @ beta
        if family == "binomial":
            mu = 1.0 / (1.0 + np.exp(-eta))
            w = mu * (1.0 - mu)
        elif family == "poisson":
            mu = np.exp(eta)
            w = mu
        else:
            mu = eta
            w = np.ones(n)
        return eta, mu, pw * w

    for _ in range(max_iter):
        eta, mu, w = _wm(beta)
        z = eta + (y - mu) / np.clip(w / pw, 1e-10, None)
        WX = X * w[:, None]
        A = X.T @ WX
        b = WX.T @ (z - o)
        beta_new = np.linalg.solve(A, b)
        if np.max(np.abs(beta_new - beta)) < tol:
            beta = beta_new
            break
        beta = beta_new
    # final information and residuals
    eta, mu, w = _wm(beta)
    A = X.T @ (X * w[:, None])
    return beta, np.linalg.inv(A), mu


def _sandwich_hc1(X, y, mu, bread, n, p):
    s = (y - mu)[:, None] * X
    meat = s.T @ s
    return (n / (n - p)) * bread @ meat @ bread


def _sandwich_cr1(X, y, mu, bread, clusters, n, p):
    s = (y - mu)[:, None] * X
    df = pd.DataFrame(s)
    df["g"] = clusters
    sg = df.groupby("g", dropna=False).sum().values
    meat = sg.T @ sg
    g = sg.shape[0]
    return (g / (g - 1)) * (n / (n - p)) * bread @ meat @ bread


@pytest.fixture(scope="module")
def glm_pdf():
    rng = np.random.default_rng(42)
    n = 4000
    x1 = rng.normal(size=n)
    x2 = rng.uniform(-1, 1, size=n)
    g = rng.integers(0, 25, size=n)
    eta = 0.4 + 0.8 * x1 - 1.2 * x2 + 0.05 * g
    p = 1.0 / (1.0 + np.exp(-eta))
    ybin = (rng.uniform(size=n) < p).astype(float)
    lam = np.exp(0.2 + 0.3 * x1 + 0.1 * x2)
    ypois = rng.poisson(lam).astype(float)
    return pd.DataFrame(
        {
            "x1": x1,
            "x2": x2,
            "g": g.astype(np.int64),
            "ybin": ybin,
            "ypois": ypois,
            "ynum": eta + rng.normal(size=n),
        }
    )


@pytest.fixture(scope="module")
def glm_df(spark, glm_pdf):
    return spark.createDataFrame(glm_pdf)


def _X(pdf, cols):
    return np.column_stack([np.ones(len(pdf))] + [pdf[c].values for c in cols])


def test_logit_matches_numpy_irls(glm_df, glm_pdf):
    m = dbglm("ybin ~ x1 + x2", glm_df, family="binomial")
    X = _X(glm_pdf, ["x1", "x2"])
    beta, bread, _ = _np_irls(X, glm_pdf["ybin"].values, "binomial")
    assert m.converged
    np.testing.assert_allclose(m.coef().values, beta, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(
        m.se().values, np.sqrt(np.diag(bread)), rtol=1e-6, atol=1e-10
    )
    # deviance = -2·loglik for 0/1 outcomes (saturated ll = 0)
    assert m.deviance == pytest.approx(-2.0 * m.loglik, rel=1e-12)
    assert 0 < m.deviance < m.null_deviance


def test_poisson_matches_numpy_irls(glm_df, glm_pdf):
    m = dbglm("ypois ~ x1 + x2", glm_df, family="poisson")
    X = _X(glm_pdf, ["x1", "x2"])
    beta, bread, _ = _np_irls(X, glm_pdf["ypois"].values, "poisson")
    assert m.converged
    np.testing.assert_allclose(m.coef().values, beta, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(
        m.se().values, np.sqrt(np.diag(bread)), rtol=1e-6, atol=1e-10
    )


def test_gaussian_equals_ols(glm_df):
    m = dbglm("ynum ~ x1 + x2", glm_df, family="gaussian")
    ref = dbreg("ynum ~ x1 + x2", glm_df, strategy="moments")
    np.testing.assert_allclose(
        m.coef().values, ref.coef().values, rtol=1e-9, atol=1e-12
    )
    # gaussian model-based SEs use the pearson (= OLS sigma²) dispersion
    np.testing.assert_allclose(m.se().values, ref.se().values, rtol=1e-7)


def test_logit_hc1_matches_numpy_sandwich(glm_df, glm_pdf):
    m = dbglm("ybin ~ x1 + x2", glm_df, family="binomial", vcov="hc1")
    X = _X(glm_pdf, ["x1", "x2"])
    y = glm_pdf["ybin"].values
    beta, bread, mu = _np_irls(X, y, "binomial")
    V = _sandwich_hc1(X, y, mu, bread, len(y), X.shape[1])
    np.testing.assert_allclose(m.se().values, np.sqrt(np.diag(V)), rtol=1e-6)


def test_logit_cluster_matches_numpy_crve(glm_df, glm_pdf):
    m = dbglm("ybin ~ x1 + x2", glm_df, family="binomial", vcov="~ g")
    X = _X(glm_pdf, ["x1", "x2"])
    y = glm_pdf["ybin"].values
    beta, bread, mu = _np_irls(X, y, "binomial")
    V = _sandwich_cr1(X, y, mu, bread, glm_pdf["g"].values, len(y), X.shape[1])
    assert m.n_clusters == glm_pdf["g"].nunique()
    np.testing.assert_allclose(m.se().values, np.sqrt(np.diag(V)), rtol=1e-6)


def test_factor_regressor_expands(glm_df, glm_pdf):
    pdf = glm_pdf.assign(cat=np.where(glm_pdf["g"] % 2 == 0, "even", "odd"))
    sdf = glm_df.sparkSession.createDataFrame(pdf)
    m = dbglm("ybin ~ x1 + cat", sdf, family="binomial")
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["x1"].values, (pdf["cat"] == "odd").astype(float)]
    )
    beta, _, _ = _np_irls(X, pdf["ybin"].values, "binomial")
    assert any("cat" in n for n in m.coef_names)
    np.testing.assert_allclose(m.coef().values, beta, rtol=1e-7, atol=1e-9)


def test_predict_response_and_link(glm_df, glm_pdf):
    m = dbglm("ybin ~ x1 + x2", glm_df, family="binomial")
    out = m.predict(glm_df, type="response").select("fit").toPandas()["fit"]
    assert ((out >= 0) & (out <= 1)).all()
    link = m.predict(glm_df, type="link").select("fit").toPandas()["fit"]
    X = _X(glm_pdf, ["x1", "x2"])
    # row order is preserved for a local-relation source
    np.testing.assert_allclose(
        np.sort(link.values), np.sort(X @ m.coef().values), rtol=1e-7
    )


def test_refuses_fe_formula(glm_df):
    with pytest.raises(NotImplementedError, match="fixed effects"):
        dbglm("ybin ~ x1 | g", glm_df, family="binomial")


def test_rejects_non_binary_outcome(glm_df):
    with pytest.raises(ValueError, match="0/1 outcome"):
        dbglm("ypois ~ x1", glm_df, family="binomial")


def test_rejects_negative_poisson_outcome(glm_df):
    with pytest.raises(ValueError, match="non-negative"):
        dbglm("ynum ~ x1", glm_df, family="poisson")


def test_collinear_column_dropped(glm_df, glm_pdf):
    pdf = glm_pdf.assign(x1_copy=glm_pdf["x1"])
    sdf = glm_df.sparkSession.createDataFrame(pdf)
    m = dbglm("ybin ~ x1 + x1_copy + x2", sdf, family="binomial")
    assert m.collin_vars  # one of the twins dropped
    X = _X(glm_pdf, ["x1", "x2"])
    beta, _, _ = _np_irls(X, glm_pdf["ybin"].values, "binomial")
    # kept coefficients still match the full-rank fit
    np.testing.assert_allclose(np.sort(m.coef().values), np.sort(beta), rtol=1e-7)


def test_separation_warns_not_crashes(spark):
    # perfectly separated: MLE diverges; must terminate with a warning, not
    # an exception or a non-finite coeftable
    pdf = pd.DataFrame({"y": [0.0] * 20 + [1.0] * 20, "x": list(range(40))})
    sdf = spark.createDataFrame(pdf)
    with pytest.warns(UserWarning):
        m = dbglm("y ~ x", sdf, family="binomial", max_iter=8)
    assert not m.converged
    assert np.isfinite(m.coef().values).all()


def test_multiway_cluster_matches_numpy_cgm(glm_df, glm_pdf):
    """Two-way CGM: V = V_g + V_g2 − V_g∩g2 with each component carrying its
    own G_S/(G_S−1) CR1 factor — the same convention as the linear path."""
    pdf = glm_pdf.assign(g2=(glm_pdf["g"] * 7 + 3) % 11)
    sdf = glm_df.sparkSession.createDataFrame(pdf)
    m = dbglm("ybin ~ x1 + x2", sdf, family="binomial", vcov="~ g + g2")
    assert m.n_clusters == min(pdf["g"].nunique(), pdf["g2"].nunique())

    X = _X(glm_pdf, ["x1", "x2"])
    y = glm_pdf["ybin"].values
    beta, bread, mu = _np_irls(X, y, "binomial")
    inter = pdf["g"].astype(str) + "|" + pdf["g2"].astype(str)
    n, p = X.shape
    V = (
        _sandwich_cr1(X, y, mu, bread, pdf["g"].values, n, p)
        + _sandwich_cr1(X, y, mu, bread, pdf["g2"].values, n, p)
        - _sandwich_cr1(X, y, mu, bread, inter.values, n, p)
    )
    np.testing.assert_allclose(m.vcov_, V, rtol=1e-6)


def test_no_intercept_formula_honored(glm_df, glm_pdf):
    m = dbglm("ybin ~ 0 + x1 + x2", glm_df, family="binomial")
    assert "(Intercept)" not in m.coef_names
    X = np.column_stack([glm_pdf["x1"].values, glm_pdf["x2"].values])
    beta, bread, _ = _np_irls(X, glm_pdf["ybin"].values, "binomial")
    np.testing.assert_allclose(m.coef().values, beta, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(
        m.se().values, np.sqrt(np.diag(bread)), rtol=1e-6
    )
    # null model for a no-intercept GLM is the zero linear predictor
    n = len(glm_pdf)
    assert m.null_deviance == pytest.approx(2 * n * np.log(2), rel=1e-10)


def test_poisson_offset_matches_numpy(glm_df, glm_pdf):
    """Rate model: log-exposure offset shifts the linear predictor but is
    not a fitted coefficient."""
    rng = np.random.default_rng(7)
    pdf = glm_pdf.assign(log_exp=np.log(rng.uniform(0.5, 4.0, len(glm_pdf))))
    sdf = glm_df.sparkSession.createDataFrame(pdf)
    m = dbglm("ypois ~ x1 + x2", sdf, family="poisson", offset="log_exp")
    X = _X(pdf, ["x1", "x2"])
    beta, bread, _ = _np_irls(
        X, pdf["ypois"].values, "poisson", offset=pdf["log_exp"].values
    )
    assert m.converged
    np.testing.assert_allclose(m.coef().values, beta, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(
        m.se().values, np.sqrt(np.diag(bread)), rtol=1e-6
    )
    assert np.isnan(m.null_deviance)  # no closed form with an offset
    # predict honors the offset; refuses data without the offset column
    fit = m.predict(sdf, type="link").select("fit", "log_exp", "x1", "x2")
    pd_fit = fit.toPandas()
    np.testing.assert_allclose(
        np.sort(pd_fit["fit"].values),
        np.sort(
            pd_fit["log_exp"].values
            + np.column_stack(
                [np.ones(len(pd_fit)), pd_fit["x1"], pd_fit["x2"]]
            )
            @ beta
        ),
        rtol=1e-6,
    )
    with pytest.raises(ValueError, match="offset"):
        m.predict(sdf.drop("log_exp"))


def test_grouped_binomial_equals_rowlevel(glm_df, glm_pdf):
    """Sufficiency: logit on grouped proportions (weights = trials) must
    reproduce the row-level 0/1 fit exactly — coefficients, SEs, loglik."""
    pdf = glm_pdf.assign(xq=np.round(glm_pdf["x1"], 1))
    g = (
        pdf.groupby(["xq", "g"], as_index=False)
        .agg(trials=("ybin", "size"), prop=("ybin", "mean"))
    )
    spark = glm_df.sparkSession
    row_m = dbglm(
        "ybin ~ xq + g", spark.createDataFrame(pdf[["ybin", "xq", "g"]]),
        family="binomial",
    )
    grp_m = dbglm(
        "prop ~ xq + g", spark.createDataFrame(g), family="binomial",
        weights="trials",
    )
    np.testing.assert_allclose(
        grp_m.coef().values, row_m.coef().values, rtol=1e-7
    )
    np.testing.assert_allclose(grp_m.se().values, row_m.se().values, rtol=1e-6)
    assert grp_m.loglik == pytest.approx(row_m.loglik, rel=1e-9)
    # deviances are relative to each representation's own saturated model,
    # but their DIFFERENCE (null − residual) is saturation-free and matches
    assert grp_m.null_deviance - grp_m.deviance == pytest.approx(
        row_m.null_deviance - row_m.deviance, rel=1e-9
    )


def test_weighted_gaussian_is_wls(glm_df, glm_pdf):
    rng = np.random.default_rng(11)
    pdf = glm_pdf.assign(wt=rng.uniform(0.2, 3.0, len(glm_pdf)))
    sdf = glm_df.sparkSession.createDataFrame(pdf)
    m = dbglm("ynum ~ x1 + x2", sdf, family="gaussian", weights="wt")
    X = _X(pdf, ["x1", "x2"])
    w = pdf["wt"].values
    A = X.T @ (X * w[:, None])
    beta = np.linalg.solve(A, X.T @ (w * pdf["ynum"].values))
    np.testing.assert_allclose(m.coef().values, beta, rtol=1e-9)
    # model-based SEs use pearson dispersion Σw·e²/(n−p)
    e = pdf["ynum"].values - X @ beta
    disp = (w * e**2).sum() / (len(pdf) - 3)
    np.testing.assert_allclose(
        m.se().values, np.sqrt(disp * np.diag(np.linalg.inv(A))), rtol=1e-7
    )


def test_ridge_logit_matches_numpy_penalized_irls(glm_df, glm_pdf):
    lam = 5.0
    m = dbglm("ybin ~ x1 + x2", glm_df, family="binomial", l2=lam)
    X = _X(glm_pdf, ["x1", "x2"])
    y = glm_pdf["ybin"].values
    P = np.diag([0.0, lam, lam])  # intercept unpenalized
    beta = np.zeros(3)
    for _ in range(60):
        eta = X @ beta
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = mu * (1.0 - mu)
        z = eta + (y - mu) / w
        A = X.T @ (X * w[:, None])
        beta_new = np.linalg.solve(A + P, X.T @ (w * z))
        if np.max(np.abs(beta_new - beta)) < 1e-12:
            beta = beta_new
            break
        beta = beta_new
    assert m.converged
    np.testing.assert_allclose(m.coef().values, beta, rtol=1e-6, atol=1e-9)
    # penalty shrinks the slopes toward zero vs the unpenalized fit
    m0 = dbglm("ybin ~ x1 + x2", glm_df, family="binomial")
    assert abs(m.coef()["x1"]) < abs(m0.coef()["x1"])


def test_ridge_tames_separation(spark):
    pdf = pd.DataFrame({"y": [0.0] * 20 + [1.0] * 20, "x": list(range(40))})
    sdf = spark.createDataFrame(pdf)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")  # any non-convergence warning fails this
        m = dbglm("y ~ x", sdf, family="binomial", l2=1.0, max_iter=50)
    assert m.converged
    assert abs(m.coef()["x"]) < 10  # bounded, not diverging
    assert np.isfinite(m.se().values).all()


def test_ridge_refused_with_fe(glm_df, glm_pdf):
    pdf = glm_pdf.assign(gcat="g" + glm_pdf["g"].astype(str))
    sdf = glm_df.sparkSession.createDataFrame(pdf)
    with pytest.raises(NotImplementedError, match="l2"):
        dbglm("ypois ~ x1 | gcat", sdf, family="poisson", l2=1.0)


def test_quasipoisson_scales_se_by_dispersion(glm_df, glm_pdf):
    m = dbglm("ypois ~ x1 + x2", glm_df, family="poisson")
    q = dbglm("ypois ~ x1 + x2", glm_df, family="quasipoisson")
    np.testing.assert_allclose(q.coef().values, m.coef().values, rtol=1e-12)
    assert q.family == "quasipoisson"
    assert q.dispersion == pytest.approx(q.pearson_chi2 / q.df_residual)
    np.testing.assert_allclose(
        q.se().values, m.se().values * np.sqrt(q.dispersion), rtol=1e-10
    )


def test_negative_weights_rejected(glm_df, glm_pdf):
    pdf = glm_pdf.assign(wt=np.where(glm_pdf["g"] == 0, -1.0, 1.0))
    sdf = glm_df.sparkSession.createDataFrame(pdf)
    with pytest.raises(ValueError, match="negative"):
        dbglm("ybin ~ x1", sdf, family="binomial", weights="wt")


@pytest.fixture(scope="module")
def fe_sdf(glm_df, glm_pdf):
    pdf = glm_pdf.assign(gcat="g" + glm_pdf["g"].astype(str))
    return glm_df.sparkSession.createDataFrame(pdf), pdf


def test_fe_poisson_matches_dummy_encoding(fe_sdf):
    """Profiled (concentrated) FE-Poisson must equal the explicit-dummy
    logit— two entirely different computation paths through the engine."""
    sdf, pdf = fe_sdf
    fe_m = dbglm("ypois ~ x1 + x2 | gcat", sdf, family="poisson")
    dm = dbglm("ypois ~ x1 + x2 + gcat", sdf, family="poisson")
    assert fe_m.converged
    for name in ["x1", "x2"]:
        assert fe_m.coef()[name] == pytest.approx(dm.coef()[name], rel=1e-6)
        # model-based SEs: profile information == partitioned full inverse
        assert fe_m.se()[name] == pytest.approx(dm.se()[name], rel=1e-5)
    assert fe_m.loglik == pytest.approx(dm.loglik, rel=1e-9)
    assert fe_m.n_fe_levels == pdf["gcat"].nunique()


def test_fe_poisson_fixef_matches_dummy_coefs(fe_sdf):
    sdf, pdf = fe_sdf
    fe_m = dbglm("ypois ~ x1 + x2 | gcat", sdf, family="poisson")
    dm = dbglm("ypois ~ x1 + x2 + gcat", sdf, family="poisson")
    fx = fe_m.fixef().toPandas().set_index("gcat")["fixef"]
    # dummy model: α̂_ref = intercept; α̂_level = intercept + γ_level
    icpt = dm.coef()["(Intercept)"]
    levels = sorted(pdf["gcat"].unique())
    ref = levels[0]
    assert fx[ref] == pytest.approx(icpt, rel=1e-6)
    probe = levels[7]
    assert fx[probe] == pytest.approx(
        icpt + dm.coef()[f"gcat{probe}"], rel=1e-6
    )


def test_fe_poisson_hc1_and_cluster_match_dummy(fe_sdf):
    """FWL: the profiled sandwich (scores (y−μ̂)x̃) equals the β-block of
    the full dummy-model sandwich, small-sample factors included."""
    sdf, pdf = fe_sdf
    fe_h = dbglm("ypois ~ x1 + x2 | gcat", sdf, family="poisson", vcov="hc1")
    dm_h = dbglm("ypois ~ x1 + x2 + gcat", sdf, family="poisson", vcov="hc1")
    for name in ["x1", "x2"]:
        assert fe_h.se()[name] == pytest.approx(dm_h.se()[name], rel=1e-5)
    fe_c = dbglm(
        "ypois ~ x1 + x2 | gcat", sdf, family="poisson", vcov="~ g"
    )
    dm_c = dbglm(
        "ypois ~ x1 + x2 + gcat", sdf, family="poisson", vcov="~ g"
    )
    assert fe_c.n_clusters == dm_c.n_clusters
    for name in ["x1", "x2"]:
        assert fe_c.se()[name] == pytest.approx(dm_c.se()[name], rel=1e-5)


def test_fe_poisson_offset_and_weights(fe_sdf):
    sdf, pdf = fe_sdf
    rng = np.random.default_rng(3)
    pdf2 = pdf.assign(
        log_exp=np.log(rng.uniform(0.5, 2.0, len(pdf))),
        wt=rng.uniform(0.5, 2.0, len(pdf)),
    )
    sdf2 = sdf.sparkSession.createDataFrame(pdf2)
    fe_m = dbglm(
        "ypois ~ x1 + x2 | gcat", sdf2, family="poisson",
        offset="log_exp", weights="wt",
    )
    dm = dbglm(
        "ypois ~ x1 + x2 + gcat", sdf2, family="poisson",
        offset="log_exp", weights="wt",
    )
    for name in ["x1", "x2"]:
        assert fe_m.coef()[name] == pytest.approx(dm.coef()[name], rel=1e-6)
        assert fe_m.se()[name] == pytest.approx(dm.se()[name], rel=1e-5)


def test_fe_poisson_zero_outcome_group_drops_cleanly(fe_sdf):
    """A group whose outcomes are all zero is perfectly predicted
    (λ̂_g = 0): it must not move β, and its fixef is NULL (ln 0) —
    ppmlhdfe's separation behavior, marked instead of crashed."""
    sdf, pdf = fe_sdf
    extra = pdf.iloc[:50].assign(gcat="gzero", ypois=0.0)
    pdf2 = pd.concat([pdf, extra], ignore_index=True)
    sdf2 = sdf.sparkSession.createDataFrame(pdf2)
    m_with = dbglm("ypois ~ x1 + x2 | gcat", sdf2, family="poisson")
    m_base = dbglm("ypois ~ x1 + x2 | gcat", sdf, family="poisson")
    np.testing.assert_allclose(
        m_with.coef().values, m_base.coef().values, rtol=1e-6
    )
    fx = m_with.fixef().toPandas().set_index("gcat")["fixef"]
    assert pd.isna(fx["gzero"])
    assert fx.drop("gzero").notna().all()


def test_fe_poisson_predict_joins_fixef(fe_sdf):
    sdf, pdf = fe_sdf
    m = dbglm("ypois ~ x1 + x2 | gcat", sdf, family="poisson")
    out = m.predict(sdf).select("gcat", "ypois", "fit").toPandas()
    assert out["fit"].notna().all() and (out["fit"] > 0).all()
    # group means of fit equal group means of y (the FE moment condition)
    gm = out.groupby("gcat").agg(fit=("fit", "sum"), y=("ypois", "sum"))
    np.testing.assert_allclose(gm["fit"], gm["y"], rtol=1e-6)


def test_fe_poisson_multiway_cluster_matches_dummy(fe_sdf):
    """Two-way CGM in the profiled path must equal the dummy-model CGM —
    per-component G_S/(G_S−1) scaling included (FWL extends to each
    inclusion-exclusion component)."""
    sdf, pdf = fe_sdf
    pdf2 = pdf.assign(c2=(pdf["g"] * 13 + 5) % 7)
    sdf2 = sdf.sparkSession.createDataFrame(pdf2)
    fe_m = dbglm(
        "ypois ~ x1 + x2 | gcat", sdf2, family="poisson", vcov="~ g + c2"
    )
    dm = dbglm(
        "ypois ~ x1 + x2 + gcat", sdf2, family="poisson", vcov="~ g + c2"
    )
    assert fe_m.n_clusters == dm.n_clusters
    for name in ["x1", "x2"]:
        assert fe_m.se()[name] == pytest.approx(dm.se()[name], rel=1e-5)


def test_fe_poisson_drops_within_group_constant_regressor(fe_sdf):
    """A regressor constant within the FE groups is absorbed — it must be
    DROPPED (recorded in collin_vars), not reported with garbage SE."""
    sdf, pdf = fe_sdf
    gmean = pdf.groupby("gcat")["x1"].transform("mean")
    pdf2 = pdf.assign(gconst=gmean)  # constant within each gcat
    sdf2 = sdf.sparkSession.createDataFrame(pdf2)
    m = dbglm("ypois ~ x1 + gconst + x2 | gcat", sdf2, family="poisson")
    assert "gconst" in m.collin_vars
    assert list(m.coef_names) == ["x1", "x2"]
    base = dbglm("ypois ~ x1 + x2 | gcat", sdf, family="poisson")
    np.testing.assert_allclose(m.coef().values, base.coef().values, rtol=1e-6)
    np.testing.assert_allclose(m.se().values, base.se().values, rtol=1e-6)


def test_fe_poisson_refusals(fe_sdf):
    sdf, _ = fe_sdf
    with pytest.raises(NotImplementedError, match="poisson family only"):
        dbglm("ybin ~ x1 | gcat", sdf, family="binomial")
    with pytest.raises(NotImplementedError, match="quasipoisson"):
        dbglm("ypois ~ x1 | gcat", sdf, family="quasipoisson")


def test_fepois_suffstats_matches_two_pass_system(fe_sdf):
    """r9 fused pass: the Newton system assembled from the ONE-scan
    sufficient statistics (fepois_suffstats_table + _fepois_assemble) must
    equal the two-pass gate shape (fepois_group_table →
    fepois_profiled_rows → fepois_profiled_agg) at the same literal β —
    A, s, ll, ll_sat, d_raw and n, centered and uncentered."""
    import numpy as np

    from dbreg_spark.glm import (
        _fepois_assemble,
        fepois_group_table,
        fepois_profiled_agg,
        fepois_profiled_rows,
        fepois_suffstats_table,
    )

    sdf, _ = fe_sdf
    x = ["x1", "x2"]
    beta = np.array([0.02, -0.01])
    gtab = fepois_group_table(sdf, "ypois", x, "gcat", beta)
    rows = fepois_profiled_rows(sdf, gtab, "ypois", x, "gcat", beta, first=True)
    ref = fepois_profiled_agg(rows, 2, first=True).collect()[0].asDict()
    for center in (None, np.array([5.0, -2.0])):
        stats = fepois_suffstats_table(
            sdf, "ypois", x, "gcat", beta, center=center, first=True
        )
        got = _fepois_assemble(stats, 2, beta, False, True)
        assert got["n_total"] == ref["n_total"]
        for key in ("ll", "ll_sat", "a_0_0", "a_0_1", "a_1_1", "b_0",
                    "b_1", "d_0", "d_1"):
            assert got[key] == pytest.approx(ref[key], rel=1e-9), (center, key)


def test_fepois_scan_pass_contract(fe_sdf):
    """r9: ONE data scan per Newton iteration (was two) + one meat scan —
    the pass ledger pins the contract."""
    from dbreg_spark.glm import _FEPOIS_PASS_STATS

    sdf, _ = fe_sdf
    m = dbglm("ypois ~ x1 + x2 | gcat", sdf, family="poisson", vcov="hc1")
    # scan_passes == n_iter, +1 only when the post-loop rebuild fired
    assert _FEPOIS_PASS_STATS["scan_passes"] in (m.n_iter, m.n_iter + 1)
    assert _FEPOIS_PASS_STATS["meat_passes"] == 1


def test_fepois_large_mean_regressor_shift_invariance(fe_sdf):
    """The profiled system is invariant to shifting a regressor (the
    shift is absorbed into the FE); with the grouped M − TT'/W assembly
    this is also the cancellation stress test that the global-mean
    centering exists for — a +1e4 shift must leave slope and SE intact."""
    sdf, pdf = fe_sdf
    pdf2 = pdf.assign(x1s=pdf["x1"] + 1.0e4)
    sdf2 = sdf.sparkSession.createDataFrame(pdf2)
    base = dbglm("ypois ~ x1 + x2 | gcat", sdf, family="poisson", vcov="hc1")
    shifted = dbglm(
        "ypois ~ x1s + x2 | gcat", sdf2, family="poisson", vcov="hc1"
    )
    assert shifted.coef()["x1s"] == pytest.approx(base.coef()["x1"], rel=1e-6)
    assert shifted.se()["x1s"] == pytest.approx(base.se()["x1"], rel=1e-6)


# ---------------------------------------------------------------------------
# k-FE Poisson (alternating profiles + weighted AP demeaning)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fe2_sdf(glm_df, glm_pdf):
    pdf = glm_pdf.assign(
        gcat="g" + glm_pdf["g"].astype(str),
        hcat="h" + ((glm_pdf["g"] * 3 + (glm_pdf["x1"] > 0)) % 7).astype(str),
    )
    return glm_df.sparkSession.createDataFrame(pdf), pdf


def test_fe_poisson_2fe_matches_dummy_encoding(fe2_sdf):
    """Two absorbed FEs via alternating profiles must equal the explicit
    double-dummy fit — coefficients, model SEs (profile information ≡
    partitioned full inverse), and the log-likelihood."""
    sdf, pdf = fe2_sdf
    fe_m = dbglm("ypois ~ x1 + x2 | gcat + hcat", sdf, family="poisson")
    dm = dbglm("ypois ~ x1 + x2 + gcat + hcat", sdf, family="poisson")
    assert fe_m.converged
    for name in ["x1", "x2"]:
        assert fe_m.coef()[name] == pytest.approx(dm.coef()[name], rel=1e-5)
        assert fe_m.se()[name] == pytest.approx(dm.se()[name], rel=1e-4)
    assert fe_m.loglik == pytest.approx(dm.loglik, rel=1e-8)


def test_fe_poisson_2fe_cluster_matches_dummy(fe2_sdf):
    sdf, pdf = fe2_sdf
    fe_c = dbglm(
        "ypois ~ x1 + x2 | gcat + hcat", sdf, family="poisson", vcov="~ g"
    )
    dm_c = dbglm(
        "ypois ~ x1 + x2 + gcat + hcat", sdf, family="poisson", vcov="~ g"
    )
    assert fe_c.n_clusters == dm_c.n_clusters
    for name in ["x1", "x2"]:
        assert fe_c.se()[name] == pytest.approx(dm_c.se()[name], rel=1e-4)


def test_fe_poisson_2fe_predict_moment_conditions(fe2_sdf):
    """Fitted means must reproduce each FE's group totals (the FE
    first-order conditions) — and predict must resolve both α̂ joins."""
    sdf, pdf = fe2_sdf
    m = dbglm("ypois ~ x1 + x2 | gcat + hcat", sdf, family="poisson")
    out = m.predict(sdf).select("gcat", "hcat", "ypois", "fit").toPandas()
    assert out["fit"].notna().all()
    for key in ["gcat", "hcat"]:
        gm = out.groupby(key).agg(fit=("fit", "sum"), y=("ypois", "sum"))
        np.testing.assert_allclose(gm["fit"], gm["y"], rtol=1e-5)
    # fixef: long form with both FEs present
    fx = m.fixef().toPandas()
    assert set(fx["fe_var"]) == {"gcat", "hcat"}


def test_fe_poisson_2fe_dead_group_drops_cleanly(fe2_sdf):
    """An all-zero-outcome level of one FE must not poison the other FE's
    λ updates (−inf − (−inf) = NaN regression): β invariant, dead fixef
    NULL, live fixefs finite."""
    sdf, pdf = fe2_sdf
    extra = pdf.iloc[:40].assign(gcat="gdead", ypois=0.0)
    pdf2 = pd.concat([pdf, extra], ignore_index=True)
    sdf2 = sdf.sparkSession.createDataFrame(pdf2)
    m_with = dbglm("ypois ~ x1 + x2 | gcat + hcat", sdf2, family="poisson")
    m_base = dbglm("ypois ~ x1 + x2 | gcat + hcat", sdf, family="poisson")
    np.testing.assert_allclose(
        m_with.coef().values, m_base.coef().values, rtol=1e-5
    )
    fx = m_with.fixef().toPandas()
    dead = fx[(fx["fe_var"] == "gcat") & (fx["level"] == "gdead")]
    assert len(dead) == 1 and pd.isna(dead["fixef"]).all()
    live = fx[~((fx["fe_var"] == "gcat") & (fx["level"] == "gdead"))]
    assert live["fixef"].notna().all()


def test_fe_poisson_2fe_duplicate_regressor_dropped(fe2_sdf):
    sdf, pdf = fe2_sdf
    pdf2 = pdf.assign(x1_copy=pdf["x1"] * 2.0)
    sdf2 = sdf.sparkSession.createDataFrame(pdf2)
    m = dbglm("ypois ~ x1 + x1_copy + x2 | gcat + hcat", sdf2, family="poisson")
    # exactly one of the twins is dropped (the pivot keeps the larger-norm
    # one, so which twin survives is an implementation detail)
    assert len(set(m.collin_vars) & {"x1", "x1_copy"}) == 1
    kept = ({"x1", "x1_copy"} - set(m.collin_vars)).pop()
    scale = 2.0 if kept == "x1_copy" else 1.0
    base = dbglm("ypois ~ x1 + x2 | gcat + hcat", sdf, family="poisson")
    assert m.coef()[kept] * scale == pytest.approx(base.coef()["x1"], rel=1e-5)
    assert m.coef()["x2"] == pytest.approx(base.coef()["x2"], rel=1e-5)


def test_fe_poisson_rejects_continuous_fe_type(fe2_sdf):
    sdf, pdf = fe2_sdf
    pdf2 = pdf.assign(fdbl=pdf["g"].astype(float))
    sdf2 = sdf.sparkSession.createDataFrame(pdf2)
    with pytest.raises(ValueError, match="string/integer/boolean"):
        dbglm("ypois ~ x1 | fdbl + hcat", sdf2, family="poisson")


def test_fe_poisson_2fe_save_load(fe2_sdf, tmp_path):
    from dbreg_spark import GlmModel

    sdf, _ = fe2_sdf
    m = dbglm("ypois ~ x1 + x2 | gcat + hcat", sdf, family="poisson")
    p = str(tmp_path / "fe2_model")
    m.save(p)
    r = GlmModel.load(p, spark=sdf.sparkSession)
    np.testing.assert_allclose(r.coef().values, m.coef().values, rtol=0)
    a = m.predict(sdf).select("fit").toPandas()["fit"].values
    b = r.predict(sdf).select("fit").toPandas()["fit"].values
    np.testing.assert_allclose(np.sort(a), np.sort(b), rtol=1e-12)


def test_model_save_load_roundtrip(glm_df, glm_pdf, tmp_path):
    from dbreg_spark import GlmModel

    m = dbglm("ybin ~ x1 + x2", glm_df, family="binomial", vcov="hc1")
    p = str(tmp_path / "logit_model")
    m.save(p)
    r = GlmModel.load(p)
    np.testing.assert_allclose(r.coef().values, m.coef().values, rtol=0)
    np.testing.assert_allclose(r.vcov_, m.vcov_, rtol=0)
    assert r.coeftable["p.value"].equals(m.coeftable["p.value"])
    a = m.predict(glm_df).select("fit").toPandas()["fit"].values
    b = r.predict(glm_df).select("fit").toPandas()["fit"].values
    np.testing.assert_allclose(np.sort(a), np.sort(b), rtol=0)


def test_fe_model_save_load_roundtrip(fe_sdf, tmp_path):
    from dbreg_spark import GlmModel

    sdf, pdf = fe_sdf
    m = dbglm("ypois ~ x1 + x2 | gcat", sdf, family="poisson")
    p = str(tmp_path / "fepois_model")
    m.save(p)
    r = GlmModel.load(p, spark=sdf.sparkSession)
    np.testing.assert_allclose(r.coef().values, m.coef().values, rtol=0)
    fx_m = m.fixef().toPandas().set_index("gcat")["fixef"].sort_index()
    fx_r = r.fixef().toPandas().set_index("gcat")["fixef"].sort_index()
    np.testing.assert_allclose(fx_r.values, fx_m.values, rtol=1e-12)
    a = m.predict(sdf).select("fit").toPandas()["fit"].values
    b = r.predict(sdf).select("fit").toPandas()["fit"].values
    np.testing.assert_allclose(np.sort(a), np.sort(b), rtol=1e-12)


def test_fit_quality_classifier_roundtrip(tables):
    """Train-in-engine → apply-at-scale loop: dbglm-fitted weights plug
    straight into quality_classify, and the applied score equals the
    model's own probability."""
    import pyspark.sql.functions as F

    from dbreg_spark.operators.text import (
        fit_quality_classifier,
        quality_classify,
    )

    docs = tables["documents"]
    # label: thresholded default-classifier score with 10% deterministic
    # label noise (pure separability would make the MLE diverge)
    scored = quality_classify(docs.select("doc_id", "text"))
    labeled = scored.select(
        "doc_id",
        F.when(
            F.pmod(F.hash("doc_id"), F.lit(10)) == 0,
            1 - F.col("clf_keep"),
        ).otherwise(F.col("clf_keep")).cast("double").alias("label"),
    ).join(docs.select("doc_id", "text"), "doc_id")

    w, b, model = fit_quality_classifier(labeled, "label")
    assert model.converged
    assert set(w) <= set(
        ["log_tokens", "stopword_ratio", "unique_token_ratio",
         "punct_ratio", "digit_ratio", "mean_token_len"]
    )

    applied = quality_classify(
        labeled.select("doc_id", "label", "text"), weights=w, bias=b
    )
    pdf = applied.toPandas()
    agree = (pdf["clf_keep"] == pdf["label"]).mean()
    assert agree > 0.8, f"fitted classifier agreement only {agree:.2%}"


def test_pass_plan_sql_matches_duckdb(spark, duck, sf_dir):
    """The one-pass weighted-moment aggregation at a fixed β: Spark plan vs
    the emitted DuckDB SQL (the gate's mechanism, pinned here too)."""
    import numpy as np

    from dbreg_spark.design import build_design
    from dbreg_spark.formula import parse_formula
    from dbreg_spark.glm import get_family, irls_pass_plan
    from dbreg_spark.plans.common import resolve_source
    from dbreg_spark.plans.frames import build_base_frame

    src = resolve_source(spark, path=f"{sf_dir}/lineitem.parquet")
    parsed = parse_formula("is_return ~ l_quantity + l_discount")
    df = src.df.withColumn(
        "is_return", (src.df["l_returnflag"] == "R").cast("double")
    )
    from dbreg_spark.plans.common import Source

    src2 = Source(
        df=df,
        sql_from=(
            "FROM (SELECT *, CAST(l_returnflag = 'R' AS DOUBLE) AS is_return "
            f"FROM read_parquet('{sf_dir}/lineitem.parquet'))"
        ),
    )
    design = build_design(src2.df, parsed, expand="all", fe_vars=None)
    frame = build_base_frame(src2, parsed, design, True, want_sql=True)
    fam = get_family("binomial")
    beta = np.array([-0.5, 0.02, 0.3])
    spec, agg_df, sql = irls_pass_plan(frame, fam, beta, list(frame.x_cols), True)
    srow = agg_df.collect()[0].asDict()
    orow = duck.execute(sql).fetchdf().iloc[0].to_dict()
    for k, v in srow.items():
        assert orow[k] == pytest.approx(v, rel=1e-9), k


@pytest.mark.parametrize("family", ["binomial", "poisson", "gaussian"])
def test_irls_pass_cross_engine_fuzz(spark, duck, family):
    """Cross-engine fuzz of the IRLS pass algebra: random data, random β,
    random offset/prior-weight combinations — the Spark aggregation row and
    the emitted DuckDB SQL must agree on every moment to ~1e-9 (pins the
    μ/w/wz/ll/pearson expressions of every family in BOTH dialects, not
    just at the gate's single fixed β)."""
    import numpy as np

    from dbreg_spark.design import build_design
    from dbreg_spark.formula import parse_formula
    from dbreg_spark.glm import get_family, irls_pass_plan
    from dbreg_spark.plans.common import Source
    from dbreg_spark.plans.frames import build_base_frame

    rng = np.random.default_rng(hash(family) % 2**31)
    fam = get_family(family)
    for draw in range(4):
        n = 400
        pdf = pd.DataFrame(
            {
                "x1": rng.normal(size=n),
                "x2": rng.uniform(-2, 2, size=n),
                "off": rng.normal(scale=0.2, size=n),
                "wt": rng.uniform(0.2, 3.0, size=n),
            }
        )
        if family == "binomial":
            pdf["y"] = rng.integers(0, 2, size=n).astype(float)
        elif family == "poisson":
            pdf["y"] = rng.poisson(2.0, size=n).astype(float)
        else:
            pdf["y"] = rng.normal(size=n)
        tname = f"glm_fuzz_{family}_{draw}"
        duck.register(tname, pdf)
        sdf = spark.createDataFrame(pdf)
        src = Source(df=sdf, sql_from=f"FROM {tname}")
        parsed = parse_formula("y ~ x1 + x2")
        design = build_design(sdf, parsed, expand="all", fe_vars=None)
        beta = rng.normal(scale=0.3, size=3)
        use_off = draw % 2 == 1
        use_wt = draw >= 2
        extra = (["off"] if use_off else []) + (["wt"] if use_wt else [])
        frame = build_base_frame(
            src, parsed, design, True, want_sql=True,
            extra_cols=extra or None,
        )
        spec, agg_df, sql = irls_pass_plan(
            frame, fam, beta, list(frame.x_cols), True,
            first=(draw == 0),
            offset="off" if use_off else None,
            weights="wt" if use_wt else None,
        )
        srow = agg_df.collect()[0].asDict()
        orow = duck.execute(sql).fetchdf().iloc[0].to_dict()
        for k, v in srow.items():
            assert orow[k] == pytest.approx(v, rel=1e-9, abs=1e-12), (
                f"{family} draw {draw} stat {k}: spark={v} duck={orow[k]}"
            )
        duck.unregister(tname)


@pytest.mark.slowparity
def test_fe_poisson_2fe_cell_resident_matches_driver(fe2_sdf):
    """Past cells_nmax the inner solve switches to the cell-RESIDENT Spark
    solver (_kfe_solve_cells_spark). Force the switch with a tiny cap and
    pin full parity with the driver-tier fit: coefficients, cluster SEs,
    log-likelihood, dof, and the recovered fixef table (incl. NULL for
    dead groups)."""
    sdf, pdf = fe2_sdf
    with pytest.warns(UserWarning, match="cell-resident"):
        m_sp = dbglm(
            "ypois ~ x1 + x2 | gcat + hcat", sdf, family="poisson",
            vcov="~g", cells_nmax=10,
        )
    m_dr = dbglm(
        "ypois ~ x1 + x2 | gcat + hcat", sdf, family="poisson", vcov="~g"
    )
    assert m_sp.converged and m_sp.n_iter == m_dr.n_iter
    for name in ["x1", "x2"]:
        assert m_sp.coef()[name] == pytest.approx(m_dr.coef()[name], rel=1e-9)
        assert m_sp.se()[name] == pytest.approx(m_dr.se()[name], rel=1e-8)
    assert m_sp.loglik == pytest.approx(m_dr.loglik, rel=1e-10)
    assert m_sp.df_residual == m_dr.df_residual
    fx_sp = (
        m_sp.fixef().toPandas()
        .sort_values(["fe_var", "level"]).reset_index(drop=True)
    )
    fx_dr = (
        m_dr.fixef().toPandas()
        .sort_values(["fe_var", "level"]).reset_index(drop=True)
    )
    assert list(fx_sp["level"]) == list(fx_dr["level"])
    assert fx_sp["fixef"].isna().equals(fx_dr["fixef"].isna())
    import numpy as np

    # fixefs are identified up to k−1 additive constants (see the kfe
    # docstring) and the two tiers may land on different normalizations:
    # within each FE the difference must be one CONSTANT, and the
    # constants must cancel across FEs (the total α per cell is invariant)
    shifts = []
    for fv in ["gcat", "hcat"]:
        sub = fx_sp["fe_var"] == fv
        live = sub & ~fx_sp["fixef"].isna()
        diff = (fx_sp.loc[live, "fixef"] - fx_dr.loc[live, "fixef"]).to_numpy()
        assert np.ptp(diff) < 1e-7, f"{fv}: non-constant fixef shift"
        shifts.append(float(diff.mean()))
    assert abs(sum(shifts)) < 1e-7


def test_fe_poisson_2fe_cell_resident_dead_group(fe2_sdf):
    """Cell-resident tier with a dead (all-zero-outcome) FE level: drops
    out with a NULL fixef exactly as the driver tier, predict() joins it
    back as NULL fit."""
    sdf, pdf = fe2_sdf
    pdf2 = pdf.copy()
    pdf2.loc[pdf2["gcat"] == "g3", "ypois"] = 0.0
    sdf2 = sdf.sparkSession.createDataFrame(pdf2)
    with pytest.warns(UserWarning, match="cell-resident"):
        m = dbglm(
            "ypois ~ x1 + x2 | gcat + hcat", sdf2, family="poisson",
            cells_nmax=10,
        )
    m_dr = dbglm("ypois ~ x1 + x2 | gcat + hcat", sdf2, family="poisson")
    for name in ["x1", "x2"]:
        assert m.coef()[name] == pytest.approx(m_dr.coef()[name], rel=1e-8)
    fx = m.fixef().toPandas()
    dead = fx[(fx["fe_var"] == "gcat") & (fx["level"] == "g3")]
    assert len(dead) == 1 and dead["fixef"].isna().all()


@pytest.mark.slowparity
def test_fe_poisson_3fe_cell_resident_one_pass_per_sweep(fe2_sdf):
    """The cell-resident tier's inner loops run ONE grouping-sets pass per
    sweep regardless of k (k=3 here), and the damped-Jacobi sweeps land on
    the same fit as the driver tier."""
    from dbreg_spark import glm as glm_mod

    sdf, pdf = fe2_sdf
    pdf3 = pdf.assign(
        kcat="k" + ((pdf["g"] * 7 + (pdf["x2"] > 0)) % 5).astype(str)
    )
    sdf3 = sdf.sparkSession.createDataFrame(pdf3)
    with pytest.warns(UserWarning, match="cell-resident"):
        m_sp = dbglm(
            "ypois ~ x1 + x2 | gcat + hcat + kcat", sdf3, family="poisson",
            cells_nmax=10,
        )
    stats = glm_mod._KFE_PASS_STATS
    assert stats["lambda_passes"] == stats["lambda_sweeps"]
    assert stats["corr_passes"] == stats["corr_sweeps"]
    m_dr = dbglm(
        "ypois ~ x1 + x2 | gcat + hcat + kcat", sdf3, family="poisson"
    )
    for name in ["x1", "x2"]:
        assert m_sp.coef()[name] == pytest.approx(m_dr.coef()[name], rel=1e-8)
        assert m_sp.se()[name] == pytest.approx(m_dr.se()[name], rel=1e-7)
    assert m_sp.loglik == pytest.approx(m_dr.loglik, rel=1e-10)


def test_glm_dk_lag0_equals_cluster_by_time(glm_df, glm_pdf):
    """DK with lag 0 must reproduce cluster-by-time exactly, and the
    NW-weighted meat must match a dense numpy oracle at lag 2."""
    m0 = dbglm("ybin ~ x1 + x2", glm_df, family="binomial",
               vcov="dk ~ g", hac_lag=0)
    mc = dbglm("ybin ~ x1 + x2", glm_df, family="binomial", vcov="~g")
    np.testing.assert_allclose(m0.vcov_, mc.vcov_, rtol=1e-10)

    m2 = dbglm("ybin ~ x1 + x2", glm_df, family="binomial",
               vcov="dk ~ g", hac_lag=2)
    beta = m2.coef().to_numpy()
    X = _X(glm_pdf, ["x1", "x2"])
    mu = 1.0 / (1.0 + np.exp(-(X @ beta)))
    s = glm_pdf["ybin"].to_numpy() - mu
    t = glm_pdf["g"].to_numpy()
    T = int(t.max()) + 1
    S = np.zeros((T, 3))
    for ti in range(T):
        S[ti] = X[t == ti].T @ s[t == ti]
    meat = S.T @ S
    for ell in (1, 2):
        w = 1.0 - ell / 3.0
        Gm = S[ell:].T @ S[:-ell]
        meat += w * (Gm + Gm.T)
    W = mu * (1 - mu)
    A = X.T @ (X * W[:, None])
    Ainv = np.linalg.inv(A)
    n, p = X.shape
    V = (T / (T - 1)) * (n / (n - p)) * (Ainv @ meat @ Ainv)
    np.testing.assert_allclose(m2.vcov_, V, rtol=1e-8)


def test_fepois_dk_lag0_equals_cluster_by_time(fe2_sdf):
    """Driscoll-Kraay over profiled scores, both FE tiers: lag 0 must
    reproduce cluster-by-time exactly (the NW lag weighting itself is
    oracle-pinned via nw_combine at the dbreg level)."""
    sdf, pdf = fe2_sdf
    a = dbglm("ypois ~ x1 + x2 | gcat", sdf, family="poisson",
              vcov="dk ~ g", hac_lag=0)
    b = dbglm("ypois ~ x1 + x2 | gcat", sdf, family="poisson", vcov="~g")
    np.testing.assert_allclose(a.vcov_, b.vcov_, rtol=1e-10)
    c = dbglm("ypois ~ x1 + x2 | gcat + hcat", sdf, family="poisson",
              vcov="dk ~ g", hac_lag=0)
    d = dbglm("ypois ~ x1 + x2 | gcat + hcat", sdf, family="poisson",
              vcov="~g")
    np.testing.assert_allclose(c.vcov_, d.vcov_, rtol=1e-10)
    # a longer lag changes (typically widens) the SEs but stays finite
    e = dbglm("ypois ~ x1 + x2 | gcat", sdf, family="poisson",
              vcov="dk ~ g", hac_lag=3)
    assert np.isfinite(e.se().to_numpy()).all()
