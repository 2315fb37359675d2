"""HC2/HC3 leverage-corrected sandwiches: parity vs dense numpy oracles
computing the FULL (LSDV) hat-matrix leverage — including the weighted
and 1-absorbed-FE cases, where the engine uses the exact orthogonal
decomposition h = w/W_g + within-quadratic-form."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from dbreg_spark import dbreg

N = 1500


@pytest.fixture(scope="module")
def hdata(spark):
    rng = np.random.default_rng(9)
    x1 = rng.normal(size=N)
    x2 = rng.uniform(size=N)
    g = rng.integers(0, 12, N)
    w = rng.uniform(0.5, 2.0, N)
    y = 1.0 + 2.0 * x1 - x2 + 0.3 * g + rng.normal(size=N) * (1 + 0.5 * np.abs(x1))
    pdf = pd.DataFrame(dict(y=y, x1=x1, x2=x2, g=g.astype("int32"), w=w))
    return spark.createDataFrame(pdf), pdf


def _oracle(A, y, k, w=None):
    """WLS HC2/HC3 sandwich over design A; returns (beta, V)."""
    W = np.ones(len(y)) if w is None else w
    AW = A * W[:, None]
    G = A.T @ AW
    Gi = np.linalg.inv(G)
    b = Gi @ (AW.T @ y)
    u = y - A @ b
    h = W * np.einsum("ij,jk,ik->i", A, Gi, A)
    psi2 = (W * u) ** 2 / (1 - h) ** k
    M = (A * psi2[:, None]).T @ A
    return b, Gi @ M @ Gi


@pytest.mark.parametrize("kind,k", [("hc2", 1), ("hc3", 2)])
def test_hck_moments_matches_numpy(hdata, kind, k):
    df, pdf = hdata
    m = dbreg("y ~ x1 + x2", df, strategy="moments", vcov=kind)
    A = np.column_stack([np.ones(N), pdf.x1, pdf.x2])
    b, V = _oracle(A, pdf.y.values, k)
    np.testing.assert_allclose(
        m.coeftable["estimate"].values, b, rtol=1e-9
    )
    np.testing.assert_allclose(
        m.coeftable["std.error"].values, np.sqrt(np.diag(V)), rtol=1e-8
    )
    # HC3 >= HC2 >= ... elementwise on this heteroskedastic design
    m1 = dbreg("y ~ x1 + x2", df, strategy="moments", vcov="hc1")
    if kind == "hc3":
        assert (
            m.coeftable["std.error"].values
            >= m1.coeftable["std.error"].values * 0.999
        ).all()


@pytest.mark.parametrize("kind,k", [("hc2", 1), ("hc3", 2)])
def test_hck_weighted_matches_numpy(hdata, kind, k):
    df, pdf = hdata
    m = dbreg(
        "y ~ x1 + x2", df, strategy="moments", vcov=kind, weights="~ w"
    )
    A = np.column_stack([np.ones(N), pdf.x1, pdf.x2])
    b, V = _oracle(A, pdf.y.values, k, w=pdf.w.values)
    np.testing.assert_allclose(m.coeftable["estimate"].values, b, rtol=1e-9)
    np.testing.assert_allclose(
        m.coeftable["std.error"].values, np.sqrt(np.diag(V)), rtol=1e-8
    )


@pytest.mark.parametrize("kind,k", [("hc2", 1), ("hc3", 2)])
def test_hck_one_fe_matches_lsdv_oracle(hdata, kind, k):
    """1 absorbed FE: the engine's h = 1/n_g + within form must equal the
    FULL LSDV hat-matrix leverage — oracle builds the dummies explicitly
    and slices the X block of the LSDV sandwich."""
    df, pdf = hdata
    m = dbreg("y ~ x1 + x2 | g", df, strategy="demean", vcov=kind)
    D = pd.get_dummies(pdf.g).to_numpy(dtype=float)
    A = np.column_stack([D, pdf.x1, pdf.x2])
    _b, V = _oracle(A, pdf.y.values, k)
    sl = slice(D.shape[1], D.shape[1] + 2)
    np.testing.assert_allclose(
        m.coeftable["std.error"].values,
        np.sqrt(np.diag(V[sl, sl])), rtol=1e-8,
    )


@pytest.mark.parametrize("kind,k", [("hc2", 1)])
def test_hck_weighted_one_fe_matches_lsdv_oracle(hdata, kind, k):
    df, pdf = hdata
    m = dbreg(
        "y ~ x1 + x2 | g", df, strategy="demean", vcov=kind, weights="~ w"
    )
    D = pd.get_dummies(pdf.g).to_numpy(dtype=float)
    A = np.column_stack([D, pdf.x1, pdf.x2])
    _b, V = _oracle(A, pdf.y.values, k, w=pdf.w.values)
    sl = slice(D.shape[1], D.shape[1] + 2)
    np.testing.assert_allclose(
        m.coeftable["std.error"].values,
        np.sqrt(np.diag(V[sl, sl])), rtol=1e-8,
    )


def test_hck_refusals(hdata):
    df, _ = hdata
    with pytest.raises(NotImplementedError, match="ONE fixed effect"):
        dbreg("y ~ x1 | g + x2", df, vcov="hc2")
    with pytest.raises(NotImplementedError, match="row-level leverage"):
        dbreg("y ~ x1 | g", df, strategy="compress", vcov="hc3")


@pytest.fixture(scope="module")
def gdata_hck(spark):
    rng = np.random.default_rng(17)
    n = 1800
    x1 = rng.normal(size=n)
    x2 = rng.uniform(size=n)
    w = rng.uniform(0.5, 2.0, n)
    eta = -0.5 + 0.8 * x1 - 0.6 * x2
    yb = (rng.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(float)
    yp = rng.poisson(np.exp(0.2 + 0.4 * x1 + 0.3 * x2)).astype(float)
    pdf = pd.DataFrame(dict(yb=yb, yp=yp, x1=x1, x2=x2, w=w))
    return spark.createDataFrame(pdf), pdf


def _glm_oracle_hck(A, y, family, k, w=None):
    W0 = np.ones(len(y)) if w is None else w
    b = np.zeros(A.shape[1])
    for _ in range(60):
        eta = A @ b
        if family == "binomial":
            mu = 1 / (1 + np.exp(-eta)); wi = mu * (1 - mu)
        else:
            mu = np.exp(eta); wi = mu
        z = eta + (y - mu) / np.maximum(wi, 1e-12)
        ww = W0 * wi
        b = np.linalg.solve(A.T @ (A * ww[:, None]), A.T @ (ww * z))
    eta = A @ b
    if family == "binomial":
        mu = 1 / (1 + np.exp(-eta)); wi = mu * (1 - mu)
    else:
        mu = np.exp(eta); wi = mu
    ww = W0 * wi
    Gi = np.linalg.inv(A.T @ (A * ww[:, None]))
    h = ww * np.einsum("ij,jk,ik->i", A, Gi, A)
    s = W0 * (y - mu)
    psi2 = s * s / (1 - h) ** k
    M = (A * psi2[:, None]).T @ A
    return b, Gi @ M @ Gi


@pytest.mark.parametrize(
    "kind,k,fam,ycol,wcol",
    [
        ("hc2", 1, "binomial", "yb", None),
        ("hc3", 2, "binomial", "yb", None),
        ("hc2", 1, "poisson", "yp", "w"),
        ("hc3", 2, "poisson", "yp", None),
    ],
)
def test_glm_hck_matches_numpy(gdata_hck, kind, k, fam, ycol, wcol):
    from dbreg_spark import dbglm

    df, pdf = gdata_hck
    m = dbglm(
        f"{ycol} ~ x1 + x2", df, family=fam, vcov=kind, weights=wcol,
    )
    A = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    b, V = _glm_oracle_hck(
        A, pdf[ycol].values, fam, k,
        w=pdf[wcol].values if wcol else None,
    )
    np.testing.assert_allclose(m.coeftable["estimate"].values, b, rtol=1e-7)
    np.testing.assert_allclose(
        m.coeftable["std.error"].values, np.sqrt(np.diag(V)), rtol=1e-6
    )


def test_glm_hck_fe_refused(gdata_hck):
    from dbreg_spark import dbglm

    df, _ = gdata_hck
    df2 = df.withColumn("f", (F.col("x2") * 3).cast("int"))
    with pytest.raises(NotImplementedError, match="absorbed FEs"):
        dbglm("yp ~ x1 | f", df2, family="poisson", vcov="hc2")


def test_glm_predict_se_and_ci_match_numpy(gdata_hck):
    """GlmModel.predict(se_fit=True, interval='confidence'): link-scale
    x'Vx delta SEs and monotone-transformed response CIs vs a numpy
    oracle at the fitted vcov."""
    from dbreg_spark import dbglm
    from dbreg_spark.stats import norm_ppf

    df, pdf = gdata_hck
    m = dbglm("yb ~ x1 + x2", df, family="binomial", vcov="hc1")
    out = (
        m.predict(df, type="response", se_fit=True, interval="confidence")
        .select("x1", "x2", "fit", "se_fit", "lwr", "upr")
        .toPandas()
        .sort_values(["x1", "x2"])
        .reset_index(drop=True)
    )
    b = m.coeftable["estimate"].values
    V = np.asarray(m.vcov_)
    A = np.column_stack(
        [np.ones(len(out)), out.x1.values, out.x2.values]
    )
    eta = A @ b
    mu = 1 / (1 + np.exp(-eta))
    se_eta = np.sqrt(np.einsum("ij,jk,ik->i", A, V, A))
    np.testing.assert_allclose(out.fit.values, mu, rtol=1e-9)
    np.testing.assert_allclose(
        out.se_fit.values, mu * (1 - mu) * se_eta, rtol=1e-7
    )
    z = norm_ppf(0.975)
    np.testing.assert_allclose(
        out.lwr.values, 1 / (1 + np.exp(-(eta - z * se_eta))), rtol=1e-7
    )
    assert (out.lwr >= 0).all() and (out.upr <= 1).all()

    mp = dbglm("yp ~ x1", df, family="poisson")
    op = mp.predict(df, se_fit=True).select("fit", "se_fit").toPandas()
    assert (op.se_fit > 0).all()
    with pytest.raises(ValueError, match="interval"):
        m.predict(df, interval="prediction")


def test_split_hck_batched_matches_per_level(hdata):
    """dbreg_split(vcov='hc2'/'hc3'): per-level leverage-corrected meats
    from ONE grouped pass (betas AND kept inverse-Grams broadcast) match
    per-level dbreg fits, moments and 1-FE demean."""
    from dbreg_spark.split import dbreg_split

    df, pdf = hdata
    df2 = df.withColumn("grp", (F.col("g") % 2).cast("int"))
    for kind in ("hc2", "hc3"):
        sp = dbreg_split("y ~ x1 + x2", df2, split="grp", vcov=kind)
        for lvl in (0, 1):
            o = dbreg(
                "y ~ x1 + x2", df2.where(F.col("grp") == lvl), vcov=kind
            )
            np.testing.assert_allclose(
                sp[lvl].coeftable["std.error"].values,
                o.coeftable["std.error"].values, rtol=1e-8,
            )
    # 1-FE demean + weights
    sp = dbreg_split(
        "y ~ x1 + x2 | g", df2, split="grp", strategy="demean",
        vcov="hc2", weights="~ w",
    )
    for lvl in (0, 1):
        o = dbreg(
            "y ~ x1 + x2 | g", df2.where(F.col("grp") == lvl),
            strategy="demean", vcov="hc2", weights="~ w",
        )
        np.testing.assert_allclose(
            sp[lvl].coeftable["std.error"].values,
            o.coeftable["std.error"].values, rtol=1e-8,
        )
    with pytest.raises(NotImplementedError, match="ONE fixed"):
        dbreg_split("y ~ x1 | g + x2", df2, split="grp", vcov="hc3")


def test_multi_hck_batched_matches_per_model(hdata):
    """dbreg_multi(vcov='hc2'/'hc3'): every submodel's leverage-corrected
    meat (literal per-model inverse-Grams) from ONE batched pass matches
    per-model dbreg — moments and 1-FE demean."""
    from dbreg_spark.multi import dbreg_multi

    df, pdf = hdata
    for kind in ("hc2", "hc3"):
        mm = dbreg_multi("y ~ sw(x1, x2)", df, vcov=kind)
        assert mm.n_passes == 2
        for (yv, step), m in mm.models.items():
            o = dbreg(f"{yv} ~ {step}", df, vcov=kind)
            np.testing.assert_allclose(
                m.coeftable["std.error"].values,
                o.coeftable["std.error"].values, rtol=1e-8,
            )
    mm = dbreg_multi("y ~ csw(x1, x2) | g", df, vcov="hc2")
    for (yv, step), m in mm.models.items():
        o = dbreg(f"{yv} ~ {step} | g", df, strategy="demean", vcov="hc2")
        np.testing.assert_allclose(
            m.coeftable["std.error"].values,
            o.coeftable["std.error"].values, rtol=1e-8,
        )
    with pytest.raises(NotImplementedError, match="ONE fixed"):
        dbreg_multi("y ~ sw(x1, x2) | g + w", df, vcov="hc3")


def test_multi_hck_weighted_matches_per_model(hdata):
    """dbreg_multi(vcov='hc2'/'hc3', weights=...): the shared residual
    projection must carry the weight column (regression: the batched
    leverage references it by name) — parity vs per-model dbreg on
    moments and 1-FE demean."""
    from dbreg_spark.multi import dbreg_multi

    df, _ = hdata
    for kind in ("hc2", "hc3"):
        mm = dbreg_multi("y ~ sw(x1, x2)", df, vcov=kind, weights="~ w")
        for (yv, step), m in mm.models.items():
            o = dbreg(f"{yv} ~ {step}", df, vcov=kind, weights="~ w")
            np.testing.assert_allclose(
                m.coeftable["std.error"].values,
                o.coeftable["std.error"].values, rtol=1e-8,
            )
    mm = dbreg_multi("y ~ csw(x1, x2) | g", df, vcov="hc3", weights="~ w")
    for (yv, step), m in mm.models.items():
        o = dbreg(
            f"{yv} ~ {step} | g", df, strategy="demean", vcov="hc3",
            weights="~ w",
        )
        np.testing.assert_allclose(
            m.coeftable["std.error"].values,
            o.coeftable["std.error"].values, rtol=1e-8,
        )
