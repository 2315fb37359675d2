"""Negative-binomial (NB2) GLM: fixed-theta IRLS parity vs an independent
numpy reference, full-loglik (lgamma histogram) parity, model-based /
HC1 / CR1 / DK sandwiches vs dense score oracles, the two-step
Cameron-Trivedi theta estimator, and refusals."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from dbreg_spark import dbglm

N = 3000
THETA = 2.5


@pytest.fixture(scope="module")
def nb(spark):
    rng = np.random.default_rng(11)
    x1 = rng.normal(size=N)
    x2 = rng.uniform(size=N)
    eta = 0.5 + 0.8 * x1 - 1.2 * x2
    mu = np.exp(eta)
    lam = rng.gamma(2.0, mu / 2.0)
    y = rng.poisson(lam).astype(float)
    g = rng.integers(0, 15, N)
    t = rng.integers(0, 12, N)
    w = rng.uniform(0.5, 2.0, N)
    pdf = pd.DataFrame(
        dict(y=y, x1=x1, x2=x2, g=g.astype("int32"), t=t.astype("int32"), w=w)
    )
    return spark.createDataFrame(pdf), pdf


def _nb_irls(X, y, th, w=None, iters=60):
    w = np.ones(len(y)) if w is None else w
    b = np.zeros(X.shape[1])
    for _ in range(iters):
        eta = X @ b
        m = np.exp(eta)
        ww = w * m * th / (th + m)
        z = eta + (y - m) / m
        bn = np.linalg.solve(X.T @ (ww[:, None] * X), X.T @ (ww * z))
        if np.max(np.abs(bn - b)) < 1e-13:
            return bn
        b = bn
    return b


def test_negbin_fixed_theta_matches_numpy(nb):
    df, pdf = nb
    X = np.column_stack([np.ones(N), pdf.x1, pdf.x2])
    bref = _nb_irls(X, pdf.y.values, THETA)
    m = dbglm("y ~ x1 + x2", df, family="negbin", theta=THETA, vcov="iid")
    np.testing.assert_allclose(
        m.coeftable["estimate"].values, bref, rtol=1e-6
    )
    # model-based vcov = inverse Fisher information at beta-hat
    mh = np.exp(X @ bref)
    wh = mh * THETA / (THETA + mh)
    V = np.linalg.inv(X.T @ (wh[:, None] * X))
    np.testing.assert_allclose(
        m.coeftable["std.error"].values, np.sqrt(np.diag(V)), rtol=1e-5
    )
    # reported loglik includes the lgamma terms (y-histogram pass)
    ll = sum(
        math.lgamma(yi + THETA) - math.lgamma(THETA) - math.lgamma(yi + 1.0)
        + THETA * math.log(THETA) + yi * math.log(mi)
        - (yi + THETA) * math.log(THETA + mi)
        for yi, mi in zip(pdf.y.values, mh)
    )
    np.testing.assert_allclose(m.loglik, ll, rtol=1e-8)
    assert m.deviance > 0 and m.null_deviance > m.deviance


def test_negbin_sandwiches_match_dense(nb):
    df, pdf = nb
    X = np.column_stack([np.ones(N), pdf.x1, pdf.x2])
    b = _nb_irls(X, pdf.y.values, THETA)
    mh = np.exp(X @ b)
    wh = mh * THETA / (THETA + mh)
    A_inv = np.linalg.inv(X.T @ (wh[:, None] * X))
    # non-canonical-link score: s = theta (y - mu) / (theta + mu)
    s = THETA * (pdf.y.values - mh) / (THETA + mh)
    S = s[:, None] * X
    p = 3

    mh1 = dbglm("y ~ x1 + x2", df, family="negbin", theta=THETA, vcov="hc1")
    Vh = (N / (N - p)) * A_inv @ (S.T @ S) @ A_inv
    np.testing.assert_allclose(
        mh1.coeftable["std.error"].values, np.sqrt(np.diag(Vh)), rtol=1e-5
    )

    mcl = dbglm("y ~ x1 + x2", df, family="negbin", theta=THETA, vcov="~ g")
    G = pdf.g.nunique()
    Sg = np.vstack([S[pdf.g.values == gi].sum(0) for gi in sorted(pdf.g.unique())])
    Vc = (G / (G - 1)) * (N / (N - p)) * A_inv @ (Sg.T @ Sg) @ A_inv
    np.testing.assert_allclose(
        mcl.coeftable["std.error"].values, np.sqrt(np.diag(Vc)), rtol=1e-5
    )


def test_negbin_dk_lag0_equals_cluster_by_time(nb):
    df, _ = nb
    a = dbglm("y ~ x1 + x2", df, family="negbin", theta=THETA,
              vcov="dk ~ t", hac_lag=0)
    b = dbglm("y ~ x1 + x2", df, family="negbin", theta=THETA, vcov="~ t")
    np.testing.assert_allclose(
        a.coeftable["std.error"].values,
        b.coeftable["std.error"].values,
        rtol=1e-10,
    )


def test_negbin_weighted(nb):
    df, pdf = nb
    X = np.column_stack([np.ones(N), pdf.x1, pdf.x2])
    bref = _nb_irls(X, pdf.y.values, THETA, w=pdf.w.values)
    m = dbglm("y ~ x1 + x2", df, family="negbin", theta=THETA,
              weights="w", vcov="iid")
    np.testing.assert_allclose(
        m.coeftable["estimate"].values, bref, rtol=1e-6
    )


def test_negbin_two_step_theta(nb):
    df, pdf = nb
    m = dbglm("y ~ x1 + x2", df, family="negbin")
    assert m.family.startswith("negbin(theta=")
    th = float(m.family[len("negbin(theta="):-1])
    # Cameron-Trivedi moment oracle at the poisson mu-hat
    X = np.column_stack([np.ones(N), pdf.x1, pdf.x2])
    bp = np.zeros(3)
    for _ in range(50):
        mu = np.exp(X @ bp)
        z = X @ bp + (pdf.y.values - mu) / mu
        bn = np.linalg.solve(X.T @ (mu[:, None] * X), X.T @ (mu * z))
        if np.max(np.abs(bn - bp)) < 1e-13:
            bp = bn
            break
        bp = bn
    mu = np.exp(X @ bp)
    alpha = np.sum((pdf.y.values - mu) ** 2 - mu) / np.sum(mu**2)
    np.testing.assert_allclose(th, 1.0 / alpha, rtol=1e-6)
    # refit at the estimated theta reproduces the model exactly
    m2 = dbglm("y ~ x1 + x2", df, family="negbin", theta=th)
    np.testing.assert_allclose(
        m.coeftable["estimate"].values,
        m2.coeftable["estimate"].values,
        rtol=1e-12,
    )


def test_negbin_poisson_limit(nb):
    """theta -> infinity degenerates to poisson (same IRLS fixed point)."""
    df, _ = nb
    m = dbglm("y ~ x1 + x2", df, family="negbin", theta=1e9)
    p = dbglm("y ~ x1 + x2", df, family="poisson")
    np.testing.assert_allclose(
        m.coeftable["estimate"].values,
        p.coeftable["estimate"].values,
        rtol=1e-6,
    )


def test_negbin_save_load_roundtrip(nb, tmp_path):
    df, _ = nb
    import pyspark.sql.functions as F

    m = dbglm("y ~ x1 + x2", df, family="negbin", theta=THETA)
    path = str(tmp_path / "nbmodel")
    m.save(path)
    from dbreg_spark.model import load_any_model

    m2 = load_any_model(path, spark=df.sparkSession)
    assert m2.family == m.family
    a = m.predict(df).agg(F.sum("fit")).collect()[0][0]
    b = m2.predict(df).agg(F.sum("fit")).collect()[0][0]
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_negbin_refusals(nb, spark):
    df, _ = nb
    with pytest.raises(ValueError, match="theta must be > 0"):
        dbglm("y ~ x1", df, family="negbin", theta=-1.0)
    with pytest.raises(ValueError, match="theta= applies"):
        dbglm("y ~ x1", df, family="poisson", theta=2.0)
    neg = spark.createDataFrame(
        [(-1.0, 1.0), (2.0, 2.0), (3.0, 0.5), (1.0, 1.5)], "y double, x1 double"
    )
    with pytest.raises(ValueError, match="non-negative"):
        dbglm("y ~ x1", neg, family="negbin", theta=2.0)
    # underdispersed (binary-ish) data: the two-step alpha-hat <= 0 raises
    under = spark.createDataFrame(
        [(float(i % 2), float(i)) for i in range(40)], "y double, x1 double"
    )
    with pytest.raises(ValueError, match="overdispersion"):
        dbglm("y ~ x1", under, family="negbin")
    from dbreg_spark import dbglm_split, wild_score_bootstrap

    with pytest.raises(NotImplementedError, match="negbin"):
        dbglm_split("y ~ x1", df, split="g", family="negbin")
    with pytest.raises(NotImplementedError, match="negbin"):
        wild_score_bootstrap("y ~ x1", df, param="x1", cluster="~ g",
                             family="negbin")


def test_negbin_ml_theta_matches_profile_oracle(nb):
    """theta='ml' (full profile ML) vs an independent derivative-free
    oracle: golden-section over ln(theta) with a fresh numpy IRLS beta at
    every candidate, exact lgamma loglik."""
    df, pdf = nb
    m = dbglm("y ~ x1 + x2", df, family="negbin", theta="ml")
    th_hat = float(m.family[len("negbin(theta="):-1])

    X = np.column_stack([np.ones(N), pdf.x1, pdf.x2])
    y = pdf.y.values

    def prof_ll(th):
        b = _nb_irls(X, y, th)
        mu = np.exp(X @ b)
        return sum(
            math.lgamma(yi + th) - math.lgamma(th) - math.lgamma(yi + 1.0)
            + th * math.log(th) + yi * math.log(mi)
            - (yi + th) * math.log(th + mi)
            for yi, mi in zip(y, mu)
        )

    lo, hi = math.log(0.2), math.log(50.0)
    gr = (math.sqrt(5) - 1) / 2
    c = hi - gr * (hi - lo)
    d = lo + gr * (hi - lo)
    fc, fd = prof_ll(math.exp(c)), prof_ll(math.exp(d))
    for _ in range(50):
        if fc > fd:
            hi, d, fd = d, c, fc
            c = hi - gr * (hi - lo)
            fc = prof_ll(math.exp(c))
        else:
            lo, c, fc = c, d, fd
            d = lo + gr * (hi - lo)
            fd = prof_ll(math.exp(d))
    th_star = math.exp((lo + hi) / 2)
    np.testing.assert_allclose(th_hat, th_star, rtol=5e-4)
    b_star = _nb_irls(X, y, th_star)
    np.testing.assert_allclose(
        m.coeftable["estimate"].values, b_star, rtol=1e-5
    )
    with pytest.raises(ValueError, match="positive float"):
        dbglm("y ~ x1", df, family="negbin", theta="mle-ish")


def test_negbin_ml_theta_null_regressors_use_fit_sample(nb, spark):
    """ML theta's lgamma histogram must come from the complete-case fit
    sample, not the raw source: rows with NULL x are excluded from both
    the distributed S(theta) term and the driver constant."""
    df, pdf = nb
    # poison 15% of x1 with NULLs; the ml fit on the poisoned frame must
    # equal the ml fit on the pre-filtered complete-case frame
    import pyspark.sql.functions as F

    poisoned = df.withColumn(
        "x1", F.when(F.col("g") % 7 == 0, F.lit(None)).otherwise(F.col("x1"))
    )
    complete = poisoned.where(F.col("x1").isNotNull())
    m_p = dbglm("y ~ x1 + x2", poisoned, family="negbin", theta="ml")
    m_c = dbglm("y ~ x1 + x2", complete, family="negbin", theta="ml")
    th_p = float(m_p.family[len("negbin(theta="):-1])
    th_c = float(m_c.family[len("negbin(theta="):-1])
    np.testing.assert_allclose(th_p, th_c, rtol=1e-6)
    np.testing.assert_allclose(
        m_p.coeftable["estimate"].values,
        m_c.coeftable["estimate"].values, rtol=1e-10,
    )


def test_negbin_profile_search_escapes_bad_seed(nb):
    """The grid search re-centers at the bracket edge instead of
    shrinking, so a seed 1000x off still reaches the profile optimum."""
    from dbreg_spark.glm import _negbin_profile_theta

    df, _ = nb
    m = dbglm("y ~ x1 + x2", df, family="negbin", theta="ml")
    th_star = float(m.family[len("negbin(theta="):-1])
    th_lo, _h = _negbin_profile_theta(m, df, None, th_star / 1000.0)
    th_hi, _h = _negbin_profile_theta(m, df, None, th_star * 1000.0)
    np.testing.assert_allclose(th_lo, th_star, rtol=2e-3)
    np.testing.assert_allclose(th_hi, th_star, rtol=2e-3)
