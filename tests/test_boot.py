"""Wild cluster bootstrap: exact parity with an independent brute-force
bootstrap (explicit per-draw refits in numpy over enumerated Rademacher
weights), plus statistical sanity on a many-cluster DGP."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dbreg_spark import wild_cluster_bootstrap


def _gen(seed=5, n=600, G=6):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, G, n)
    x = rng.normal(size=n) + 0.6 * rng.normal(size=G)[g]
    u = rng.normal(size=n) + rng.normal(size=G)[g]  # clustered errors
    y = 1.0 + 0.5 * x + u
    return pd.DataFrame({"y": y, "x": x, "g": g.astype(np.int64)})


def _brute_force(pdf, param_beta, impose_null, weights_matrix):
    """Explicit WCR/WCU bootstrap: per draw, rebuild y*, refit OLS, compute
    the CR1 t — the definitionally-correct reference implementation."""
    X = np.column_stack([np.ones(len(pdf)), pdf["x"].to_numpy()])
    y = pdf["y"].to_numpy()
    g = pdf["g"].to_numpy()
    G = int(g.max()) + 1
    n, p = X.shape
    R = np.array([0.0, 1.0])

    def cr1_t(Xm, ym, bta, ref):
        u = ym - Xm @ bta
        meat = np.zeros((p, p))
        for gi in range(G):
            s = Xm[g == gi].T @ u[g == gi]
            meat += np.outer(s, s)
        Ainv = np.linalg.inv(Xm.T @ Xm)
        # package CR1 convention (solve.py): G/(G−1) · n/(n−k); the
        # Stata/boottest (n−1)/(n−k) variant gives identical p-values
        V = (G / (G - 1)) * (n / (n - p)) * (Ainv @ meat @ Ainv)
        return float(R @ (bta - ref)) / float(np.sqrt(R @ V @ R))

    A = X.T @ X
    beta = np.linalg.solve(A, X.T @ y)
    if impose_null:
        Ainv = np.linalg.inv(A)
        RA = Ainv @ R
        beta_c = beta - RA * ((R @ beta - param_beta) / (R @ RA))
    else:
        beta_c = beta
    u_c = y - X @ beta_c
    ts = []
    for w in weights_matrix:
        y_star = X @ beta_c + w[g] * u_c
        b_star = np.linalg.solve(A, X.T @ y_star)
        ts.append(cr1_t(X, y_star, b_star, beta_c))
    return np.array(ts)


def test_matches_brute_force_enumerated(spark):
    """G=6 → 64 enumerated Rademacher draws: the one-pass algebraic
    bootstrap must reproduce the explicit refit-per-draw t* distribution
    to machine precision, both WCR and WCU."""
    pdf = _gen()
    df = spark.createDataFrame(pdf)
    for impose_null in (True, False):
        res = wild_cluster_bootstrap(
            "y ~ x", df, cluster="g", param="x", B=9999,
            impose_null=impose_null,
        )
        assert res["enumerated"] and res["B"] == 64 and res["G"] == 6
        ks = np.arange(64, dtype=np.uint64)
        W = ((ks[:, None] >> np.arange(6, dtype=np.uint64)) & 1).astype(
            float
        ) * 2.0 - 1.0
        t_ref = _brute_force(pdf, 0.0, impose_null, W)
        p_ref = float(np.mean(np.abs(t_ref) >= abs(res["t"]) - 1e-12))
        assert res["p_value"] == pytest.approx(p_ref, abs=1e-12)
        # the reported analytic t must match the brute-force CR1 t at β̂
        X = np.column_stack([np.ones(len(pdf)), pdf["x"].to_numpy()])
        y = pdf["y"].to_numpy()
        beta = np.linalg.solve(X.T @ X, X.T @ y)
        assert res["estimate"] == pytest.approx(beta[1], rel=1e-10)


def test_bootstrap_p_close_to_analytic_many_clusters(spark):
    """With 40 clusters the bootstrap and analytic CR1 inference should
    broadly agree (both asymptotically valid); also checks CI ordering and
    seed reproducibility."""
    pdf = _gen(seed=11, n=4000, G=40)
    df = spark.createDataFrame(pdf)
    res = wild_cluster_bootstrap(
        "y ~ x", df, cluster="g", param="x", B=999, seed=7
    )
    res2 = wild_cluster_bootstrap(
        "y ~ x", df, cluster="g", param="x", B=999, seed=7
    )
    assert res == res2  # seeded: fully reproducible
    assert 0.0 <= res["p_value"] <= 1.0
    assert res["conf_low"] < res["estimate"] < res["conf_high"]
    # true slope 0.5 with se ~0.05: strongly significant both ways
    assert res["p_value"] < 0.05 and abs(res["t"]) > 3


def test_hypothesis_string_and_weights_variants(spark):
    pdf = _gen(seed=3, n=800, G=8)
    df = spark.createDataFrame(pdf)
    # "x = 0.5" near the truth: should NOT reject
    res = wild_cluster_bootstrap(
        "y ~ x", df, cluster="g", param="x = 0.5", B=4095
    )
    assert res["p_value"] > 0.05
    for w in ("webb", "mammen"):
        r = wild_cluster_bootstrap(
            "y ~ x", df, cluster="g", param="x", B=499, weights=w
        )
        assert 0.0 <= r["p_value"] <= 1.0 and not r["enumerated"]


def test_refusals(spark):
    pdf = _gen()
    # an FE whose levels span multiple clusters cannot be absorbed — the
    # fallback carries it as explicit dummies UP TO the level cap; past
    # the cap the refusal fires naming the FE
    rng = np.random.default_rng(8)
    pdf["f_span"] = np.arange(len(pdf)) % 250  # 250 levels > cap of 200
    df = spark.createDataFrame(pdf)
    with pytest.raises(NotImplementedError, match="f_span"):
        wild_cluster_bootstrap("y ~ x | f_span", df, cluster="g", param="x")
    with pytest.raises(ValueError, match="weights"):
        wild_cluster_bootstrap(
            "y ~ x", df, cluster="g", param="x", weights="bogus"
        )
    with pytest.raises(ValueError, match="at least 99"):
        wild_cluster_bootstrap("y ~ x", df, cluster="g", param="x", B=10)


def test_weighted_matches_brute_force(spark):
    """WLS wild bootstrap: the per-cluster blocks carry Σw-weighted sums;
    parity vs an explicit sqrt(w)-scaled refit-per-draw bootstrap."""
    pdf = _gen(seed=9, n=400, G=5)
    rng = np.random.default_rng(2)
    pdf["w"] = rng.uniform(0.5, 2.0, len(pdf))
    df = spark.createDataFrame(pdf)
    res = wild_cluster_bootstrap(
        "y ~ x", df, cluster="g", param="x", B=9999, obs_weights="w"
    )
    assert res["enumerated"] and res["B"] == 32

    # brute force in the sqrt(w)-transformed space (WLS == OLS on scaled
    # data; scores w*u*x match the engine's weighted blocks)
    sw = np.sqrt(pdf["w"].to_numpy())
    X = np.column_stack([np.ones(len(pdf)), pdf["x"].to_numpy()]) * sw[:, None]
    y = pdf["y"].to_numpy() * sw
    g = pdf["g"].to_numpy()
    G, n, p = 5, len(pdf), 2
    R = np.array([0.0, 1.0])
    A = X.T @ X
    Ainv = np.linalg.inv(A)
    beta = np.linalg.solve(A, X.T @ y)
    n_w = float(pdf["w"].sum())  # engine convention: n = Σw under weights
    RA = Ainv @ R
    beta_c = beta - RA * (R @ beta) / (R @ RA)
    u_c = y - X @ beta_c
    ks = np.arange(32, dtype=np.uint64)
    W = ((ks[:, None] >> np.arange(5, dtype=np.uint64)) & 1).astype(float) * 2 - 1
    ts = []
    for w in W:
        y_star = X @ beta_c + w[g] * u_c
        b_star = np.linalg.solve(A, X.T @ y_star)
        u_star = y_star - X @ b_star
        meat = np.zeros((p, p))
        for gi in range(G):
            s = X[g == gi].T @ u_star[g == gi]
            meat += np.outer(s, s)
        V = (G / (G - 1)) * (n_w / (n_w - p)) * (Ainv @ meat @ Ainv)
        ts.append(float(R @ (b_star - beta_c)) / float(np.sqrt(R @ V @ R)))
    t_ref = np.array(ts)
    p_ref = float(np.mean(np.abs(t_ref) >= abs(res["t"]) - 1e-12))
    assert res["p_value"] == pytest.approx(p_ref, abs=1e-12)
    assert res["estimate"] == pytest.approx(beta[1], rel=1e-10)


def test_fe_matches_brute_force_dummy_model(spark):
    """Absorbed-FE bootstrap (FE nested in clusters): the demeaned-space
    algebra must equal an explicit LSDV refit-per-draw bootstrap with the
    same CR1 dof (k = p + G_fe) to machine precision."""
    pdf = _gen(seed=13, n=500, G=5)
    # a unit FE nested in the cluster: 3 units per cluster
    rng = np.random.default_rng(4)
    pdf["unit"] = pdf["g"] * 3 + rng.integers(0, 3, len(pdf))
    pdf["y"] = pdf["y"] + 0.8 * rng.normal(size=15)[pdf["unit"].to_numpy()]
    df = spark.createDataFrame(pdf)
    res = wild_cluster_bootstrap(
        "y ~ x | unit", df, cluster="g", param="x", B=9999
    )
    assert res["enumerated"] and res["B"] == 32 and res["fe"] == ["unit"]

    # explicit-dummy brute force
    g = pdf["g"].to_numpy()
    unit = pdf["unit"].to_numpy()
    n = len(pdf)
    D = np.zeros((n, 15))
    D[np.arange(n), unit] = 1.0
    X = np.column_stack([pdf["x"].to_numpy()[:, None], D])
    y = pdf["y"].to_numpy()
    G, p_x, k_par = 5, 1, 1 + 15  # x + 15 unit dummies (no intercept)
    R = np.zeros(X.shape[1]); R[0] = 1.0
    A = X.T @ X
    Ainv = np.linalg.inv(A)
    beta = np.linalg.solve(A, X.T @ y)
    RA = Ainv @ R
    beta_c = beta - RA * (R @ beta) / (R @ RA)
    u_c = y - X @ beta_c
    ks = np.arange(32, dtype=np.uint64)
    W = ((ks[:, None] >> np.arange(5, dtype=np.uint64)) & 1).astype(float) * 2 - 1
    ts = []
    for w in W:
        y_star = X @ beta_c + w[g] * u_c
        b_star = np.linalg.solve(A, X.T @ y_star)
        u_star = y_star - X @ b_star
        meat = np.zeros((X.shape[1],) * 2)
        for gi in range(G):
            s = X[g == gi].T @ u_star[g == gi]
            meat += np.outer(s, s)
        V = (G / (G - 1)) * (n / (n - k_par)) * (Ainv @ meat @ Ainv)
        ts.append(float(R @ (b_star - beta_c)) / float(np.sqrt(R @ V @ R)))
    t_ref = np.array(ts)
    p_ref = float(np.mean(np.abs(t_ref) >= abs(res["t"]) - 1e-12))
    assert res["p_value"] == pytest.approx(p_ref, abs=1e-12)
    assert res["estimate"] == pytest.approx(beta[0], rel=1e-9)
    # the analytic CR1 t itself must match the dummy model's
    u_hat = y - X @ beta
    meat = np.zeros((X.shape[1],) * 2)
    for gi in range(G):
        s = X[g == gi].T @ u_hat[g == gi]
        meat += np.outer(s, s)
    V = (G / (G - 1)) * (n / (n - k_par)) * (Ainv @ meat @ Ainv)
    assert res["t"] == pytest.approx(
        float(R @ beta) / float(np.sqrt(R @ V @ R)), rel=1e-9
    )


def test_cr3_matches_delete_one_oracle(spark):
    """VERDICT r06 #9: vcov='cr3 ~ g' — CV3 cluster jackknife from the
    per-cluster Gram blocks must equal an explicit numpy leave-one-
    cluster-out refit oracle to machine precision."""
    from dbreg_spark import dbreg

    pdf = _gen(seed=21, n=900, G=9)
    df = spark.createDataFrame(pdf)
    m = dbreg("y ~ x", df, vcov="cr3 ~ g", strategy="moments")

    X = np.column_stack([np.ones(len(pdf)), pdf["x"].to_numpy()])
    y = pdf["y"].to_numpy()
    g = pdf["g"].to_numpy()
    G = 9
    beta = np.linalg.solve(X.T @ X, X.T @ y)
    D = []
    for gi in range(G):
        keep = g != gi
        D.append(
            np.linalg.solve(X[keep].T @ X[keep], X[keep].T @ y[keep]) - beta
        )
    D = np.asarray(D)
    V_ref = ((G - 1) / G) * (D.T @ D)
    np.testing.assert_allclose(m.vcov().to_numpy(), V_ref, rtol=1e-9)
    np.testing.assert_allclose(m.coef().to_numpy(), beta, rtol=1e-10)
    assert m.n_clusters == G and m.vcov_type == "cr3"


def test_cr3_weighted_and_guards(spark):
    from dbreg_spark import dbreg

    pdf = _gen(seed=23, n=700, G=7)
    rng = np.random.default_rng(2)
    pdf["w"] = rng.uniform(0.5, 2.0, len(pdf))
    df = spark.createDataFrame(pdf)
    m = dbreg("y ~ x", df, vcov="cr3 ~ g", weights="w")

    sw = np.sqrt(pdf["w"].to_numpy())
    X = np.column_stack([np.ones(len(pdf)), pdf["x"].to_numpy()]) * sw[:, None]
    y = pdf["y"].to_numpy() * sw
    g = pdf["g"].to_numpy()
    G = 7
    beta = np.linalg.solve(X.T @ X, X.T @ y)
    D = []
    for gi in range(G):
        keep = g != gi
        D.append(
            np.linalg.solve(X[keep].T @ X[keep], X[keep].T @ y[keep]) - beta
        )
    D = np.asarray(D)
    V_ref = ((G - 1) / G) * (D.T @ D)
    np.testing.assert_allclose(m.vcov().to_numpy(), V_ref, rtol=1e-9)

    # FE = cluster is trivially nested, so cr3 now FITS it (the nested-FE
    # test pins that path); the strategy guard still refuses compress
    m_fe = dbreg("y ~ x | g", df, vcov="cr3 ~ g")
    assert m_fe.n_clusters == 7 and m_fe.vcov_type == "cr3"
    with pytest.raises(NotImplementedError, match="moments"):
        dbreg("y ~ x", df, vcov="cr3 ~ g", strategy="compress")


def test_cr3_pivotal_cluster_clear_error(spark):
    """A regressor whose variation lives in ONE cluster: leaving that
    cluster out is singular — must raise naming the cluster."""
    from dbreg_spark import dbreg

    rng = np.random.default_rng(5)
    n = 300
    pdf = pd.DataFrame(
        {"x": rng.normal(size=n), "g": rng.integers(0, 6, n)}
    )
    pdf["z"] = np.where(pdf.g == 3, rng.normal(size=n), 0.0)
    pdf["y"] = pdf.x + 0.5 * pdf.z + rng.normal(size=n)
    with pytest.raises(ValueError, match="cluster 3"):
        dbreg("y ~ x + z", spark.createDataFrame(pdf), vcov="cr3 ~ g")


def test_bootstrap_save_load_roundtrip(spark, tmp_path):
    """VERDICT r06 #8: the bootstrap result (incl. the full t* tuple)
    round-trips bit-exactly; p and CI re-derive from the saved t*."""
    from dbreg_spark.boot import load_bootstrap, save_bootstrap
    from dbreg_spark.model import load_any_model

    pdf = _gen(seed=31, n=500, G=5)
    df = spark.createDataFrame(pdf)
    res = wild_cluster_bootstrap("y ~ x", df, cluster="g", param="x", B=999)
    p = str(tmp_path / "boot_res")
    save_bootstrap(res, p)
    res2 = load_bootstrap(p)
    assert res2 == res  # bit-exact: repr round-trip of every float
    assert load_any_model(p) == res
    t_star = np.asarray(res2["t_star"])
    assert len(t_star) == res2["B"]
    p_re = float(np.mean(np.abs(t_star) >= abs(res2["t"]) - 1e-12))
    assert p_re == res2["p_value"]


def test_fe_dummy_fallback_matches_lsdv(spark):
    """VERDICT r06 #5: a non-nested FE no longer refuses — it rides as
    explicit dummies, and the result must equal the explicit LSDV
    brute-force bootstrap exactly (same shape as the nested-FE test, but
    the FE spans clusters)."""
    pdf = _gen(seed=17, n=500, G=5)
    rng = np.random.default_rng(6)
    pdf["f_span"] = rng.integers(0, 4, len(pdf))  # spans clusters
    pdf["y"] = pdf["y"] + 0.6 * rng.normal(size=4)[pdf["f_span"].to_numpy()]
    df = spark.createDataFrame(pdf)
    res = wild_cluster_bootstrap(
        "y ~ x | f_span", df, cluster="g", param="x", B=9999
    )
    assert res["enumerated"] and res["B"] == 32

    g = pdf["g"].to_numpy()
    f = pdf["f_span"].to_numpy()
    n = len(pdf)
    D = np.zeros((n, 4))
    D[np.arange(n), f] = 1.0
    X = np.column_stack([pdf["x"].to_numpy()[:, None], D])
    y = pdf["y"].to_numpy()
    G, k_par = 5, 1 + 4  # x + 4 full dummies, no intercept
    R = np.zeros(X.shape[1]); R[0] = 1.0
    A = X.T @ X
    Ainv = np.linalg.inv(A)
    beta = np.linalg.solve(A, X.T @ y)
    RA = Ainv @ R
    beta_c = beta - RA * (R @ beta) / (R @ RA)
    u_c = y - X @ beta_c
    ks = np.arange(32, dtype=np.uint64)
    W = ((ks[:, None] >> np.arange(5, dtype=np.uint64)) & 1).astype(float) * 2 - 1
    ts = []
    for w in W:
        y_star = X @ beta_c + w[g] * u_c
        b_star = np.linalg.solve(A, X.T @ y_star)
        u_star = y_star - X @ b_star
        meat = np.zeros((X.shape[1],) * 2)
        for gi in range(G):
            sv = X[g == gi].T @ u_star[g == gi]
            meat += np.outer(sv, sv)
        V = (G / (G - 1)) * (n / (n - k_par)) * (Ainv @ meat @ Ainv)
        ts.append(float(R @ (b_star - beta_c)) / float(np.sqrt(R @ V @ R)))
    t_ref = np.array(ts)
    p_ref = float(np.mean(np.abs(t_ref) >= abs(res["t"]) - 1e-12))
    assert res["p_value"] == pytest.approx(p_ref, abs=1e-12)
    assert res["estimate"] == pytest.approx(beta[0], rel=1e-9)


def test_fe_weighted_2fe_dummy_fallback(spark):
    """Weighted 2-FE: one FE stays absorbed (nested), the second rides as
    dummies — parity vs the explicit sqrt(w)-scaled partial-LSDV model."""
    pdf = _gen(seed=19, n=450, G=5)
    rng = np.random.default_rng(3)
    pdf["unit"] = pdf["g"] * 3 + rng.integers(0, 3, len(pdf))  # nested
    pdf["f2"] = rng.integers(0, 4, len(pdf))
    pdf["w"] = rng.uniform(0.5, 2.0, len(pdf))
    pdf["y"] = (
        pdf["y"]
        + 0.5 * rng.normal(size=15)[pdf["unit"].to_numpy()]
        + 0.4 * rng.normal(size=4)[pdf["f2"].to_numpy()]
    )
    df = spark.createDataFrame(pdf)
    res = wild_cluster_bootstrap(
        "y ~ x | unit + f2", df, cluster="g", param="x", B=9999,
        obs_weights="w",
    )
    assert res["enumerated"] and res["B"] == 32
    # oracle: weighted LSDV with FULL dummies for BOTH FEs (collinearity
    # resolved by lstsq-equivalent reduced design: drop one f2 dummy)
    sw = np.sqrt(pdf["w"].to_numpy())
    n = len(pdf)
    Du = np.zeros((n, 15)); Du[np.arange(n), pdf["unit"].to_numpy()] = 1.0
    Df = np.zeros((n, 4)); Df[np.arange(n), pdf["f2"].to_numpy()] = 1.0
    X = np.column_stack([pdf["x"].to_numpy()[:, None], Du, Df[:, 1:]])
    X = X * sw[:, None]
    y = pdf["y"].to_numpy() * sw
    g = pdf["g"].to_numpy()
    G = 5
    n_w = float(pdf["w"].sum())
    k_par = X.shape[1]
    R = np.zeros(k_par); R[0] = 1.0
    A = X.T @ X
    Ainv = np.linalg.inv(A)
    beta = np.linalg.solve(A, X.T @ y)
    RA = Ainv @ R
    beta_c = beta - RA * (R @ beta) / (R @ RA)
    u_c = y - X @ beta_c
    ks = np.arange(32, dtype=np.uint64)
    W = ((ks[:, None] >> np.arange(5, dtype=np.uint64)) & 1).astype(float) * 2 - 1
    ts = []
    for w in W:
        y_star = X @ beta_c + w[g] * u_c
        b_star = np.linalg.solve(A, X.T @ y_star)
        u_star = y_star - X @ b_star
        meat = np.zeros((k_par, k_par))
        for gi in range(G):
            sv = X[g == gi].T @ u_star[g == gi]
            meat += np.outer(sv, sv)
        V = (G / (G - 1)) * (n_w / (n_w - k_par)) * (Ainv @ meat @ Ainv)
        ts.append(float(R @ (b_star - beta_c)) / float(np.sqrt(R @ V @ R)))
    t_ref = np.array(ts)
    p_ref = float(np.mean(np.abs(t_ref) >= abs(res["t"]) - 1e-12))
    assert res["p_value"] == pytest.approx(p_ref, abs=1e-12)
    assert res["estimate"] == pytest.approx(beta[0], rel=1e-9)


def test_cr3_nested_fe_matches_lsdv_delete_one(spark):
    """cr3 with ONE absorbed FE (each level nested in a cluster): the
    demeaned-frame block-subtraction jackknife must equal the explicit
    LSDV delete-one-cluster refit oracle; a spanning FE refuses."""
    from dbreg_spark import dbreg

    rng = np.random.default_rng(13)
    n, G = 800, 8
    g = rng.integers(0, G, n)
    unit = g * 4 + rng.integers(0, 4, n)
    x = rng.normal(size=n) + 0.4 * rng.normal(size=G)[g]
    y = 1.0 + 0.5 * x + 0.6 * rng.normal(size=32)[unit] + rng.normal(size=n)
    pdf = pd.DataFrame({"y": y, "x": x, "g": g, "unit": unit})
    df = spark.createDataFrame(pdf)
    m = dbreg("y ~ x | unit", df, vcov="cr3 ~ g")

    D = np.zeros((n, 32))
    D[np.arange(n), unit] = 1.0
    X = np.column_stack([x[:, None], D])
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    devs = []
    for gi in range(G):
        keep = g != gi
        cols = [0] + [1 + u for u in range(32) if (u // 4) != gi]
        b = np.linalg.lstsq(X[keep][:, cols], y[keep], rcond=None)[0]
        devs.append(b[0] - beta[0])
    devs = np.asarray(devs)
    V_ref = (G - 1) / G * float(devs @ devs)
    assert m.vcov().to_numpy()[0, 0] == pytest.approx(V_ref, rel=1e-8)
    assert m.coef().to_numpy()[0] == pytest.approx(beta[0], rel=1e-9)
    assert m.n_clusters == G

    pdf["f_span"] = rng.integers(0, 5, n)
    with pytest.raises(NotImplementedError, match="nested"):
        dbreg(
            "y ~ x | f_span", spark.createDataFrame(pdf), vcov="cr3 ~ g"
        )
    with pytest.raises(NotImplementedError, match="ONE fixed effect"):
        dbreg("y ~ x | unit + f_span", df.withColumn("f_span", df.g),
              vcov="cr3 ~ g")


def test_wild_score_bootstrap_matches_numpy_oracle(spark):
    """Kline-Santos wild score bootstrap for GLMs: statistic, p, and the
    full t* distribution (as a multiset — cluster collection order is
    arbitrary, and the enumerated Rademacher set is permutation-
    invariant) must match an independent numpy implementation that refits
    the restricted logit itself."""
    from dbreg_spark.boot import wild_score_bootstrap

    rng = np.random.default_rng(5)
    n, G = 900, 9
    g = rng.integers(0, G, n)
    x = rng.normal(size=n) + 0.5 * rng.normal(size=G)[g]
    z = rng.normal(size=n)
    eta = -0.2 + 0.8 * x + 0.3 * z + 0.7 * rng.normal(size=G)[g]
    y = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float)
    df = spark.createDataFrame(pd.DataFrame({"y": y, "x": x, "z": z, "g": g}))
    res = wild_score_bootstrap(
        "y ~ x + z", df, cluster="g", param="x", family="binomial", B=9999
    )
    assert res["enumerated"] and res["B"] == 512 and res["G"] == 9

    # independent restricted IRLS + scores/information at beta~
    X_r = np.column_stack([np.ones(n), z])
    b_r = np.zeros(2)
    for _ in range(60):
        mu = 1 / (1 + np.exp(-(X_r @ b_r)))
        b_r = b_r + np.linalg.solve(
            X_r.T * (mu * (1 - mu)) @ X_r, X_r.T @ (y - mu)
        )
    Xf = np.column_stack([np.ones(n), x, z])
    bt = np.array([b_r[0], 0.0, b_r[1]])
    mu_t = 1 / (1 + np.exp(-(Xf @ bt)))
    A = Xf.T * (mu_t * (1 - mu_t)) @ Xf
    s_g = np.zeros((G, 3))
    for gi in range(G):
        m = g == gi
        s_g[gi] = Xf[m].T @ (y[m] - mu_t[m])
    # the restricted components' total score vanishes (MLE first-order
    # condition) — strong internal consistency check
    np.testing.assert_allclose(s_g.sum(axis=0)[[0, 2]], 0.0, atol=1e-8)
    st = s_g @ np.linalg.solve(A, np.array([0.0, 1.0, 0.0]))
    T_ref = st.sum() / np.sqrt((st**2).sum())
    assert res["statistic"] == pytest.approx(T_ref, rel=1e-7)
    ks = np.arange(512, dtype=np.uint64)
    W = ((ks[:, None] >> np.arange(9, dtype=np.uint64)) & 1).astype(
        float
    ) * 2 - 1
    t_ref = (W @ st) / np.sqrt((W**2) @ (st**2))
    p_ref = float(np.mean(np.abs(t_ref) >= abs(T_ref) - 1e-12))
    assert res["p_value"] == pytest.approx(p_ref, abs=1e-12)
    np.testing.assert_allclose(
        np.sort(np.asarray(res["t_star"])), np.sort(t_ref), rtol=1e-7
    )


def test_wild_score_bootstrap_null_value_and_guards(spark):
    """'x = c' rides the offset; poisson family; refusals."""
    from dbreg_spark.boot import wild_score_bootstrap

    rng = np.random.default_rng(7)
    n, G = 1200, 12
    g = rng.integers(0, G, n)
    x = rng.normal(size=n)
    cnt = rng.poisson(np.exp(0.2 + 0.5 * x + 0.3 * rng.normal(size=G)[g]))
    df = spark.createDataFrame(
        pd.DataFrame({"cnt": cnt.astype(float), "x": x, "g": g})
    )
    # test at the true value: should not reject
    r_true = wild_score_bootstrap(
        "cnt ~ x", df, cluster="g", param="x = 0.5", family="poisson",
        B=4095,
    )
    # test at zero: strongly rejected
    r_zero = wild_score_bootstrap(
        "cnt ~ x", df, cluster="g", param="x", family="poisson", B=4095
    )
    assert r_true["p_value"] > 0.05
    assert r_zero["p_value"] < 0.01
    with pytest.raises(NotImplementedError, match="fixed effects"):
        wild_score_bootstrap(
            "cnt ~ x | g", df, cluster="g", param="x", family="poisson"
        )
    with pytest.raises(ValueError, match="raw RHS"):
        wild_score_bootstrap(
            "cnt ~ x", df, cluster="g", param="nope", family="poisson"
        )
