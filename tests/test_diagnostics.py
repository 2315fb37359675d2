"""Breusch-Pagan / White heteroskedasticity tests: LM statistics pinned
against dense numpy auxiliary regressions; power/level sanity; factor
handling (collinear aux terms dropped, df follows); FE refusal."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from dbreg_spark import dbreg

N = 2000


@pytest.fixture(scope="module")
def het(spark):
    rng = np.random.default_rng(21)
    x1 = rng.normal(size=N)
    x2 = rng.uniform(size=N)
    g = rng.integers(0, 3, N)
    # monotone-in-x1 conditional variance: both BP and White should fire
    y = 1.0 + 2.0 * x1 - x2 + rng.normal(size=N) * np.exp(0.6 * x1)
    y0 = 1.0 + 2.0 * x1 - x2 + rng.normal(size=N)
    pdf = pd.DataFrame(
        dict(y=y, y0=y0, x1=x1, x2=x2, g=g.astype("int32"))
    )
    return spark.createDataFrame(pdf), pdf


def test_bp_matches_dense_oracle(het):
    df, pdf = het
    m = dbreg("y ~ x1 + x2", df, strategy="moments")
    bp = m.bp_test(df)
    X = np.column_stack([np.ones(N), pdf.x1, pdf.x2])
    b = np.linalg.lstsq(X, pdf.y.values, rcond=None)[0]
    u2 = (pdf.y.values - X @ b) ** 2
    g = np.linalg.lstsq(X, u2, rcond=None)[0]
    r2 = 1 - np.sum((u2 - X @ g) ** 2) / np.sum((u2 - u2.mean()) ** 2)
    np.testing.assert_allclose(bp["statistic"], N * r2, rtol=1e-8)
    assert bp["df"] == 2
    assert bp["p_value"] < 1e-6  # strong heteroskedasticity detected


def test_white_matches_dense_oracle(het):
    df, pdf = het
    m = dbreg("y ~ x1 + x2", df, strategy="moments")
    wh = m.white_test(df)
    X = np.column_stack([np.ones(N), pdf.x1, pdf.x2])
    b = np.linalg.lstsq(X, pdf.y.values, rcond=None)[0]
    u2 = (pdf.y.values - X @ b) ** 2
    W = np.column_stack(
        [X, pdf.x1 * pdf.x1, pdf.x1 * pdf.x2, pdf.x2 * pdf.x2]
    )
    gw = np.linalg.lstsq(W, u2, rcond=None)[0]
    r2 = 1 - np.sum((u2 - W @ gw) ** 2) / np.sum((u2 - u2.mean()) ** 2)
    np.testing.assert_allclose(wh["statistic"], N * r2, rtol=1e-8)
    assert wh["df"] == 5
    assert wh["p_value"] < 1e-6


def test_bp_level_under_homoskedasticity(het):
    df, _ = het
    m = dbreg("y0 ~ x1 + x2", df, strategy="moments")
    assert m.bp_test(df)["p_value"] > 0.01
    assert m.white_test(df)["p_value"] > 0.01


def test_white_factor_regressors_drop_collinear_aux(het):
    """Dummy squares duplicate the dummies; the aux collinearity layer
    drops them and the df follows the kept count."""
    df, _ = het
    m = dbreg("y ~ x1 + g", df, strategy="moments")
    wh = m.white_test(df)
    # design: x1, g1, g2 -> aux adds 6 products, but g1^2==g1, g2^2==g2,
    # g1*g2==0 are collinear/degenerate -> kept aux regressors < 9
    assert wh["df"] < 9
    assert 0.0 <= wh["p_value"] <= 1.0


def test_fe_refusals_narrowed(het):
    """demean AND mundlak FE models are supported (within/CRE variants);
    compress, weighted demean, and BG-on-FE stay refused with clear
    messages."""
    df, pdf = het
    mc = dbreg("y ~ x1 + x2 | g", df, strategy="compress")
    with pytest.raises(NotImplementedError, match="compress"):
        mc.bp_test(df)
    dfw = df.withColumn("w", (F.col("x2") + 1.0))
    mw = dbreg("y ~ x1 | g", dfw, strategy="demean", weights="~ w")
    with pytest.raises(NotImplementedError, match="weighted"):
        mw.bp_test(dfw)
    md = dbreg("y ~ x1 | g", df, strategy="demean")
    with pytest.raises(NotImplementedError, match="WITHIN or CRE"):
        md.bg_test(df, time="x2")
    mk = dbreg("y ~ x1 + x2 | g", df, strategy="mundlak")
    with pytest.raises(NotImplementedError, match="WITHIN or CRE"):
        mk.bg_test(df, time="x2")


def _within_oracle(pdf, xcols, ycol="y", g="g"):
    """numpy 1-FE within fit: (u, Xt demeaned cols, beta, fit)."""
    dm = lambda s: (s - pdf.groupby(g)[s.name].transform("mean")).values
    Xt = np.column_stack([dm(pdf[c]) for c in xcols])
    yt = dm(pdf[ycol])
    b = np.linalg.lstsq(Xt, yt, rcond=None)[0]
    fit = Xt @ b
    return yt - fit, Xt, b, fit


def test_bp_within_matches_dense_oracle(het):
    df, pdf = het
    m = dbreg("y ~ x1 + x2 | g", df, strategy="demean")
    bp = m.bp_test(df)
    u, Xt, _b, _f = _within_oracle(pdf, ["x1", "x2"])
    A = np.column_stack([np.ones(N), Xt])
    u2 = u * u
    gam = np.linalg.lstsq(A, u2, rcond=None)[0]
    r2 = 1 - np.sum((u2 - A @ gam) ** 2) / np.sum((u2 - u2.mean()) ** 2)
    np.testing.assert_allclose(bp["statistic"], N * r2, rtol=1e-8)
    assert bp["df"] == 2


def test_white_within_matches_dense_oracle(het):
    df, pdf = het
    m = dbreg("y ~ x1 + x2 | g", df, strategy="demean")
    wh = m.white_test(df)
    u, Xt, _b, _f = _within_oracle(pdf, ["x1", "x2"])
    W = np.column_stack(
        [np.ones(N), Xt, Xt[:, 0] ** 2, Xt[:, 0] * Xt[:, 1], Xt[:, 1] ** 2]
    )
    u2 = u * u
    gam = np.linalg.lstsq(W, u2, rcond=None)[0]
    r2 = 1 - np.sum((u2 - W @ gam) ** 2) / np.sum((u2 - u2.mean()) ** 2)
    np.testing.assert_allclose(wh["statistic"], N * r2, rtol=1e-8)
    assert wh["df"] == 5


def test_reset_within_matches_dense_oracle(het):
    df, pdf = het
    m = dbreg("y ~ x1 + x2 | g", df, strategy="demean")
    rs = m.reset_test(df)
    u, Xt, _b, fit = _within_oracle(pdf, ["x1", "x2"])
    rss_r = float(np.sum(u * u))
    np.testing.assert_allclose(rss_r, float(m.rss), rtol=1e-9)
    A = np.column_stack([np.ones(N), Xt, fit**2, fit**3])
    g2 = np.linalg.lstsq(A, u + fit, rcond=None)[0]
    rss_u = float(np.sum((u + fit - A @ g2) ** 2))
    q = 2
    df2 = float(m.df_residual) - q
    stat = ((rss_r - rss_u) / q) / (rss_u / df2)
    np.testing.assert_allclose(rs["statistic"], stat, rtol=1e-7)
    assert rs["df1"] == 2 and rs["df2"] == df2


def test_jb_within_matches_dense_oracle(het):
    df, pdf = het
    m = dbreg("y ~ x1 + x2 | g", df, strategy="demean")
    jb = m.jb_test(df)
    u, _X, _b, _f = _within_oracle(pdf, ["x1", "x2"])
    m2 = np.mean((u - u.mean()) ** 2)
    S = np.mean((u - u.mean()) ** 3) / m2**1.5
    K = np.mean((u - u.mean()) ** 4) / m2**2
    np.testing.assert_allclose(
        jb["statistic"], N / 6 * (S**2 + (K - 3) ** 2 / 4), rtol=1e-8
    )


def _mundlak_oracle(pdf, xcols, ycol="y", g="g"):
    """numpy 1-FE CRE fit: (u, A = [1, X, x̄_g], beta, fit)."""
    xb = np.column_stack(
        [pdf.groupby(g)[c].transform("mean").values for c in xcols]
    )
    A = np.column_stack(
        [np.ones(len(pdf))] + [pdf[c].values for c in xcols] + [xb]
    )
    b = np.linalg.lstsq(A, pdf[ycol].values, rcond=None)[0]
    fit = A @ b
    return pdf[ycol].values - fit, A, b, fit


def test_bp_mundlak_matches_dense_oracle(het):
    """BP on a mundlak (CRE) model: the residual y − β̂₀ − Xβ̂ − x̄γ̂ at
    the stored literal coefficients, aux regressors = [X, x̄]."""
    df, pdf = het
    m = dbreg("y ~ x1 + x2 | g", df, strategy="mundlak")
    bp = m.bp_test(df)
    u, A, _b, _f = _mundlak_oracle(pdf, ["x1", "x2"])
    u2 = u * u
    gam = np.linalg.lstsq(A, u2, rcond=None)[0]
    r2 = 1 - np.sum((u2 - A @ gam) ** 2) / np.sum((u2 - u2.mean()) ** 2)
    np.testing.assert_allclose(bp["statistic"], N * r2, rtol=1e-8)
    assert bp["df"] == 4  # x1, x2, x1_bar_g, x2_bar_g


def test_reset_jb_mundlak_match_dense_oracle(het):
    df, pdf = het
    m = dbreg("y ~ x1 + x2 | g", df, strategy="mundlak")
    u, A, _b, fit = _mundlak_oracle(pdf, ["x1", "x2"])
    rss_r = float(np.sum(u * u))
    np.testing.assert_allclose(rss_r, float(m.rss), rtol=1e-9)
    rs = m.reset_test(df)
    Au = np.column_stack([A, fit**2, fit**3])
    g2 = np.linalg.lstsq(Au, pdf.y.values, rcond=None)[0]
    rss_u = float(np.sum((pdf.y.values - Au @ g2) ** 2))
    q = 2
    df2 = N - Au.shape[1]
    stat = ((rss_r - rss_u) / q) / (rss_u / df2)
    np.testing.assert_allclose(rs["statistic"], stat, rtol=1e-7)
    assert rs["df1"] == q and rs["df2"] == df2
    jb = m.jb_test(df)
    m2 = np.mean((u - u.mean()) ** 2)
    S = np.mean((u - u.mean()) ** 3) / m2**1.5
    K = np.mean((u - u.mean()) ** 4) / m2**2
    np.testing.assert_allclose(
        jb["statistic"], N / 6 * (S**2 + (K - 3) ** 2 / 4), rtol=1e-8
    )


def test_reset_matches_dense_oracle(het, spark):
    rng = np.random.default_rng(7)
    n = 1500
    x = rng.normal(size=n)
    y_quad = 1 + 2 * x + 1.5 * x * x + rng.normal(size=n)
    y_lin = 1 + 2 * x + rng.normal(size=n)
    df = spark.createDataFrame(
        pd.DataFrame(dict(y_quad=y_quad, y_lin=y_lin, x=x))
    )
    m = dbreg("y_quad ~ x", df, strategy="moments")
    r = m.reset_test(df)
    X = np.column_stack([np.ones(n), x])
    b = np.linalg.lstsq(X, y_quad, rcond=None)[0]
    fit = X @ b
    Xu = np.column_stack([X, fit**2, fit**3])
    bu = np.linalg.lstsq(Xu, y_quad, rcond=None)[0]
    rss_r = np.sum((y_quad - fit) ** 2)
    rss_u = np.sum((y_quad - Xu @ bu) ** 2)
    Fs = ((rss_r - rss_u) / 2) / (rss_u / (n - 4))
    np.testing.assert_allclose(r["statistic"], Fs, rtol=1e-7)
    assert r["p_value"] < 1e-6
    # correctly-specified model: no rejection
    m0 = dbreg("y_lin ~ x", df, strategy="moments")
    assert m0.reset_test(df)["p_value"] > 0.01


def test_jb_matches_dense_oracle(het, spark):
    rng = np.random.default_rng(3)
    n = 2000
    x = rng.normal(size=n)
    y_norm = 1 + 2 * x + rng.normal(size=n)
    y_skew = 1 + 2 * x + (rng.exponential(size=n) - 1.0)
    df = spark.createDataFrame(
        pd.DataFrame(dict(y_norm=y_norm, y_skew=y_skew, x=x))
    )
    m = dbreg("y_skew ~ x", df, strategy="moments")
    jb = m.jb_test(df)
    X = np.column_stack([np.ones(n), x])
    b = np.linalg.lstsq(X, y_skew, rcond=None)[0]
    u = y_skew - X @ b
    S = np.mean((u - u.mean()) ** 3) / np.var(u) ** 1.5
    K = np.mean((u - u.mean()) ** 4) / np.var(u) ** 2
    ref = n / 6 * (S**2 + (K - 3) ** 2 / 4)
    np.testing.assert_allclose(jb["statistic"], ref, rtol=1e-8)
    assert jb["p_value"] < 1e-10  # exponential errors: clearly non-normal
    m0 = dbreg("y_norm ~ x", df, strategy="moments")
    assert m0.jb_test(df)["p_value"] > 0.01


def test_bg_matches_dense_oracle(spark):
    rng = np.random.default_rng(2)
    G, T = 40, 50
    rows = []
    for g in range(G):
        x = rng.normal(size=T)
        e = np.zeros(T)
        eps = rng.normal(size=T)
        for t in range(T):
            e[t] = (0.6 * e[t - 1] if t else 0) + eps[t]
        y_ar = 1 + 2 * x + e
        y_iid = 1 + 2 * x + rng.normal(size=T)
        rows += [(g, t, x[t], y_ar[t], y_iid[t]) for t in range(T)]
    pdf = pd.DataFrame(rows, columns=["g", "t", "x", "y_ar", "y_iid"])
    df = spark.createDataFrame(pdf)
    m = dbreg("y_ar ~ x", df, strategy="moments")
    bg = m.bg_test(df, time="t", panel="g", order=1)
    X = np.column_stack([np.ones(len(pdf)), pdf.x])
    b = np.linalg.lstsq(X, pdf.y_ar, rcond=None)[0]
    pdf["u"] = pdf.y_ar - X @ b
    pdf = pdf.sort_values(["g", "t"])
    pdf["ul1"] = pdf.groupby("g")["u"].shift(1)
    sub = pdf.dropna(subset=["ul1"])
    Xa = np.column_stack([np.ones(len(sub)), sub.x, sub.ul1])
    ba = np.linalg.lstsq(Xa, sub.u, rcond=None)[0]
    r2 = 1 - np.sum((sub.u - Xa @ ba) ** 2) / np.sum(
        (sub.u - sub.u.mean()) ** 2
    )
    np.testing.assert_allclose(bg["statistic"], len(sub) * r2, rtol=1e-8)
    assert bg["p_value"] < 1e-20
    m0 = dbreg("y_iid ~ x", df, strategy="moments")
    assert m0.bg_test(df, time="t", panel="g")["p_value"] > 0.01
    # no panel: single-sort warning
    import warnings as _w

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        m0.bg_test(df.where("g = 0"), time="t")
    assert any("global sort" in str(r.message) for r in rec)


def test_overdispersion_matches_dense_oracle(spark):
    from dbreg_spark import dbglm

    rng = np.random.default_rng(8)
    n = 3000
    x = rng.normal(size=n)
    mu = np.exp(0.5 + 0.7 * x)
    y_over = rng.poisson(rng.gamma(2.0, mu / 2.0)).astype(float)
    y_pois = rng.poisson(mu).astype(float)
    df = spark.createDataFrame(
        pd.DataFrame(dict(y_over=y_over, y_pois=y_pois, x=x))
    )
    m = dbglm("y_over ~ x", df, family="poisson")
    od = m.overdispersion_test(df)
    X = np.column_stack([np.ones(n), x])
    b = np.zeros(2)
    for _ in range(60):
        mm_ = np.exp(X @ b)
        zz = X @ b + (y_over - mm_) / mm_
        bn = np.linalg.solve(X.T @ (mm_[:, None] * X), X.T @ (mm_ * zz))
        if np.max(np.abs(bn - b)) < 1e-13:
            b = bn
            break
        b = bn
    muh = np.exp(X @ b)
    z = ((y_over - muh) ** 2 - y_over) / muh
    alpha = np.sum(z * muh) / np.sum(muh * muh)
    se = np.sqrt(
        np.sum((z - alpha * muh) ** 2) / (n - 1) / np.sum(muh * muh)
    )
    np.testing.assert_allclose(od["statistic"], alpha / se, rtol=1e-7)
    assert od["p_value"] < 1e-10 and od["alpha"] > 0.3
    # equidispersed: no rejection; binomial model refused
    m0 = dbglm("y_pois ~ x", df, family="poisson")
    assert m0.overdispersion_test(df)["p_value"] > 0.01
    with pytest.raises(ValueError, match="poisson"):
        mb = dbglm(
            "y_pois ~ x",
            df.withColumn("y_pois", (df.y_pois > 1).cast("double")),
            family="binomial",
        )
        mb.overdispersion_test(df)


def test_mundlak_hausman(spark):
    """Wooldridge's CRE Hausman: rejects when unit effects correlate with
    x, holds under the RE null — and the default MUST cluster by unit
    (hc1 over-rejects under the null because the unit effect itself
    correlates errors within unit)."""
    from dbreg_spark import mundlak_hausman

    rng = np.random.default_rng(4)
    G, T = 60, 20
    rows = []
    for g in range(G):
        a = rng.normal()
        for t in range(T):
            x_corr = a + rng.normal()
            x_unc = rng.normal()
            rows.append(
                (g, x_corr, x_unc,
                 1 + 2 * x_corr + a + rng.normal(),
                 1 + 2 * x_unc + a + rng.normal())
            )
    pdf = pd.DataFrame(rows, columns=["g", "x_corr", "x_unc", "y_fe", "y_re"])
    df = spark.createDataFrame(pdf)
    h1 = mundlak_hausman("y_fe ~ x_corr | g", df)
    assert h1["p_value"] < 1e-10
    assert h1["tested"] == ["x_corr:bar:g"] or h1["tested"] == ["x_corr_bar_g"]
    h0 = mundlak_hausman("y_re ~ x_unc | g", df)
    assert h0["p_value"] > 0.05
    # the model rides along for inspection
    assert h1["model"].strategy == "mundlak"
    with pytest.raises(ValueError, match="fe"):
        mundlak_hausman("y_re ~ x_unc", df)


def test_wooldridge_fd_matches_dense_oracle(spark):
    """Parity vs a numpy implementation of Drukker's xtserial recipe
    (FD regression -> residual-on-lag, panel-clustered slope test of
    -0.5), plus level/power: AR(1) level errors reject, iid don't."""
    from dbreg_spark import wooldridge_fd_test

    rng = np.random.default_rng(3)
    G, T = 120, 8
    g = np.repeat(np.arange(G), T)
    t = np.tile(np.arange(T), G)
    x = rng.normal(size=G * T)
    alpha = np.repeat(rng.normal(size=G), T)
    u_iid = rng.normal(size=G * T)
    # AR(1) level errors
    u_ar = np.zeros(G * T)
    for i in range(G * T):
        u_ar[i] = (0.6 * u_ar[i - 1] if t[i] > 0 else 0.0) + rng.normal()
    pdf = pd.DataFrame(
        dict(
            g=g.astype("int64"), t=t.astype("int64"), x=x,
            y0=1.0 + 2.0 * x + alpha + u_iid,
            y1=1.0 + 2.0 * x + alpha + u_ar,
        )
    )
    df = spark.createDataFrame(pdf)

    def oracle(ycol):
        d = pdf.sort_values(["g", "t"]).copy()
        dy = d.groupby("g")[ycol].diff().values
        dx = d.groupby("g")["x"].diff().values
        keep = ~np.isnan(dy)
        dyk, dxk, gk = dy[keep], dx[keep], d["g"].values[keep]
        b = (dxk @ dyk) / (dxk @ dxk)  # no constant
        e = dyk - b * dxk
        ed = pd.DataFrame(dict(g=gk, e=e, t=d["t"].values[keep]))
        ed["el"] = ed.groupby("g")["e"].shift()
        ed = ed.dropna()
        s = float((ed.el @ ed.e) / (ed.el @ ed.el))
        r = ed.e.values - s * ed.el.values
        # CR1 clustered se of the no-intercept slope
        sg = ed.assign(sc=r * ed.el.values).groupby("g")["sc"].sum()
        Gc = len(sg)
        n = len(ed)
        meat = float((sg**2).sum())
        bread = float((ed.el**2).sum())
        scale = (Gc / (Gc - 1)) * ((n) / (n - 1))
        return s, np.sqrt(scale * meat) / bread, Gc

    r0 = wooldridge_fd_test("y0 ~ x", df, panel="g", time="t")
    s, se, Gc = oracle("y0")
    np.testing.assert_allclose(r0["slope"], s, rtol=1e-8)
    np.testing.assert_allclose(r0["se"], se, rtol=1e-6)
    assert r0["n_clusters"] == Gc
    assert r0["p_value"] > 0.05  # iid level errors: do not reject
    # two-sided p pinned to the oracle t stat (xtserial's F(1, G-1) form
    # == two-sided |t|); y0's slope sits ABOVE -0.5, the side the old
    # one-sided p halved — and a mirrored stat must give the same p
    from dbreg_spark.stats import t_sf

    t_stat = (s + 0.5) / se
    np.testing.assert_allclose(
        r0["p_value"], 2.0 * t_sf(abs(t_stat), Gc - 1), rtol=1e-9
    )
    assert t_stat > 0 and r0["p_value"] > t_sf(t_stat, Gc - 1) * 1.5

    r1 = wooldridge_fd_test("y1 ~ x | g", df, panel="g", time="t")
    assert r1["p_value"] < 1e-4  # AR(1) level errors: reject hard

    with pytest.raises(ValueError, match="panel unit"):
        wooldridge_fd_test("y0 ~ x | t", df, panel="g", time="t")
