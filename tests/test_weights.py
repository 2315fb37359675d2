"""Observation weights (fixest's ``weights=``) across every strategy,
pinned against dense numpy WLS oracles.

Conventions under test (fixest semantics, matching the engine):
  β = (X'WX)⁻¹X'Wy; nobs and dof keep the RAW row count; iid σ² =
  Σw·u²/(n−p); HC1 meat Σw²u²xx'; CR1 scores Σ_g w·u·x with the engine's
  (G/(G−1))·(n/(n−p)) scale; weighted 2-FE demeaning routes to the
  iterated path (the double-demean identity fails under weights).
"""

import numpy as np
import pandas as pd
import pytest

from dbreg_spark import dbreg


def _panel(seed=42, n=3000):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "x1": rng.normal(size=n),
            "x2": rng.normal(size=n),
            "f1": rng.integers(0, 12, n),
            "f2": rng.integers(0, 7, n),
            "cl": rng.integers(0, 15, n),
            "w": rng.uniform(0.2, 3.0, n),
        }
    )
    pdf["y"] = (
        1.5
        + 2.0 * pdf.x1
        - 0.7 * pdf.x2
        + 0.5 * pdf.f1
        + 0.3 * pdf.f2
        + rng.normal(size=n)
    )
    return pdf


@pytest.fixture(scope="module")
def wpanel(spark):
    pdf = _panel()
    return spark.createDataFrame(pdf), pdf


def dense_wls(X, y, w, vcov="iid", cluster=None, df_fe=0):
    """Dense WLS with the engine's sandwich conventions."""
    XtWX = X.T @ (w[:, None] * X)
    b = np.linalg.solve(XtWX, X.T @ (w * y))
    u = y - X @ b
    n, p = X.shape
    dfres = n - p - df_fe
    Vi = np.linalg.inv(XtWX)
    if vcov == "hc1":
        meat = (X * (w**2 * u**2)[:, None]).T @ X
        V = (n / dfres) * Vi @ meat @ Vi
    elif vcov == "cluster":
        S = {}
        for i in range(n):
            S.setdefault(cluster[i], np.zeros(p))
            S[cluster[i]] += w[i] * u[i] * X[i]
        meat = sum(np.outer(s, s) for s in S.values())
        G = len(S)
        V = (G / (G - 1)) * (n / (n - p - df_fe)) * Vi @ meat @ Vi
    else:
        V = ((w * u * u).sum() / dfres) * Vi
    return b, np.sqrt(np.diag(V))


def _fe_dummies(s, drop_first):
    return pd.get_dummies(
        s.astype(str), drop_first=drop_first
    ).to_numpy(dtype=float)


# ------------------------------------------------------------- moments ----


@pytest.mark.parametrize("vcov", ["iid", "hc1", "cluster"])
def test_moments_weighted(wpanel, vcov):
    df, pdf = wpanel
    m = dbreg(
        "y ~ x1 + x2",
        df,
        weights="~w",
        strategy="moments",
        vcov=("~cl" if vcov == "cluster" else vcov),
    )
    X = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    b, se = dense_wls(
        X, pdf.y.to_numpy(), pdf.w.to_numpy(), vcov, pdf.cl.to_numpy()
    )
    np.testing.assert_allclose(m.coef().to_numpy(), b, rtol=1e-8)
    np.testing.assert_allclose(m.se().to_numpy(), se, rtol=1e-8)
    assert m.nobs_orig == len(pdf)
    assert m.weight_col == "w"


# -------------------------------------------------------------- demean ----


@pytest.mark.parametrize("vcov", ["iid", "hc1", "cluster"])
def test_demean_1fe_weighted(wpanel, vcov):
    df, pdf = wpanel
    m = dbreg(
        "y ~ x1 + x2 | f1",
        df,
        weights="w",
        strategy="demean",
        vcov=("~cl" if vcov == "cluster" else vcov),
    )
    # LSDV oracle: full dummies, dof bookkeeping via df_fe
    D = _fe_dummies(pdf.f1, drop_first=False)
    X = np.column_stack([pdf.x1, pdf.x2, D])
    b, se = dense_wls(
        X, pdf.y.to_numpy(), pdf.w.to_numpy(), vcov, pdf.cl.to_numpy()
    )
    np.testing.assert_allclose(m.coef().to_numpy(), b[:2], rtol=1e-8)
    np.testing.assert_allclose(m.se().to_numpy(), se[:2], rtol=1e-7)


def test_demean_2fe_weighted_routes_iterative(wpanel, recwarn):
    df, pdf = wpanel
    m = dbreg("y ~ x1 + x2 | f1 + f2", df, weights="w", strategy="demean")
    assert m.demean_iterated  # double-demean identity invalid under weights
    # no spurious "unbalanced" warning: the iterated path is exact
    assert not [w for w in recwarn.list if "unbalanced" in str(w.message)]
    D1 = _fe_dummies(pdf.f1, drop_first=False)
    D2 = _fe_dummies(pdf.f2, drop_first=True)
    X = np.column_stack([pdf.x1, pdf.x2, D1, D2])
    b, se = dense_wls(X, pdf.y.to_numpy(), pdf.w.to_numpy())
    np.testing.assert_allclose(m.coef().to_numpy(), b[:2], rtol=1e-8)
    np.testing.assert_allclose(m.se().to_numpy(), se[:2], rtol=1e-7)


def test_demean_3fe_weighted_iterative(spark):
    rng = np.random.default_rng(7)
    n = 1500
    pdf = pd.DataFrame(
        {
            "x": rng.normal(size=n),
            "a": rng.integers(0, 8, n),
            "b": rng.integers(0, 6, n),
            "c": rng.integers(0, 5, n),
            "w": rng.uniform(0.5, 2.0, n),
        }
    )
    pdf["y"] = 1.0 + 0.9 * pdf.x + 0.2 * pdf.a - 0.1 * pdf.b + rng.normal(size=n)
    m = dbreg(
        "y ~ x | a + b + c",
        spark.createDataFrame(pdf),
        weights="w",
        strategy="demean",
    )
    X = np.column_stack(
        [
            pdf.x.to_numpy(),
            _fe_dummies(pdf.a, drop_first=False),
            _fe_dummies(pdf.b, drop_first=True),
            _fe_dummies(pdf.c, drop_first=True),
        ]
    )
    b, _ = dense_wls(X, pdf.y.to_numpy(), pdf.w.to_numpy())
    np.testing.assert_allclose(m.coef().to_numpy(), b[:1], rtol=1e-7)


# ------------------------------------------------------------- mundlak ----


def test_mundlak_weighted_reproduces_within(wpanel):
    df, pdf = wpanel
    m = dbreg("y ~ x1 + x2 | f1", df, weights="w", strategy="mundlak")
    D = _fe_dummies(pdf.f1, drop_first=False)
    X = np.column_stack([pdf.x1, pdf.x2, D])
    b, _ = dense_wls(X, pdf.y.to_numpy(), pdf.w.to_numpy())
    got = m.coef(fe=False)[["x1", "x2"]].to_numpy()
    np.testing.assert_allclose(got, b[:2], rtol=1e-8)


# ------------------------------------------------------------ compress ----


@pytest.fixture(scope="module")
def wcells(spark):
    rng = np.random.default_rng(3)
    n = 4000
    pdf = pd.DataFrame(
        {
            "xd": rng.integers(0, 5, n).astype(float),
            "f1": rng.integers(0, 10, n),
            "cl": rng.integers(0, 12, n),
            "w": rng.uniform(0.2, 3.0, n),
        }
    )
    pdf["y"] = 1.0 + 0.8 * pdf.xd + 0.4 * pdf.f1 + rng.normal(size=n)
    return spark.createDataFrame(pdf), pdf


@pytest.mark.parametrize("vcov", ["iid", "hc1", "cluster"])
def test_compress_weighted(wcells, vcov):
    df, pdf = wcells
    m = dbreg(
        "y ~ xd",
        df,
        weights="w",
        strategy="compress",
        vcov=("~cl" if vcov == "cluster" else vcov),
    )
    X = np.column_stack([np.ones(len(pdf)), pdf.xd])
    b, se = dense_wls(
        X, pdf.y.to_numpy(), pdf.w.to_numpy(), vcov, pdf.cl.to_numpy()
    )
    np.testing.assert_allclose(m.coef().to_numpy(), b, rtol=1e-8)
    np.testing.assert_allclose(m.se().to_numpy(), se, rtol=1e-8)
    assert m.nobs_orig == len(pdf)  # raw rows, not Σw


@pytest.mark.parametrize("vcov", ["iid", "hc1", "cluster"])
def test_compress_weighted_distributed_parity(wcells, vcov):
    """Force the distributed-Gram fallback (compress_nmax=1) and pin it to
    the driver-WLS weighted path to 1e-10."""
    df, pdf = wcells
    kw = dict(
        weights="w",
        strategy="compress",
        vcov=("~cl" if vcov == "cluster" else vcov),
    )
    drv = dbreg("y ~ xd | f1", df, **kw)
    dist = dbreg("y ~ xd | f1", df, compress_nmax=1, **kw)
    np.testing.assert_allclose(
        dist.coef(fe=False).to_numpy(),
        drv.coef(fe=False).to_numpy(),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        dist.se(fe=False).to_numpy(), drv.se(fe=False).to_numpy(), rtol=1e-10
    )
    assert dist.nobs_orig == drv.nobs_orig == len(pdf)


# ------------------------------------------------------ guards & nulls ----


def test_nonpositive_weights_raise(spark):
    pdf = _panel(seed=1, n=200)
    pdf.loc[3, "w"] = 0.0
    df = spark.createDataFrame(pdf)
    for strategy in ("moments", "compress"):
        with pytest.raises(ValueError, match="non-positive"):
            dbreg("y ~ x1", df, weights="w", strategy=strategy)
    with pytest.raises(ValueError, match="non-positive"):
        dbreg("y ~ x1 | f1", df, weights="w", strategy="demean")


def test_null_weights_drop_rows(spark):
    pdf = _panel(seed=2, n=300)
    # SQL NULL (None), not float NaN: the engine's missing handling is the
    # conjunctive IS NOT NULL filter, matching the reference's NA → NULL
    wnull = pdf.copy()
    wnull["w"] = wnull["w"].astype(object)
    wnull.loc[:9, "w"] = None
    df = spark.createDataFrame(wnull)
    m = dbreg("y ~ x1 + x2", df, weights="w", strategy="moments")
    assert m.nobs_orig == 290
    sub = pdf.iloc[10:]
    X = np.column_stack([np.ones(len(sub)), sub.x1, sub.x2])
    b, _ = dense_wls(X, sub.y.to_numpy(), sub.w.to_numpy())
    np.testing.assert_allclose(m.coef().to_numpy(), b, rtol=1e-8)


def test_nan_weights_raise_not_poison(spark):
    """Float NaN (≠ NULL) must raise, never return NaN coefficients —
    Spark's MIN sorts NaN last so only the Σw probe can catch it."""
    pdf = _panel(seed=5, n=200)
    pdf.loc[7, "w"] = np.nan
    df = spark.createDataFrame(pdf)
    for kwargs in (
        dict(strategy="moments"),
        dict(strategy="compress"),
        dict(strategy="compress", compress_nmax=1),
    ):
        with pytest.raises(ValueError, match="non-positive or NaN"):
            dbreg("y ~ x1", df, weights="w", **kwargs)


def test_bad_weights_spec_raises(wpanel):
    df, _ = wpanel
    with pytest.raises(ValueError, match="single column"):
        dbreg("y ~ x1", df, weights="~w + z", strategy="moments")
    with pytest.raises(ValueError, match="not found"):
        dbreg("y ~ x1", df, weights="nope", strategy="moments")


# --------------------------------------------------- predict and fixef ----


def test_weighted_demean_predict_matches_lsdv(wpanel):
    df, pdf = wpanel
    m = dbreg("y ~ x1 + x2 | f1", df, weights="w", strategy="demean")
    fit = (
        m.predict(df).select("f1", "x1", "fit").toPandas().fit.to_numpy()
    )
    D = _fe_dummies(pdf.f1, drop_first=False)
    X = np.column_stack([pdf.x1, pdf.x2, D])
    b, _ = dense_wls(X, pdf.y.to_numpy(), pdf.w.to_numpy())
    np.testing.assert_allclose(np.sort(fit), np.sort(X @ b), rtol=1e-6)


def test_weighted_fixef_1fe(wpanel):
    df, pdf = wpanel
    m = dbreg("y ~ x1 + x2 | f1", df, weights="w", strategy="demean")
    fx = m.fixef(df).toPandas().set_index("f1")["fixef"]
    D = _fe_dummies(pdf.f1, drop_first=False)
    X = np.column_stack([pdf.x1, pdf.x2, D])
    b, _ = dense_wls(X, pdf.y.to_numpy(), pdf.w.to_numpy())
    # dummy columns are in lexicographic level order (astype(str))
    lex_levels = sorted(pdf.f1.unique(), key=str)
    oracle = pd.Series(b[2:], index=lex_levels)
    np.testing.assert_allclose(
        fx.sort_index().to_numpy(), oracle.sort_index().to_numpy(), rtol=1e-6
    )


def test_weighted_predict_requires_weight_column(wpanel):
    df, pdf = wpanel
    m = dbreg("y ~ x1 + x2 | f1", df, weights="w", strategy="demean")
    with pytest.raises(ValueError, match="weights='w'"):
        m.predict(df.drop("w"))


# ------------------------------------------------------------ sql twin ----


def test_weighted_moments_sql_matches_duckdb(spark, wpanel):
    import duckdb

    df, pdf = wpanel
    df.createOrReplaceTempView("wpanel_sql")
    sql = dbreg(
        "y ~ x1 + x2",
        spark=spark,
        table="wpanel_sql",
        weights="w",
        strategy="moments",
        sql_only=True,
    )
    con = duckdb.connect()
    con.register("wpanel_sql", pdf)
    oracle = con.execute(sql).fetchdf().iloc[0]
    got = dbreg(
        "y ~ x1 + x2",
        spark=spark,
        table="wpanel_sql",
        weights="w",
        strategy="moments",
        data_only=True,
    ).iloc[0]
    for k in got.index:
        np.testing.assert_allclose(got[k], oracle[k], rtol=1e-9)


# ----------------------------------------------------------- dbbinsreg ----


def test_binsreg_weighted_deg0_bins_are_weighted_means(spark):
    """Degree-0 weighted binscatter: each bin's fitted value is the bin's
    w-weighted mean of y (the WLS bin-dummy coefficient)."""
    from dbreg_spark import dbbinsreg

    rng = np.random.default_rng(21)
    n = 3000
    pdf = pd.DataFrame(
        {
            "x": rng.uniform(0, 1, n),
            "w": rng.uniform(0.2, 3.0, n),
        }
    )
    pdf["y"] = 2.0 * pdf.x + rng.normal(size=n)
    df = spark.createDataFrame(pdf)
    breaks = [0.0, 0.25, 0.5, 0.75, 1.0]
    r = dbbinsreg(
        "y ~ x", df, points=(0, 0), binspos=breaks, weights="w", ci=False
    )
    fit = r.points.set_index("bin")["fit"]
    cut = pd.cut(pdf.x, breaks, labels=False, include_lowest=True) + 1
    for b, grp in pdf.groupby(cut):
        wmean = (grp.y * grp.w).sum() / grp.w.sum()
        assert fit[b] == pytest.approx(wmean, rel=1e-8)
    # unweighted differs (sanity that the weighting actually bound)
    r0 = dbbinsreg("y ~ x", df, points=(0, 0), binspos=breaks, ci=False)
    assert not np.allclose(
        r0.points["fit"].to_numpy(), r.points["fit"].to_numpy()
    )


def test_binsreg_weighted_spline_matches_dense_wls(spark):
    """Weighted constrained (spline) fit == dense numpy WLS on the same
    truncated-power basis."""
    from dbreg_spark import dbbinsreg

    rng = np.random.default_rng(22)
    n = 2500
    pdf = pd.DataFrame(
        {"x": rng.uniform(0, 1, n), "w": rng.uniform(0.5, 2.0, n)}
    )
    pdf["y"] = np.sin(3 * pdf.x) + rng.normal(scale=0.3, size=n)
    df = spark.createDataFrame(pdf)
    breaks = [0.0, 0.25, 0.5, 0.75, 1.0]
    r = dbbinsreg(
        "y ~ x", df, points=(1, 1), binspos=breaks, weights="w", ci=False,
        sample_fit=False,
    )
    # engine knots are the data-driven per-bin x-max (bin_geometry), not
    # the literal break values
    cut = pd.cut(pdf.x, breaks, labels=False, include_lowest=True)
    knots = pdf.groupby(cut)["x"].max().to_numpy()[:-1]
    X = np.column_stack(
        [np.ones(n), pdf.x]
        + [np.maximum(0.0, pdf.x - k) for k in knots]
    )
    w = pdf.w.to_numpy()
    b = np.linalg.solve(X.T @ (w[:, None] * X), X.T @ (w * pdf.y.to_numpy()))

    def spline_at(xv):
        return b[0] + b[1] * xv + sum(
            b[2 + j] * max(0.0, xv - k) for j, k in enumerate(knots)
        )

    for _, row in r.points.iterrows():
        assert row["fit"] == pytest.approx(spline_at(row["x"]), rel=1e-7)


# ----------------------------------------------------- Driscoll-Kraay -----


def _ts_panel(seed=11, n=3000, T=40):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "x1": rng.normal(size=n),
            "x2": rng.normal(size=n),
            "t": rng.integers(0, T, n),
            "f1": rng.integers(0, 6, n),
            "w": rng.uniform(0.5, 2.0, n),
        }
    )
    # serially correlated common shock so DK differs from HC1
    shock = np.cumsum(rng.normal(size=T)) * 0.3
    pdf["y"] = 1 + 2 * pdf.x1 - pdf.x2 + shock[pdf.t] + rng.normal(size=n)
    return pdf


def _dense_dk(X, y, t, lag, w=None, df_fe=0):
    """Dense Driscoll-Kraay with the engine's conventions."""
    n, p = X.shape
    w = np.ones(n) if w is None else w
    XtWX = X.T @ (w[:, None] * X)
    b = np.linalg.solve(XtWX, X.T @ (w * y))
    u = y - X @ b
    periods = np.sort(np.unique(t))
    S = np.vstack([(X[t == per] * (w * u)[t == per][:, None]).sum(0) for per in periods])
    T = len(periods)
    meat = S.T @ S
    for ell in range(1, lag + 1):
        wgt = 1.0 - ell / (lag + 1.0)
        G = S[ell:].T @ S[:-ell]
        meat += wgt * (G + G.T)
    Vi = np.linalg.inv(XtWX)
    scale = (T / (T - 1)) * (n / (n - p - df_fe))
    return b, np.sqrt(np.diag(scale * Vi @ meat @ Vi))


@pytest.fixture(scope="module")
def tspanel(spark):
    pdf = _ts_panel()
    return spark.createDataFrame(pdf), pdf


def test_dk_lag0_equals_cluster_by_time(tspanel):
    df, _ = tspanel
    mdk = dbreg("y ~ x1 + x2", df, strategy="moments", vcov="dk ~ t", hac_lag=0)
    mcl = dbreg("y ~ x1 + x2", df, strategy="moments", vcov="~t")
    np.testing.assert_allclose(
        mdk.se().to_numpy(), mcl.se().to_numpy(), rtol=1e-10
    )
    assert mdk.vcov_type == "dk"


def test_dk_moments_matches_dense_nw(tspanel):
    df, pdf = tspanel
    m = dbreg("y ~ x1 + x2", df, strategy="moments", vcov="dk ~ t", hac_lag=3)
    X = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    b, se = _dense_dk(X, pdf.y.to_numpy(), pdf.t.to_numpy(), lag=3)
    np.testing.assert_allclose(m.coef().to_numpy(), b, rtol=1e-9)
    np.testing.assert_allclose(m.se().to_numpy(), se, rtol=1e-9)
    # serial correlation present: DK(3) must differ from DK(0)
    m0 = dbreg("y ~ x1 + x2", df, strategy="moments", vcov="dk ~ t", hac_lag=0)
    assert not np.allclose(m.se().to_numpy(), m0.se().to_numpy(), rtol=1e-3)


def test_dk_demean_weighted_matches_dense(tspanel):
    df, pdf = tspanel
    m = dbreg(
        "y ~ x1 + x2 | f1", df, strategy="demean", vcov="dk ~ t",
        hac_lag=2, weights="w",
    )
    D = _fe_dummies(pdf.f1, drop_first=False)
    X = np.column_stack([pdf.x1, pdf.x2, D])
    b, se = _dense_dk(
        X, pdf.y.to_numpy(), pdf.t.to_numpy(), lag=2, w=pdf.w.to_numpy()
    )
    np.testing.assert_allclose(m.coef().to_numpy(), b[:2], rtol=1e-8)
    np.testing.assert_allclose(m.se().to_numpy(), se[:2], rtol=1e-7)


def test_dk_auto_lag_and_auto_strategy(tspanel):
    df, _ = tspanel
    # auto bandwidth runs; auto strategy never lands on compress under dk
    m = dbreg("y ~ x1 + x2 | f1", df, vcov="dk ~ t")
    assert m.strategy in ("demean", "moments")
    assert np.isfinite(m.se().to_numpy()).all()


def test_dk_compress_refused(tspanel):
    df, _ = tspanel
    with pytest.raises(NotImplementedError, match="Driscoll-Kraay"):
        dbreg("y ~ x1", df, strategy="compress", vcov="dk ~ t")
