"""Slice-0 end-to-end: moments strategy vs numpy lstsq + DuckDB oracles."""

import numpy as np
import pytest

from dbreg_spark import dbreg


@pytest.fixture(scope="module")
def li(tables):
    return tables["lineitem"]


def _numpy_ols(pdf, y, xs):
    X = np.column_stack([np.ones(len(pdf))] + [pdf[x].to_numpy(float) for x in xs])
    yv = pdf[y].to_numpy(float)
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    resid = yv - X @ beta
    n, p = X.shape
    sigma2 = resid @ resid / (n - p)
    V = sigma2 * np.linalg.inv(X.T @ X)
    return beta, np.sqrt(np.diag(V))


def test_moments_vs_numpy(spark, li):
    m = dbreg(
        "l_extendedprice ~ l_quantity + l_discount",
        li,
        strategy="moments",
    )
    pdf = li.select("l_extendedprice", "l_quantity", "l_discount").toPandas()
    beta, se = _numpy_ols(pdf, "l_extendedprice", ["l_quantity", "l_discount"])
    np.testing.assert_allclose(m.coef().to_numpy(), beta, rtol=1e-6)
    np.testing.assert_allclose(m.se().to_numpy(), se, rtol=1e-6)
    assert m.nobs_orig == li.count()
    assert m.coef_names == ["(Intercept)", "l_quantity", "l_discount"]


def test_moments_sql_matches_duckdb(spark, li, duck):
    """The emitted oracle SQL reproduces the Spark moments row in DuckDB."""
    sql = dbreg(
        "l_extendedprice ~ l_quantity + l_discount",
        table="lineitem",
        spark=spark,
        strategy="moments",
        sql_only=True,
    )
    assert "WITH base AS" in sql and "moments AS" in sql
    ddf = duck.execute(sql).fetchdf()
    row = dbreg(
        "l_extendedprice ~ l_quantity + l_discount",
        table="lineitem",
        spark=spark,
        strategy="moments",
        data_only=True,
    )
    for c in ddf.columns:
        np.testing.assert_allclose(
            row[c].iloc[0], ddf[c].iloc[0], rtol=1e-9, err_msg=c
        )


def test_moments_hc1(spark, li):
    m = dbreg(
        "l_extendedprice ~ l_quantity + l_discount", li, strategy="moments", vcov="hc1"
    )
    # HC1 oracle in numpy
    pdf = li.select("l_extendedprice", "l_quantity", "l_discount").toPandas()
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["l_quantity"], pdf["l_discount"]]
    ).astype(float)
    y = pdf["l_extendedprice"].to_numpy(float)
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    e = y - X @ beta
    n, p = X.shape
    bread = np.linalg.inv(X.T @ X)
    meat = (X * (e**2)[:, None]).T @ X
    V = (n / (n - p)) * bread @ meat @ bread
    np.testing.assert_allclose(m.se().to_numpy(), np.sqrt(np.diag(V)), rtol=1e-6)


def test_moments_cluster(spark, li):
    m = dbreg(
        "l_extendedprice ~ l_quantity + l_discount",
        li,
        strategy="moments",
        vcov="~l_returnflag",
    )
    assert m.n_clusters == 3
    pdf = li.select(
        "l_extendedprice", "l_quantity", "l_discount", "l_returnflag"
    ).toPandas()
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["l_quantity"], pdf["l_discount"]]
    ).astype(float)
    y = pdf["l_extendedprice"].to_numpy(float)
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    e = y - X @ beta
    n, p = X.shape
    bread = np.linalg.inv(X.T @ X)
    meat = np.zeros((p, p))
    for g in pdf["l_returnflag"].unique():
        idx = (pdf["l_returnflag"] == g).to_numpy()
        s = X[idx].T @ e[idx]
        meat += np.outer(s, s)
    G = pdf["l_returnflag"].nunique()
    V = (G / (G - 1)) * (n / (n - p)) * bread @ meat @ bread
    np.testing.assert_allclose(m.se().to_numpy(), np.sqrt(np.diag(V)), rtol=1e-6)


def test_gof(spark, li):
    m = dbreg("l_extendedprice ~ l_quantity", li, strategy="moments")
    pdf = li.select("l_extendedprice", "l_quantity").toPandas()
    yv = pdf["l_extendedprice"].to_numpy(float)
    X = np.column_stack([np.ones(len(pdf)), pdf["l_quantity"]]).astype(float)
    beta = np.linalg.lstsq(X, yv, rcond=None)[0]
    resid = yv - X @ beta
    ss_res = resid @ resid
    ss_tot = ((yv - yv.mean()) ** 2).sum()
    np.testing.assert_allclose(m.r2(), 1 - ss_res / ss_tot, rtol=1e-9)


def test_no_intercept_moments_matches_numpy(tables):
    """`y ~ 0 + x` on the moments strategy: the formula's intercept flag
    is honored (no silent intercept), R² uses the uncentered TSS (R's
    no-intercept summary.lm convention), HC1 follows the kept layout."""
    import numpy as np

    li = tables["lineitem"].select(
        "l_extendedprice", "l_quantity", "l_discount"
    ).dropna()
    from dbreg_spark import dbreg

    m = dbreg(
        "l_extendedprice ~ 0 + l_quantity + l_discount", li,
        strategy="moments", vcov="hc1",
    )
    assert "(Intercept)" not in m.coef_names
    pdf = li.toPandas()
    X = pdf[["l_quantity", "l_discount"]].to_numpy(dtype=float)
    y = pdf["l_extendedprice"].to_numpy(dtype=float)
    b = np.linalg.solve(X.T @ X, X.T @ y)
    np.testing.assert_allclose(
        m.coeftable["estimate"].values, b, rtol=1e-9
    )
    u = y - X @ b
    n, p = X.shape
    XtXi = np.linalg.inv(X.T @ X)
    V = (n / (n - p)) * XtXi @ (X * (u * u)[:, None]).T @ X @ XtXi
    np.testing.assert_allclose(
        m.coeftable["std.error"].values, np.sqrt(np.diag(V)), rtol=1e-8
    )
    # uncentered R²
    np.testing.assert_allclose(
        m.r2(), 1 - (u @ u) / (y @ y), rtol=1e-10
    )


def test_no_intercept_compress_refused(tables):
    from dbreg_spark import dbreg
    import pytest as _pt

    li = tables["lineitem"]
    with _pt.raises(NotImplementedError, match="no-intercept"):
        dbreg(
            "l_tax ~ 0 + l_quantity | l_returnflag", li,
            strategy="compress",
        )
