"""Cells-compressed GLM (strategy='cells'): ONE groupBy pass + driver
IRLS on per-cell sufficient statistics must match the raw-frame
distributed IRLS exactly (same step-halving/convergence logic, so same
iteration path) — across families, vcovs, weights, offsets, ridge,
collinear designs. Plus the pass-count contract and the dbbinsglm
routing."""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from dbreg_spark.glm import dbglm
from dbreg_spark.glm_cells import _CELLS_PASS_STATS


@pytest.fixture(scope="module")
def cdata(spark):
    rng = np.random.default_rng(7)
    n = 6000
    g = rng.integers(0, 10, n)
    f2 = rng.integers(0, 3, n)
    w = rng.uniform(0.5, 2.0, n)
    cl = rng.integers(0, 20, n)
    eta = -0.5 + 0.15 * g - 0.4 * f2
    yb = (rng.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(float)
    mu = np.exp(0.1 + 0.08 * g + 0.2 * f2)
    yp = rng.poisson(mu).astype(float)
    yn = rng.poisson(mu * rng.gamma(2.0, 0.5, n)).astype(float)  # NB2
    yg = eta + rng.normal(size=n)
    off = np.log(rng.integers(1, 4, n)).astype(float)
    pdf = pd.DataFrame(
        dict(
            g=[f"g{v}" for v in g], f2=[f"f{v}" for v in f2],
            w=w, cl=cl.astype("int64"), yb=yb, yp=yp, yn=yn, yg=yg, off=off,
        )
    )
    df = spark.createDataFrame(pdf)
    df.cache().count()
    return df


def _assert_parity(kw, rtol=1e-8):
    a = dbglm(**kw)
    b = dbglm(**dict(kw, strategy="cells"))
    np.testing.assert_allclose(
        a.coeftable["estimate"].values, b.coeftable["estimate"].values,
        rtol=rtol,
    )
    np.testing.assert_allclose(
        a.coeftable["std.error"].values, b.coeftable["std.error"].values,
        rtol=rtol,
    )
    for fld in (
        "loglik", "deviance", "null_deviance", "pearson_chi2", "dispersion",
    ):
        av, bv = getattr(a, fld), getattr(b, fld)
        if np.isnan(av) and np.isnan(bv):
            continue
        np.testing.assert_allclose(av, bv, rtol=max(rtol, 1e-7), err_msg=fld)
    assert a.nobs == b.nobs
    assert a.n_clusters == b.n_clusters
    assert a.n_iter == b.n_iter  # identical convergence path
    assert list(a.coeftable.index) == list(b.coeftable.index)
    return b


@pytest.mark.parametrize(
    "fam,ycol", [("binomial", "yb"), ("poisson", "yp"), ("gaussian", "yg"),
                 ("quasipoisson", "yp")],
)
@pytest.mark.parametrize("vcov", ["iid", "hc1", "hc3", "~ cl"])
def test_cells_matches_raw(cdata, fam, ycol, vcov):
    _assert_parity(
        dict(fml=f"{ycol} ~ g + f2", data=cdata, family=fam, vcov=vcov)
    )
    # unweighted: everything is cell-computable — exactly ONE Spark pass
    assert _CELLS_PASS_STATS["n_spark_passes"] == 1


def test_cells_weighted_and_offset(cdata):
    # weighted hc1 stays one pass (omega^2 sums ride the same groupBy);
    # weighted hc2/hc3 leverage is per-row -> one disclosed raw meat pass
    _assert_parity(
        dict(fml="yp ~ g + f2", data=cdata, family="poisson", vcov="hc1",
             weights="w")
    )
    assert _CELLS_PASS_STATS["n_spark_passes"] == 1
    _assert_parity(
        dict(fml="yp ~ g + f2", data=cdata, family="poisson", vcov="hc3",
             weights="w")
    )
    assert _CELLS_PASS_STATS["n_spark_passes"] == 2
    # offset joins the groupBy keys (eta must be constant within a cell)
    _assert_parity(
        dict(fml="yp ~ g", data=cdata, family="poisson", vcov="hc1",
             offset="off")
    )


def test_cells_multiway_dk_negbin(cdata):
    _assert_parity(
        dict(fml="yb ~ g", data=cdata, family="binomial", vcov="~ cl + f2")
    )
    _assert_parity(
        dict(fml="yb ~ g", data=cdata, family="binomial", vcov="dk ~ cl")
    )
    m = _assert_parity(
        dict(fml="yn ~ g + f2", data=cdata, family="negbin", vcov="hc1",
             theta=2.0)
    )
    # fixed-theta negbin pays one extra y-histogram pass for the lgamma
    # constant in the reported loglik
    assert _CELLS_PASS_STATS["n_spark_passes"] == 2
    assert m.family == "negbin(theta=2.0)"
    # two-step theta: the poisson seed fit and the refit both ride cells
    _assert_parity(
        dict(fml="yn ~ g + f2", data=cdata, family="negbin", vcov="iid")
    )


def test_cells_ridge_noicpt_collinear(cdata):
    _assert_parity(
        dict(fml="yb ~ 0 + g", data=cdata, family="binomial", vcov="hc1")
    )
    _assert_parity(
        dict(fml="yb ~ g + f2", data=cdata, family="binomial", l2=0.5)
    )
    df2 = cdata.withColumn("f2b", F.col("f2"))
    m = _assert_parity(
        dict(fml="yb ~ g + f2 + f2b", data=df2, family="binomial",
             vcov="hc1")
    )
    assert m.collin_vars  # the duplicated factor's dummies dropped


def test_cells_guards(cdata):
    with pytest.raises(NotImplementedError, match="cells"):
        dbglm("yp ~ f2 | g", cdata, family="poisson", strategy="cells")
    with pytest.raises(ValueError, match="strategy"):
        dbglm("yb ~ g", cdata, family="binomial", strategy="bogus")
    # over-cap cell count falls back to raw IRLS with a warning
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        m = dbglm(
            "yb ~ g", cdata, family="binomial", strategy="cells",
            cells_nmax=3,
        )
    assert any("falling back" in str(x.message) for x in rec)
    o = dbglm("yb ~ g", cdata, family="binomial")
    np.testing.assert_allclose(
        m.coeftable["estimate"].values, o.coeftable["estimate"].values,
        rtol=1e-12,
    )


def test_dbbinsglm_routes_through_cells(cdata):
    """dbbinsglm with no/discrete controls must take the cells path (one
    compress pass instead of ~n_iter raw scans) and reproduce the raw-path
    fit exactly."""
    from dbreg_spark import dbbinsglm

    df = cdata.withColumn("x", F.col("yg") + F.col("cl").cast("double"))
    _CELLS_PASS_STATS.clear()
    r = dbbinsglm(
        "yb ~ x", df, family="binomial", nbins=8, vcov="hc1", cb=True
    )
    assert _CELLS_PASS_STATS.get("n_spark_passes") == 1
    assert r.model.converged
    # discrete (factor) controls still ride cells
    _CELLS_PASS_STATS.clear()
    r2 = dbbinsglm("yb ~ x + f2", df, family="binomial", nbins=8, vcov="hc1")
    assert _CELLS_PASS_STATS.get("n_spark_passes") == 1
    # numeric controls are not compression fodder -> raw path
    _CELLS_PASS_STATS.clear()
    r3 = dbbinsglm("yb ~ x + yg", df, family="binomial", nbins=8, vcov="hc1")
    assert "n_spark_passes" not in _CELLS_PASS_STATS
    assert r3.model.converged
