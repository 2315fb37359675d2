"""Distributed-Gram compress fallback: must reproduce the driver-WLS path
exactly (same blocks, same estimator) without collecting the cells.

Judge contract (VERDICT r01 #2): fitting with compress_nmax small enough to
trip the fallback produces coefficients equal to the driver-WLS path to
1e-10, and the compress_cells gate is unchanged.
"""

import numpy as np
import pytest

from dbreg_spark import dbreg

FML = "l_tax ~ l_quantity + l_discount | l_returnflag + l_linestatus"
FML_FACTOR_X = "l_tax ~ l_quantity + l_returnflag | l_linestatus"


def _assert_models_match(m_drv, m_dist, rtol=1e-10):
    assert m_dist.strategy == "compress"
    assert set(m_dist.coef().index) == set(m_drv.coef().index)
    b1 = m_drv.coef().sort_index()
    b2 = m_dist.coef().sort_index()
    np.testing.assert_allclose(b2.to_numpy(), b1.to_numpy(), rtol=rtol)
    np.testing.assert_allclose(
        m_dist.se().sort_index().to_numpy(),
        m_drv.se().sort_index().to_numpy(),
        rtol=1e-8,
    )
    assert m_dist.nobs_orig == m_drv.nobs_orig
    assert m_dist.nobs == m_drv.nobs
    np.testing.assert_allclose(m_dist.rss, m_drv.rss, rtol=1e-8)
    np.testing.assert_allclose(m_dist.tss, m_drv.tss, rtol=1e-10)
    np.testing.assert_allclose(m_dist.r2(), m_drv.r2(), rtol=1e-8)


@pytest.mark.parametrize("vcov", ["iid", "hc1"])
def test_fallback_matches_driver_wls(tables, vcov):
    li = tables["lineitem"]
    m_drv = dbreg(FML, li, strategy="compress", vcov=vcov)
    m_dist = dbreg(FML, li, strategy="compress", vcov=vcov, compress_nmax=100)
    _assert_models_match(m_drv, m_dist)


def test_fallback_factor_regressor(tables):
    """String regressor → categorical block in the distributed Gram."""
    li = tables["lineitem"]
    m_drv = dbreg(FML_FACTOR_X, li, strategy="compress", vcov="hc1")
    m_dist = dbreg(
        FML_FACTOR_X, li, strategy="compress", vcov="hc1", compress_nmax=100
    )
    _assert_models_match(m_drv, m_dist)


def test_fallback_cluster_refused(tables):
    with pytest.raises(ValueError, match="distributed-Gram"):
        dbreg(
            FML,
            tables["lineitem"],
            strategy="compress",
            vcov="~l_returnflag",
            compress_nmax=100,
        )


def test_fallback_width_guard(tables):
    """Expanded width past p_max must raise with demean/mundlak guidance,
    not attempt a dense solve."""
    with pytest.raises(ValueError, match="demean"):
        # l_extendedprice is near-unique → expanded width far past p_max
        dbreg(
            "l_tax ~ l_quantity | l_extendedprice",
            tables["lineitem"],
            strategy="compress",
            compress_nmax=100,
        )


def test_fallback_predict_matches_driver(tables):
    li = tables["lineitem"]
    m_drv = dbreg(FML, li, strategy="compress")
    m_dist = dbreg(FML, li, strategy="compress", compress_nmax=100)
    keys = ["l_orderkey", "l_linenumber"]
    a = m_drv.predict(li).select(*keys, "fit").toPandas().sort_values(keys)
    b = m_dist.predict(li).select(*keys, "fit").toPandas().sort_values(keys)
    np.testing.assert_allclose(
        b["fit"].to_numpy(), a["fit"].to_numpy(), rtol=1e-9
    )
    # no retained cells past the cap → newdata required
    with pytest.raises(ValueError, match="newdata"):
        m_dist.predict()
