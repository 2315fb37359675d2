"""dbglm_multi: lockstep multiple GLM estimation. Oracle = per-model
dbglm — the lockstep passes must reproduce each single fit's
coefficients, SEs, loglik, dispersion and iteration count exactly; the
pass counter pins that the distributed work tracks the SLOWEST model,
not the model count."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from dbreg_spark import dbglm, dbglm_multi


def _chk(m, o, rb=1e-8, rs=1e-7):
    assert m.coef_names == o.coef_names
    np.testing.assert_allclose(
        m.coeftable["estimate"].values, o.coeftable["estimate"].values,
        rtol=rb,
    )
    np.testing.assert_allclose(
        m.coeftable["std.error"].values, o.coeftable["std.error"].values,
        rtol=rs,
    )
    np.testing.assert_allclose(m.loglik, o.loglik, rtol=1e-9)
    np.testing.assert_allclose(m.deviance, o.deviance, rtol=1e-8)
    if o.family == "gaussian":
        # dbglm special-cases the one-step identity link (2 passes); the
        # generic lockstep loop needs one extra pass to OBSERVE convergence
        assert m.n_iter in (o.n_iter, o.n_iter + 1)
    else:
        assert m.n_iter == o.n_iter
    assert m.nobs == o.nobs and m.n_clusters == o.n_clusters


@pytest.fixture(scope="module")
def li_glm(tables):
    return tables["lineitem"].withColumn(
        "is_return", (F.col("l_returnflag") == "R").cast("double")
    ).withColumn("w", F.col("l_quantity") / 10.0 + 0.5)


def test_multi_glm_logit_hc1_matches_single(li_glm):
    mm = dbglm_multi(
        "is_return ~ l_quantity + csw(l_discount, l_linenumber)",
        li_glm, family="binomial", vcov="hc1",
    )
    assert len(mm) == 2
    for (y, step), m in mm.models.items():
        _chk(m, dbglm(f"{y} ~ l_quantity + {step}", li_glm,
                      family="binomial", vcov="hc1"))
    # lockstep: passes = 1 (beta=0) + slowest model's Newton iterations
    # + 1 batched meat — NOT sum over models
    slowest = max(m.n_iter for m in mm)
    assert mm.n_passes == slowest + 1


def test_multi_glm_poisson_cluster_multi_lhs(li_glm):
    mm = dbglm_multi(
        "c(l_linenumber, l_quantity) ~ sw(l_discount, l_tax)",
        li_glm, family="poisson", vcov="~ l_returnflag",
    )
    assert len(mm) == 4
    for (y, step), m in mm.models.items():
        _chk(m, dbglm(f"{y} ~ {step}", li_glm, family="poisson",
                      vcov="~ l_returnflag"))
    slowest = max(m.n_iter for m in mm)
    assert mm.n_passes == slowest + 1


def test_multi_glm_gaussian_weighted_dk(li_glm):
    mm = dbglm_multi(
        "l_extendedprice ~ sw(l_quantity, l_discount)", li_glm,
        family="gaussian", weights="w", vcov="dk ~ l_linenumber", hac_lag=1,
    )
    for (y, step), m in mm.models.items():
        o = dbglm(f"{y} ~ {step}", li_glm, family="gaussian", weights="w",
                  vcov="dk ~ l_linenumber", hac_lag=1)
        _chk(m, o)
        np.testing.assert_allclose(m.dispersion, o.dispersion, rtol=1e-9)


def test_multi_glm_negbin_cgm(li_glm):
    mm = dbglm_multi(
        "l_linenumber ~ sw(l_quantity, l_discount)", li_glm,
        family="negbin", theta=2.5,
        vcov="~ l_returnflag + l_linestatus",
    )
    for (y, step), m in mm.models.items():
        _chk(m, dbglm(f"{y} ~ {step}", li_glm, family="negbin", theta=2.5,
                      vcov="~ l_returnflag + l_linestatus"))


def test_multi_glm_quasi_dispersion(li_glm):
    mm = dbglm_multi(
        "l_linenumber ~ csw(l_quantity, l_discount)", li_glm,
        family="quasipoisson",
    )
    for (y, step), m in mm.models.items():
        o = dbglm(f"{y} ~ {step}", li_glm, family="quasipoisson")
        _chk(m, o)
        np.testing.assert_allclose(m.dispersion, o.dispersion, rtol=1e-9)
        assert m.inference == "t"


def test_multi_glm_factor_step_and_predict(li_glm):
    mm = dbglm_multi(
        "is_return ~ l_quantity + sw(l_linestatus, l_discount)", li_glm,
        family="binomial",
    )
    for (y, step), m in mm.models.items():
        _chk(m, dbglm(f"{y} ~ l_quantity + {step}", li_glm,
                      family="binomial"))
    m = mm[("is_return", "l_linestatus")]
    o = dbglm("is_return ~ l_quantity + l_linestatus", li_glm,
              family="binomial")
    a = m.predict(li_glm).agg(F.sum("fit")).collect()[0][0]
    b = o.predict(li_glm).agg(F.sum("fit")).collect()[0][0]
    np.testing.assert_allclose(a, b, rtol=1e-10)


def test_multi_glm_refusals(li_glm):
    with pytest.raises(NotImplementedError, match="fixed effects"):
        dbglm_multi("l_linenumber ~ sw(l_quantity, l_discount) | l_returnflag",
                    li_glm, family="poisson")
    with pytest.raises(NotImplementedError, match="cr3"):
        dbglm_multi("is_return ~ sw(l_quantity, l_discount)", li_glm,
                    family="binomial", vcov="cr3 ~ l_returnflag")
    with pytest.raises(ValueError, match="must be numeric"):
        dbglm_multi("c(is_return, l_returnflag) ~ l_quantity", li_glm,
                    family="binomial")
    with pytest.raises(ValueError, match="outside"):
        dbglm_multi("c(is_return, l_quantity) ~ l_discount", li_glm,
                    family="binomial")


def test_multi_glm_negbin_auto_theta_matches_single(li_glm):
    """negbin with theta=None: the per-model two-step (poisson lockstep ->
    ONE shared alpha pass -> per-model fixed-theta negbin lockstep) must
    reproduce each dbglm(family='negbin', theta=None) two-step fit —
    including each model's own theta-hat in the family label."""
    mm = dbglm_multi(
        "l_linenumber ~ sw(l_quantity, l_discount)", li_glm,
        family="negbin", vcov="hc1",
    )
    thetas = set()
    for (y, step), m in mm.models.items():
        o = dbglm(f"{y} ~ {step}", li_glm, family="negbin", vcov="hc1")
        assert m.coef_names == o.coef_names
        np.testing.assert_allclose(
            m.coeftable["estimate"].values, o.coeftable["estimate"].values,
            rtol=1e-7,
        )
        np.testing.assert_allclose(
            m.coeftable["std.error"].values,
            o.coeftable["std.error"].values, rtol=1e-6,
        )
        np.testing.assert_allclose(m.loglik, o.loglik, rtol=1e-8)
        assert m.family.startswith("negbin(theta=")
        th_m = float(m.family[len("negbin(theta="):-1])
        th_o = float(o.family[len("negbin(theta="):-1])
        np.testing.assert_allclose(th_m, th_o, rtol=1e-7)
        thetas.add(round(th_m, 6))
    # the two submodels genuinely get DIFFERENT thetas
    assert len(thetas) == 2
