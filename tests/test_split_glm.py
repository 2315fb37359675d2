"""Lockstep grouped-IRLS GLM split: every level must equal the per-level
filtered dbglm fit exactly while pass counts stay level-count-independent."""

import numpy as np
import pandas as pd
import pytest

from dbreg_spark import dbglm
from dbreg_spark.split_glm import dbglm_split


def _gen(seed=4, n=9000):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "x1": rng.normal(size=n),
            "x2": rng.normal(size=n),
            "g": rng.choice(["a", "b", "c"], n),
            "cl": rng.integers(0, 12, n),
            "w": rng.uniform(0.5, 2.0, n),
            "off": rng.uniform(0.0, 0.5, n),
        }
    )
    slope = np.where(pdf.g == "a", 1.5, np.where(pdf.g == "b", -0.8, 0.3))
    eta = -0.2 + slope * pdf.x1 + 0.5 * pdf.x2
    pdf["y"] = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float)
    pdf["cnt"] = rng.poisson(np.exp(0.3 + 0.4 * pdf.x1))
    return pdf


@pytest.fixture(scope="module")
def gdata(spark):
    pdf = _gen()
    return spark.createDataFrame(pdf), pdf


def _match(sm, ref, rel=1e-9):
    np.testing.assert_allclose(
        sm.coef().to_numpy(), ref.coef().to_numpy(), rtol=rel, atol=1e-12
    )
    np.testing.assert_allclose(
        sm.se().to_numpy(), ref.se().to_numpy(), rtol=rel, atol=1e-12
    )
    assert sm.loglik == pytest.approx(ref.loglik, rel=1e-10)
    assert sm.deviance == pytest.approx(ref.deviance, rel=1e-10)
    assert sm.converged == ref.converged


@pytest.mark.parametrize("vcov", ["iid", "hc1", "~cl"])
def test_glm_split_logit_matches_filtered(gdata, vcov):
    df, _ = gdata
    ms = dbglm_split("y ~ x1 + x2", df, split="g", family="binomial", vcov=vcov)
    assert set(ms) == {"a", "b", "c"}
    for lvl in ms:
        ref = dbglm(
            "y ~ x1 + x2", df.where(df.g == lvl), family="binomial", vcov=vcov
        )
        _match(ms[lvl], ref)


def test_glm_split_poisson_offset_weights(gdata):
    df, _ = gdata
    ms = dbglm_split(
        "cnt ~ x1", df, split="g", family="poisson", offset="off",
        weights="w", vcov="hc1",
    )
    for lvl in ms:
        ref = dbglm(
            "cnt ~ x1", df.where(df.g == lvl), family="poisson",
            offset="off", weights="w", vcov="hc1",
        )
        _match(ms[lvl], ref)


def test_glm_split_gaussian(gdata):
    df, pdf = gdata
    ms = dbglm_split("x2 ~ x1", df, split="g", family="gaussian")
    for lvl in ms:
        ref = dbglm("x2 ~ x1", df.where(df.g == lvl), family="gaussian")
        np.testing.assert_allclose(
            ms[lvl].coef().to_numpy(), ref.coef().to_numpy(), rtol=1e-9
        )
        np.testing.assert_allclose(
            ms[lvl].se().to_numpy(), ref.se().to_numpy(), rtol=1e-8
        )


def test_glm_split_tidy_and_refusals(gdata):
    df, _ = gdata
    ms = dbglm_split("y ~ x1", df, split="g")
    t = ms.tidy()
    assert list(t.columns)[0] == "g" and len(t) == 6
    with pytest.raises(ValueError, match="0/1"):
        dbglm_split("x1 ~ x2", df, split="g", family="binomial")


def test_glm_split_per_level_validity(spark):
    """A poisson-invalid level (negative outcome) is reported by level."""
    rng = np.random.default_rng(9)
    n = 600
    pdf = pd.DataFrame(
        {"x": rng.normal(size=n), "g": ["u"] * (n // 2) + ["v"] * (n // 2)}
    )
    pdf["y"] = rng.poisson(2.0, n).astype(float)
    pdf.loc[pdf.g == "v", "y"] = -1.0
    with pytest.raises(ValueError, match="'v'"):
        dbglm_split(
            "y ~ x", spark.createDataFrame(pdf), split="g", family="poisson"
        )


def test_glm_split_nan_weight_raises(spark):
    """NaN weights sort above every real in Spark MIN — the Σw probe must
    still catch them per level (not a step-halving warning)."""
    rng = np.random.default_rng(11)
    n = 400
    pdf = pd.DataFrame(
        {
            "x": rng.normal(size=n),
            "g": ["u"] * (n // 2) + ["v"] * (n // 2),
            "w": rng.uniform(0.5, 2.0, n),
        }
    )
    pdf["y"] = (rng.random(n) < 0.5).astype(float)
    pdf.loc[10, "w"] = np.nan
    with pytest.raises(ValueError, match="non-positive or NaN"):
        dbglm_split(
            "y ~ x", spark.createDataFrame(pdf), split="g",
            family="binomial", weights="w",
        )


def test_glm_split_all_null_level(spark):
    """An entirely-NULL split level must fit (explicit __lvl schema — type
    inference would fail on the all-None driver row) and match the filtered
    per-level dbglm fit."""
    pdf = _gen(seed=7, n=3000)
    pdf["g"] = pdf["g"].astype(object)
    pdf.loc[pdf.g == "c", "g"] = None
    df = spark.createDataFrame(pdf)
    res = dbglm_split("y ~ x1 + x2", df, split="g", family="binomial",
                      vcov="hc1")
    assert set(res) == {"a", "b", None}
    ref = dbglm("y ~ x1 + x2", df.where("g IS NULL"), family="binomial",
                vcov="hc1")
    _match(res[None], ref)


def test_glm_split_save_load_roundtrip(gdata, tmp_path):
    df, pdf = gdata
    ms = dbglm_split("y ~ x1 + x2", df, split="g", family="binomial",
                     vcov="hc1")
    p = str(tmp_path / "glm_split_res")
    ms.save(p)
    from dbreg_spark.split_glm import GlmSplit

    ms2 = GlmSplit.load(p, df.sparkSession)
    assert type(ms2) is GlmSplit and set(ms2) == set(ms)
    for lvl in ms:
        np.testing.assert_array_equal(
            ms[lvl].coef().to_numpy(), ms2[lvl].coef().to_numpy()
        )
        np.testing.assert_array_equal(ms[lvl].vcov_, ms2[lvl].vcov_)
        assert ms2[lvl].loglik == ms[lvl].loglik
        assert ms2[lvl].family == ms[lvl].family


def test_glm_split_multiway_cluster_matches_filtered(gdata):
    """2-way CGM per level must equal the per-level filtered dbglm fit."""
    _, pdf = gdata
    rng = np.random.default_rng(21)
    pdf2 = pdf.assign(cl2=rng.integers(0, 9, len(pdf)))
    import pyspark.sql

    df = pyspark.sql.SparkSession.getActiveSession().createDataFrame(pdf2)
    ms = dbglm_split(
        "y ~ x1 + x2", df, split="g", family="binomial", vcov="~cl + cl2"
    )
    for lvl in ms:
        ref = dbglm(
            "y ~ x1 + x2", df.where(df.g == lvl), family="binomial",
            vcov="~cl + cl2",
        )
        _match(ms[lvl], ref)
        assert ms[lvl].n_clusters == ref.n_clusters


def test_glm_split_dk_matches_filtered(gdata):
    """Per-level Driscoll-Kraay (NW over per-period scores) must equal the
    filtered dbglm DK fit, auto and fixed lag."""
    df, pdf = gdata
    for lag in (0, 2, None):
        ms = dbglm_split(
            "y ~ x1 + x2", df, split="g", family="binomial",
            vcov="dk ~ cl", hac_lag=lag,
        )
        for lvl in ms:
            ref = dbglm(
                "y ~ x1 + x2", df.where(df.g == lvl), family="binomial",
                vcov="dk ~ cl", hac_lag=lag,
            )
            _match(ms[lvl], ref)


def test_glm_split_single_cluster_level_clear_error(spark):
    """ADVICE r06: one cluster (or DK period) inside a split level must be
    a clear per-level error, not ZeroDivisionError from G/(G-1)."""
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "x": rng.normal(size=60),
            "g": ["a"] * 30 + ["b"] * 30,
            "cl": [0] * 15 + [1] * 15 + [7] * 30,
        }
    )
    pdf["y"] = (rng.uniform(size=60) < 1 / (1 + np.exp(-pdf.x))).astype(float)
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="level 'b'"):
        dbglm_split("y ~ x", df, split="g", family="binomial", vcov="~cl")
    with pytest.raises(ValueError, match="level 'b'"):
        dbglm_split(
            "y ~ x", df, split="g", family="binomial", vcov="dk ~ cl",
            hac_lag=1,
        )


@pytest.mark.parametrize("family", ["quasipoisson", "quasibinomial"])
def test_glm_split_quasi_matches_filtered(gdata, family):
    """VERDICT r06 #7: quasi families — per-level Pearson dispersion from
    the shared grouped pass, t inference; exact parity vs per-level dbglm."""
    df, _ = gdata
    yv = "cnt" if family == "quasipoisson" else "y"
    ms = dbglm_split(f"{yv} ~ x1 + x2", df, split="g", family=family)
    assert set(ms) == {"a", "b", "c"}
    for lvl in ms:
        ref = dbglm(f"{yv} ~ x1 + x2", df.where(df.g == lvl), family=family)
        _match(ms[lvl], ref)
        assert ms[lvl].dispersion == pytest.approx(ref.dispersion, rel=1e-10)
        assert ms[lvl].dispersion != 1.0  # estimated, not fixed
        assert ms[lvl].inference == "t"


@pytest.fixture(scope="module")
def fedata(spark):
    rng = np.random.default_rng(7)
    n = 8000
    pdf = pd.DataFrame(
        {
            "x1": rng.normal(size=n),
            "x2": rng.normal(size=n),
            "g": rng.choice(["a", "b", "c"], n),
            "fe": rng.integers(0, 15, n),
            "cl": rng.integers(0, 10, n),
            "t": rng.integers(0, 6, n),
            "w": rng.uniform(0.5, 2.0, n),
            "off": rng.uniform(0.0, 0.3, n),
        }
    )
    alpha = rng.normal(size=15) * 0.5
    slope = np.where(pdf.g == "a", 0.5, np.where(pdf.g == "b", -0.3, 0.1))
    pdf["cnt"] = rng.poisson(
        np.exp(0.2 + slope * pdf.x1 + 0.3 * pdf.x2 + alpha[pdf.fe])
    )
    # a column constant within fe for level 'a' only (absorbed there);
    # in level 'b', fe group 14 has all-zero outcomes (separation)
    pdf["xc"] = np.where(pdf.g == "a", pdf.fe * 0.1, rng.normal(size=n))
    pdf.loc[(pdf.g == "b") & (pdf.fe == 14), "cnt"] = 0
    return spark.createDataFrame(pdf), pdf


def _match_fepois(sm, ref):
    np.testing.assert_allclose(
        sm.coef().to_numpy(), ref.coef().to_numpy(), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        sm.se().to_numpy(), ref.se().to_numpy(), rtol=1e-9, atol=1e-12
    )
    assert sm.loglik == pytest.approx(ref.loglik, rel=1e-10)
    assert sm.nobs == ref.nobs and sm.df_residual == ref.df_residual
    assert sm.n_iter == ref.n_iter and sm.converged == ref.converged


@pytest.mark.parametrize("vcov", ["iid", "hc1", "~cl"])
def test_glm_split_fepois_matches_filtered(fedata, vcov):
    """VERDICT r06 #4: one absorbed FE in dbglm_split — the profiled
    Newton step in lockstep must equal per-level dbglm fepois exactly
    (coef, se, ll, dof with k = p + G_level, iteration trajectory)."""
    df, _ = fedata
    ms = dbglm_split(
        "cnt ~ x1 + x2 | fe", df, split="g", family="poisson", vcov=vcov
    )
    assert set(ms) == {"a", "b", "c"}
    for lvl in ms:
        ref = dbglm(
            "cnt ~ x1 + x2 | fe", df.where(df.g == lvl), family="poisson",
            vcov=vcov,
        )
        _match_fepois(ms[lvl], ref)


def test_glm_split_fepois_weights_offset_dk(fedata):
    df, _ = fedata
    ms = dbglm_split(
        "cnt ~ x1 | fe", df, split="g", family="poisson", weights="w",
        offset="off", vcov="dk ~ t", hac_lag=1,
    )
    for lvl in ms:
        ref = dbglm(
            "cnt ~ x1 | fe", df.where(df.g == lvl), family="poisson",
            weights="w", offset="off", vcov="dk ~ t", hac_lag=1,
        )
        _match_fepois(ms[lvl], ref)


def test_glm_split_fepois_per_level_absorption_and_separation(fedata):
    """xc is FE-constant only in level 'a' (dropped there, kept elsewhere);
    level 'b' has an all-zero-outcome FE group (lambda=0 -> NULL fixef,
    rows stay in nobs) — both per-level behaviors must match dbglm."""
    df, _ = fedata
    ms = dbglm_split(
        "cnt ~ x1 + xc | fe", df, split="g", family="poisson",
        vcov="~cl + t",
    )
    for lvl in ms:
        ref = dbglm(
            "cnt ~ x1 + xc | fe", df.where(df.g == lvl), family="poisson",
            vcov="~cl + t",
        )
        assert list(ms[lvl].coef().index) == list(ref.coef().index)
        assert ms[lvl].collin_vars == ref.collin_vars
        _match_fepois(ms[lvl], ref)
    assert ms["a"].collin_vars == ["xc"] and ms["b"].collin_vars == []
    # separated group: NULL fixef for fe=14 in level 'b', matching dbglm
    fx = ms["b"]._fe_table.toPandas().sort_values("fe").reset_index(drop=True)
    rf = (
        dbglm("cnt ~ x1 + xc | fe", df.where(df.g == "b"), family="poisson")
        ._fe_table.toPandas().sort_values("fe").reset_index(drop=True)
    )
    assert fx[fx.fe == 14]["fixef"].isna().all()
    np.testing.assert_allclose(
        fx.fixef.fillna(-999.0), rf.fixef.fillna(-999.0), rtol=1e-8
    )


def test_glm_split_fepois_refusals(fedata):
    df, _ = fedata
    with pytest.raises(NotImplementedError, match="poisson family only"):
        dbglm_split("cnt ~ x1 | fe", df, split="g", family="binomial")
    with pytest.raises(NotImplementedError, match="at most ONE"):
        dbglm_split("cnt ~ x1 | fe + cl", df, split="g", family="poisson")


def test_glm_split_fepois_passes_track_slowest_level(fedata):
    """The lockstep contract: Newton passes == the SLOWEST level's
    iteration count (every pass advances all active levels), independent
    of the number of levels G."""
    from dbreg_spark import split_glm as sgm

    df, _ = fedata
    ms = dbglm_split(
        "cnt ~ x1 + x2 | fe", df, split="g", family="poisson"
    )
    stats = sgm._FEPOIS_SPLIT_STATS
    assert stats["newton_passes"] == stats["max_level_iters"]
    assert stats["max_level_iters"] == max(m.n_iter for m in ms.values())
