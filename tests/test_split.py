"""Split-sample estimation: every level must equal the per-level filtered
dbreg fit exactly (same estimator, same dof, same sandwiches) while the
split runs in O(1) full-data passes."""

import numpy as np
import pandas as pd
import pytest

from dbreg_spark import dbreg, dbreg_split


def _gen(seed=42, n=6000):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "x1": rng.normal(size=n),
            "x2": rng.normal(size=n),
            "g": rng.choice(["a", "b", "c"], n),
            "f1": rng.integers(0, 8, n),
            "f2": rng.integers(0, 5, n),
            "cl": rng.integers(0, 12, n),
            "w": rng.uniform(0.2, 3.0, n),
        }
    )
    slope = np.where(pdf.g == "a", 2.0, np.where(pdf.g == "b", -1.0, 0.5))
    pdf["y"] = (
        1.0 + slope * pdf.x1 - 0.7 * pdf.x2 + 0.4 * pdf.f1 + rng.normal(size=n)
    )
    return pdf


@pytest.fixture(scope="module")
def sdata(spark):
    pdf = _gen()
    return spark.createDataFrame(pdf), pdf


def _assert_matches(sm, ref, rel=1e-9):
    np.testing.assert_allclose(
        sm.coef().to_numpy(), ref.coef().to_numpy(), rtol=rel
    )
    np.testing.assert_allclose(sm.se().to_numpy(), ref.se().to_numpy(), rtol=rel)
    assert sm.nobs_orig == ref.nobs_orig
    assert sm.df_residual == ref.df_residual


@pytest.mark.parametrize("vcov", ["iid", "hc1", "cluster"])
def test_split_moments_matches_filtered(sdata, vcov):
    df, pdf = sdata
    v = "~cl" if vcov == "cluster" else vcov
    ms = dbreg_split("y ~ x1 + x2", df, split="g", strategy="moments", vcov=v)
    assert set(ms) == {"a", "b", "c"}
    for lvl in ms:
        ref = dbreg(
            "y ~ x1 + x2", df.where(df.g == lvl), strategy="moments", vcov=v
        )
        _assert_matches(ms[lvl], ref)


@pytest.mark.parametrize("vcov", ["iid", "hc1", "cluster"])
def test_split_demean_1fe_matches_filtered(sdata, vcov):
    df, pdf = sdata
    v = "~cl" if vcov == "cluster" else vcov
    ms = dbreg_split("y ~ x1 + x2 | f1", df, split="g", vcov=v)
    for lvl in ms:
        ref = dbreg(
            "y ~ x1 + x2 | f1", df.where(df.g == lvl), strategy="demean",
            vcov=v,
        )
        _assert_matches(ms[lvl], ref)
        assert ms[lvl].n_fe1 == ref.n_fe1


def test_split_demean_2fe_matches_filtered(sdata):
    df, pdf = sdata
    ms = dbreg_split("y ~ x1 + x2 | f1 + f2", df, split="g", vcov="hc1")
    for lvl in ms:
        ref = dbreg(
            "y ~ x1 + x2 | f1 + f2", df.where(df.g == lvl),
            strategy="demean", vcov="hc1",
        )
        _assert_matches(ms[lvl], ref)


def test_split_weighted(sdata):
    df, pdf = sdata
    ms = dbreg_split(
        "y ~ x1 + x2 | f1", df, split="g", weights="w", vcov="hc1"
    )
    for lvl in ms:
        ref = dbreg(
            "y ~ x1 + x2 | f1", df.where(df.g == lvl), strategy="demean",
            weights="w", vcov="hc1",
        )
        _assert_matches(ms[lvl], ref)
        assert ms[lvl].weight_col == "w"


def test_split_compress_matches_filtered(spark):
    rng = np.random.default_rng(3)
    n = 5000
    pdf = pd.DataFrame(
        {
            "xd": rng.integers(0, 5, n).astype(float),
            "g": rng.choice(["u", "v"], n),
            "w": rng.uniform(0.5, 2.0, n),
        }
    )
    pdf["y"] = 1.0 + 0.8 * pdf.xd + (pdf.g == "u") * 0.5 + rng.normal(size=n)
    df = spark.createDataFrame(pdf)
    for kw in (dict(vcov="hc1"), dict(vcov="iid", weights="w")):
        ms = dbreg_split("y ~ xd", df, split="g", strategy="compress", **kw)
        for lvl in ms:
            ref = dbreg(
                "y ~ xd", df.where(df.g == lvl), strategy="compress", **kw
            )
            _assert_matches(ms[lvl], ref)


def test_split_tidy_and_coef_table(sdata):
    df, _ = sdata
    ms = dbreg_split("y ~ x1", df, split="g", strategy="moments")
    t = ms.tidy()
    assert list(t.columns)[0] == "g"
    assert len(t) == 6  # 3 levels x (intercept + slope)
    ct = ms.coef_table()
    assert set(ct.index) == {"a", "b", "c"}
    # the construction put genuinely different slopes per level
    assert ct["x1"].max() - ct["x1"].min() > 1.0


def test_split_null_level_is_a_level(spark):
    pdf = _gen(seed=9, n=900)
    pdf["g"] = pdf["g"].astype(object)
    pdf.loc[:99, "g"] = None
    df = spark.createDataFrame(pdf)
    ms = dbreg_split("y ~ x1", df, split="g", strategy="moments")
    assert None in ms
    ref = dbreg("y ~ x1", df.where(df.g.isNull()), strategy="moments")
    _assert_matches(ms[None], ref)


def test_split_refusals(sdata):
    df, _ = sdata
    with pytest.raises(ValueError, match="cannot also be"):
        dbreg_split("y ~ x1 | g", df, split="g")
    with pytest.raises(ValueError, match="1-3 variables"):
        dbreg_split("y ~ x1", df, split="g", vcov="~cl + f1 + f2 + w")
    with pytest.raises(ValueError, match="more than"):
        dbreg_split(
            "y ~ x2", df, split="x1", strategy="moments", split_nmax=10
        )


def test_split_moments_sql_twin(spark, sdata):
    import duckdb

    from dbreg_spark.plans.common import moment_spec
    from dbreg_spark.plans.exprs import Var, agg_to_spark
    from dbreg_spark.split import split_moments_sql

    df, pdf = sdata
    spec = moment_spec(Var("y"), [Var("x1"), Var("x2")], intercept=True)
    got = (
        df.where("y IS NOT NULL AND x1 IS NOT NULL AND x2 IS NOT NULL")
        .groupBy("g")
        .agg(*[agg_to_spark(a).alias(n) for n, a in spec])
        .toPandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    o = (
        con.execute(split_moments_sql("y ~ x1 + x2", "g", "FROM t"))
        .fetchdf()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for c in got.columns:
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=float) if c != "g" else 0,
            o[c].to_numpy(dtype=float) if c != "g" else 0,
            rtol=1e-9,
        )
    assert list(got["g"]) == list(o["g"])


def test_split_include_full(sdata):
    df, _ = sdata
    ms = dbreg_split(
        "y ~ x1 + x2", df, split="g", strategy="moments", vcov="hc1",
        include_full=True,
    )
    assert "(full)" in ms and set(ms) == {"a", "b", "c", "(full)"}
    ref = dbreg("y ~ x1 + x2", df, strategy="moments", vcov="hc1")
    _assert_matches(ms["(full)"], ref)
    t = ms.tidy()
    assert set(t["g"]) == {"a", "b", "c", "(full)"}


def test_split_null_level_robust_vcov(spark):
    """NULL split levels must survive the broadcast-β meat join (null-safe
    equality) under hc1/cluster and the demean means joins."""
    pdf = _gen(seed=9, n=1200)
    pdf["g"] = pdf["g"].astype(object)
    pdf.loc[:199, "g"] = None
    df = spark.createDataFrame(pdf)
    for kw in (
        dict(strategy="moments", vcov="hc1"),
        dict(strategy="moments", vcov="~cl"),
        dict(vcov="hc1"),  # demean via f1
    ):
        fml = "y ~ x1 + x2" + (" | f1" if "strategy" not in kw else "")
        ms = dbreg_split(fml, df, split="g", **kw)
        assert None in ms
        ref = dbreg(
            fml, df.where(df.g.isNull()),
            strategy=kw.get("strategy", "demean"), vcov=kw["vcov"],
        )
        _assert_matches(ms[None], ref)


def test_split_compress_fe_bookkeeping(spark):
    """Split-compress models must carry FE-dummy metadata so coef(fe=False)
    and predict() behave like single-model compress fits."""
    rng = np.random.default_rng(5)
    n = 3000
    pdf = pd.DataFrame(
        {
            "xd": rng.integers(0, 4, n).astype(float),
            "f": rng.integers(0, 6, n),
            "g": rng.choice(["u", "v"], n),
        }
    )
    pdf["y"] = 1 + 0.7 * pdf.xd + 0.3 * pdf.f + rng.normal(size=n)
    df = spark.createDataFrame(pdf)
    ms = dbreg_split("y ~ xd | f", df, split="g", strategy="compress")
    m = ms["u"]
    assert m.fe_coef_names  # dummy names recorded
    assert list(m.coef(fe=False).index) != list(m.coef().index)
    fit = m.predict(df.where(df.g == "u")).toPandas()["fit"]
    ref = dbreg(
        "y ~ xd | f", df.where(df.g == "u"), strategy="compress"
    ).predict(df.where(df.g == "u")).toPandas()["fit"]
    np.testing.assert_allclose(fit.to_numpy(), ref.to_numpy(), rtol=1e-9)


def test_split_entirely_null_column(spark):
    """An ALL-NULL split column is one level (None); the broadcast-β frame
    must carry an explicit __lvl type (inference has no non-None sample)."""
    pdf = _gen(seed=3, n=900)
    pdf["g"] = None
    pdf["g"] = pdf["g"].astype(object)
    df = spark.createDataFrame(
        pdf,
        schema="x1 double, x2 double, g string, f1 long, f2 long, "
        "cl long, w double, y double",
    )
    ms = dbreg_split("y ~ x1 + x2", df, split="g", strategy="moments",
                     vcov="hc1")
    assert list(ms) == [None]
    ref = dbreg("y ~ x1 + x2", df, strategy="moments", vcov="hc1")
    _assert_matches(ms[None], ref)


def test_split_save_load_roundtrip(sdata, tmp_path):
    """Bit-exact coef/vcov round trip per level, level keys (incl. the
    '(full)' pseudo-level) preserved with their types."""
    df, pdf = sdata
    ms = dbreg_split(
        "y ~ x1 + x2", df, split="g", strategy="moments", vcov="hc1",
        include_full=True,
    )
    p = str(tmp_path / "split_res")
    ms.save(p)
    from dbreg_spark.split import DbregSplit

    ms2 = DbregSplit.load(p, df.sparkSession)
    assert type(ms2) is DbregSplit and ms2.split_var == "g"
    assert set(ms2) == set(ms)
    for lvl in ms:
        np.testing.assert_array_equal(
            ms[lvl].coef().to_numpy(), ms2[lvl].coef().to_numpy()
        )
        np.testing.assert_array_equal(ms[lvl].vcov_, ms2[lvl].vcov_)
        assert ms2[lvl].df_residual == ms[lvl].df_residual
    pd.testing.assert_frame_equal(ms.tidy(), ms2.tidy(), check_exact=True)


def test_split_multiway_cluster_matches_filtered(sdata):
    """2-way CGM per level from the ONE finest-key score pass must equal
    the per-level filtered dbreg multiway fit."""
    df, pdf = sdata
    ms = dbreg_split(
        "y ~ x1 + x2", df, split="g", strategy="moments", vcov="~cl + f2"
    )
    for lvl in ms:
        ref = dbreg(
            "y ~ x1 + x2", df.where(df.g == lvl), strategy="moments",
            vcov="~cl + f2",
        )
        _assert_matches(ms[lvl], ref)
        assert ms[lvl].n_clusters == ref.n_clusters


def test_split_dk_matches_filtered(sdata):
    """Driscoll-Kraay per level (NW plug-in lag on the level's own T)."""
    df, pdf = sdata
    for kw in (dict(), dict(hac_lag=2)):
        ms = dbreg_split(
            "y ~ x1 + x2", df, split="g", strategy="moments",
            vcov="dk ~ f1", **kw,
        )
        for lvl in ms:
            ref = dbreg(
                "y ~ x1 + x2", df.where(df.g == lvl), strategy="moments",
                vcov="dk ~ f1", **kw,
            )
            _assert_matches(ms[lvl], ref)


def test_split_dk_demean_and_full(sdata):
    df, pdf = sdata
    ms = dbreg_split(
        "y ~ x1 + x2 | f2", df, split="g", vcov="dk ~ f1", hac_lag=1,
        include_full=True,
    )
    for lvl in ("a", "b", "c"):
        ref = dbreg(
            "y ~ x1 + x2 | f2", df.where(df.g == lvl), strategy="demean",
            vcov="dk ~ f1", hac_lag=1,
        )
        _assert_matches(ms[lvl], ref)
    full = dbreg("y ~ x1 + x2 | f2", df, strategy="demean", vcov="dk ~ f1",
                 hac_lag=1)
    _assert_matches(ms["(full)"], full)


def test_split_single_cluster_level_clear_error(spark):
    """ADVICE r06: a split level with one cluster (or one DK period) must
    raise a clear per-level error, not a bare ZeroDivisionError from the
    G/(G-1) small-sample factor."""
    pdf = pd.DataFrame(
        {
            "y": np.arange(40, dtype=float),
            "x": np.arange(40, dtype=float) * 0.5 + 1.0,
            "g": ["a"] * 20 + ["b"] * 20,
            # level 'b' sees only one cluster / one period
            "cl": [0] * 10 + [1] * 10 + [7] * 20,
        }
    )
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="level 'b'"):
        dbreg_split("y ~ x", df, split="g", vcov="~cl")
    with pytest.raises(ValueError, match="level 'b'"):
        dbreg_split("y ~ x", df, split="g", vcov="dk ~ cl", hac_lag=1)


def test_split_cr3_matches_per_level_dbreg(sdata):
    """vcov='cr3 ~ cl' per split level must equal dbreg's CV3 on the
    filtered level (itself pinned against numpy delete-one refits)."""
    df, _ = sdata
    ms = dbreg_split("y ~ x1 + x2", df, split="g", vcov="cr3 ~ cl")
    for lvl in ms:
        ref = dbreg("y ~ x1 + x2", df.where(df.g == lvl), vcov="cr3 ~ cl")
        np.testing.assert_allclose(
            ms[lvl].coef().to_numpy(), ref.coef().to_numpy(), rtol=1e-9
        )
        np.testing.assert_allclose(
            ms[lvl].vcov_, ref.vcov_, rtol=1e-8
        )
        assert ms[lvl].n_clusters == ref.n_clusters
    with pytest.raises(NotImplementedError, match="moments"):
        dbreg_split("y ~ x1 | f1", df, split="g", vcov="cr3 ~ cl")
