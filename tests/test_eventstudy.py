"""Event-study helper vs a dense LSDV oracle with explicit dummies."""

import numpy as np
import pandas as pd
import pytest

from dbreg_spark import dbreg, event_study


def _panel(seed=5, n_units=60, T=12, event_at=6):
    rng = np.random.default_rng(seed)
    rows = []
    alpha = rng.normal(size=n_units)
    gamma = rng.normal(size=T) * 0.5
    treated = rng.random(n_units) < 0.6
    # true dynamic effect: 0 before, then 1.0, 1.5, 2.0 ... after event
    for u in range(n_units):
        for t in range(T):
            rel = t - event_at if treated[u] else None
            eff = 0.0
            if rel is not None and rel >= 0:
                eff = 1.0 + 0.5 * rel
            rows.append(
                dict(
                    unit=u, time=t,
                    rel_time=rel,
                    y=alpha[u] + gamma[t] + eff + rng.normal(scale=0.4),
                )
            )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def espanel(spark):
    pdf = _panel()
    return spark.createDataFrame(pdf), pdf


def test_event_study_matches_dense_lsdv(espanel):
    df, pdf = espanel
    r = event_study(df, "y", "rel_time", "unit", "time", ref=-1, vcov="hc1")
    # dense oracle: unit+time dummies + rel-time dummies (ref -1 dropped)
    levels = sorted(v for v in pdf.rel_time.dropna().unique())
    est_levels = [lv for lv in levels if lv != -1]
    Dn = pd.get_dummies(pdf.unit).to_numpy(dtype=float)
    Dt = pd.get_dummies(pdf.time, drop_first=True).to_numpy(dtype=float)
    E = np.column_stack(
        [(pdf.rel_time == lv).to_numpy(dtype=float) for lv in est_levels]
    )
    X = np.column_stack([E, Dn, Dt])
    yv = pdf.y.to_numpy()
    b = np.linalg.solve(X.T @ X, X.T @ yv)
    got = r.table[~r.table.is_ref].set_index("rel_time")["estimate"]
    for i, lv in enumerate(est_levels):
        assert got[lv] == pytest.approx(b[i], rel=1e-6, abs=1e-9)
    # reference row pinned at zero
    refrow = r.table[r.table.is_ref]
    assert list(refrow.rel_time) == [-1] and float(refrow.estimate) == 0.0
    # pre-trends ~ 0, post effects ramp up
    post = got[[lv for lv in est_levels if lv >= 0]]
    assert post.iloc[-1] > post.iloc[0] > 0.5


def test_event_study_default_clusters_by_unit(espanel):
    df, _ = espanel
    r = event_study(df, "y", "rel_time", "unit", "time", ref=-1)
    assert r.model.vcov_type == "cluster"
    assert r.model.cluster_var == "unit"


def test_event_study_refusals(espanel):
    df, _ = espanel
    with pytest.raises(ValueError, match="reference period"):
        event_study(df, "y", "rel_time", "unit", "time", ref=99)
    with pytest.raises(ValueError, match="more than"):
        event_study(df, "y", "rel_time", "unit", "time", ref=-1, max_levels=2)


def test_event_study_never_treated_value(spark):
    pdf = _panel(seed=7)
    pdf2 = pdf.copy()
    pdf2["rel_time"] = pdf2["rel_time"].fillna(-999)
    df = spark.createDataFrame(pdf2)
    r = event_study(
        df, "y", "rel_time", "unit", "time", ref=-1,
        never_treated_value=-999, vcov="hc1",
    )
    df0 = spark.createDataFrame(pdf)
    r0 = event_study(df0, "y", "rel_time", "unit", "time", ref=-1, vcov="hc1")
    got = r.table[~r.table.is_ref].estimate.to_numpy()
    want = r0.table[~r0.table.is_ref].estimate.to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-9)


# ----------------------------------------------------------- Sun-Abraham --


def _staggered(seed=11, n_units=80, T=14):
    """Staggered adoption with cohort-heterogeneous dynamic effects."""
    rng = np.random.default_rng(seed)
    rows = []
    alpha = rng.normal(size=n_units)
    gamma = rng.normal(size=T) * 0.4
    cohorts = rng.choice([5, 8, -1], size=n_units, p=[0.35, 0.35, 0.3])
    for u in range(n_units):
        g = cohorts[u]
        for t in range(T):
            eff = 0.0
            if g > 0 and t >= g:
                # cohort-specific dynamics: early cohort ramps 2x faster
                ramp = 1.0 if g == 5 else 0.4
                eff = ramp * (1 + (t - g))
            rows.append(
                dict(
                    unit=u, time=t,
                    cohort=(int(g) if g > 0 else None),
                    y=alpha[u] + gamma[t] + eff + rng.normal(scale=0.3),
                )
            )
    pdf = pd.DataFrame(rows)
    pdf["cohort"] = pdf["cohort"].astype("Int64").astype(object)
    return pdf


@pytest.fixture(scope="module")
def stag(spark):
    pdf = _staggered()
    pdf2 = pdf.copy()
    pdf2["cohort"] = pdf2["cohort"].where(pdf2["cohort"].notna(), None)
    return spark.createDataFrame(pdf2), pdf


def test_sunab_matches_dense_oracle(stag):
    from dbreg_spark import sun_abraham

    df, pdf = stag
    r = sun_abraham(df, "y", "cohort", "time", "unit", ref=-1, vcov="hc1")
    # dense oracle: same (cohort x rel) dummies, same share weights,
    # delta-method aggregation on the dense HC1 vcov
    pdf = pdf.copy()
    pdf["rel"] = pdf.time - pd.to_numeric(pdf.cohort, errors="coerce")
    cells = (
        pdf.dropna(subset=["rel"])
        .groupby(["cohort", "rel"])
        .size()
        .reset_index(name="n")
    )
    est_cells = [
        (int(g), int(rt), int(n))
        for g, rt, n in cells.itertuples(index=False)
        if rt != -1
    ]
    E = np.column_stack(
        [
            ((pdf.cohort == g) & (pdf.rel == rt)).to_numpy(dtype=float)
            for g, rt, _ in est_cells
        ]
    )
    Dn = pd.get_dummies(pdf.unit).to_numpy(dtype=float)
    Dt = pd.get_dummies(pdf.time, drop_first=True).to_numpy(dtype=float)
    X = np.column_stack([E, Dn, Dt])
    yv = pdf.y.to_numpy()
    n, p = X.shape
    XtXi = np.linalg.inv(X.T @ X)
    b = XtXi @ (X.T @ yv)
    u = yv - X @ b
    meat = (X * (u**2)[:, None]).T @ X
    V = (n / (n - p)) * XtXi @ meat @ XtXi
    k = len(est_cells)
    got = r.table[~r.table.is_ref].set_index("rel_time")
    for rt in sorted({c[1] for c in est_cells}):
        idx = [i for i, c in enumerate(est_cells) if c[1] == rt]
        w = np.array([est_cells[i][2] for i in idx], dtype=float)
        w /= w.sum()
        a = np.zeros(p)
        for wi, i in zip(w, idx):
            a[i] = wi
        est = float(a @ b)
        se = float(np.sqrt(a @ V @ a))
        assert got.loc[rt, "estimate"] == pytest.approx(est, rel=1e-6, abs=1e-9)
        assert got.loc[rt, "se"] == pytest.approx(se, rel=1e-5)


def test_sunab_single_cohort_equals_twfe(spark):
    from dbreg_spark import event_study, sun_abraham

    pdf = _panel(seed=3)  # single event time => single cohort
    pdf2 = pdf.copy()
    pdf2["cohort"] = np.where(pdf2.rel_time.notna(), 6, np.nan)
    pdf2["cohort"] = pdf2["cohort"].astype(object).where(
        pd.notna(pdf2["cohort"]), None
    )
    df = spark.createDataFrame(pdf2)
    r_sa = sun_abraham(df, "y", "cohort", "time", "unit", ref=-1, vcov="hc1")
    r_es = event_study(df, "y", "rel_time", "unit", "time", ref=-1, vcov="hc1")
    a = r_sa.table[~r_sa.table.is_ref].set_index("rel_time")["estimate"]
    bt = r_es.table[~r_es.table.is_ref].set_index("rel_time")["estimate"]
    np.testing.assert_allclose(
        a.sort_index().to_numpy(), bt.sort_index().to_numpy(), rtol=1e-8
    )


def test_sunab_recovers_heterogeneous_truth(stag):
    """Weighted-average truth at each rel time: cohort-5 share x 1.0-ramp +
    cohort-8 share x 0.4-ramp; sunab must land near it."""
    from dbreg_spark import sun_abraham

    df, pdf = stag
    r = sun_abraham(df, "y", "cohort", "time", "unit", ref=-1)
    got = r.table[~r.table.is_ref].set_index("rel_time")["estimate"]
    pdf = pdf.copy()
    pdf["rel"] = pdf.time - pd.to_numeric(pdf.cohort, errors="coerce")
    for rt in (0, 1, 2):
        sub = pdf[pdf.rel == rt]
        truth = 0.0
        for g, grp in sub.groupby("cohort"):
            ramp = 1.0 if g == 5 else 0.4
            truth += len(grp) / len(sub) * ramp * (1 + rt)
        assert got[rt] == pytest.approx(truth, abs=0.25)


def test_pretrend_test_and_att(espanel):
    from dbreg_spark import event_study

    df, pdf = espanel
    r = event_study(df, "y", "rel_time", "unit", "time", ref=-1, vcov="hc1")
    pre = r.pretrend_test()
    # no pre-trend in the DGP: p should not be tiny
    assert pre["p.value"] > 0.01 and pre["df1"] >= 4
    a = r.att()
    # truth: effects 1.0, 1.5, ..., observation-weighted mean in (1, 4)
    assert 1.0 < a["att"] < 4.0
    assert a["lwr"] < a["att"] < a["upr"]
    # n_obs recorded for every level
    assert (r.table["n_obs"] > 0).all()


def test_sunab_pretrend_and_att(stag):
    from dbreg_spark import sun_abraham

    df, _ = stag
    r = sun_abraham(df, "y", "cohort", "time", "unit", ref=-1)
    pre = r.pretrend_test()
    assert pre["p.value"] > 0.001
    a = r.att()
    assert a["att"] > 0.5 and a["se"] > 0


def test_att_all_post_dropped_raises_clear_error():
    """If every post-period dummy was collinearity-dropped, att() must raise
    a clear ValueError, not an opaque numpy vstack error."""
    from dbreg_spark.eventstudy import EventStudyResult

    class _StubModel:
        coef_names = ["(Intercept)", "es_m2"]  # no post-period dummies kept

    table = pd.DataFrame(
        {
            "rel_time": [-2, -1, 0, 1],
            "is_ref": [False, True, False, False],
            "estimate": [0.1, 0.0, np.nan, np.nan],
            "n_obs": [10, 10, 10, 10],
        }
    )
    r = EventStudyResult(_StubModel(), table, ref=-1, rel_time="rt")
    with pytest.raises(ValueError, match="post-period coefficient survived"):
        r.att()


def test_event_study_save_load_roundtrip(espanel, tmp_path):
    df, _ = espanel
    r = event_study(df, "y", "rel_time", "unit", "time", ref=-1, vcov="hc1")
    p = str(tmp_path / "es")
    r.save(p)
    from dbreg_spark.eventstudy import EventStudyResult

    r2 = EventStudyResult.load(p, df.sparkSession)
    pd.testing.assert_frame_equal(r.table, r2.table, check_exact=True)
    assert r2.ref == r.ref and r2.rel_time == r.rel_time
    np.testing.assert_array_equal(
        r.model.coef().to_numpy(), r2.model.coef().to_numpy()
    )
    np.testing.assert_array_equal(r.model.vcov_, r2.model.vcov_)
    a1, a2 = r.att(), r2.att()
    assert a1 == a2
    p1, p2 = r.pretrend_test(), r2.pretrend_test()
    assert p1 == p2


def test_sunab_save_load_roundtrip(stag, tmp_path):
    from dbreg_spark import sun_abraham
    from dbreg_spark.eventstudy import EventStudyResult

    df, _ = stag
    r = sun_abraham(df, "y", "cohort", "time", "unit", ref=-1)
    p = str(tmp_path / "sunab")
    r.save(p)
    r2 = EventStudyResult.load(p, df.sparkSession)
    pd.testing.assert_frame_equal(r.table, r2.table, check_exact=True)
    assert set(r2._agg_rows) == set(r._agg_rows)
    for rt in r._agg_rows:
        np.testing.assert_array_equal(r._agg_rows[rt], r2._agg_rows[rt])
    assert r.att() == r2.att()
    assert sorted(map(tuple, r.dropped_cells)) == sorted(
        map(tuple, r2.dropped_cells)
    )
