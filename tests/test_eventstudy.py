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
