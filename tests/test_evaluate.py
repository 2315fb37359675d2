"""Evaluation metrics vs numpy oracles and the DuckDB SQL twins."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from dbreg_spark.operators.evaluate import (
    calibration_table,
    calibration_table_sql,
    classifier_metrics,
    classifier_metrics_sql,
    regression_metrics,
    regression_metrics_sql,
)


def _gen(seed=5, n=20_000):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({"y": rng.integers(0, 2, n).astype(float)})
    pdf["p"] = np.clip(0.25 * pdf.y + rng.uniform(0, 0.8, n), 0, 1)
    return pdf


@pytest.fixture(scope="module")
def scored(spark):
    pdf = _gen()
    return spark.createDataFrame(pdf), pdf


def exact_auc(y, p):
    """Exact tie-aware rank AUC (Mann-Whitney with average ranks)."""
    order = np.argsort(p, kind="mergesort")
    ranks = np.empty(len(p), dtype=float)
    sp = p[order]
    i = 0
    r = np.arange(1, len(p) + 1, dtype=float)
    while i < len(sp):
        j = i
        while j + 1 < len(sp) and sp[j + 1] == sp[i]:
            j += 1
        r[i : j + 1] = (i + 1 + j + 1) / 2.0
        i = j + 1
    ranks[order] = r
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    u = ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0
    return u / (n_pos * n_neg)


def test_classifier_metrics_vs_numpy(scored):
    df, pdf = scored
    m = classifier_metrics(df, "y", "p").toPandas().iloc[0]
    y, p = pdf.y.to_numpy(), pdf.p.to_numpy()
    # binned AUC within O(1/bins) of the exact rank AUC
    assert m["auc"] == pytest.approx(exact_auc(y, p), abs=2e-4)
    eps = 1e-15
    pc = np.clip(p, eps, 1 - eps)
    assert m["log_loss"] == pytest.approx(
        float(np.mean(-(y * np.log(pc) + (1 - y) * np.log(1 - pc)))), rel=1e-10
    )
    assert m["brier"] == pytest.approx(float(np.mean((p - y) ** 2)), rel=1e-10)
    pred = (p >= 0.5).astype(float)
    assert m["tp"] == int((pred * y).sum())
    assert m["fp"] == int((pred * (1 - y)).sum())
    assert m["tn"] == int(((1 - pred) * (1 - y)).sum())
    assert m["fn"] == int(((1 - pred) * y).sum())
    tp, fp, fn = m["tp"], m["fp"], m["fn"]
    assert m["precision"] == pytest.approx(tp / (tp + fp))
    assert m["recall"] == pytest.approx(tp / (tp + fn))


def test_classifier_metrics_matches_duckdb_twin(scored):
    df, pdf = scored
    m = classifier_metrics(df, "y", "p", threshold=0.4, bins=1000).toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    o = con.execute(
        classifier_metrics_sql("FROM t", "y", "p", threshold=0.4, bins=1000)
    ).fetchdf()
    for c in m.columns:
        a, b = m[c].iloc[0], o[c].iloc[0]
        if pd.isna(a):
            assert pd.isna(b), c
        else:
            assert float(a) == pytest.approx(float(b), rel=1e-9), c


def test_classifier_metrics_degenerate_labels(spark):
    pdf = pd.DataFrame({"y": np.ones(100), "p": np.linspace(0, 1, 100)})
    m = classifier_metrics(spark.createDataFrame(pdf), "y", "p").toPandas()
    assert pd.isna(m["auc"].iloc[0])  # no negatives: AUC undefined
    assert pd.isna(m["f1"].iloc[0]) or m["f1"].iloc[0] is not None  # defined path
    assert m["n_neg"].iloc[0] == 0


def test_classifier_metrics_perfect_separation(spark):
    pdf = pd.DataFrame(
        {"y": [0.0] * 50 + [1.0] * 50,
         "p": list(np.linspace(0, 0.4, 50)) + list(np.linspace(0.6, 1, 50))}
    )
    m = classifier_metrics(spark.createDataFrame(pdf), "y", "p").toPandas()
    assert m["auc"].iloc[0] == pytest.approx(1.0, abs=1e-6)
    assert m["accuracy"].iloc[0] == 1.0


def test_calibration_table(scored):
    df, pdf = scored
    t = calibration_table(df, "y", "p", bins=10).toPandas()
    cut = np.clip(np.floor(pdf.p * 10), 0, 9).astype(int)
    for b, grp in pdf.groupby(cut):
        row = t[t.bucket == b].iloc[0]
        assert row["n"] == len(grp)
        assert row["mean_score"] == pytest.approx(grp.p.mean(), rel=1e-10)
        assert row["pos_rate"] == pytest.approx(grp.y.mean(), rel=1e-10)
    con = duckdb.connect()
    con.register("t", pdf)
    o = con.execute(calibration_table_sql("FROM t", "y", "p", bins=10)).fetchdf()
    np.testing.assert_allclose(
        t.sort_values("bucket")[["n", "mean_score", "pos_rate"]].to_numpy(float),
        o.sort_values("bucket")[["n", "mean_score", "pos_rate"]].to_numpy(float),
        rtol=1e-9,
    )


def test_regression_metrics(spark):
    rng = np.random.default_rng(9)
    n = 5000
    pdf = pd.DataFrame({"y": rng.normal(size=n)})
    pdf["f"] = pdf.y * 0.8 + rng.normal(scale=0.5, size=n)
    m = (
        regression_metrics(spark.createDataFrame(pdf), "y", "f")
        .toPandas()
        .iloc[0]
    )
    e = pdf.y - pdf.f
    assert m["rmse"] == pytest.approx(float(np.sqrt((e**2).mean())), rel=1e-10)
    assert m["mae"] == pytest.approx(float(e.abs().mean()), rel=1e-10)
    assert m["bias"] == pytest.approx(float(e.mean()), rel=1e-8, abs=1e-12)
    sst = float(((pdf.y - pdf.y.mean()) ** 2).sum())
    assert m["r2"] == pytest.approx(1 - float((e**2).sum()) / sst, rel=1e-9)
    con = duckdb.connect()
    con.register("t", pdf)
    o = con.execute(regression_metrics_sql("FROM t", "y", "f")).fetchdf().iloc[0]
    for c in ("n", "rmse", "mae", "bias", "r2"):
        assert float(m[c]) == pytest.approx(float(o[c]), rel=1e-9, abs=1e-12)


def test_null_rows_dropped(spark):
    pdf = _gen(seed=7, n=500)
    pdf2 = pdf.copy()
    pdf2["y"] = pdf2["y"].astype(object)
    pdf2.loc[:19, "y"] = None
    m = classifier_metrics(spark.createDataFrame(pdf2), "y", "p").toPandas()
    assert m["n"].iloc[0] == 480


def test_classifier_metrics_empty_input(spark):
    df = spark.createDataFrame([], schema="y double, p double")
    m = classifier_metrics(df, "y", "p").toPandas().iloc[0]
    assert m["n"] == 0
    for c in ("auc", "log_loss", "brier", "accuracy", "precision", "recall", "f1"):
        assert pd.isna(m[c]), c


def test_weighted_demean_null_x_drop_missings_false(spark):
    """drop_missings=False with a null regressor: the weighted group mean
    must ignore the null row entirely (AVG semantics), not count its w in
    the denominator."""
    import numpy as np

    from dbreg_spark import dbreg

    rng = np.random.default_rng(31)
    n = 400
    pdf = pd.DataFrame(
        {
            "x": rng.normal(size=n),
            "f": rng.integers(0, 5, n),
            "w": rng.uniform(0.5, 2.0, n),
        }
    )
    pdf["y"] = 1.0 + 2.0 * pdf.x + 0.3 * pdf.f + rng.normal(size=n)
    pdf["x"] = pdf["x"].astype(object)
    pdf.loc[:19, "x"] = None
    df = spark.createDataFrame(pdf)
    m = dbreg("y ~ x | f", df, weights="w", strategy="demean",
              drop_missings=False)
    sub = pdf.iloc[20:]
    import pandas as _pd

    D = _pd.get_dummies(sub.f.astype(str)).to_numpy(dtype=float)
    X = np.column_stack([sub.x.to_numpy(dtype=float), D])
    w = sub.w.to_numpy()
    yv = sub.y.to_numpy()
    b = np.linalg.solve(X.T @ (w[:, None] * X), X.T @ (w * yv))
    assert m.coef()["x"] == pytest.approx(b[0], rel=1e-8)


def test_glm_evaluate_closes_the_loop(spark):
    """dbglm fit -> .evaluate(): AUC well above chance on separable data,
    and the regression branch returns rmse for gaussian fits."""
    import numpy as np

    from dbreg_spark import dbglm

    rng = np.random.default_rng(17)
    n = 4000
    pdf = pd.DataFrame({"x": rng.normal(size=n)})
    eta = -0.3 + 1.8 * pdf.x
    pdf["y"] = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float)
    df = spark.createDataFrame(pdf)
    m = dbglm("y ~ x", df, family="binomial")
    ev = m.evaluate(df).toPandas().iloc[0]
    assert ev["auc"] > 0.75 and 0 < ev["log_loss"] < 0.6
    assert ev["n"] == n

    pdf["yc"] = 2.0 + 0.5 * pdf.x + rng.normal(scale=0.3, size=n)
    mg = dbglm("yc ~ x", spark.createDataFrame(pdf), family="gaussian")
    rv = mg.evaluate(spark.createDataFrame(pdf)).toPandas().iloc[0]
    assert rv["rmse"] == pytest.approx(0.3, abs=0.05)
    assert rv["r2"] > 0.5
