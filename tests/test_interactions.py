"""Factor/interaction expansion + collinearity (mirrors the reference's
test_interactions.R / test_sql_model_matrix.R / test_did.R shapes)."""

import numpy as np
import pandas as pd
import pytest

from dbreg_spark import dbreg
from dbreg_spark.design import build_design
from dbreg_spark.formula import parse_formula

from fixtures import interactions_data, iid_se, ols_fit


@pytest.fixture(scope="module")
def idata(spark):
    pdf = interactions_data()
    return spark.createDataFrame(pdf), pdf


def _manual_design(pdf):
    d = pd.DataFrame(
        {
            "x1": pdf["x1"],
            "x2b": (pdf["x2"] == "b").astype(float),
            "x2c": (pdf["x2"] == "c").astype(float),
        }
    )
    d["x1_x_x2b"] = d["x1"] * d["x2b"]
    d["x1_x_x2c"] = d["x1"] * d["x2c"]
    return d


def test_design_golden_names(spark, idata):
    df, pdf = idata
    parsed = parse_formula("y ~ x1*x2")
    design = build_design(df, parsed, expand="all")
    assert design.names == ["x1", "x2b", "x2c", "x1_x_x2b", "x1_x_x2c"]
    assert design.factor_levels["x2"] == ["a", "b", "c"]


def test_design_interaction_only_keeps_all_levels(spark, idata):
    """Pure interaction with no main effect: reference level retained
    (reference: R/sql_model_matrix.R:115-121)."""
    df, pdf = idata
    parsed = parse_formula("y ~ x1:x2")
    design = build_design(df, parsed, expand="all")
    assert design.names == ["x1_x_x2a", "x1_x_x2b", "x1_x_x2c"]


def test_design_fe_membership_drops_ref(spark, idata):
    """x2 is an FE ⇒ its reference level drops even in a pure interaction."""
    df, pdf = idata
    parsed = parse_formula("y ~ x1:x2 | x2")
    design = build_design(df, parsed, expand="all", fe_vars=["x2"])
    assert design.names == ["x1_x_x2b", "x1_x_x2c"]


def test_moments_interaction_vs_numpy(idata):
    df, pdf = idata
    m = dbreg("y ~ x1*x2", df, strategy="moments")
    d = _manual_design(pdf)
    X = np.column_stack([np.ones(len(pdf))] + [d[c] for c in d.columns])
    beta, resid = ols_fit(X, pdf["y"].to_numpy(float))
    se = iid_se(X, resid)
    assert m.coef_names == ["(Intercept)", "x1", "x2b", "x2c", "x1:x2b", "x1:x2c"]
    np.testing.assert_allclose(m.coef().to_numpy(), beta, rtol=1e-6)
    np.testing.assert_allclose(m.se().to_numpy(), se, rtol=1e-6)


def test_numeric_numeric_interaction(idata):
    df, pdf = idata
    m = dbreg("y2 ~ x1*x3", df, strategy="moments")
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["x1"], pdf["x3"], pdf["x1"] * pdf["x3"]]
    )
    beta, resid = ols_fit(X, pdf["y2"].to_numpy(float))
    np.testing.assert_allclose(m.coef().to_numpy(), beta, rtol=1e-6)
    assert m.coef_names[-1] == "x1:x3"


def test_interaction_demean_fe(idata):
    df, pdf = idata
    m = dbreg("y1 ~ x1*x2 | fe", df, strategy="demean")
    d = _manual_design(pdf)
    dd = pd.concat([d, pdf[["fe", "y1"]]], axis=1)
    for c in list(d.columns) + ["y1"]:
        dd[c] = dd[c] - dd.groupby("fe")[c].transform("mean")
    X = dd[list(d.columns)].to_numpy(float)
    beta, resid = ols_fit(X, dd["y1"].to_numpy(float))
    np.testing.assert_allclose(
        m.coef().to_numpy(), beta, rtol=1e-6
    )


def test_interaction_compress(idata):
    df, pdf = idata
    # discrete-ish regressors for compression: x2 main + x2:fe interaction
    m = dbreg("y1 ~ x2 | fe", df, strategy="compress")
    X = np.column_stack(
        [
            np.ones(len(pdf)),
            (pdf["x2"] == "b").astype(float),
            (pdf["x2"] == "c").astype(float),
        ]
        + [(pdf["fe"] == l).astype(float) for l in sorted(pdf["fe"].unique())[1:]]
    )
    beta, resid = ols_fit(X, pdf["y1"].to_numpy(float))
    se = iid_se(X, resid)
    np.testing.assert_allclose(m.coef()[["x2b", "x2c"]], beta[1:3], rtol=1e-6)
    np.testing.assert_allclose(m.se()[["x2b", "x2c"]], se[1:3], rtol=1e-6)


def test_collinearity_drop_did(spark):
    """DiD: time-invariant treat is absorbed by unit FE → dropped
    (reference: test_did.R:16-20)."""
    rng = np.random.default_rng(7)
    n_id, n_per = 40, 8
    ids = np.repeat(np.arange(n_id), n_per)
    period = np.tile(np.arange(1, n_per + 1), n_id)
    treat = (ids % 2).astype(float)
    post = (period >= 5).astype(float)
    x1 = rng.normal(size=ids.size)
    y = (
        ids / 10.0
        + period / 5.0
        + 1.0 * x1
        + 3.0 * treat * post
        + rng.normal(size=ids.size)
    )
    pdf = pd.DataFrame(
        {"id": ids.astype("int64"), "period": period.astype("int64"),
         "treat": treat, "post": post, "x1": x1, "tp": treat * post, "y": y}
    )
    df = spark.createDataFrame(pdf)
    m = dbreg("y ~ x1 + treat + tp | id + period", df, strategy="demean")
    assert "treat" in m.collin_vars
    # kept coefficient on treatment effect matches LSDV oracle
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["x1"], pdf["tp"]]
        + [(pdf["id"] == l).astype(float) for l in range(1, n_id)]
        + [(pdf["period"] == l).astype(float) for l in range(2, n_per + 1)]
    )
    beta, _ = ols_fit(X, pdf["y"].to_numpy(float))
    np.testing.assert_allclose(m.coef()["tp"], beta[2], rtol=1e-6)


def test_factor_levels_cardinality_cap(spark):
    """A high-cardinality string column mistaken for a factor must raise a
    clear error, not collect every distinct value (VERDICT r01 #7)."""
    from dbreg_spark.design import factor_levels

    pdf = pd.DataFrame(
        {"idlike": [f"user_{i}" for i in range(5000)], "y": np.arange(5000.0)}
    )
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="distinct levels"):
        factor_levels(df, ["idlike"], max_levels=100)
    # under the cap: levels come back complete and sorted
    lv = factor_levels(df.limit(50), ["idlike"], max_levels=100)
    assert len(lv["idlike"]) == 50 and lv["idlike"] == sorted(lv["idlike"])
