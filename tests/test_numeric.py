"""Numeric column-prep operators vs pandas/numpy oracles and DuckDB twins."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from dbreg_spark.operators.numeric import (
    mad_outliers,
    mad_outliers_sql,
    standardize,
    standardize_sql,
    winsorize,
    winsorize_sql,
)


@pytest.fixture(scope="module")
def numdf(spark):
    rng = np.random.default_rng(13)
    n = 5000
    pdf = pd.DataFrame(
        {
            "a": rng.normal(size=n),
            "b": np.concatenate([rng.normal(size=n - 20), 50 + rng.normal(size=20)]),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_winsorize_exact_matches_pandas(numdf):
    df, pdf = numdf
    got = winsorize(df, ["a", "b"], 0.05, 0.95, exact=True).toPandas()
    for c in ("a", "b"):
        lo, hi = pdf[c].quantile([0.05, 0.95], interpolation="linear")
        np.testing.assert_allclose(
            got[f"{c}_w"].to_numpy(),
            pdf[c].clip(lo, hi).to_numpy(),
            rtol=1e-12,
        )
    # extreme outliers in b are gone
    assert got["b_w"].max() < 40


def test_winsorize_matches_duckdb_twin(numdf):
    df, pdf = numdf
    got = (
        winsorize(df, ["a"], 0.01, 0.99, exact=True)
        .toPandas()
        .sort_values("a")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    o = (
        con.execute(winsorize_sql("FROM t", ["a"], 0.01, 0.99))
        .fetchdf()
        .sort_values("a")
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(
        got["a_w"].to_numpy(), o["a_w"].to_numpy(), rtol=1e-12
    )


def test_standardize_matches_numpy_and_twin(numdf):
    df, pdf = numdf
    got = standardize(df, ["a", "b"]).toPandas()
    for c in ("a", "b"):
        z = (pdf[c] - pdf[c].mean()) / pdf[c].std(ddof=1)
        np.testing.assert_allclose(
            got[f"{c}_z"].to_numpy(), z.to_numpy(), rtol=1e-9
        )
    con = duckdb.connect()
    con.register("t", pdf)
    o = con.execute(standardize_sql("FROM t", ["a"])).fetchdf()
    np.testing.assert_allclose(
        np.sort(got["a_z"].to_numpy()), np.sort(o["a_z"].to_numpy()), rtol=1e-9
    )


def test_standardize_constant_column_null(spark):
    pdf = pd.DataFrame({"c": [2.0] * 50})
    got = standardize(spark.createDataFrame(pdf), ["c"]).toPandas()
    assert got["c_z"].isna().all()


def test_mad_outliers_flags_planted(numdf):
    df, pdf = numdf
    got = mad_outliers(df, ["b"], k=3.5, exact=True).toPandas()
    med = pdf.b.median()
    mad = (pdf.b - med).abs().median()
    expect = (pdf.b - med).abs() > 3.5 * 1.4826 * mad
    assert (got["b_outlier"].to_numpy() == expect.to_numpy()).all()
    assert got["b_outlier"].sum() >= 20  # the planted block is caught


def test_mad_outliers_matches_duckdb_twin(numdf):
    df, pdf = numdf
    got = (
        mad_outliers(df, ["b"], exact=True)
        .toPandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    o = (
        con.execute(mad_outliers_sql("FROM t", ["b"]))
        .fetchdf()
        .sort_values("b")
        .reset_index(drop=True)
    )
    assert (got["b_outlier"].to_numpy() == o["b_outlier"].to_numpy()).all()


def test_approx_path_close_to_exact(numdf):
    df, pdf = numdf
    ex = winsorize(df, ["a"], 0.05, 0.95, exact=True).toPandas()["a_w"]
    ap = winsorize(df, ["a"], 0.05, 0.95, exact=False).toPandas()["a_w"]
    # approx quantile sketch bounds clamp within a tight band of exact
    assert np.abs(np.sort(ex) - np.sort(ap)).max() < 0.05


def test_winsorize_nulls_pass_through(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0, 100.0] * 20})
    pdf["a"] = pdf["a"].astype(object)
    pdf.loc[:4, "a"] = None
    df = spark.createDataFrame(pdf)
    got = winsorize(df, ["a"], 0.05, 0.95, exact=True).toPandas()
    assert got["a_w"].isna().sum() == 5  # NULL in, NULL out — never lo
    con = duckdb.connect()
    con.register("t", pdf)
    o = con.execute(winsorize_sql("FROM t", ["a"], 0.05, 0.95)).fetchdf()
    assert o["a_w"].isna().sum() == 5


def test_correlation_matrix_and_vif(spark):
    rng = np.random.default_rng(23)
    n = 4000
    pdf = pd.DataFrame({"a": rng.normal(size=n)})
    pdf["b"] = 0.7 * pdf.a + rng.normal(scale=0.5, size=n)
    pdf["c"] = rng.normal(size=n)
    df = spark.createDataFrame(pdf)
    from dbreg_spark.operators.numeric import (
        correlation_matrix,
        correlation_matrix_sql,
        vif,
    )

    got = correlation_matrix(df, ["a", "b", "c"])
    want = pdf[["a", "b", "c"]].corr()
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(), rtol=1e-9)
    con = duckdb.connect()
    con.register("t", pdf)
    o = con.execute(
        correlation_matrix_sql("FROM t", ["a", "b", "c"])
    ).fetchdf().iloc[0]
    assert got.loc["a", "b"] == pytest.approx(o["corr_0_1"], rel=1e-9)
    v = vif(df, ["a", "b", "c"])
    # b is strongly collinear with a -> VIF well above 1; c is independent
    assert v["a"] > 1.5 and v["b"] > 1.5 and v["c"] < 1.1
    # numpy oracle: diagonal of the inverse correlation matrix
    np.testing.assert_allclose(
        v.to_numpy(), np.diag(np.linalg.inv(want.to_numpy())), rtol=1e-8
    )


def test_all_null_column_raises_clear_error(spark):
    pdf = pd.DataFrame({"a": [None] * 50, "b": range(50)})
    pdf["b"] = pdf["b"].astype(float)
    df = spark.createDataFrame(pdf, schema="a double, b double")
    with pytest.raises(ValueError, match="'a' has no non-null values"):
        mad_outliers(df, ["a"], exact=True)
    with pytest.raises(ValueError, match="'a' has no non-null values"):
        winsorize(df, ["a"], exact=True)


def test_winsorize_nan_passes_through(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0, 100.0] * 20})
    pdf.loc[:4, "a"] = np.nan
    # approx sketch (exact percentile NaN-poisons the probe; the approx
    # sketch ignores NaN), NaN rows must come back NaN — not hi-clamped
    df = spark.createDataFrame(pdf)
    got = winsorize(df, ["a"], 0.05, 0.95, exact=False).toPandas()
    assert np.isnan(got["a_w"].to_numpy()[:5]).all() or got["a_w"].isna()[:5].all()
    assert (got["a_w"].dropna() <= got["a"].max()).all()


def test_standardize_nan_stddev_yields_null(spark):
    pdf = pd.DataFrame({"a": [1.0, np.nan, 3.0] * 10, "b": range(30)})
    pdf["b"] = pdf["b"].astype(float)
    df = spark.createDataFrame(pdf)
    got = standardize(df, ["a", "b"]).toPandas()
    # NaN stddev for a → documented NULL, not NaN propagation mislabeled
    assert got["a_z"].isna().all()
    assert got["b_z"].notna().all()
