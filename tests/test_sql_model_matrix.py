"""Golden tests for the public design-matrix compiler, mirroring the
reference's inst/tinytest/test_sql_model_matrix.R:6-63."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def tdf(spark):
    pdf = pd.DataFrame(
        {
            "y": [1, 2, 3, 4, 5, 6],
            "x1": [1.0, 2, 3, 1, 2, 3],
            "x2": ["a", "a", "b", "b", "c", "c"],
            "x3": [10.0, 20, 30, 40, 50, 60],
        }
    )
    return spark.createDataFrame(pdf)


def test_expand_all(tdf):
    from dbreg_spark import sql_model_matrix

    res = sql_model_matrix("~ x1 + x2", tdf, expand="all")
    assert res["col_names"][0] == "x1"  # numeric passes through
    assert res["col_names"][1:3] == ["x2b", "x2c"]  # one-hot, ref level dropped
    assert res["select_exprs"][0] == "x1"
    assert "CASE WHEN" in res["select_exprs"][1]


def test_interaction_retains_all_levels(tdf):
    from dbreg_spark import sql_model_matrix

    # no main effect for x2 -> all factor levels retained in the interaction
    res = sql_model_matrix("~ x1:x2", tdf, expand="all")
    assert res["col_names"] == ["x1_x_x2a", "x1_x_x2b", "x1_x_x2c"]
    assert all("*" in e for e in res["select_exprs"])


def test_expand_interactions_only(tdf):
    from dbreg_spark import sql_model_matrix

    res = sql_model_matrix("~ x1 + x2 + x1:x2", tdf, expand="interactions")
    assert res["col_names"][0] == "x1"
    assert res["col_names"][1] == "x2"  # factor main effect NOT expanded
    assert res["select_exprs"][1] == "x2"
    assert res["col_names"][2:4] == ["x1_x_x2b", "x1_x_x2c"]
    assert res["factor_levels"]["x2"] == ["a", "b", "c"]


def test_numeric_numeric_interaction(tdf):
    from dbreg_spark import sql_model_matrix

    res = sql_model_matrix("~ x1:x3", tdf, expand="all")
    assert res["col_names"] == ["x1_x_x3"]
    assert res["select_exprs"] == ["(x1 * x3)"]


def test_two_sided_and_errors(tdf):
    from dbreg_spark import sql_model_matrix

    res = sql_model_matrix("y ~ x1 + x2", tdf)
    assert res["col_names"][0] == "x1"
    with pytest.raises(ValueError):
        sql_model_matrix("~ x1", tdf, expand="bogus")
