import pytest

from dbreg_spark.formula import parse_formula, parse_vcov


def test_simple():
    p = parse_formula("y ~ x1 + x2")
    assert p.yvar == "y"
    assert p.term_labels == ["x1", "x2"]
    assert p.fe == []
    assert p.intercept and not p.has_interactions


def test_fe_part():
    p = parse_formula("y ~ x1 + x2 | fe1 + fe2")
    assert p.fe == ["fe1", "fe2"]
    assert p.xvars == ["x1", "x2"]


def test_star_expansion():
    p = parse_formula("y ~ x1 + x2*x3")
    assert p.term_labels == ["x1", "x2", "x3", "x2:x3"]
    assert p.has_interactions


def test_pure_interaction():
    p = parse_formula("y ~ x1:x2")
    assert p.term_labels == ["x1:x2"]


def test_three_way_star():
    p = parse_formula("y ~ a*b*c")
    assert p.term_labels == ["a", "b", "c", "a:b", "a:c", "b:c", "a:b:c"]


def test_no_intercept():
    p = parse_formula("y ~ 0 + x1")
    assert not p.intercept
    p = parse_formula("y ~ x1 - 1")
    assert not p.intercept


def test_dedupe_orders():
    p = parse_formula("y ~ x1 + x2 + x1 + x2:x1")
    assert p.term_labels == ["x1", "x2", "x2:x1"]


def test_vcov_parse():
    assert parse_vcov("iid") == ("iid", None)
    assert parse_vcov("HC1") == ("hc1", None)
    assert parse_vcov("~firm") == ("cluster", ["firm"])
    assert parse_vcov("iid", cluster="~firm") == ("cluster", ["firm"])
    assert parse_vcov("~firm + year") == ("cluster", ["firm", "year"])
    assert parse_vcov("conley ~ lat + lon") == ("conley", ["lat", "lon"])
    with pytest.raises(ValueError, match="two coordinate"):
        parse_vcov("conley ~ lat")
    with pytest.raises(ValueError, match="two coordinate"):
        parse_vcov("conley ~ a + b + c")


def test_errors():
    import pytest

    with pytest.raises(ValueError):
        parse_formula("y + z ~ x")
    with pytest.raises(ValueError):
        parse_formula("y ~ ")


def test_unknown_column_clean_error(spark, tables):
    from dbreg_spark import dbbinsreg, dbreg

    with pytest.raises(ValueError, match="not found in input"):
        dbreg("l_tax ~ nope_col", tables["lineitem"])
    with pytest.raises(ValueError, match="not found in input"):
        dbreg("l_tax ~ l_quantity | bad_fe", tables["lineitem"])
    with pytest.raises(ValueError, match="not found in input"):
        dbreg("l_tax ~ l_quantity", tables["lineitem"], vcov="~bad_cluster")
    with pytest.raises(ValueError, match="not found in input"):
        dbbinsreg("l_tax ~ nope_col", tables["lineitem"])


def test_power_sugar_expands_to_repeated_interaction():
    from dbreg_spark.formula import parse_formula

    p = parse_formula("y ~ x + x^2 + x^3")
    keys = [t.sorted_key for t in p.terms]
    assert ("x",) in keys and ("x", "x") in keys and ("x", "x", "x") in keys
    # x^2 and x:x are the same term (deduped)
    p2 = parse_formula("y ~ x^2 + x:x")
    assert len(p2.terms) == 1


def test_power_sugar_refusals():
    import pytest as _pt

    from dbreg_spark.formula import parse_formula

    with _pt.raises(ValueError, match="integer"):
        parse_formula("y ~ x^a")
    with _pt.raises(ValueError, match=">= 1"):
        parse_formula("y ~ x^0")


def test_power_fit_matches_dense_quadratic(spark):
    import numpy as np
    import pandas as pd

    from dbreg_spark import dbreg

    rng = np.random.default_rng(2)
    n = 2000
    pdf = pd.DataFrame({"x": rng.normal(size=n)})
    pdf["y"] = 1 + 2 * pdf.x + 0.5 * pdf.x**2 + rng.normal(size=n)
    m = dbreg("y ~ x + x^2", spark.createDataFrame(pdf), strategy="moments")
    X = np.column_stack([np.ones(n), pdf.x, pdf.x**2])
    b = np.linalg.solve(X.T @ X, X.T @ pdf.y)
    np.testing.assert_allclose(
        m.coef().to_numpy(), b, rtol=1e-9
    )
