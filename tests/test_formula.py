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
