"""Fast IR rendering (one F.expr JVM call) must be BITWISE-identical to
the node-by-node Column builder — projections and aggregates — and must
fall back to the builder whenever its exactness contract doesn't hold
(non-double-cast top, unsafe identifiers)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from dbreg_spark.plans.exprs import (
    Agg,
    CaseGE,
    Cast,
    Func,
    Lit,
    Var,
    agg_to_spark,
    aggs_to_spark_fast,
    asum,
    amax,
    amin,
    count_star,
    expr_vars,
    to_spark,
    to_spark_fast,
)


@pytest.fixture(scope="module")
def fdata(spark):
    rng = np.random.default_rng(5)
    n = 400
    pdf = pd.DataFrame(
        dict(
            x=rng.normal(size=n) * 1e3,
            y=rng.uniform(-2, 2, n),
            k=rng.integers(0, 7, n).astype("int64"),
            s=[f"v{i % 3}" for i in range(n)],
        )
    )
    pdf.loc[3, "x"] = 0.0
    return spark.createDataFrame(pdf), pdf


def _d(e):
    return Cast(e, "double")


_EXPRS = [
    _d(Var("x")),
    _d(Lit(0.1) + Var("x") * Lit(-1.2344999999999999e-05)),
    _d(Func("exp", (_d(Var("y")),)) / (Lit(1.0) + Func("exp", (_d(Var("y")),)))),
    _d(Func("greatest", (_d(Var("y")), Lit(0.0)))
       + Func("ln", (Lit(1.0) + Func("exp", (Func("abs", (_d(Var("y")),)) * Lit(-1.0),)),))),
    _d(CaseGE(_d(Var("x")), 0.0, _d(Var("x")) * Func("ln", (_d(Var("x")),)), strict=True)),
    _d(Cast(Var("k"), "double") * Lit(2.5) - Lit(7.0)),
]


def test_to_spark_fast_bitwise_equals_builder(fdata):
    df, _ = fdata
    sel = []
    for i, e in enumerate(_EXPRS):
        sel.append(to_spark(e).alias(f"a{i}"))
        sel.append(to_spark_fast(e).alias(f"b{i}"))
    out = df.select(*sel).toPandas()
    for i in range(len(_EXPRS)):
        a, b = out[f"a{i}"].to_numpy(), out[f"b{i}"].to_numpy()
        assert (
            (a == b) | (np.isnan(a) & np.isnan(b))
        ).all(), f"expr {i} diverged"


def test_aggs_fast_bitwise_equals_builder(fdata):
    df, _ = fdata
    spec = [
        ("n_total", count_star()),
        ("s1", asum(_d(Var("x")) * _d(Var("y")))),
        ("s2", asum(_d(Var("x")) * _d(Var("x")))),
        ("mn", amin(_d(Var("y")))),
        ("mx", amax(_d(Var("y")))),
    ]
    fast = df.agg(*aggs_to_spark_fast(spec)).collect()[0].asDict()
    slow = df.agg(
        *[agg_to_spark(a).alias(n) for n, a in spec]
    ).collect()[0].asDict()
    assert fast == slow
    # schema identical too: doubles stay double, counts stay long
    fs = dict(df.agg(*aggs_to_spark_fast(spec)).dtypes)
    ss = dict(df.agg(*[agg_to_spark(a).alias(n) for n, a in spec]).dtypes)
    assert fs == ss


def test_fast_path_fallbacks(fdata):
    df, _ = fdata
    # non-double-cast top node -> builder (identical Column semantics)
    e = Var("x") * Lit(2.0)
    out = df.select(
        to_spark_fast(e).alias("a"), to_spark(e).alias("b")
    ).toPandas()
    assert (out["a"] == out["b"]).all()
    # unsafe identifier -> builder handles it, fast must not break it
    df2 = df.withColumnRenamed("x", "x col")
    e2 = _d(Var("x col"))
    got = df2.select(to_spark_fast(e2).alias("v")).toPandas()["v"]
    assert got.notna().all()
    # a literal-only SUM keeps the builder's DOUBLE type under fast
    spec = [("w", asum(Lit(1.0)))]
    assert dict(df.agg(*aggs_to_spark_fast(spec)).dtypes)["w"] == "double"


def test_expr_vars_walks_every_node():
    e = _d(
        CaseGE(Var("a"), 1.0, Func("ln", (Var("b"),)) + Var("c") / Lit(2.0))
    )
    assert expr_vars(e) == {"a", "b", "c"}
    assert expr_vars(Lit(1.0)) == set()
