"""Tiny neutral expression IR with two renderers: PySpark Column and ANSI SQL.

The reference engine (grantmcdermott/dbreg) builds SQL strings directly via
glue templates (reference: R/dbreg.R:724-757, R/sql_model_matrix.R:143-175).
We instead describe every generated column once, as a small AST, and render it
twice: to a ``pyspark.sql.Column`` (the primary, distributed execution path)
and to an ANSI-SQL string that DuckDB can run (the correctness oracle /
``sql_only`` parity mode).  This keeps a single source of truth for the
semantics of every emitted expression.
"""

from __future__ import annotations

import re

from dataclasses import dataclass, field
from typing import Union

import pyspark.sql.functions as F
from pyspark.sql import Column

Exprish = Union["Expr", str, int, float]


@dataclass(frozen=True)
class Expr:
    """Base class for expression nodes."""

    # -- operator sugar ----------------------------------------------------
    def __mul__(self, other: Exprish) -> "Expr":
        return BinOp("*", self, wrap(other))

    def __add__(self, other: Exprish) -> "Expr":
        return BinOp("+", self, wrap(other))

    def __sub__(self, other: Exprish) -> "Expr":
        return BinOp("-", self, wrap(other))

    def __truediv__(self, other: Exprish) -> "Expr":
        return BinOp("/", self, wrap(other))


@dataclass(frozen=True)
class Var(Expr):
    """A column reference."""

    name: str


@dataclass(frozen=True)
class Lit(Expr):
    """A literal. Floats render with 17 significant digits (round-trip safe),
    mirroring the reference's ``%.15g`` beta embedding (R/dbreg.R:1829)."""

    value: object


@dataclass(frozen=True)
class BinOp(Expr):
    op: str
    left: Expr
    right: Expr


@dataclass(frozen=True)
class Func(Expr):
    """Scalar function by ANSI name: pow, sqrt, floor, ln, least, abs, log10."""

    name: str
    args: tuple[Expr, ...]


@dataclass(frozen=True)
class OneHot(Expr):
    """``CASE WHEN var = 'level' THEN 1.0 ELSE 0.0 END`` dummy encoding
    (reference: R/sql_model_matrix.R:147)."""

    var: str
    level: object


@dataclass(frozen=True)
class CaseGE(Expr):
    """``CASE WHEN cond_expr > knot THEN then_expr ELSE 0.0 END`` — used for
    truncated-power spline bases (reference: R/dbbinsreg.R:1240-1263)."""

    cond_var: Expr
    knot: float
    then: Expr
    strict: bool = True


@dataclass(frozen=True)
class Cast(Expr):
    expr: Expr
    to: str  # "double" | "long"


def wrap(x: Exprish) -> Expr:
    if isinstance(x, Expr):
        return x
    return Lit(x)


# --------------------------------------------------------------------------
# Aggregates
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Agg:
    """An aggregate over an expression. kind in {count_star, count, sum, avg,
    min, max, count_distinct}."""

    kind: str
    expr: Expr | None = None
    cast_to: str | None = None  # cast applied to the *result*


def count_star() -> Agg:
    return Agg("count_star", None, "long")


def asum(e: Exprish) -> Agg:
    return Agg("sum", wrap(e))


def aavg(e: Exprish) -> Agg:
    return Agg("avg", wrap(e))


def amin(e: Exprish) -> Agg:
    return Agg("min", wrap(e))


def amax(e: Exprish) -> Agg:
    return Agg("max", wrap(e))


def acountd(e: Exprish) -> Agg:
    return Agg("count_distinct", wrap(e), "long")


# --------------------------------------------------------------------------
# Spark renderer
# --------------------------------------------------------------------------


def to_spark(e: Expr) -> Column:
    if isinstance(e, Var):
        return F.col(e.name)
    if isinstance(e, Lit):
        return F.lit(e.value)
    if isinstance(e, BinOp):
        left, right = to_spark(e.left), to_spark(e.right)
        if e.op == "*":
            return left * right
        if e.op == "+":
            return left + right
        if e.op == "-":
            return left - right
        if e.op == "/":
            return left / right
        raise ValueError(f"unknown op {e.op}")
    if isinstance(e, Func):
        args = [to_spark(a) for a in e.args]
        fn = {
            "pow": F.pow,
            "sqrt": F.sqrt,
            "floor": F.floor,
            "ln": F.log,  # natural log
            "log10": F.log10,
            "least": F.least,
            "greatest": F.greatest,
            "abs": F.abs,
            "round": F.round,
            "exp": F.exp,
        }[e.name]
        return fn(*args)
    if isinstance(e, OneHot):
        return F.when(F.col(e.var) == F.lit(e.level), F.lit(1.0)).otherwise(F.lit(0.0))
    if isinstance(e, CaseGE):
        cond = to_spark(e.cond_var)
        c = cond > F.lit(e.knot) if e.strict else cond >= F.lit(e.knot)
        return F.when(c, to_spark(e.then)).otherwise(F.lit(0.0))
    if isinstance(e, Cast):
        return to_spark(e.expr).cast(e.to)
    raise TypeError(f"unknown expr {e!r}")


_SAFE_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def expr_vars(e: Expr) -> set[str]:
    """Every column name referenced anywhere in the IR tree."""
    out: set[str] = set()
    stack: list[Expr] = [e]
    while stack:
        n = stack.pop()
        if isinstance(n, Var):
            out.add(n.name)
        elif isinstance(n, BinOp):
            stack += [n.left, n.right]
        elif isinstance(n, Func):
            stack += list(n.args)
        elif isinstance(n, OneHot):
            out.add(n.var)
        elif isinstance(n, CaseGE):
            stack += [n.cond_var, n.then]
        elif isinstance(n, Cast):
            stack.append(n.expr)
    return out


def to_spark_fast(e: Expr) -> Column:
    """Column for ``e`` via ONE JVM call — F.expr over the SQL rendering —
    instead of one py4j round-trip per IR node. The node-by-node builder
    measured ~10 s of pure driver socket time for one 4-model IRLS
    lockstep fit (55k py4j commands; SCALE.md round 9). Exactness
    contract: the fast path fires only when (a) the top node is
    CAST(· AS DOUBLE), so SQL's DECIMAL literal typing cannot reach the
    result type, and (b) every referenced column is a bare-safe
    identifier (F.expr would need quoting otherwise). Any other shape
    falls back to :func:`to_spark` — always correct, just slower."""
    if (
        isinstance(e, Cast)
        and e.to == "double"
        and all(_SAFE_IDENT.match(v) for v in expr_vars(e))
    ):
        return F.expr(to_sql(e))
    return to_spark(e)


def aggs_to_spark_fast(spec: list[tuple[str, "Agg"]]) -> list[Column]:
    """Aliased aggregate Columns, one F.expr JVM call each.

    CALLER CONTRACT: every sum/min/max/avg aggregate in ``spec`` is
    double-typed (its expr is a double cast or a product/sum of
    double-cast columns) — the rendering wraps CAST(· AS DOUBLE) so SQL
    DECIMAL literal typing cannot drift the result schema, and the cast
    is a no-op on the contract's types. count_star / count_distinct /
    explicitly-cast aggregates keep the builder path, as does any
    aggregate referencing a non-bare-safe column name."""
    out: list[Column] = []
    for name, a in spec:
        if (
            a.kind in ("sum", "min", "max", "avg")
            and not a.cast_to
            and all(_SAFE_IDENT.match(v) for v in expr_vars(a.expr))
        ):
            out.append(
                F.expr(f"CAST({agg_to_sql(a)} AS DOUBLE)").alias(name)
            )
        else:
            out.append(agg_to_spark(a).alias(name))
    return out


def agg_to_spark(a: Agg) -> Column:
    if a.kind == "count_star":
        c = F.count(F.lit(1))
    elif a.kind == "count_distinct":
        c = F.countDistinct(to_spark(a.expr))
    else:
        fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max, "count": F.count}[a.kind]
        c = fn(to_spark(a.expr))
    if a.cast_to:
        c = c.cast(a.cast_to)
    return c


# --------------------------------------------------------------------------
# ANSI SQL renderer (DuckDB-compatible; also valid Spark SQL)
# --------------------------------------------------------------------------


def _sql_lit(v: object) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        return repr(v)  # 17 significant digits, round-trip exact
    if isinstance(v, int):
        return str(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def to_sql(e: Expr) -> str:
    if isinstance(e, Var):
        return e.name
    if isinstance(e, Lit):
        return _sql_lit(e.value)
    if isinstance(e, BinOp):
        return f"({to_sql(e.left)} {e.op} {to_sql(e.right)})"
    if isinstance(e, Func):
        name = {"pow": "POWER", "ln": "LN", "log10": "LOG10"}.get(e.name, e.name.upper())
        return f"{name}({', '.join(to_sql(a) for a in e.args)})"
    if isinstance(e, OneHot):
        return f"CASE WHEN {e.var} = {_sql_lit(e.level)} THEN 1.0 ELSE 0.0 END"
    if isinstance(e, CaseGE):
        op = ">" if e.strict else ">="
        return (
            f"CASE WHEN {to_sql(e.cond_var)} {op} {_sql_lit(float(e.knot))} "
            f"THEN {to_sql(e.then)} ELSE 0.0 END"
        )
    if isinstance(e, Cast):
        to = {"double": "DOUBLE", "long": "BIGINT"}.get(e.to, e.to.upper())
        return f"CAST({to_sql(e.expr)} AS {to})"
    raise TypeError(f"unknown expr {e!r}")


def agg_to_sql(a: Agg) -> str:
    if a.kind == "count_star":
        s = "COUNT(*)"
    elif a.kind == "count_distinct":
        s = f"COUNT(DISTINCT {to_sql(a.expr)})"
    else:
        s = f"{a.kind.upper()}({to_sql(a.expr)})"
    if a.cast_to:
        to = {"double": "DOUBLE", "long": "BIGINT"}.get(a.cast_to, a.cast_to.upper())
        s = f"CAST({s} AS {to})"
    return s


# --------------------------------------------------------------------------
# JSON-serializable form (model persistence: save a fitted model's design
# expressions and rebuild them in another session)
# --------------------------------------------------------------------------


def expr_to_obj(e: Expr) -> dict:
    """Encode an Expr tree as plain JSON-compatible dicts."""
    if isinstance(e, Var):
        return {"t": "var", "name": e.name}
    if isinstance(e, Lit):
        return {"t": "lit", "value": e.value}
    if isinstance(e, BinOp):
        return {
            "t": "bin",
            "op": e.op,
            "left": expr_to_obj(e.left),
            "right": expr_to_obj(e.right),
        }
    if isinstance(e, Func):
        return {"t": "func", "name": e.name, "args": [expr_to_obj(a) for a in e.args]}
    if isinstance(e, OneHot):
        return {"t": "onehot", "var": e.var, "level": e.level}
    if isinstance(e, CaseGE):
        return {
            "t": "casege",
            "cond": expr_to_obj(e.cond_var),
            "knot": e.knot,
            "then": expr_to_obj(e.then),
            "strict": e.strict,
        }
    if isinstance(e, Cast):
        return {"t": "cast", "expr": expr_to_obj(e.expr), "to": e.to}
    raise TypeError(f"unknown expr {e!r}")


def expr_from_obj(d: dict) -> Expr:
    """Inverse of :func:`expr_to_obj`."""
    t = d["t"]
    if t == "var":
        return Var(d["name"])
    if t == "lit":
        return Lit(d["value"])
    if t == "bin":
        return BinOp(d["op"], expr_from_obj(d["left"]), expr_from_obj(d["right"]))
    if t == "func":
        return Func(d["name"], tuple(expr_from_obj(a) for a in d["args"]))
    if t == "onehot":
        return OneHot(d["var"], d["level"])
    if t == "casege":
        return CaseGE(
            expr_from_obj(d["cond"]), d["knot"], expr_from_obj(d["then"]), d["strict"]
        )
    if t == "cast":
        return Cast(expr_from_obj(d["expr"]), d["to"])
    raise ValueError(f"unknown expr tag {t!r}")
