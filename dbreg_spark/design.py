"""Design-matrix compiler: formula terms → named column expressions.

Re-implements the semantics of the reference's SQL design-matrix builder
(reference: R/sql_model_matrix.R:34-175) on top of a Spark DataFrame:

- column types come from ``df.schema`` (string/boolean ⇒ factor, numeric ⇒
  numeric), replacing the reference's LIMIT-0 probe;
- factor levels are harvested with a distinct+orderBy scan (first level =
  reference level, matching the reference's ``SELECT DISTINCT ... ORDER BY``);
- one-hot dummies are CASE WHEN expressions, reference level dropped
  following R contrasts rules: in an interaction, a factor keeps its
  reference level *unless* the variable is an FE or the complementary term is
  also in the model (reference: R/sql_model_matrix.R:115-121);
- interactions are cartesian products of the per-variable expansions, named
  ``a_x_b`` (reported back as ``a:b``).

Everything is emitted as the neutral expression IR from
:mod:`dbreg_spark.plans.exprs`, so it renders both to Spark Columns and to
oracle SQL.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .formula import ParsedFormula, Term
from .plans.exprs import Expr, Lit, OneHot, Var

SEP = "_x_"

_FACTOR_TYPES = (T.StringType, T.BooleanType)


def standardize_coef_names(names):
    """``a_x_b`` → ``a:b`` (reference: R/utils.R:6)."""
    if isinstance(names, str):
        return names.replace(SEP, ":")
    return [n.replace(SEP, ":") for n in names]


@dataclass
class DesignInfo:
    """Expanded design: parallel lists of column names and expressions."""

    names: list[str]
    exprs: list[Expr]
    factor_levels: dict[str, list]
    # variables classified numeric (used by mundlak group means)
    numeric_vars: list[str] = field(default_factory=list)


def classify_columns(df: DataFrame, vars_: list[str]) -> dict[str, str]:
    """'factor' for string/boolean columns, 'numeric' otherwise
    (reference: R/sql_model_matrix.R:87-98)."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    out = {}
    for v in vars_:
        if v not in schema:
            raise ValueError(f"column {v!r} not found in input")
        out[v] = "factor" if isinstance(schema[v], _FACTOR_TYPES) else "numeric"
    return out


MAX_FACTOR_LEVELS = 10_000


def factor_levels(
    df: DataFrame, vars_: list[str], max_levels: int = MAX_FACTOR_LEVELS
) -> dict[str, list]:
    """Distinct non-null levels, ascending — first level is the reference.

    One small job per factor, guarded by a single approx-cardinality
    pre-check: a string ID column mistaken for a factor would otherwise
    collect millions of rows to the driver (the reference caps its scan at
    100k rows, R/sql_model_matrix.R:93-94; here the distinct is exact for
    determinism but refused above ``max_levels`` with a clear message).
    """
    if not vars_:
        return {}
    probe = df.agg(
        *[F.approx_count_distinct(v, rsd=0.02).alias(f"__c_{i}") for i, v in enumerate(vars_)]
    ).collect()[0]
    for i, v in enumerate(vars_):
        est = probe[f"__c_{i}"]
        if est > max_levels:
            raise ValueError(
                f"[dbreg] factor column {v!r} has ~{est:,} distinct levels "
                f"(cap {max_levels:,}). This looks like an ID column, not a "
                "factor — use it as a fixed effect (demean/mundlak absorb "
                "high-cardinality FEs without level enumeration) or recode it."
            )
    out = {}
    for v in vars_:
        rows = (
            df.select(v)
            .where(F.col(v).isNotNull())
            .distinct()
            .orderBy(v)
            .collect()
        )
        out[v] = [r[0] for r in rows]
    return out


def _expand_variable(
    var: str,
    types: dict[str, str],
    levels: dict[str, list],
    expand: str,
    in_interaction: bool,
    drop_ref: bool,
) -> list[tuple[str, Expr]]:
    """(reference: R/sql_model_matrix.R:130-155)"""
    is_factor = types[var] == "factor"
    if is_factor and (expand == "all" or in_interaction):
        lvls = levels[var]
        if len(lvls) < 2:
            return [(f"{var}_constant", Lit(1.0))]
        if drop_ref:
            lvls = lvls[1:]
        return [(f"{var}{lvl}", OneHot(var, lvl)) for lvl in lvls]
    return [(var, Var(var))]


def _cross_product(expansions: list[list[tuple[str, Expr]]]) -> list[tuple[str, Expr]]:
    """(reference: R/sql_model_matrix.R:159-175)"""
    if len(expansions) == 1:
        return expansions[0]
    rest = _cross_product(expansions[1:])
    out = []
    for n1, e1 in expansions[0]:
        for n2, e2 in rest:
            out.append((f"{n1}{SEP}{n2}", e1 * e2))
    return out


def expand_term(
    term: Term,
    types: dict[str, str],
    levels: dict[str, list],
    expand: str,
    all_term_keys: set[tuple[str, ...]],
    fe_vars: list[str],
) -> list[tuple[str, Expr]]:
    """(reference: R/sql_model_matrix.R:105-126)"""
    vars_ = list(term.vars)
    is_interaction = len(vars_) > 1
    if not is_interaction and expand == "interactions":
        return [(vars_[0], Var(vars_[0]))]
    expansions = []
    for v in vars_:
        drop_ref = True
        if is_interaction and types[v] == "factor":
            other = tuple(sorted(set(vars_) - {v}))
            drop_ref = v in fe_vars or other in all_term_keys
        expansions.append(
            _expand_variable(v, types, levels, expand, is_interaction, drop_ref)
        )
    return _cross_product(expansions)


def build_design(
    df: DataFrame,
    parsed: ParsedFormula,
    expand: str = "all",
    fe_vars: list[str] | None = None,
    known_levels: dict[str, list] | None = None,
) -> DesignInfo:
    """Expand RHS part-1 terms into named expressions.

    ``expand="all"`` expands factors and interactions (moments/demean/mundlak
    paths); ``expand="interactions"`` expands only interaction terms, leaving
    factor main effects as raw grouping columns (compress path; reference:
    R/dbreg.R:1514-1534).

    ``known_levels``: caller-supplied factor levels (sorted ascending, the
    same order :func:`factor_levels` would return) — skips the
    probe + distinct scans for those columns. Used by callers that already
    enumerated the levels from an earlier pass (e.g. dbbinsglm's bins).
    """
    fe_vars = fe_vars if fe_vars is not None else parsed.fe
    vars_ = parsed.xvars
    types = classify_columns(df, vars_)
    fvars = [v for v in vars_ if types[v] == "factor"]
    if expand != "all":
        # interactions-only expansion leaves factor MAIN effects as raw
        # grouping columns (compress path) — only factors inside interaction
        # terms need their level tables; skipping the rest saves the
        # distinct+orderBy scan (and its cardinality guard) per factor
        in_interaction = {
            v for t in parsed.terms if len(t.vars) > 1 for v in t.vars
        }
        fvars = [v for v in fvars if v in in_interaction]
    levels = dict(known_levels or {})
    probe_vars = [v for v in fvars if v not in levels]
    if probe_vars:
        levels.update(factor_levels(df, probe_vars))
    levels = {v: levels[v] for v in fvars}  # only the formula's factors

    all_term_keys = {t.sorted_key for t in parsed.terms}
    # FE vars count as terms for the drop-reference rule
    # (reference: R/sql_model_matrix.R:61 `all_terms = unique(c(term_labels, fe_vars))`)
    for v in fe_vars:
        all_term_keys.add((v,))

    names: list[str] = []
    exprs: list[Expr] = []
    for term in parsed.terms:
        for n, e in expand_term(term, types, levels, expand, all_term_keys, fe_vars):
            names.append(n)
            exprs.append(e)
    return DesignInfo(
        names=names,
        exprs=exprs,
        factor_levels=levels,
        numeric_vars=[v for v in vars_ if types[v] == "numeric"],
    )
