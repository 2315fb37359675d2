"""R-style regression formula parser.

Implements the subset of R formula semantics the reference relies on
(reference: R/utils.R:224-258 `parse_regression_formula` and the Formula
package's two-part RHS):

    y ~ x1 + x2*x3 | fe1 + fe2

- LHS: exactly one outcome variable.
- RHS part 1 (before `|`): terms joined by `+`; `a:b` is a pure interaction;
  `a*b` expands to `a + b + a:b`; `0` / `-1` suppress the intercept
  (used by the binscatter path, reference: R/dbbinsreg.R:1040-1060).
- RHS part 2 (after `|`): fixed-effect variables joined by `+`.
- Term ordering follows R's `terms()`: main effects first, then 2-way
  interactions, then 3-way, ... each group in order of first appearance.

Cluster formulas (`~ clustervar`) are parsed with :func:`parse_cluster`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_TOKEN = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


@dataclass(frozen=True)
class Term:
    """One RHS term: a tuple of variable names (len > 1 ⇒ interaction)."""

    vars: tuple[str, ...]

    @property
    def label(self) -> str:
        return ":".join(self.vars)

    @property
    def order(self) -> int:
        return len(self.vars)

    @property
    def sorted_key(self) -> tuple[str, ...]:
        return tuple(sorted(self.vars))


@dataclass
class ParsedFormula:
    yvar: str | None
    terms: list[Term]
    fe: list[str]
    intercept: bool = True

    @property
    def xvars(self) -> list[str]:
        """Unique variable names on RHS part 1, in order of appearance."""
        seen: list[str] = []
        for t in self.terms:
            for v in t.vars:
                if v not in seen:
                    seen.append(v)
        return seen

    @property
    def term_labels(self) -> list[str]:
        return [t.label for t in self.terms]

    @property
    def has_interactions(self) -> bool:
        return any(t.order > 1 for t in self.terms)


def _split_top(s: str, sep: str) -> list[str]:
    """Split on sep outside parentheses."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _expand_product(vars_: list[str]) -> list[Term]:
    """`a*b*c` → all non-empty subsets, R ordering (by order, then position)."""
    n = len(vars_)
    subsets: list[tuple[str, ...]] = []
    for mask in range(1, 1 << n):
        subsets.append(tuple(vars_[i] for i in range(n) if mask & (1 << i)))
    subsets.sort(key=lambda t: len(t))
    return [Term(t) for t in subsets]


def parse_formula(fml: str) -> ParsedFormula:
    fml = fml.strip()
    if "~" not in fml:
        raise ValueError(f"not a formula: {fml!r}")
    lhs, rhs = fml.split("~", 1)
    lhs = lhs.strip()
    yvar: str | None = None
    if lhs:
        yvars = [v.strip() for v in _split_top(lhs, "+") if v.strip()]
        if len(yvars) != 1:
            raise ValueError("Exactly one outcome variable required.")
        yvar = yvars[0]
        if not _TOKEN.match(yvar):
            raise ValueError(f"invalid outcome variable {yvar!r}")

    rhs_parts = [p.strip() for p in _split_top(rhs, "|")]
    if len(rhs_parts) > 2:
        raise ValueError("At most one `|` (fixed-effects part) supported.")
    rhs1 = rhs_parts[0]
    fe: list[str] = []
    if len(rhs_parts) == 2 and rhs_parts[1]:
        fe = [v.strip() for v in _split_top(rhs_parts[1], "+") if v.strip()]
        for v in fe:
            if not _TOKEN.match(v):
                raise ValueError(f"invalid fixed-effect variable {v!r}")

    intercept = True
    raw_terms: list[Term] = []
    tokens: list[str] = []
    for plus_tok in _split_top(rhs1, "+"):
        minus_parts = _split_top(plus_tok, "-")
        tokens.append(minus_parts[0].strip())
        tokens.extend("-" + p.strip() for p in minus_parts[1:])
    for tok in tokens:
        if not tok:
            continue
        neg = False
        while tok.startswith("-"):
            neg = not neg
            tok = tok[1:].strip()
        if tok in ("0",):
            intercept = False
            continue
        if tok == "1":
            if neg:
                intercept = False
            continue
        if neg:
            raise ValueError(f"term removal not supported: -{tok}")
        if "^" in tok and ":" not in tok and "*" not in tok:
            # polynomial sugar: x^k == x:x:…:x (k copies — the repeated-var
            # interaction term multiplies out to the k-th power)
            v, _, kk = tok.partition("^")
            v = v.strip()
            if not _TOKEN.match(v):
                raise ValueError(f"invalid variable {v!r}")
            try:
                k = int(kk.strip())
            except ValueError:
                raise ValueError(f"power must be an integer: {tok!r}") from None
            if k < 1:
                raise ValueError(f"power must be >= 1: {tok!r}")
            raw_terms.append(Term((v,) * k))
        elif "*" in tok:
            vars_ = [v.strip() for v in tok.split("*")]
            for v in vars_:
                if not _TOKEN.match(v):
                    raise ValueError(f"invalid variable {v!r}")
            raw_terms.extend(_expand_product(vars_))
        elif ":" in tok:
            vars_ = tuple(v.strip() for v in tok.split(":"))
            for v in vars_:
                if not _TOKEN.match(v):
                    raise ValueError(f"invalid variable {v!r}")
            raw_terms.append(Term(vars_))
        else:
            if not _TOKEN.match(tok):
                raise ValueError(f"invalid variable {tok!r}")
            raw_terms.append(Term((tok,)))

    # Dedupe (by order-insensitive key) then sort R-style: by interaction
    # order, stable within order by first appearance.
    seen: set[tuple[str, ...]] = set()
    deduped: list[Term] = []
    for t in raw_terms:
        if t.sorted_key in seen:
            continue
        seen.add(t.sorted_key)
        deduped.append(t)
    deduped.sort(key=lambda t: t.order)  # stable sort keeps appearance order

    if not deduped:
        raise ValueError("No regressors on RHS.")

    return ParsedFormula(yvar=yvar, terms=deduped, fe=fe, intercept=intercept)


def parse_cluster(spec) -> list[str]:
    """Parse a cluster spec: "~ firm" → ["firm"], "~ firm + year" →
    ["firm", "year"] (multiway, Cameron-Gelbach-Miller). The reference
    allows one variable only (R/utils.R:284-287); multiway is a
    Spark-native extension (SURVEY §7.5)."""
    if spec is None:
        raise ValueError("no cluster spec")
    s = str(spec).strip()
    if s.startswith("~"):
        s = s[1:].strip()
    vars_ = [v.strip() for v in s.split("+") if v.strip()]
    if not 1 <= len(vars_) <= 3:
        raise ValueError("cluster spec needs 1-3 variables")
    for v in vars_:
        if not _TOKEN.match(v):
            raise ValueError(f"invalid cluster variable {v!r}")
    return vars_


def parse_weights(weights: str | None) -> str | None:
    """Resolve a ``weights=`` argument ("w" or "~w") to a single column
    name — shared by dbreg/dbiv/dbbinsreg/build_plan so the rule and its
    error message cannot drift."""
    if weights is None:
        return None
    col = weights.lstrip("~").strip()
    if not col or any(ch in col for ch in " +*:|"):
        raise ValueError(
            "weights must name a single column (e.g. weights='w' or '~w')"
        )
    return col


def parse_vcov(vcov, cluster=None, valid=("iid", "hc1")) -> tuple[str, list[str] | None]:
    """Returns (vcov_type, cluster_vars). Mirrors R/utils.R:276-314; the
    cluster list has >1 entry only for the multiway extension."""
    vcov_type, cluster_vars = None, None
    if vcov is None:
        vcov_type = valid[0]
    elif isinstance(vcov, str) and vcov.strip().startswith("~"):
        cluster_vars = parse_cluster(vcov)
        vcov_type = "cluster"
    elif isinstance(vcov, str) and "~" in vcov:
        # "dk ~ time": Driscoll-Kraay HAC over per-period score sums
        lhs, rhs = vcov.split("~", 1)
        if lhs.strip().lower() in ("dk", "driscoll_kraay", "driscoll-kraay"):
            cluster_vars = parse_cluster("~" + rhs)
            if len(cluster_vars) != 1:
                raise ValueError("Driscoll-Kraay needs exactly one time variable")
            vcov_type = "dk"
        elif lhs.strip().lower() == "conley":
            # Conley (1999) spatial HAC: two coordinate columns (lat, lon)
            cluster_vars = parse_cluster("~" + rhs)
            if len(cluster_vars) != 2:
                raise ValueError(
                    "conley needs exactly two coordinate variables: "
                    "'conley ~ lat + lon'"
                )
            vcov_type = "conley"
        elif lhs.strip().lower() in ("cr3", "cv3", "jackknife"):
            # MacKinnon-Nielsen-Webb cluster jackknife (CV3): leave-one-
            # cluster-out refits from per-cluster Gram blocks
            cluster_vars = parse_cluster("~" + rhs)
            if len(cluster_vars) != 1:
                raise ValueError("cr3 needs exactly one cluster variable")
            vcov_type = "cr3"
        else:
            raise ValueError(
                f"unknown vcov form {vcov!r}; use 'iid', 'hc1', '~cluster', "
                "'dk ~ time', 'cr3 ~ cluster', or 'conley ~ lat + lon'"
            )
    elif isinstance(vcov, str):
        vt = vcov.strip().lower()
        matches = [v for v in valid if v.startswith(vt)]
        if not matches:
            raise ValueError(f"vcov must be one of {valid} or a cluster formula")
        vcov_type = matches[0]
    else:
        raise ValueError("vcov must be a string or a cluster formula string")
    if cluster is not None:
        cluster_vars = parse_cluster(cluster)
        vcov_type = "cluster"
    return vcov_type, cluster_vars
