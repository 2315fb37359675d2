"""fixest-style model comparison tables (``etable``).

Driver-side presentation only — takes already-fitted models (DbregModel,
GlmModel, IvModel, a DbregMulti, a DbregSplit/GlmSplit dict, or any object
exposing ``coeftable``/``coef_names``) and assembles one column per model:
estimates with significance stars, standard errors in parentheses, a
fixed-effects block, and a fit-statistics block. Zero distributed work.

Star convention is fixest's default: ``***`` p<0.001, ``**`` p<0.01,
``*`` p<0.05, ``.`` p<0.1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_STARS = ((0.001, "***"), (0.01, "**"), (0.05, "*"), (0.1, "."))


def _stars(p: float) -> str:
    if p is None or not np.isfinite(p):
        return ""
    for cut, s in _STARS:
        if p < cut:
            return s
    return ""


def _fmt(v: float, digits: int) -> str:
    if v is None or not np.isfinite(v):
        return "NA"
    if v != 0 and (abs(v) >= 10 ** (digits + 2) or abs(v) < 10 ** (-digits)):
        return f"{v:.{digits}e}"
    return f"{v:.{digits}f}"


def _iter_models(models) -> list[tuple[str, object]]:
    """Normalize the input into [(label, model)]."""
    out: list[tuple[str, object]] = []

    def add(label, m):
        out.append((str(label), m))

    if isinstance(models, dict):
        for k, v in models.items():
            add(k, v)
        return out
    # DbregMulti / DbregSplit / GlmSplit expose .models mappings
    inner = getattr(models, "models", None)
    if isinstance(inner, dict) and not hasattr(models, "coeftable"):
        for k, v in inner.items():
            if isinstance(k, tuple):
                y, step = k
                add(f"{y} ~ {step}" if step else str(y), v)
            else:
                add(k, v)
        return out
    if isinstance(models, (list, tuple)):
        for i, m in enumerate(models, start=1):
            lab = getattr(m, "yvar", None) or f"model {i}"
            add(f"({i}) {lab}", m)
        return out
    # single model
    add(getattr(models, "yvar", "model"), models)
    return out


def _vcov_label(m) -> str:
    vt = getattr(m, "vcov_type", None)
    if vt == "cluster":
        cv = getattr(m, "cluster_var", None)
        return f"by: {cv}" if cv else "clustered"
    return {
        "iid": "IID",
        "hc1": "HC1",
        "dk": "Driscoll-Kraay",
        "cr3": "CV3 jackknife",
        "conley": "Conley",
        None: "",
    }.get(vt, str(vt))


def etable(models, *, digits: int = 4, se_below: bool = True) -> pd.DataFrame:
    """Model comparison table: one column per model, coefficient rows
    ``est[stars]`` with ``(se)`` beneath (``se_below=False`` puts them on
    one line), then the fixed-effects block and fit statistics. Returns a
    pandas DataFrame whose string repr prints cleanly; ``.to_latex()`` /
    ``.to_csv()`` export it (``.to_markdown()`` additionally needs the
    ``tabulate`` package)."""
    pairs = _iter_models(models)
    if not pairs:
        raise ValueError("etable: no models given")

    # union coefficient order (first appearance)
    coef_order: list[str] = []
    for _, m in pairs:
        for n in m.coef_names:
            if n not in coef_order:
                coef_order.append(n)
    fe_order: list[str] = []
    for _, m in pairs:
        for f in getattr(m, "fe", None) or []:
            if f not in fe_order:
                fe_order.append(f)

    col_cells: list[list[str]] = []  # parallel to pairs (labels may repeat)
    rows: list[str] = []
    for lab, m in pairs:
        ct = m.coeftable
        cells: list[str] = []
        for n in coef_order:
            if n in m.coef_names:
                i = list(ct.index).index(n)
                est = float(ct["estimate"].iloc[i])
                se = float(ct["std.error"].iloc[i])
                p = float(ct["p.value"].iloc[i])
                top = f"{_fmt(est, digits)}{_stars(p)}"
                bot = f"({_fmt(se, digits)})"
                cells.extend([top, bot] if se_below else [f"{top} {bot}"])
            else:
                cells.extend(["", ""] if se_below else [""])
        for f in fe_order:
            cells.append("Yes" if f in (getattr(m, "fe", None) or []) else "")
        # fit statistics
        nobs = getattr(m, "nobs_orig", None) or getattr(m, "nobs", None)
        cells.append(f"{int(nobs):,}" if nobs else "")
        cells.append(_vcov_label(m))
        r2 = ""
        if hasattr(m, "r2"):
            try:
                r2 = _fmt(float(m.r2()), 5)
            except Exception:
                r2 = ""
        cells.append(r2)
        ll = getattr(m, "loglik", None)
        cells.append(_fmt(float(ll), 2) if ll is not None else "")
        fam = getattr(m, "family", None)
        cells.append(str(fam) if fam else "OLS")
        col_cells.append(cells)

    for n in coef_order:
        rows.extend([n, ""] if se_below else [n])
    rows.extend(f"FE: {f}" for f in fe_order)
    rows.extend(["N", "vcov", "R2", "LogLik", "family"])

    # de-duplicate column labels (pandas requires unique columns)
    seen: dict[str, int] = {}
    labels = []
    for lab, _ in pairs:
        if lab in seen:
            seen[lab] += 1
            labels.append(f"{lab} ({seen[lab]})")
        else:
            seen[lab] = 1
            labels.append(lab)

    df = pd.DataFrame(
        {lab: cells for lab, cells in zip(labels, col_cells)},
        index=rows,
    )
    # drop all-empty stat rows (e.g. R2 for GLMs, LogLik for OLS)
    keep = [
        i for i, r in enumerate(rows)
        if r == "" or any(df.iloc[i][c] != "" for c in df.columns)
    ]
    return df.iloc[keep]
