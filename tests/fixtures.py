"""Deterministic synthetic fixtures mirroring FIXTURES.md (seed fixed)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def panel_balanced(n_firms=50, n_years=10, seed=42) -> pd.DataFrame:
    """F3: balanced panel, y = 2 + 1.5 x1 - 0.8 x2 + firm_fe + year_fe + e."""
    rng = np.random.default_rng(seed)
    firm = np.repeat(np.arange(1, n_firms + 1), n_years)
    year = np.tile(np.arange(1, n_years + 1), n_firms)
    x1 = rng.normal(size=firm.size)
    x2 = rng.normal(size=firm.size)
    firm_fe = rng.normal(size=n_firms)[firm - 1]
    year_fe = rng.normal(size=n_years)[year - 1]
    y = 2 + 1.5 * x1 - 0.8 * x2 + firm_fe + year_fe + rng.normal(size=firm.size)
    return pd.DataFrame(
        {"firm": firm.astype("int64"), "year": year.astype("int64"), "x1": x1, "x2": x2, "y": y}
    )


def panel_unbalanced(seed=42) -> pd.DataFrame:
    pdf = panel_balanced(seed=seed)
    rng = np.random.default_rng(seed + 1)
    keep = rng.random(len(pdf)) > 0.15
    return pdf[keep].reset_index(drop=True)


def trade_like(seed=42) -> pd.DataFrame:
    """F1: 15×15 dyads × products; dist_km constant within dyad so a
    GROUP BY (dist_km, dest, origin) compresses to ~#dyads rows."""
    rng = np.random.default_rng(seed)
    codes = [f"C{i:02d}" for i in range(15)]
    rows = []
    dist = {}
    for d in codes:
        for o in codes:
            if d == o:
                continue
            dist[(d, o)] = float(np.exp(rng.normal(7, 0.8)))
    for d in codes:
        for o in codes:
            if d == o:
                continue
            for p in range(1, 171):
                rows.append((d, o, p, dist[(d, o)]))
    pdf = pd.DataFrame(rows, columns=["destination", "origin", "product", "dist_km"])
    dfe = {c: rng.normal(0, 2) for c in codes}
    ofe = {c: rng.normal(0, 2) for c in codes}
    noise = np.exp(rng.normal(0, 1.5, len(pdf)))
    pdf["euros"] = (
        np.exp(
            10
            - 0.45 * np.log(pdf["dist_km"])
            + pdf["destination"].map(dfe)
            + pdf["origin"].map(ofe)
        )
        * noise
    )
    return pdf


def interactions_data(seed=42, n=200) -> pd.DataFrame:
    """F5: numeric × factor interactions."""
    rng = np.random.default_rng(seed)
    x1 = rng.normal(size=n)
    x3 = rng.normal(size=n)
    x2 = rng.choice(["a", "b", "c"], size=n)
    fe = rng.integers(1, 6, size=n)
    y = (
        1
        + 2 * x1
        + 3 * (x2 == "b")
        + 4 * (x2 == "c")
        + 0.5 * x1 * (x2 == "b")
        - 1.0 * x1 * (x2 == "c")
        + rng.normal(0, 0.5, n)
    )
    return pd.DataFrame(
        {
            "x1": x1,
            "x2": x2,
            "x3": x3,
            "fe": fe.astype("int64"),
            "y": y,
            "y1": y + 0.5 * fe,
            "y2": 1 + x1 + 2 * x3 + 0.8 * x1 * x3 + 0.3 * fe + rng.normal(0, 0.5, n),
        }
    )


def lsdv_matrix(pdf: pd.DataFrame, y: str, xs: list[str], fes: list[str]):
    """Oracle design: intercept + xs + FE dummies (drop first level each)."""
    n = len(pdf)
    cols = [np.ones(n)] + [pdf[x].to_numpy(float) for x in xs]
    names = ["(Intercept)"] + list(xs)
    for f in fes:
        lv = sorted(pdf[f].unique())
        for l in lv[1:]:
            cols.append((pdf[f] == l).astype(float).to_numpy())
            names.append(f"{f}{l}")
    return np.column_stack(cols), names, pdf[y].to_numpy(float)


def ols_fit(X: np.ndarray, y: np.ndarray):
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    return beta, resid


def iid_se(X, resid, df_res=None):
    n, p = X.shape
    df = df_res if df_res is not None else n - p
    sigma2 = resid @ resid / df
    return np.sqrt(np.diag(sigma2 * np.linalg.inv(X.T @ X)))


def cr1_se(X, resid, groups, n_params=None):
    n, p = X.shape
    bread = np.linalg.inv(X.T @ X)
    meat = np.zeros((p, p))
    for g in np.unique(groups):
        idx = groups == g
        s = X[idx].T @ resid[idx]
        meat += np.outer(s, s)
    G = len(np.unique(groups))
    K = n_params if n_params is not None else p
    V = (G / (G - 1)) * (n / (n - K)) * bread @ meat @ bread
    return np.sqrt(np.diag(V))
