"""Driver-side dense linear algebra kernels (K1-K8 in SURVEY.md §2.9).

These mirror the reference's client-side numeric layer:
- Cholesky solve with lstsq fallback (reference: R/utils.R:66-80)
- pivoted-Cholesky collinearity detection, playing the role of the
  reference's pivoted-QR rank probe (reference: R/utils.R:25-62; SURVEY
  §7.4 notes drop *identity* may differ — kept-coefficient values match)
- RSS/TSS identities from sufficient statistics (reference: R/dbreg.R:800-809)
- vcov assembly for iid / HC1 / CR1 (reference: R/dbreg.R:1756-1803)
- coefficient table with t-based inference (reference: R/utils.R:10-17)

numpy-only (the container has no scipy); all inputs are tiny (p × p).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .stats import t_sf


@dataclass
class SolveResult:
    betahat: np.ndarray  # (p,)
    xtx_inv: np.ndarray  # (p, p)


def solve_with_fallback(xtx: np.ndarray, xty: np.ndarray) -> SolveResult:
    xtx = np.asarray(xtx, dtype=float)
    xty = np.asarray(xty, dtype=float).reshape(-1)
    try:
        np.linalg.cholesky(xtx)  # raises if not SPD
        betahat = np.linalg.solve(xtx, xty)
        xtx_inv = np.linalg.inv(xtx)
    except np.linalg.LinAlgError:
        betahat, *_ = np.linalg.lstsq(xtx, xty, rcond=None)
        xtx_inv = np.linalg.pinv(xtx)
    return SolveResult(betahat=betahat, xtx_inv=xtx_inv)


@dataclass
class CollinResult:
    xtx: np.ndarray
    xty: np.ndarray
    keep_idx: list[int]
    keep_names: list[str]
    drop_names: list[str]
    collinear: bool


def _pivoted_cholesky_rank(a: np.ndarray, tol: float) -> list[int]:
    """Pivoted Cholesky on a correlation-normalized PSD matrix; returns the
    pivot indices of the numerically independent columns."""
    a = a.copy()
    p = a.shape[0]
    piv = list(range(p))
    rank = 0
    for k in range(p):
        d = np.diag(a)[k:]
        j = k + int(np.argmax(d))
        if a[j, j] <= tol:
            break
        if j != k:
            a[[k, j], :] = a[[j, k], :]
            a[:, [k, j]] = a[:, [j, k]]
            piv[k], piv[j] = piv[j], piv[k]
        a[k, k] = np.sqrt(a[k, k])
        if k + 1 < p:
            a[k + 1 :, k] /= a[k, k]
            a[k + 1 :, k + 1 :] -= np.outer(a[k + 1 :, k], a[k + 1 :, k])
        rank += 1
    return piv[:rank]


def detect_collinearity(
    xtx: np.ndarray, xty: np.ndarray, names: list[str], tol: float = 1e-10
) -> CollinResult:
    """Rank detection on the Gram matrix; drop linearly dependent columns."""
    xtx = np.asarray(xtx, dtype=float)
    xty = np.asarray(xty, dtype=float).reshape(-1)
    p = xtx.shape[0]
    d = np.sqrt(np.clip(np.diag(xtx), 0.0, None))
    d[d == 0.0] = 1.0
    norm = xtx / np.outer(d, d)
    keep = _pivoted_cholesky_rank(norm, tol)
    if len(keep) >= p:
        return CollinResult(xtx, xty, list(range(p)), list(names), [], False)
    keep_idx = sorted(keep)
    drop_idx = sorted(set(range(p)) - set(keep))
    return CollinResult(
        xtx=xtx[np.ix_(keep_idx, keep_idx)],
        xty=xty[keep_idx],
        keep_idx=keep_idx,
        keep_names=[names[i] for i in keep_idx],
        drop_names=[names[i] for i in drop_idx],
        collinear=True,
    )


def rss_from_moments(sum_y_sq: float, betahat: np.ndarray, xtx: np.ndarray, xty: np.ndarray) -> float:
    """rss = Σy² − 2β'X'y + β'X'Xβ (reference: R/dbreg.R:800-804)."""
    b = np.asarray(betahat, dtype=float).reshape(-1)
    return float(sum_y_sq - 2.0 * b @ xty + b @ xtx @ b)


def tss_from_moments(sum_y_sq: float, sum_y: float, n: float) -> float:
    """tss = Σy² − (Σy)²/n (reference: R/dbreg.R:809)."""
    return float(sum_y_sq - (sum_y**2) / n)


def compute_vcov(
    vcov_type: str,
    xtx_inv: np.ndarray,
    rss: float,
    df_res: float,
    nobs_orig: float,
    n_params: int | None = None,
    meat: np.ndarray | None = None,
    n_clusters: int | None = None,
) -> np.ndarray:
    """(reference: R/dbreg.R:1756-1803)"""
    if vcov_type in ("hc2", "hc3"):
        # leverage-corrected meats carry their correction per row; no
        # finite-sample scale (MacKinnon-White / fixest vcov="hetero"
        # ssc-free convention for HC2/HC3)
        if meat is None:
            raise ValueError(f"{vcov_type} requires a meat matrix")
        return xtx_inv @ meat @ xtx_inv
    if vcov_type in ("hc1", "conley"):
        # Conley spatial HAC uses the HC1-style finite-sample factor, so a
        # cutoff small enough to isolate every observation reproduces HC1
        # exactly (pinned by tests/test_conley.py)
        if meat is None:
            raise ValueError(f"{vcov_type} requires a meat matrix")
        scale = nobs_orig / df_res
        return scale * (xtx_inv @ meat @ xtx_inv)
    if vcov_type == "cluster":
        if meat is None or n_clusters is None:
            raise ValueError("Clustered SEs require a meat matrix and cluster count")
        if n_params is None:
            n_params = xtx_inv.shape[0]
        scale = (n_clusters / (n_clusters - 1)) * (nobs_orig / (nobs_orig - n_params))
        return scale * (xtx_inv @ meat @ xtx_inv)
    if vcov_type == "dk":
        # Driscoll-Kraay: NW-weighted per-period meat, scaled like CR1 on
        # the time dimension (T periods) — lag 0 reproduces cluster-by-time
        if meat is None or n_clusters is None:
            raise ValueError("DK requires a meat matrix and period count")
        if n_params is None:
            n_params = xtx_inv.shape[0]
        scale = (n_clusters / (n_clusters - 1)) * (nobs_orig / (nobs_orig - n_params))
        return scale * (xtx_inv @ meat @ xtx_inv)
    if vcov_type != "iid":
        raise ValueError(f"unknown vcov type {vcov_type!r}")
    sigma2 = rss / df_res
    return sigma2 * xtx_inv


def gen_coeftable(
    betahat: np.ndarray,
    vcov: np.ndarray,
    df_residual: float,
    names: list[str],
    use_z: bool = False,
):
    """pandas coeftable: estimate, std.error, statistic, p.value
    (reference: R/utils.R:10-17). ``use_z=True`` switches to Wald-z
    (standard-normal) p-values — the GLM/MLE convention."""
    import pandas as pd

    b = np.asarray(betahat, dtype=float).reshape(-1)
    diag = np.diag(vcov)
    if np.any(diag < -1e-12 * max(np.abs(diag).max(), 1.0)):
        import warnings

        warnings.warn(
            "[dbreg] variance-covariance matrix has negative diagonal entries "
            "(multiway-CGM vcov can be non-PSD); the affected std.errors are "
            "reported as 0. Interpret those coefficients' inference with care."
        )
    se = np.sqrt(np.clip(diag, 0.0, None))
    with np.errstate(divide="ignore", invalid="ignore"):
        t = b / se
    if use_z:
        import math

        p = np.asarray(
            [math.erfc(abs(v) / math.sqrt(2.0)) if np.isfinite(v) else 0.0 for v in t]
        )
    else:
        p = 2.0 * np.asarray(t_sf(np.abs(t), df_residual))
    return pd.DataFrame(
        {"estimate": b, "std.error": se, "statistic": t, "p.value": p}, index=list(names)
    )
