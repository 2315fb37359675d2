"""Weighted least squares on compressed cells — Gram assembly without ever
materializing a design matrix.

The reference builds a client-side sparse model matrix over the compressed
cells and takes cross products (R/dbreg.R:1601-1635). This module computes
the same X'WX / X'Wy objects *directly* from the cell table with vectorized
groupby aggregations: dummy-column products are just (weighted) contingency
tables, so a design with thousands of FE levels needs O(#vars²) groupbys over
the cells, never an N×p matrix. numpy/pandas only (no scipy in the image).

Column order matches R's ``sparse.model.matrix`` convention: intercept, then
each design variable in formula order (factors expand to sorted levels with
the first dropped), then each FE's levels (first dropped).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd


@dataclass
class _Block:
    kind: str  # "const" | "num" | "cat"
    var: str | None
    levels: list | None  # for cat: levels contributing columns (ref dropped)
    codes: np.ndarray | None  # for cat: per-row index into `levels`, -1 = ref/absent
    values: np.ndarray | None  # for num: per-row values
    col_offset: int = 0

    @property
    def ncols(self) -> int:
        if self.kind == "const":
            return 1
        if self.kind == "num":
            return 1
        return len(self.levels)


def _is_categorical(s: pd.Series, force: bool) -> bool:
    return force or s.dtype == object or str(s.dtype) in ("string", "bool", "boolean")


class CellDesign:
    """Implicit design matrix over a cell table."""

    def __init__(self, pdf: pd.DataFrame, design_vars: list[str], fe_vars: list[str]):
        self.pdf = pdf
        self.n = len(pdf)
        self.blocks: list[_Block] = [
            _Block("const", None, None, None, np.ones(self.n))
        ]
        for v in design_vars:
            self._add_var(pdf, v, force_cat=False)
        for v in fe_vars:
            self._add_var(pdf, v, force_cat=True)
        off = 0
        self.col_names: list[str] = []
        for b in self.blocks:
            b.col_offset = off
            off += b.ncols
            if b.kind == "const":
                self.col_names.append("(Intercept)")
            elif b.kind == "num":
                self.col_names.append(b.var)
            else:
                self.col_names.extend(f"{b.var}{lvl}" for lvl in b.levels)
        self.p = off

    def _add_var(self, pdf: pd.DataFrame, v: str, force_cat: bool):
        s = pdf[v]
        if _is_categorical(s, force_cat):
            if s.isna().any():
                # np.unique cannot sort None against str, and the
                # distributed twin refuses too — fail identically
                raise ValueError(
                    f"[dbreg] categorical/FE column(s) ['{v}'] contain "
                    "NULLs; use drop_missings=True (the default) or fill "
                    "them — a NULL has no dummy level."
                )
            arr = s.to_numpy()
            uniq, inv = np.unique(arr, return_inverse=True)
            # drop first (reference) level: code 0 → -1, level k → k-1
            codes = inv - 1
            self.blocks.append(_Block("cat", v, list(uniq[1:]), codes, None))
        else:
            self.blocks.append(
                _Block("num", v, None, None, s.to_numpy(dtype=float))
            )

    # -- Gram assembly -----------------------------------------------------

    def gram(self, w: np.ndarray) -> np.ndarray:
        """X' diag(w) X as a dense (p, p) array."""
        w = np.asarray(w, dtype=float)
        G = np.zeros((self.p, self.p))
        B = self.blocks
        for i, bi in enumerate(B):
            for bj in B[i:]:
                self._fill(G, bi, bj, w)
        iu = np.triu_indices(self.p, k=1)
        G[(iu[1], iu[0])] = G[iu]
        return G

    def _fill(self, G: np.ndarray, bi: _Block, bj: _Block, w: np.ndarray):
        oi, oj = bi.col_offset, bj.col_offset
        xi = bi.values if bi.kind != "cat" else None
        xj = bj.values if bj.kind != "cat" else None
        if xi is not None and xj is not None:
            G[oi, oj] += float(np.dot(w * xi, xj))
        elif xi is not None and bj.kind == "cat":
            sums = np.bincount(
                bj.codes[bj.codes >= 0],
                weights=(w * xi)[bj.codes >= 0],
                minlength=bj.ncols,
            )
            G[oi, oj : oj + bj.ncols] += sums
        elif bi.kind == "cat" and xj is not None:
            sums = np.bincount(
                bi.codes[bi.codes >= 0],
                weights=(w * xj)[bi.codes >= 0],
                minlength=bi.ncols,
            )
            G[oi : oi + bi.ncols, oj] += sums
        else:
            if bi is bj:
                sums = np.bincount(
                    bi.codes[bi.codes >= 0],
                    weights=w[bi.codes >= 0],
                    minlength=bi.ncols,
                )
                idx = np.arange(bi.ncols)
                G[oi + idx, oj + idx] += sums
            else:
                mask = (bi.codes >= 0) & (bj.codes >= 0)
                flat = bi.codes[mask] * bj.ncols + bj.codes[mask]
                sums = np.bincount(
                    flat, weights=w[mask], minlength=bi.ncols * bj.ncols
                ).reshape(bi.ncols, bj.ncols)
                G[oi : oi + bi.ncols, oj : oj + bj.ncols] += sums

    def weighted_col_sums(self, w: np.ndarray) -> np.ndarray:
        """X' w — e.g. X'Wy with w = per-cell (weight·y)."""
        w = np.asarray(w, dtype=float)
        out = np.zeros(self.p)
        for b in self.blocks:
            if b.kind != "cat":
                out[b.col_offset] = float(np.dot(w, b.values))
            else:
                m = b.codes >= 0
                out[b.col_offset : b.col_offset + b.ncols] = np.bincount(
                    b.codes[m], weights=w[m], minlength=b.ncols
                )
        return out

    def matvec(self, beta: np.ndarray, keep_idx: list[int] | None = None) -> np.ndarray:
        """ŷ = X β over the cells (β given on kept columns)."""
        full = np.zeros(self.p)
        if keep_idx is None:
            full[:] = beta
        else:
            full[np.asarray(keep_idx)] = beta
        yhat = np.zeros(self.n)
        for b in self.blocks:
            if b.kind != "cat":
                yhat += full[b.col_offset] * b.values
            else:
                lut = np.concatenate(
                    ([0.0], full[b.col_offset : b.col_offset + b.ncols])
                )
                yhat += lut[b.codes + 1]
        return yhat

    def cross_gram_cat(self, w: np.ndarray, codes: np.ndarray, n_groups: int) -> np.ndarray:
        """X' diag(w) D where D is the full-indicator matrix of ``codes``
        (n_groups columns, no reference drop) — used for per-cluster score
        vectors S = X'U."""
        w = np.asarray(w, dtype=float)
        S = np.zeros((self.p, n_groups))
        for b in self.blocks:
            if b.kind != "cat":
                S[b.col_offset] = np.bincount(
                    codes, weights=w * b.values, minlength=n_groups
                )
            else:
                m = b.codes >= 0
                flat = b.codes[m] * n_groups + codes[m]
                S[b.col_offset : b.col_offset + b.ncols] = np.bincount(
                    flat, weights=w[m], minlength=b.ncols * n_groups
                ).reshape(b.ncols, n_groups)
        return S
