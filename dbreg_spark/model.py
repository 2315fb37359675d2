"""The fitted-model object returned by :func:`dbreg_spark.dbreg`.

Mirrors the reference's ``dbreg`` S3 object (R/dbreg.R:858-871, 2089-2100)
and its post-estimation methods (R/stats-methods.R, R/gof.R, R/tidiers.R,
R/print.R): coef/se/vcov/confint, predict (distributed — an upgrade over the
reference's client-side predict, SURVEY §7.5), gof (R²/adj-R²/RMSE), tidy,
glance, and a readable print.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pandas as pd
from . import stats as _tstats

from .design import standardize_coef_names


@dataclass
class DbregModel:
    coeftable: pd.DataFrame  # index = coef names; estimate/std.error/statistic/p.value
    vcov_: np.ndarray
    coef_names: list[str]
    yvar: str
    xvars: list[str]
    fe: list[str]
    strategy: str
    vcov_type: str
    cluster_var: Optional[str]
    nobs: int  # rows fetched to the driver (1 for moment strategies)
    nobs_orig: int  # underlying data rows
    df_residual: float
    rss: float
    tss: float
    n_fe1: int = 1
    n_fe2: int = 1
    n_clusters: Optional[int] = None
    collin_vars: list[str] = field(default_factory=list)
    compression_ratio: Optional[float] = None
    compression_ratio_est: Optional[float] = None
    query_string: Optional[str] = None  # oracle SQL of the main pass
    # handles used by predict(); not part of the printed surface
    design_info: object = None
    parsed: object = None
    fe_means: Optional[dict] = None
    # (base_df, numeric_vars, fe) for lazy fe_means computation (mundlak)
    fe_means_src: object = None
    intercept: bool = True

    def _ensure_fe_means(self):
        if self.fe_means is None and self.fe_means_src is not None:
            import pyspark.sql.functions as F

            df, numeric_vars, fe = self.fe_means_src
            self.fe_means = {
                fe_k: df.groupBy(fe_k)
                .agg(*[F.avg(v).alias(f"{v}_bar_{fe_k}") for v in numeric_vars])
                .toPandas()
                for fe_k in fe
            }
        return self.fe_means

    # -- inference ---------------------------------------------------------
    def _is_fe_coef(self, name: str) -> bool:
        """FE-level dummies (compress models) are named ``{fe_var}{level}``
        (reference: stats-methods.R:28-60 filters the same way)."""
        return any(name != f and name.startswith(f) for f in (self.fe or []))

    def _filter_fe(self, s, fe):
        if fe is None:
            return s
        mask = [self._is_fe_coef(n) for n in s.index]
        if fe:
            return s[mask]
        return s[[not m for m in mask]]

    def coef(self, fe: bool | None = None) -> pd.Series:
        """Estimates; ``fe=False`` drops FE-level dummies, ``fe=True`` keeps
        only them (reference: ``coef.dbreg(fe=)``)."""
        return self._filter_fe(self.coeftable["estimate"], fe)

    def se(self, fe: bool | None = None) -> pd.Series:
        return self._filter_fe(self.coeftable["std.error"], fe)

    def vcov(self) -> pd.DataFrame:
        return pd.DataFrame(self.vcov_, index=self.coef_names, columns=self.coef_names)

    def confint(
        self,
        parm: list[str] | None = None,
        level: float = 0.95,
        fe: bool | None = None,
    ) -> pd.DataFrame:
        crit = _tstats.t_ppf(1 - (1 - level) / 2, self.df_residual)
        est, se = self.coeftable["estimate"], self.coeftable["std.error"]
        lo = est - crit * se
        hi = est + crit * se
        out = pd.DataFrame(
            {f"{(1 - level) / 2:.1%}": lo, f"{1 - (1 - level) / 2:.1%}": hi}
        )
        out = self._filter_fe(out, fe)
        if parm is not None:
            missing = [p for p in parm if p not in out.index]
            if missing:
                raise ValueError(f"unknown coefficient(s): {missing}")
            out = out.loc[parm]
        return out

    # -- goodness of fit (reference: R/gof.R:10-27) ------------------------
    def r2(self) -> float:
        return 1.0 - self.rss / self.tss

    def adj_r2(self) -> float:
        n, k = self.nobs_orig, self.nobs_orig - self.df_residual
        return 1.0 - (self.rss / self.df_residual) / (self.tss / (n - 1))

    def rmse(self) -> float:
        return float(np.sqrt(self.rss / self.nobs_orig))

    def gof(self) -> dict:
        return {"r2": self.r2(), "adj_r2": self.adj_r2(), "rmse": self.rmse()}

    # -- tidiers (reference: R/tidiers.R:26-75) ----------------------------
    def tidy(self, conf_int: bool = False, level: float = 0.95) -> pd.DataFrame:
        out = self.coeftable.reset_index().rename(columns={"index": "term"})
        if conf_int:
            ci = self.confint(level=level)
            out["conf.low"] = ci.iloc[:, 0].values
            out["conf.high"] = ci.iloc[:, 1].values
        return out

    def glance(self) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {
                    "r.squared": self.r2(),
                    "adj.r.squared": self.adj_r2(),
                    "rmse": self.rmse(),
                    "nobs": self.nobs_orig,
                    "df.residual": self.df_residual,
                    "strategy": self.strategy,
                    "vcov.type": self.vcov_type,
                }
            ]
        )

    # -- predict (distributed; reference: R/stats-methods.R:94-236) --------
    def predict(self, newdata, interval: str | None = None, level: float = 0.95):
        """Score a Spark DataFrame with the fitted coefficients.

        Returns the input with a ``fit`` column appended (plus ``lwr``/``upr``
        when ``interval`` is "confidence" or "prediction"). Runs fully
        distributed: β is embedded as literals, x'Vx is expanded as a
        quadratic form in columns.
        """
        import pyspark.sql.functions as F

        from .plans.exprs import to_spark

        if self.design_info is None:
            raise ValueError("model does not carry design info; cannot predict")
        names = list(self.design_info.names)
        exprs = {n: to_spark(e) for n, e in zip(names, self.design_info.exprs)}

        beta = self.coeftable["estimate"]
        fit = F.lit(0.0)
        if "(Intercept)" in beta.index:
            fit = fit + F.lit(float(beta["(Intercept)"]))
        used: list[str] = []
        for raw_name in names:
            cname = standardize_coef_names(raw_name)
            if cname in beta.index:
                fit = fit + F.lit(float(beta[cname])) * exprs[raw_name]
                used.append(raw_name)
        # mundlak: add group-mean terms via broadcast-joined means
        df = newdata
        if self.strategy == "mundlak" and self._ensure_fe_means() is not None:
            spark = newdata.sparkSession
            for fe_k, pdf in self.fe_means.items():
                mdf = F.broadcast(spark.createDataFrame(pdf))
                df = df.join(mdf, on=fe_k, how="left")
            for bar_col in [c for c in beta.index if "_bar_" in c]:
                fit = fit + F.lit(float(beta[bar_col])) * F.col(bar_col)
        out = df.withColumn("fit", fit)

        if interval in ("confidence", "prediction"):
            # var(x'b) = x' V x expanded into column arithmetic
            cols = []
            for cname in self.coef_names:
                if cname == "(Intercept)":
                    cols.append(F.lit(1.0))
                elif "_bar_" in cname:
                    cols.append(F.col(cname))
                else:
                    raw = cname.replace(":", "_x_")
                    cols.append(exprs.get(raw, F.col(cname)))
            V = self.vcov_
            var_fit = F.lit(0.0)
            for i in range(len(cols)):
                for j in range(len(cols)):
                    if V[i, j] != 0.0:
                        var_fit = var_fit + F.lit(float(V[i, j])) * cols[i] * cols[j]
            if interval == "prediction":
                sigma2 = self.rss / self.df_residual
                var_fit = var_fit + F.lit(float(sigma2))
            crit = float(_tstats.t_ppf(1 - (1 - level) / 2, self.df_residual))
            se_fit = F.sqrt(var_fit)
            out = out.withColumn("lwr", F.col("fit") - crit * se_fit).withColumn(
                "upr", F.col("fit") + crit * se_fit
            )
        return out

    # -- display -----------------------------------------------------------
    def __repr__(self) -> str:
        lines = [
            f"dbreg_spark model  |  strategy={self.strategy}  vcov={self.vcov_type}"
            + (f"(~{self.cluster_var})" if self.cluster_var else ""),
            f"obs: {self.nobs_orig:,}"
            + (
                f"  (compressed to {self.nobs:,} rows)"
                if self.strategy == "compress"
                else ""
            )
            + (f"  fe: {' + '.join(self.fe)}" if self.fe else ""),
        ]
        if self.collin_vars:
            lines.append(f"dropped (collinear): {', '.join(self.collin_vars)}")
        with pd.option_context("display.float_format", lambda v: f"{v:.6g}"):
            lines.append(str(self.coeftable))
        lines.append(
            f"R2: {self.r2():.6f}  Adj.R2: {self.adj_r2():.6f}  RMSE: {self.rmse():.4g}"
        )
        return "\n".join(lines)
