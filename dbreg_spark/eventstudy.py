"""Event-study estimation — fixest's ``i(rel_time, ref = -1)`` workflow:
dynamic treatment-effect coefficients around an event, with unit and time
fixed effects absorbed.

``event_study`` builds one dummy column per relative-time level (a bounded,
probed set — never a blind explode), drops the reference period, and runs
the standard TWFE regression through :func:`dbreg` — so every strategy,
sandwich (iid/HC1/CR1/multiway/DK), and ``weights=`` option composes, and
the estimation inherits dbreg's pass-count guarantees (the dummies are pure
column expressions on the same scan). The result wraps the fitted model
with a plot-ready tidy frame: one row per relative time, the reference
period pinned at 0 with no CI.

``event_study`` is the classic (possibly-biased-under-staggered-adoption)
dynamic TWFE. :func:`sun_abraham` is the heterogeneity-robust
interaction-weighted estimator (Sun & Abraham 2021, fixest's ``sunab``):
one dummy per (cohort × relative-time) cell, cohort-share-weighted
aggregation per relative time with delta-method SEs — the same single
dbreg fit plus driver-side linear algebra on the fitted vcov.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from . import stats as _tstats
from .api import dbreg

REL_TIME_MAX_LEVELS = 200


def _dummy_name(lvl) -> str:
    """Deterministic, formula-safe column name for a relative-time level."""
    if isinstance(lvl, (int, np.integer)) or (
        isinstance(lvl, float) and float(lvl).is_integer()
    ):
        k = int(lvl)
        return f"es_m{-k}" if k < 0 else f"es_p{k}"
    import hashlib

    return "es_h" + hashlib.md5(str(lvl).encode()).hexdigest()[:8]


class EventStudyResult:
    """Fitted event study: the underlying :class:`DbregModel` plus the
    relative-time coefficient table."""

    def __init__(self, model, table: pd.DataFrame, ref, rel_time: str):
        self.model = model
        self.table = table
        self.ref = ref
        self.rel_time = rel_time
        # sun_abraham only: {rel_time: aggregation row over model coefs}
        self._agg_rows: dict = {}
        self.dropped_cells: list = []

    def tidy(self) -> pd.DataFrame:
        return self.table.copy()

    def _agg_vector(self, rt):
        """Coefficient-space weight row for a relative time: the dummy
        indicator (TWFE) or the stored cohort-share row (Sun-Abraham)."""
        if self._agg_rows:
            return self._agg_rows.get(rt)
        nm = _dummy_name(rt)
        if nm not in self.model.coef_names:
            return None
        a = np.zeros(len(self.model.coef_names))
        a[self.model.coef_names.index(nm)] = 1.0
        return a

    def pretrend_test(self) -> dict:
        """Joint Wald test that every PRE-period (rel_time < ref) effect is
        zero — the standard parallel-trends diagnostic. Driver-side on the
        fitted (cluster-robust by default) vcov."""
        pre = [
            rt
            for rt in self.table[~self.table.is_ref].rel_time
            if rt < self.ref
        ]
        rows = [self._agg_vector(rt) for rt in pre]
        rows = [r for r in rows if r is not None and np.any(r)]
        if not rows:
            raise ValueError("no pre-period coefficients to test")
        return self.model.wald(R=np.vstack(rows))

    def att(self) -> dict:
        """Observation-weighted average post-treatment effect (rel_time ≥
        0): Σ n_ℓ·β̂_ℓ / Σ n_ℓ with delta-method SE a'Va — the single-number
        summary of the dynamic profile.

        The n_ℓ weights are the pre-estimation level-probe counts (they
        include rows later dropped by ``drop_missings``/weight filtering —
        an approximation to estimation-sample shares, exact when the design
        columns have no missings)."""
        post = self.table[(~self.table.is_ref) & (self.table.rel_time >= 0)]
        if not len(post):
            raise ValueError("no post-period coefficients")
        rows, ws = [], []
        for rt, n in zip(post.rel_time, post.get("n_obs", [1] * len(post))):
            a = self._agg_vector(rt)
            if a is not None and np.any(a):
                rows.append(a)
                ws.append(float(n))
        if not rows:
            raise ValueError(
                "no post-period coefficient survived estimation (all "
                "post-period dummies were collinearity-dropped); att() "
                "needs at least one estimated post-period effect"
            )
        w = np.asarray(ws) / sum(ws)
        a = (np.vstack(rows) * w[:, None]).sum(axis=0)
        beta = self.model.coef().to_numpy()
        est = float(a @ beta)
        se = float(np.sqrt(max(a @ self.model.vcov_ @ a, 0.0)))
        crit = _tstats.t_ppf(0.975, self.model.df_residual)
        return {
            "att": est,
            "se": se,
            "lwr": est - crit * se,
            "upr": est + crit * se,
        }

    def __repr__(self) -> str:
        return (
            f"event study on {self.rel_time!r} (ref = {self.ref}):\n"
            + self.table.to_string(index=False)
        )


def event_study(
    data: DataFrame,
    y: str,
    rel_time: str,
    unit: str,
    time: str,
    *,
    ref=-1,
    controls: list[str] | None = None,
    vcov=None,
    cluster=None,
    weights: str | None = None,
    level: float = 0.95,
    strategy: str = "auto",
    max_levels: int = REL_TIME_MAX_LEVELS,
    never_treated_value=None,
    **dbreg_kwargs,
) -> EventStudyResult:
    """Dynamic TWFE event study: ``y`` on relative-time dummies (reference
    period ``ref`` dropped) with ``unit`` and ``time`` fixed effects.

    ``rel_time`` is the periods-since-event column; rows where it is NULL —
    or equals ``never_treated_value`` if given — form the never-treated
    control group (all dummies zero). ``vcov=None`` defaults to clustering
    by ``unit`` (the standard event-study inference). Distinct relative
    times are probed first and capped at ``max_levels`` (an event window
    wider than that needs binning, not 200+ coefficients).

    Returns an :class:`EventStudyResult`; ``.table`` has one row per
    relative time — estimate/se/CI, the reference row pinned at 0.
    """
    if vcov is None and cluster is None:
        vcov = f"~{unit}"
    rt = F.col(rel_time)
    present = rt.isNotNull()
    rt_type = dict(data.dtypes).get(rel_time, "")
    if rt_type in ("float", "double"):
        # float NaN (e.g. from pandas NA) is never-treated, same as NULL —
        # otherwise it becomes a phantom all-zero dummy level
        present = present & ~F.isnan(rt)
    lv_rows = (
        data.select(rt.alias("__rt"))
        .where(present)
        .groupBy("__rt")
        .count()
        .limit(max_levels + 1)
        .collect()
    )
    n_obs = {r["__rt"]: int(r["count"]) for r in lv_rows}
    # overflow check BEFORE removing the sentinel: the limit() probe is
    # unordered, so a window past the cap must raise rather than silently
    # misclassify uncollected levels as never-treated
    if len(lv_rows) > max_levels:
        raise ValueError(
            f"{rel_time!r} has more than {max_levels} distinct levels; bin "
            "the event window first (or raise max_levels)"
        )
    levels = sorted(r["__rt"] for r in lv_rows)
    if never_treated_value is not None:
        levels = [lv for lv in levels if lv != never_treated_value]
    if ref not in levels:
        raise ValueError(
            f"reference period {ref!r} not among observed relative times "
            f"{levels[:10]}{'…' if len(levels) > 10 else ''}"
        )
    est_levels = [lv for lv in levels if lv != ref]
    if not est_levels:
        raise ValueError("only the reference period is observed")

    # ONE projection for all dummies (chained withColumn wraps a new
    # Project node per call — superlinear analysis cost at wide windows)
    names = [_dummy_name(lv) for lv in est_levels]
    df = data.select(
        "*",
        *[
            F.when(F.col(rel_time) == F.lit(lv), 1.0)
            .otherwise(0.0)
            .alias(nm)
            for lv, nm in zip(est_levels, names)
        ],
    )
    rhs = names + list(controls or [])
    fml = f"{y} ~ {' + '.join(rhs)} | {unit} + {time}"
    m = dbreg(
        fml,
        df,
        vcov=vcov,
        cluster=cluster,
        weights=weights,
        strategy=strategy,
        **dbreg_kwargs,
    )

    crit = _tstats.t_ppf(1 - (1 - level) / 2, m.df_residual)
    rows = []
    coefs, ses = m.coef(), m.se()
    for lv in levels:
        if lv == ref:
            rows.append(
                dict(rel_time=lv, estimate=0.0, se=np.nan, lwr=np.nan,
                     upr=np.nan, is_ref=True, n_obs=n_obs.get(lv, 0))
            )
            continue
        nm = _dummy_name(lv)
        if nm not in coefs.index:  # dropped by collinearity
            rows.append(
                dict(rel_time=lv, estimate=np.nan, se=np.nan, lwr=np.nan,
                     upr=np.nan, is_ref=False, n_obs=n_obs.get(lv, 0))
            )
            continue
        b, s = float(coefs[nm]), float(ses[nm])
        rows.append(
            dict(rel_time=lv, estimate=b, se=s, lwr=b - crit * s,
                 upr=b + crit * s, is_ref=False, n_obs=n_obs.get(lv, 0))
        )
    table = pd.DataFrame(rows)
    return EventStudyResult(m, table, ref, rel_time)


def _sunab_dummy_name(g, lv) -> str:
    return f"sa_{_dummy_name(g)[3:]}__{_dummy_name(lv)[3:]}"


def sun_abraham(
    data: DataFrame,
    y: str,
    cohort: str,
    time: str,
    unit: str,
    *,
    ref=-1,
    controls: list[str] | None = None,
    vcov=None,
    cluster=None,
    weights: str | None = None,
    level: float = 0.95,
    strategy: str = "auto",
    max_cells: int = 2000,
    **dbreg_kwargs,
) -> EventStudyResult:
    """Sun-Abraham (2021) interaction-weighted event study.

    ``cohort`` is the period each unit was first treated (NULL / NaN =
    never treated — the comparison group); relative time is ``time −
    cohort``. One dummy per observed (cohort × relative-time) cell (the
    reference period ``ref`` dropped within every cohort) enters a single
    TWFE :func:`dbreg` fit; per-relative-time effects aggregate the cohort
    cells with their observation-share weights, SEs by the delta method
    a'Va on the fitted (cluster-robust by default) vcov. Cells are probed
    and capped at ``max_cells``; cells dropped by collinearity are excluded
    with their weight renormalized (reported in ``result.dropped_cells``).

    With a single treated cohort this reduces exactly to
    :func:`event_study` — pinned by the tests.
    """
    if vcov is None and cluster is None:
        vcov = f"~{unit}"
    g = F.col(cohort)
    treated = g.isNotNull()
    g_type = dict(data.dtypes).get(cohort, "")
    if g_type in ("float", "double"):
        treated = treated & ~F.isnan(g)
    rel = F.col(time) - g

    # one probe: observed (cohort, rel_time) cells with treated-row counts
    cells = (
        data.where(treated)
        .groupBy(g.alias("__g"), rel.alias("__rt"))
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .limit(max_cells + 1)
        .collect()
    )
    if len(cells) > max_cells:
        raise ValueError(
            f"more than {max_cells} (cohort x rel_time) cells; bin the "
            "event window or raise max_cells"
        )
    cells = [(r["__g"], r["__rt"], int(r["__n"])) for r in cells]
    rts = sorted({rt for _g, rt, _n in cells})
    if ref not in rts:
        raise ValueError(
            f"reference period {ref!r} not among observed relative times"
        )
    est_cells = [(gv, rt, n) for gv, rt, n in cells if rt != ref]
    if not est_cells:
        raise ValueError("only the reference period is observed")

    # ONE projection for all cell dummies (a withColumn per cell would
    # StackOverflow Catalyst near the max_cells cap)
    names = {
        (gv, rt): _sunab_dummy_name(gv, rt) for gv, rt, _n in est_cells
    }
    df = data.select(
        "*",
        *[
            F.when(treated & (g == F.lit(gv)) & (rel == F.lit(rt)), 1.0)
            .otherwise(0.0)
            .alias(names[(gv, rt)])
            for gv, rt, _n in est_cells
        ],
    )
    rhs = list(names.values()) + list(controls or [])
    fml = f"{y} ~ {' + '.join(rhs)} | {unit} + {time}"
    m = dbreg(
        fml, df, vcov=vcov, cluster=cluster, weights=weights,
        strategy=strategy, **dbreg_kwargs,
    )

    coefs = m.coef()
    V = m.vcov_
    pos = {n: i for i, n in enumerate(m.coef_names)}
    crit = _tstats.t_ppf(1 - (1 - level) / 2, m.df_residual)
    rows, dropped = [], []
    agg_rows = {}
    for rt in rts:
        if rt == ref:
            rows.append(
                dict(rel_time=rt, estimate=0.0, se=np.nan, lwr=np.nan,
                     upr=np.nan, is_ref=True,
                     n_obs=sum(n for _g, r2, n in cells if r2 == rt))
            )
            continue
        cell_list = [(gv, n) for gv, rt2, n in est_cells if rt2 == rt]
        kept = [
            (gv, n) for gv, n in cell_list if names[(gv, rt)] in pos
        ]
        dropped += [
            (gv, rt) for gv, _n in cell_list if names[(gv, rt)] not in pos
        ]
        tot = float(sum(n for _gv, n in kept))
        if not kept or tot == 0:
            rows.append(
                dict(rel_time=rt, estimate=np.nan, se=np.nan, lwr=np.nan,
                     upr=np.nan, is_ref=False, n_obs=0)
            )
            continue
        a = np.zeros(len(m.coef_names))
        for gv, n in kept:
            a[pos[names[(gv, rt)]]] = n / tot
        agg_rows[rt] = a
        b = float(a @ coefs.to_numpy())
        s = float(np.sqrt(max(a @ V @ a, 0.0)))
        rows.append(
            dict(rel_time=rt, estimate=b, se=s, lwr=b - crit * s,
                 upr=b + crit * s, is_ref=False, n_obs=int(tot))
        )
    out = EventStudyResult(m, pd.DataFrame(rows), ref, f"{time} - {cohort}")
    out.dropped_cells = dropped
    out._agg_rows = agg_rows
    return out


# --------------------------------------------------------------------------
# persistence
# --------------------------------------------------------------------------


def save_event_study(r: EventStudyResult, path: str) -> None:
    """Serialize a fitted event study: the underlying model in ``model/``,
    the coefficient table as ``table.parquet``, and the study metadata
    (reference period, Sun-Abraham aggregation rows, dropped cells) in
    ``study.json``. Reload with :func:`load_event_study` /
    ``EventStudyResult.load``: tidy/att/pretrend_test all work on the
    restored object."""
    import json
    import os

    from .model import _json_default, encode_key

    os.makedirs(path, exist_ok=True)
    r.model.save(os.path.join(path, "model"))
    r.table.to_parquet(os.path.join(path, "table.parquet"))
    meta = {
        "format": "dbreg_spark.event_study/1",
        "ref": encode_key(r.ref),
        "rel_time": r.rel_time,
        "dropped_cells": [list(c) for c in r.dropped_cells],
        "agg_rows": [
            {"rt": encode_key(rt), "row": [float(v) for v in a]}
            for rt, a in r._agg_rows.items()
        ],
    }
    with open(os.path.join(path, "study.json"), "w") as f:
        json.dump(meta, f, allow_nan=True, default=_json_default)


def load_event_study(path: str, spark=None) -> EventStudyResult:
    """Restore a result saved by :func:`save_event_study`."""
    import json
    import os

    from .model import decode_key, load_model

    with open(os.path.join(path, "study.json")) as f:
        meta = json.load(f)
    if meta.get("format") != "dbreg_spark.event_study/1":
        raise ValueError(f"unrecognized event-study format in {path}")
    model = load_model(os.path.join(path, "model"), spark)
    table = pd.read_parquet(os.path.join(path, "table.parquet"))
    out = EventStudyResult(
        model, table, decode_key(meta["ref"]), meta["rel_time"]
    )
    out.dropped_cells = [tuple(c) for c in meta.get("dropped_cells", [])]
    out._agg_rows = {
        decode_key(e["rt"]): np.asarray(e["row"], dtype=float)
        for e in meta.get("agg_rows", [])
    }
    return out


EventStudyResult.save = lambda self, path: save_event_study(self, path)
EventStudyResult.load = staticmethod(load_event_study)
