"""Model evaluation metrics, computed in-engine.

Closes the quality-classifier loop (annotate → ``fit_quality_classifier``
→ ``quality_classify`` → **evaluate**): binary-classifier metrics (binned
ROC-AUC, log-loss, Brier, threshold confusion), a calibration table, and
regression metrics — every one a single aggregation pass of pure column
expressions with a DuckDB SQL twin.

Scale notes (100 TB): exact rank-based AUC needs a global ordering — a
one-partition window at any scale — so the ROC is computed on ``bins``
equal-width score buckets (default 10 000) exactly like Spark MLlib's
``BinaryClassificationMetrics(numBins=...)`` downsampling: one
groupBy(bucket) shuffle of ≤ bins rows, trapezoid AUC driver-side over the
tiny bucket table. The binning error is O(1/bins) ≈ 1e-4 at the default —
below any decision threshold that matters — and the SQL twin bins
identically, so cross-engine results match exactly. Everything else is a
single global aggregate (map-side combined).

No reference counterpart (the reference is a regression library); the
API shape follows sklearn.metrics naming.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_EPS = 1e-15  # log-loss probability clip, sklearn's default


def _clip(p):
    return F.least(F.greatest(p, F.lit(_EPS)), F.lit(1.0 - _EPS))


def classifier_metrics(
    df: DataFrame,
    label_col: str,
    score_col: str,
    threshold: float = 0.5,
    bins: int = 10_000,
) -> DataFrame:
    """One-row metrics for a binary classifier scored with probabilities.

    ``label_col``: 0/1 (castable); ``score_col``: probability in [0, 1]
    (scores outside are clamped into the ROC's closed bucket range; log-loss
    clips at 1e-15 like sklearn). Returns one row:

    n, n_pos, n_neg, auc (binned trapezoid ROC, see module docstring),
    log_loss, brier, and the ``threshold``-confusion block (tp/fp/tn/fn,
    accuracy, precision, recall, f1 — score ≥ threshold predicts 1;
    precision/recall/f1 are NULL when undefined, sklearn's 0-division
    sentinel made explicit).

    ONE data scan: every global metric is a per-row sum, so it rides the
    same groupBy(bucket) pass as the ROC (≤ ``bins`` output rows, map-side
    combined) and is totaled driver-side. An empty (or fully-null) input
    returns the n=0 row with NULL metrics rather than crashing.
    """
    y = F.col(label_col).cast("double")
    p = F.col(score_col).cast("double")
    d = df.where(y.isNotNull() & p.isNotNull()).select(
        y.alias("__y"), p.alias("__p")
    )
    y, p = F.col("__y"), F.col("__p")
    pred = (p >= F.lit(float(threshold))).cast("double")
    bkt = F.least(
        F.greatest(F.floor(p * bins), F.lit(0)), F.lit(int(bins) - 1)
    )
    bt = (
        d.groupBy(bkt.alias("__b"))
        .agg(
            F.sum(y).alias("__pos"),
            F.sum(1.0 - y).alias("__neg"),
            F.sum(
                -(y * F.log(_clip(p)) + (1.0 - y) * F.log(1.0 - _clip(p)))
            ).alias("__ll"),
            F.sum((p - y) * (p - y)).alias("__br"),
            F.sum(pred * y).alias("__tp"),
            F.sum(pred * (1.0 - y)).alias("__fp"),
            F.sum((1.0 - pred) * (1.0 - y)).alias("__tn"),
            F.sum((1.0 - pred) * y).alias("__fn"),
        )
        .orderBy(F.col("__b").desc())
        .collect()
    )

    def tot(col):
        return float(sum(r[col] for r in bt))

    n_pos, n_neg = (int(tot("__pos")), int(tot("__neg"))) if bt else (0, 0)
    n = n_pos + n_neg
    auc = _trapezoid_auc(
        np.array([r["__pos"] for r in bt], dtype=float),
        np.array([r["__neg"] for r in bt], dtype=float),
        n_pos,
        n_neg,
    )
    if n:
        tp, fp, tn, fn = (tot(c) for c in ("__tp", "__fp", "__tn", "__fn"))
        log_loss = tot("__ll") / n
        brier = tot("__br") / n
    else:
        tp = fp = tn = fn = 0.0
        log_loss = brier = None
    prec = tp / (tp + fp) if (tp + fp) > 0 else None
    rec = tp / (tp + fn) if (tp + fn) > 0 else None
    f1 = (
        2 * prec * rec / (prec + rec)
        if prec is not None and rec is not None and (prec + rec) > 0
        else None
    )
    out = {
        "n": n,
        "n_pos": n_pos,
        "n_neg": n_neg,
        "auc": auc,
        "log_loss": log_loss,
        "brier": brier,
        "tp": int(tp),
        "fp": int(fp),
        "tn": int(tn),
        "fn": int(fn),
        "accuracy": (tp + tn) / n if n else None,
        "precision": prec,
        "recall": rec,
        "f1": f1,
    }
    import pandas as pd

    spark = df.sparkSession
    schema = (
        "n long, n_pos long, n_neg long, auc double, log_loss double, "
        "brier double, tp long, fp long, tn long, fn long, "
        "accuracy double, precision double, recall double, f1 double"
    )
    return spark.createDataFrame(pd.DataFrame([out]), schema=schema)


def _trapezoid_auc(pos_desc, neg_desc, n_pos: int, n_neg: int):
    """Trapezoid AUC over bucket counts ordered by DESCENDING threshold.
    Within-bucket ties contribute the trapezoid (= average-rank tie
    handling at the bucket level)."""
    if n_pos == 0 or n_neg == 0:
        return None
    tp = np.concatenate([[0.0], np.cumsum(pos_desc)])
    fp = np.concatenate([[0.0], np.cumsum(neg_desc)])
    tpr, fpr = tp / n_pos, fp / n_neg
    return float(np.sum(np.diff(fpr) * (tpr[1:] + tpr[:-1]) / 2.0))


def classifier_metrics_sql(
    from_clause: str,
    label_col: str,
    score_col: str,
    threshold: float = 0.5,
    bins: int = 10_000,
) -> str:
    """DuckDB twin of :func:`classifier_metrics` — the binned-ROC cumsum
    runs as a window over the ≤ ``bins``-row bucket CTE."""
    y = f"CAST({label_col} AS DOUBLE)"
    p = f"CAST({score_col} AS DOUBLE)"
    pc = f"LEAST(GREATEST(p, {_EPS!r}), {1.0 - _EPS!r})"
    return f"""
WITH d AS (
  SELECT {y} AS y, {p} AS p
  {from_clause}
  WHERE {label_col} IS NOT NULL AND {score_col} IS NOT NULL
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(y) AS BIGINT) AS n_pos,
    CAST(SUM(1.0 - y) AS BIGINT) AS n_neg,
    AVG(-(y * LN({pc}) + (1.0 - y) * LN(1.0 - {pc}))) AS log_loss,
    AVG((p - y) * (p - y)) AS brier,
    CAST(SUM(CAST(p >= {float(threshold)!r} AS DOUBLE) * y) AS BIGINT) AS tp,
    CAST(SUM(CAST(p >= {float(threshold)!r} AS DOUBLE) * (1.0 - y)) AS BIGINT) AS fp,
    CAST(SUM((1.0 - CAST(p >= {float(threshold)!r} AS DOUBLE)) * (1.0 - y)) AS BIGINT) AS tn,
    CAST(SUM((1.0 - CAST(p >= {float(threshold)!r} AS DOUBLE)) * y) AS BIGINT) AS fn
  FROM d
),
b AS (
  SELECT LEAST(GREATEST(FLOOR(p * {int(bins)}), 0), {int(bins) - 1}) AS bkt,
    SUM(y) AS pos, SUM(1.0 - y) AS neg
  FROM d GROUP BY 1
),
c1 AS (
  SELECT bkt,
    SUM(pos) OVER (ORDER BY bkt DESC) AS ctp,
    SUM(neg) OVER (ORDER BY bkt DESC) AS cfp
  FROM b
),
c AS (
  SELECT
    ctp / NULLIF(CAST((SELECT n_pos FROM g) AS DOUBLE), 0) AS tpr,
    cfp / NULLIF(CAST((SELECT n_neg FROM g) AS DOUBLE), 0) AS fpr,
    LAG(ctp, 1, 0) OVER (ORDER BY bkt DESC)
      / NULLIF(CAST((SELECT n_pos FROM g) AS DOUBLE), 0) AS tpr0,
    LAG(cfp, 1, 0) OVER (ORDER BY bkt DESC)
      / NULLIF(CAST((SELECT n_neg FROM g) AS DOUBLE), 0) AS fpr0
  FROM c1
),
a AS (SELECT SUM((fpr - fpr0) * (tpr + tpr0) / 2.0) AS auc FROM c)
SELECT g.n, g.n_pos, g.n_neg,
  CASE WHEN g.n_pos = 0 OR g.n_neg = 0 THEN NULL ELSE a.auc END AS auc,
  g.log_loss, g.brier, g.tp, g.fp, g.tn, g.fn,
  CASE WHEN g.n > 0
    THEN (g.tp + g.tn) / CAST(g.n AS DOUBLE) END AS accuracy,
  CASE WHEN g.tp + g.fp > 0 THEN g.tp / CAST(g.tp + g.fp AS DOUBLE) END AS precision,
  CASE WHEN g.tp + g.fn > 0 THEN g.tp / CAST(g.tp + g.fn AS DOUBLE) END AS recall,
  CASE WHEN g.tp + g.fp > 0 AND g.tp + g.fn > 0
         AND (g.tp / CAST(g.tp + g.fp AS DOUBLE)
              + g.tp / CAST(g.tp + g.fn AS DOUBLE)) > 0
    THEN 2.0 * (g.tp / CAST(g.tp + g.fp AS DOUBLE))
             * (g.tp / CAST(g.tp + g.fn AS DOUBLE))
         / (g.tp / CAST(g.tp + g.fp AS DOUBLE)
            + g.tp / CAST(g.tp + g.fn AS DOUBLE)) END AS f1
FROM g, a
"""


def calibration_table(
    df: DataFrame, label_col: str, score_col: str, bins: int = 10
) -> DataFrame:
    """Per-score-bucket calibration: (bucket, n, mean_score, pos_rate).
    One groupBy pass; a calibrated model has pos_rate ≈ mean_score."""
    y = F.col(label_col).cast("double")
    p = F.col(score_col).cast("double")
    d = df.where(y.isNotNull() & p.isNotNull()).select(
        y.alias("__y"), p.alias("__p")
    )
    bkt = F.least(
        F.greatest(F.floor(F.col("__p") * bins), F.lit(0)),
        F.lit(int(bins) - 1),
    ).cast("long")
    return (
        d.groupBy(bkt.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg("__p").alias("mean_score"),
            F.avg("__y").alias("pos_rate"),
        )
        .orderBy("bucket")
    )


def calibration_table_sql(
    from_clause: str, label_col: str, score_col: str, bins: int = 10
) -> str:
    y = f"CAST({label_col} AS DOUBLE)"
    p = f"CAST({score_col} AS DOUBLE)"
    return (
        f"SELECT CAST(LEAST(GREATEST(FLOOR({p} * {int(bins)}), 0), "
        f"{int(bins) - 1}) AS BIGINT) AS bucket,\n"
        f"  CAST(COUNT(*) AS BIGINT) AS n,\n"
        f"  AVG({p}) AS mean_score,\n  AVG({y}) AS pos_rate\n"
        f"{from_clause}\n"
        f"WHERE {label_col} IS NOT NULL AND {score_col} IS NOT NULL\n"
        f"GROUP BY 1 ORDER BY bucket"
    )


def regression_metrics(
    df: DataFrame, y_col: str, yhat_col: str
) -> DataFrame:
    """One-row regression metrics: n, rmse, mae, bias (mean error), r2
    (1 − SSE/SST around the sample mean). Single aggregation pass."""
    y = F.col(y_col).cast("double")
    f = F.col(yhat_col).cast("double")
    d = df.where(y.isNotNull() & f.isNotNull()).select(
        y.alias("__y"), f.alias("__f")
    )
    y, f = F.col("__y"), F.col("__f")
    e = y - f
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sqrt(F.avg(e * e)).alias("rmse"),
        F.avg(F.abs(e)).alias("mae"),
        F.avg(e).alias("bias"),
        (
            1.0
            - F.sum(e * e)
            / (F.sum(y * y) - F.pow(F.sum(y), F.lit(2)) / F.count(F.lit(1)))
        ).alias("r2"),
    )


def regression_metrics_sql(from_clause: str, y_col: str, yhat_col: str) -> str:
    y = f"CAST({y_col} AS DOUBLE)"
    f = f"CAST({yhat_col} AS DOUBLE)"
    e = f"({y} - {f})"
    return (
        f"SELECT CAST(COUNT(*) AS BIGINT) AS n,\n"
        f"  SQRT(AVG({e} * {e})) AS rmse,\n"
        f"  AVG(ABS({e})) AS mae,\n  AVG({e}) AS bias,\n"
        f"  1.0 - SUM({e} * {e}) / (SUM({y} * {y}) - POWER(SUM({y}), 2) / COUNT(*)) AS r2\n"
        f"{from_clause}\n"
        f"WHERE {y_col} IS NOT NULL AND {yhat_col} IS NOT NULL"
    )
