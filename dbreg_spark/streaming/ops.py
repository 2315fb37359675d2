"""Structured-Streaming variants of the pipeline operators.

The reference has no streaming surface (SURVEY §2.8) — its "streaming" is
DuckDB's out-of-core execution. These operators are the Spark-native
additions for continuous ingestion of the ``events``/``documents`` shapes:

- windowed event aggregation with watermarked late-data handling;
- streaming exact dedup via ``dropDuplicatesWithinWatermark`` on the
  normalized-content hash;
- per-user sessionization with ``applyInPandasWithState``.

All transformations are source-agnostic: they take any streaming DataFrame
with the right columns (tests drive them from file sources with
``trigger(availableNow=True)`` into memory sinks).
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.xdialect import SPARK, WS, X


def _ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (with local timezone); parquet event
    columns written without a zone are inferred as TIMESTAMP_NTZ, which
    ``withWatermark`` rejects. Cast NTZ → LTZ in place (the wall-clock
    instant is preserved under the session timezone, so window boundaries
    are unchanged)."""
    field = df.schema[ts_col]
    if isinstance(field.dataType, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling/sliding window counts + value sums per event_type, tolerating
    late data up to the watermark."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    events = _ensure_event_time(events, "ts")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w, "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop re-ingested duplicate documents within the watermark horizon,
    keyed on the normalized-content hash (state size = one hash per doc in
    the horizon, not the text)."""
    x = X(SPARK)
    norm = f"lower({x.regexp_replace_all(x.trim_ws(text_col), WS + '+', ' ')})"
    hashed = _ensure_event_time(docs, ts_col).withColumn("__fp", F.expr(f"md5({norm})"))
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")  # internal key — output schema matches the input
    )


def sessionize_builtin(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization with the BUILT-IN ``session_window`` operator
    — the idiomatic (JVM-side, codegen'd) path when plain inactivity-gap
    semantics suffice. :func:`sessionize` below keeps the custom
    applyInPandasWithState formulation for when per-session logic goes
    beyond what session_window expresses (mid-session emission, custom
    close rules)."""
    events = _ensure_event_time(events, "ts")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.DoubleType()),
        T.StructField("last", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator: per-user session aggregation with an
    inactivity-gap close, via applyInPandasWithState (state = 4 scalars per
    active user).

    Semantics match the built-in ``session_window``: an event at exactly
    ``last + gap`` MERGES into the session (verified empirically — Spark
    treats the [t, t+gap] horizon as inclusive when merging windows); only
    a strictly larger gap separates sessions. The open session closes on
    EVENT-time timeout — the watermark passing ``last + gap`` — never on
    wall-clock, so replays are deterministic and a stalled source cannot
    split a session.

    Out-of-order arrivals within the watermark: a late run overlapping or
    adjacent to the open session merges into it (extending ``start``
    backward if needed); a late run strictly earlier than
    ``start − gap`` is emitted immediately as its own closed session.
    Known divergence from the built-in ``session_window`` there: a
    still-LATER late event arriving in a SUBSEQUENT micro-batch can no
    longer merge with that already-emitted session (state holds only the
    open session), so a late cluster split across micro-batches may emit
    as several sessions where session_window would merge them into one —
    within a single batch the runs merge correctly. The window shrinks
    with the watermark; choose it no larger than the tolerated
    fragmentation horizon."""
    gap_s = _parse_duration_seconds(gap)

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            (start, last, n, total) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="s")],
                    "session_end": [pd.Timestamp(last, unit="s")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts = (rows["ts"].astype("int64") / 1e9).to_numpy()
        vals = rows["value"].to_numpy(dtype=float)
        closed = []
        if state.exists:
            (start, last, n, total) = state.get
        else:
            start, last, n, total = ts[0], ts[0], 0, 0.0
        # fold the batch event-by-run into sessions; a gap of exactly
        # gap_s still merges (inclusive horizon, like session_window)
        import numpy as _np

        breaks = _np.nonzero(_np.diff(ts) > gap_s)[0]
        run_bounds = [0] + (breaks + 1).tolist() + [len(ts)]
        for ri in range(len(run_bounds) - 1):
            i0, i1 = run_bounds[ri], run_bounds[ri + 1]
            lo, hi = float(ts[i0]), float(ts[i1 - 1])
            n_run, v_run = int(i1 - i0), float(vals[i0:i1].sum())
            if n == 0:
                start, last, n, total = lo, hi, n_run, v_run
            elif lo - last > gap_s:
                # run starts after the open session's horizon: close it
                closed.append((start, last, n, total))
                start, last, n, total = lo, hi, n_run, v_run
            elif hi < start - gap_s:
                # LATE run, disjoint strictly before the open session:
                # its own session, emitted directly
                closed.append((lo, hi, n_run, v_run))
            else:
                # overlap/adjacency on either side: merge, extending
                # start backward for late events
                start = min(start, lo)
                last = max(last, hi)
                n += n_run
                total += v_run
        state.update((start, last, n, total))
        # event-time close: fires when the WATERMARK passes last + gap
        state.setTimeoutTimestamp(int((last + gap_s) * 1000))
        if closed:
            closed.sort(key=lambda c: c[0])
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="s") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="s") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "total_value": [c[3] for c in closed],
                }
            )

    return (
        _ensure_event_time(events, "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_moments(
    df: DataFrame,
    fml: str,
    window: str | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    weights: str | None = None,
) -> DataFrame:
    """Online OLS: the same sufficient-statistics aggregation the batch
    moments strategy runs (plans/common.py:moment_spec), as a streaming
    aggregation — the stream carries only the O(p²) moment row, never data.

    ``window=None`` emits the running global moment row (use output mode
    ``complete``/``update``); with ``window`` set, one moment row per
    event-time window, watermarked and append-able. Feed any emitted row to
    :func:`coef_from_moments` for the fitted coefficients — a continuously
    updating regression at stream speed.

    ONE fixed effect is supported with ``window`` set: the within (demeaned)
    moments decompose into per-(window, fe-level) sufficient statistics
    corrected by the group means — a two-stage chained streaming
    aggregation (supported since multiple event-time stateful operators
    landed in Spark 3.5) whose state is one moment row per live FE level
    per window, never data. Output columns: ``n_total``, ``n_fe1``,
    ``w_{i}_{j}`` (upper-triangle demeaned X'X), ``w_{i}_y``, ``w_y_y``;
    feed a row to :func:`within_fit_from_moments`. Two or more FEs are
    refused (k-FE absorption needs iterated projections; use the batch
    strategies). ``weights=`` (no-FE form) carries the WLS sufficient
    statistics — the emitted row feeds :func:`coef_from_moments`
    unchanged (Σw rides in ``sum_w``)."""
    from ..formula import parse_formula, parse_weights
    from ..plans.common import filter_missing, moment_spec
    from ..plans.exprs import Var, agg_to_spark

    parsed = parse_formula(fml)
    weight_col = parse_weights(weights)
    if weight_col and parsed.fe:
        raise ValueError(
            "streaming_moments supports weights= on the no-FE form only "
            "(the within two-stage aggregation is unweighted; use the "
            "batch strategies for weighted FE fits)"
        )
    if len(parsed.fe) >= 2:
        raise ValueError(
            "streaming_moments supports at most one fixed effect "
            "(k≥2 absorption needs iterated projections; use the batch "
            "strategies)"
        )
    if parsed.fe:
        if window is None:
            raise ValueError(
                "streaming_moments with a fixed effect needs window= (the "
                "within transform is a per-event-time-window two-stage "
                "aggregation; an unbounded global version would keep "
                "unbounded per-level state)"
            )
        return _streaming_within_moments(df, parsed, window, watermark, ts_col)
    spec = moment_spec(
        Var(parsed.yvar), [Var(v) for v in parsed.xvars], intercept=True,
        weight=Var(weight_col) if weight_col else None,
    )
    aggs = [agg_to_spark(a).alias(n) for n, a in spec]
    base = filter_missing(
        df, [parsed.yvar] + parsed.xvars + ([weight_col] if weight_col else [])
    )
    if window is None:
        return base.agg(*aggs)
    base = _ensure_event_time(base, ts_col)
    return (
        base.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window))
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(n) for n, _ in spec],
        )
    )


def _streaming_within_moments(df, parsed, window, watermark, ts_col):
    """1-FE online regression: stage 1 aggregates per-(window, fe-level)
    raw sums; stage 2 sums the group-mean-corrected contributions per
    window — Σ_g (XX_g − X_g X_g'ᐟn_g) etc. — yielding the exact within
    (demeaned) moments. Works identically on a batch DataFrame (the
    watermark is a no-op), which is what the `events_moments_daily_1fe`
    correctness gate runs against a two-level GROUP BY DuckDB oracle."""
    from ..plans.common import filter_missing

    y, xs, fe = parsed.yvar, parsed.xvars, parsed.fe[0]
    base = filter_missing(df, [y] + xs + [fe])
    base = _ensure_event_time(base, ts_col)
    yd = F.col(y).cast("double")
    xd = [F.col(v).cast("double") for v in xs]
    p = len(xs)

    s1 = [
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(yd).alias("s_y"),
        F.sum(yd * yd).alias("s_yy"),
    ]
    for i in range(p):
        s1.append(F.sum(xd[i]).alias(f"s_x_{i}"))
        s1.append(F.sum(xd[i] * yd).alias(f"s_xy_{i}"))
        for j in range(i, p):
            s1.append(F.sum(xd[i] * xd[j]).alias(f"s_xx_{i}_{j}"))
    g1 = (
        base.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), F.col(fe))
        .agg(*s1)
    )

    out_names = ["n_total", "n_fe1"]
    s2 = [
        F.sum("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_fe1"),
    ]
    for i in range(p):
        for j in range(i, p):
            name = f"w_{i}_{j}"
            out_names.append(name)
            s2.append(
                F.sum(
                    F.col(f"s_xx_{i}_{j}")
                    - F.col(f"s_x_{i}") * F.col(f"s_x_{j}") / F.col("n")
                ).alias(name)
            )
    for i in range(p):
        name = f"w_{i}_y"
        out_names.append(name)
        s2.append(
            F.sum(
                F.col(f"s_xy_{i}") - F.col(f"s_x_{i}") * F.col("s_y") / F.col("n")
            ).alias(name)
        )
    out_names.append("w_y_y")
    s2.append(
        F.sum(
            F.col("s_yy") - F.col("s_y") * F.col("s_y") / F.col("n")
        ).alias("w_y_y")
    )
    g2 = g1.groupBy("window").agg(*s2)
    return g2.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(n) for n in out_names],
    )


def within_fit_from_moments(row, xvars: list[str]):
    """Solve one emitted within-moments row (from the 1-FE
    :func:`streaming_moments`) → pandas DataFrame with ``estimate`` and
    iid ``std.error`` per slope (the absorbed FE has no coefficient row,
    exactly like the batch demean strategy; dof = n − p − G)."""
    import numpy as np

    from ..solve import solve_with_fallback

    row = dict(row)
    p = len(xvars)
    W = np.zeros((p, p))
    wy = np.zeros(p)
    for i in range(p):
        wy[i] = float(row[f"w_{i}_y"])
        for j in range(i, p):
            W[i, j] = W[j, i] = float(row[f"w_{i}_{j}"])
    sol = solve_with_fallback(W, wy)
    beta = sol.betahat
    n, g = int(row["n_total"]), int(row["n_fe1"])
    rss = float(row["w_y_y"]) - float(beta @ wy)
    df_res = n - p - g
    sigma2 = rss / df_res if df_res > 0 else float("nan")
    se = np.sqrt(np.clip(np.diag(sigma2 * sol.xtx_inv), 0.0, None))
    return pd.DataFrame(
        {"estimate": beta, "std.error": se}, index=list(xvars)
    )


def coef_from_moments(row, xvars: list[str]):
    """Solve the normal equations from one emitted moments row (dict-like)
    → pandas Series indexed (Intercept), x₁, … — the driver-side twin of the
    batch moments solve."""
    from ..plans.common import assemble_normal_eqs
    from ..solve import detect_collinearity, solve_with_fallback

    row = dict(row)
    names = ["(Intercept)"] + list(xvars)
    xtx, xty, *_ = assemble_normal_eqs(row, len(xvars), intercept=True)
    collin = detect_collinearity(xtx, xty, names)
    sol = solve_with_fallback(collin.xtx, collin.xty)
    return pd.Series(sol.betahat, index=collin.keep_names)


def _parse_duration_seconds(s: str) -> float:
    """Same duration grammar Spark's own interval strings accept for the
    units a session gap sensibly uses."""
    n, unit = s.split()
    scale = {
        "millisecond": 1e-3, "milliseconds": 1e-3,
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
        "week": 604800, "weeks": 604800,
    }
    if unit not in scale:
        raise ValueError(
            f"unsupported duration unit {unit!r} (use "
            "milliseconds/seconds/minutes/hours/days/weeks)"
        )
    return float(n) * scale[unit]


def streaming_corpus_stats(
    docs: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Windowed corpus-quality monitoring over a document stream — the
    drift detector a continuously-ingesting pipeline runs (did a source's
    quality score or token volume shift this window?). Per (window,
    source): doc/NULL counts, token volume, mean quality score — the
    incremental subset of :func:`~dbreg_spark.operators.report.
    corpus_report` (exact percentiles and exact-distinct dup rate are not
    windowed-incremental; run the batch report for those). All metrics
    are sums/counts/means of per-row column expressions, so state per
    window-source cell is O(1) and the same code runs on a batch frame
    (the test's mirror)."""
    from ..functions.xdialect import SPARK, X
    from ..operators.report import _report_row_exprs

    x = X(SPARK)
    rows = _report_row_exprs(x, text_col)
    docs = _ensure_event_time(docs, ts_col)
    base = docs.select(
        F.col(ts_col),
        F.col(source_col),
        *[F.expr(e).alias(a) for a, e in rows.items() if a != "__h"],
    )
    return (
        base.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__null").cast("long").alias("n_null"),
            F.sum("__ntok").cast("long").alias("total_tokens"),
            F.round(F.avg("__q"), 6).alias("mean_quality"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col(source_col),
            "n_docs",
            "n_null",
            "total_tokens",
            "mean_quality",
        )
    )


ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("day_start", T.TimestampType()),
        T.StructField("n", T.LongType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("is_anomaly", T.IntegerType()),
    ]
)

_ANOMALY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("open_days", T.ArrayType(T.LongType())),
        T.StructField("open_counts", T.ArrayType(T.LongType())),
        T.StructField("hist_counts", T.ArrayType(T.LongType())),
    ]
)


def streaming_volume_anomaly(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    day_seconds: int = 86_400,
    history: int = 7,
    min_history: int = 3,
    z_threshold: float = 3.0,
    watermark: str = "2 days",
) -> DataFrame:
    """Streaming twin of the ``events_anomaly`` batch gate: per-type daily
    event counts scored against the trailing ``history`` OBSERVED days
    (mean/std excluding the scored day; NULL z until ``min_history`` days
    exist or while std is 0), emitted when the WATERMARK closes the day —
    volume-drop/spike monitoring as a custom stateful operator.

    State per event type: the open (not-yet-closed) day counts plus a
    ≤``history``-element deque of closed-day counts — O(history) scalars,
    bounded regardless of volume. Days close on event-time timeout, so
    replays are deterministic; rows older than the watermark are dropped
    by Spark BEFORE the operator, which is exactly what makes a closed
    day immutable (an arriving row's day always ends after the current
    watermark). Days are UTC epoch buckets — the same frame as the
    watermark, so the immutability argument holds in EVERY session
    timezone (pandas-delivered timestamps are session-local naive, so
    bucketing those against the UTC watermark would break it; the epoch
    column is computed engine-side instead). The batch gate buckets with
    session-time date_trunc — equal when the session timezone is UTC.
    The rows-based trailing window (last observed days, not calendar
    days) matches the batch gate's ROWS BETWEEN frame."""
    import numpy as np

    day_s = int(day_seconds)

    def score(n, hist):
        if len(hist) >= min_history:
            import numpy as _np

            mu = float(_np.mean(hist))
            sd = float(_np.std(hist, ddof=1))
            if sd > 0:
                z = (float(n) - mu) / sd
                return z, int(abs(z) > z_threshold)
        return None, 0

    def fn(key, pdfs, state: GroupState):
        (etype,) = key
        if state.exists:
            open_days, open_counts, hist = state.get
            open_map = dict(zip(list(open_days), list(open_counts)))
            hist = list(hist)
        else:
            open_map, hist = {}, []
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs))
            days = (rows["__sec"] // day_s).astype("int64").to_numpy()
            for d, c in zip(*np.unique(days, return_counts=True)):
                open_map[int(d)] = open_map.get(int(d), 0) + int(c)
        wm_s = state.getCurrentWatermarkMs() / 1000.0
        out = []
        for d in sorted(open_map):
            if (d + 1) * day_s <= wm_s:
                n = open_map.pop(d)
                z, flag = score(n, hist)
                hist.append(n)
                if len(hist) > history:
                    hist = hist[-history:]
                out.append((d, n, z, flag))
        state.update(
            (sorted(open_map), [open_map[d] for d in sorted(open_map)], hist)
        )
        if open_map:
            state.setTimeoutTimestamp(int((min(open_map) + 1) * day_s * 1000))
        if out:
            yield pd.DataFrame(
                {
                    "event_type": [etype] * len(out),
                    "day_start": [pd.Timestamp(d * day_s, unit="s") for d, *_ in out],
                    "n": [n for _, n, *_ in out],
                    "zscore": [z for *_, z, _f in out],
                    "is_anomaly": [f for *_, f in out],
                }
            )

    ev = _ensure_event_time(events, ts_col)
    # UTC epoch seconds computed ENGINE-side: CAST(timestamp AS DOUBLE) is
    # the internal epoch, independent of spark.sql.session.timeZone —
    # the pandas-side timestamps are session-local naive and would bucket
    # days in the wrong frame vs the UTC watermark
    ev = ev.withColumn(
        "__sec", F.col(ts_col).cast("timestamp").cast("double")
    )
    return (
        ev.withWatermark(ts_col, watermark)
        .groupBy(type_col)
        .applyInPandasWithState(
            fn,
            outputStructType=ANOMALY_SCHEMA,
            stateStructType=_ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def enrich(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join — attach dimension attributes (user
    profile, geo lookup, source metadata) to an event stream.

    Stream-static joins are stateless in Structured Streaming: each
    micro-batch joins against the CURRENT static table snapshot, so no
    watermark and no state store are involved (inner and left-outer with
    the static side on the right are the supported shapes — Spark rejects
    others at analysis time). The dimension is broadcast by default: a
    per-batch hash join with ZERO shuffle of the stream; disable for
    dimensions past broadcast size, which shuffles both sides on the key
    each micro-batch.

    The same call works on a batch frame (the gate's mirror,
    ``events_enriched``). At 100 TB of stream: cost is one map-side join
    per batch; re-planning picks up dim-table updates between batches
    (exactly-once semantics apply to the stream, not the dim snapshot).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"stream-static enrichment supports inner/left joins, got {how!r}"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)


def streaming_classifier_metrics(
    df: DataFrame,
    label_col: str,
    score_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    threshold: float = 0.5,
) -> DataFrame:
    """Windowed classifier monitoring over a scored event stream — the
    model-drift detector for a deployed quality/abuse classifier: per
    event-time window, n / n_pos / log_loss / brier and the
    ``threshold``-confusion block (tp/fp/tn/fn, accuracy). Pure windowed
    aggregation — O(1) state per open window, watermarked and append-able.

    AUC is deliberately NOT computed here: the ROC needs per-bucket state
    (≤ bins rows per window) and a second level of aggregation — run
    :func:`dbreg_spark.operators.evaluate.classifier_metrics` on a
    materialized window when the ranking metric is needed.
    """
    eps = 1e-15
    y = F.col(label_col).cast("double")
    p = F.col(score_col).cast("double")
    pc = F.least(F.greatest(p, F.lit(eps)), F.lit(1.0 - eps))
    pred = (p >= F.lit(float(threshold))).cast("double")
    base = _ensure_event_time(
        df.where(y.isNotNull() & p.isNotNull()), ts_col
    )
    return (
        base.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("window"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(y).cast("long").alias("n_pos"),
            F.avg(-(y * F.log(pc) + (1.0 - y) * F.log(1.0 - pc))).alias(
                "log_loss"
            ),
            F.avg((p - y) * (p - y)).alias("brier"),
            F.sum(pred * y).cast("long").alias("tp"),
            F.sum(pred * (1.0 - y)).cast("long").alias("fp"),
            F.sum((1.0 - pred) * (1.0 - y)).cast("long").alias("tn"),
            F.sum((1.0 - pred) * y).cast("long").alias("fn"),
            ((F.sum(pred * y) + F.sum((1.0 - pred) * (1.0 - y)))
             / F.count(F.lit(1))).alias("accuracy"),
        )
    )
