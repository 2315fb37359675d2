"""As-of (point-in-time) joins — an operator Spark lacks natively.

For every left row, attach the right row with the greatest ``on`` ≤ left's
``on`` (direction="backward", the point-in-time lookup) or the smallest
``on`` ≥ left's (direction="forward"), matching on the ``by`` keys — the
join a feature pipeline needs to ask "what was this user's state when the
event happened" without leaking the future.

Scale shape: the union-tag + windowed carry-forward formulation — left and
right are unioned, shuffled ONCE on the ``by`` keys, sorted within
partitions by (time, side), and the matched right row is propagated as ONE
struct with ``last(struct, ignorenulls=True)`` over an unbounded-preceding
window. That is one shuffle of |L| + |R| rows and a per-key sort — same
cost as a sort-merge join, with no range-explosion (a naive ``l.ts >= r.ts``
range join is O(|L|·|R|) within key). Carrying a single struct (not one
window per value column) guarantees every output field comes from the SAME
right row — a NULL in a value column of the matched row stays NULL, exactly
DuckDB's ASOF semantics, instead of being back-filled from an older row.

Hot keys: the plain window partitions by key, so one pathologically hot key
serializes its own partition. Pass ``bucket_seconds`` to sub-partition by a
coarse time bucket: the carry-forward runs within (key, bucket) and each
bucket is seeded with a boundary row — the last (first, for forward) right
row from all earlier (later) buckets, computed on a tiny per-(key, bucket)
summary table. Two windows total: one over the summary (rows = distinct
(key, bucket) pairs) and one over the data partitioned by (key, bucket) —
partition size is bounded by the bucket width, at the cost of one extra
groupBy of the right side.

DuckDB has native ``ASOF JOIN``; the oracle twin uses it, making the gate an
engine-vs-engine semantic check rather than a self-referential one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql import types as T


def _seconds_col(col, dt):
    """Numeric seconds for a time Column of datatype ``dt``: timestamps
    (with or without zone) via epoch, numerics as-is (TIMESTAMP_NTZ cannot
    cast to numeric directly)."""
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def _seconds(df: DataFrame, colname: str):
    return _seconds_col(F.col(colname), df.schema[colname].dataType)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """As-of join ``left`` to ``right`` on time column ``on`` within ``by``
    keys. Right rows must be unique per (by, on) — pre-aggregate ties
    (e.g. ``groupBy(by, on).agg(max(...))``) or the carried row among
    equal timestamps is unspecified. Returns all left columns plus each
    value column as ``<name><suffix>`` and ``<on><suffix>`` (the matched
    right timestamp; null = no match). ``tolerance_seconds`` voids matches
    further than the tolerance from the left timestamp.

    The matched right row is carried as a single struct, so all output
    value columns (including the matched timestamp used by the tolerance
    check) come from the same right row — NULLs in the matched row are
    returned as-is, never back-filled from an older row.

    ``bucket_seconds`` (optional) sub-partitions the carry-forward window
    by a coarse time bucket so a single hot ``by`` key no longer
    serializes one task: each (key, bucket) partition is seeded with a
    boundary row propagated from earlier (later, for forward) buckets.
    Results are identical; choose a width that keeps per-bucket row counts
    in the ~1e6 range for the hottest key."""
    if isinstance(by, str):
        by = [by]
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    reserved = {"__side", "__r", "__bkt", "__ord", "__on"}
    bad = reserved & (set(left.columns) | set(right.columns))
    if bad:
        raise ValueError(
            f"asof_join reserves column names {sorted(bad)} for its "
            "internal carry-forward state; rename those input columns"
        )
    rcols = value_cols or [c for c in right.columns if c not in by + [on]]
    on_dt = right.schema[on].dataType
    backward = direction == "backward"

    # the matched right row travels as ONE struct — field 0 is the right
    # timestamp, then the value columns — so a single last(ignorenulls)
    # carries them atomically
    rstruct = F.struct(
        F.col(on).alias("__on"), *[F.col(c).alias(c) for c in rcols]
    )
    r = right.select(
        *by, F.col(on), F.lit(0).alias("__side"), rstruct.alias("__r")
    )
    l = left.withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)  # left rows: __r = NULL

    part_keys = list(by)
    if bucket_seconds is not None:
        b = F.lit(int(bucket_seconds))
        bkt = F.floor(_seconds_col(F.col(on), on_dt) / b).cast("long")
        u = u.withColumn("__bkt", bkt)
        rb = r.withColumn("__bkt", bkt)
        lb = l.select(*by, bkt.alias("__bkt"))
        # tiny summary: the right row a later (earlier) bucket would carry
        # in — one row per (key, bucket); window over THIS table is cheap
        agg = F.max_by("__r", F.col(on)) if backward else F.min_by(
            "__r", F.col(on)
        )
        summ = rb.groupBy(*by, "__bkt").agg(agg.alias("__r"))
        allb = (
            lb.unionByName(rb.select(*by, "__bkt")).distinct()
        )
        sb = allb.join(summ, on=by + ["__bkt"], how="left")
        order = F.col("__bkt").asc() if backward else F.col("__bkt").desc()
        ws = (
            Window.partitionBy(*by)
            .orderBy(order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        boundary = (
            sb.withColumn("__r", F.last("__r", ignorenulls=True).over(ws))
            .where(F.col("__r").isNotNull())
            .select(
                *by,
                F.lit(None).cast(on_dt).alias(on),
                F.lit(0).alias("__side"),
                "__r",
                "__bkt",
                F.lit(0).alias("__ord"),
            )
        )
        u = u.withColumn("__ord", F.lit(1)).unionByName(
            boundary, allowMissingColumns=True
        )
        part_keys = by + ["__bkt"]
        lead = [F.col("__ord").asc()]
    else:
        lead = []

    # equal timestamps: the right row sorts before (backward) / after
    # (forward) the left row, so an exactly-coincident state is visible —
    # the inclusive semantics of SQL ASOF (l.ts >= r.ts / l.ts <= r.ts)
    tsort = F.col(on).asc() if backward else F.col(on).desc()
    w = (
        Window.partitionBy(*part_keys)
        .orderBy(*lead, tsort, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("__r", F.last("__r", ignorenulls=True).over(w))

    out = u.where(F.col("__side") == 1)
    if tolerance_seconds is not None:
        gap = F.abs(
            _seconds(out, on) - _seconds_col(F.col("__r.__on"), on_dt)
        )
        within = gap <= F.lit(float(tolerance_seconds))
        out = out.withColumn("__r", F.when(within, F.col("__r")))
    return out.select(
        *left.columns,
        F.col("__r.__on").alias(f"{on}{suffix}"),
        *[F.col(f"__r.{c}").alias(f"{c}{suffix}") for c in rcols],
    )


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    on: str,
    by: list[str] | str,
    value_cols: list[str],
    left_cols: list[str],
    suffix: str = "_right",
    direction: str = "backward",
) -> str:
    """DuckDB twin via native ASOF LEFT JOIN."""
    if isinstance(by, str):
        by = [by]
    cmp = ">=" if direction == "backward" else "<="
    keys = " AND ".join(f"l.{k} = r.{k}" for k in by)
    sel = (
        [f"l.{c}" for c in left_cols]
        + [f"r.{on} AS {on}{suffix}"]
        + [f"r.{c} AS {c}{suffix}" for c in value_cols]
    )
    return f"""
SELECT {', '.join(sel)}
FROM ({left_sql}) l
ASOF LEFT JOIN ({right_sql}) r
  ON {keys} AND l.{on} {cmp} r.{on}
"""


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    by: list[str] | str,
    start: str,
    end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Range/containment join — every (point, interval) pair with
    ``start ≤ point.on ≤ end`` within the ``by`` keys — WITHOUT the
    nested-loop plan Spark gives a raw BETWEEN join (BroadcastNestedLoop /
    per-key cartesian, O(|P|·|I|) comparisons).

    Buckets time into ``bucket_seconds`` cells: each interval explodes to
    the buckets it covers, each point carries its single bucket, and the
    join becomes an EQUI-join on (keys, bucket) + a residual containment
    filter — exact (integer epoch math keeps coverage conservative) and
    shuffle-friendly (whole-stage codegen, AQE). Each qualifying pair
    matches in exactly one bucket (the point's), so no dedup pass is
    needed. Pick ``bucket_seconds`` near the typical interval length:
    explosion factor ≈ len/bucket + 1."""
    if isinstance(by, str):
        by = [by]
    b = F.lit(int(bucket_seconds))
    ib = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(_seconds(intervals, start) / b).cast("long"),
                F.floor(_seconds(intervals, end) / b).cast("long"),
            )
        ),
    )
    pb = points.withColumn(
        "__b", F.floor(_seconds(points, on) / b).cast("long")
    )
    joined = pb.join(ib, on=by + ["__b"]).where(
        (F.col(on) >= F.col(start)) & (F.col(on) <= F.col(end))
    )
    return joined.drop("__b")


def interval_join_sql(
    points_sql: str,
    intervals_sql: str,
    on: str,
    by: list[str] | str,
    start: str,
    end: str,
    select_cols: list[str],
) -> str:
    """Oracle twin: the plain BETWEEN join (fine at oracle scale)."""
    if isinstance(by, str):
        by = [by]
    keys = " AND ".join(f"p.{k} = i.{k}" for k in by)
    return f"""
SELECT {', '.join(select_cols)}
FROM ({points_sql}) p
JOIN ({intervals_sql}) i
  ON {keys} AND p.{on} >= i.{start} AND p.{on} <= i.{end}
"""


def funnel(
    events: DataFrame,
    steps: list[str],
    on: str = "ts",
    by: str = "user_id",
    type_col: str = "event_type",
    window_seconds: float | None = None,
    max_events_per_key: int | None = 1_000_000,
) -> DataFrame:
    """Funnel analysis: how far each ``by`` key progresses through the
    ordered ``steps`` sequence — step i+1 counts only AFTER step i (same
    timestamp allowed: ties process in (time, type) order), and, with
    ``window_seconds``, only within that horizon of the step-1 event.
    Returns one row per key: (``by``, steps_completed, ts_first, ts_last)
    with the epoch seconds of the first and the latest counted step
    (NULL when nothing matched). The standard conversion-funnel query
    (signup → activate → purchase) a product-events pipeline runs.

    Scale shape: one scan filtered to the step types, one groupBy
    assembling each key's sorted (time, type) array — bounded by the
    key's RELEVANT event count, not total activity — then a single fold
    (``aggregate``) per key advances the state machine; no self-joins,
    no per-step passes. The DuckDB twin replays the same walk as a
    recursive CTE (oracle-scale only), the pack_greedy precedent.

    Skew guard, ON BY DEFAULT: a key with more than ``max_events_per_key``
    step-typed events (a bot/crawler) would materialize that many rows in
    one task's collect_list — such keys are EXCLUDED from the result (one
    pre-count groupBy + broadcast anti-join), matching the bot filtering
    every funnel analysis applies anyway; pass ``None`` to keep them."""
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    k = len(steps)
    from ..functions.xdialect import SPARK, X as _X

    _xs = _X(SPARK)
    steps_arr = "array(" + ", ".join(_xs.lit_str(s) for s in steps) + ")"
    sec = _seconds(events, on)
    relevant = events.where(F.col(type_col).isin(list(steps)))
    if max_events_per_key is not None:
        hot = (
            relevant.groupBy(by)
            .agg(F.count(F.lit(1)).alias("__m"))
            .where(F.col("__m") > max_events_per_key)
            .select(by)
        )
        relevant = relevant.join(F.broadcast(hot), by, "left_anti")
    ev = (
        relevant
        .select(
            F.col(by),
            F.struct(sec.alias("t"), F.col(type_col).alias("ty")).alias("__e"),
        )
        .groupBy(by)
        .agg(F.expr("sort_array(collect_list(__e))").alias("__evs"))
    )
    win = (
        f"AND (acc.idx = 0 OR e.t - acc.ts0 <= {float(window_seconds)!r}D)"
        if window_seconds is not None
        else ""
    )
    fold = f"""
aggregate(
  __evs,
  named_struct('idx', 0L, 'ts0', CAST(NULL AS DOUBLE), 'tsl', CAST(NULL AS DOUBLE)),
  (acc, e) -> IF(
    acc.idx < {k} AND e.ty = element_at({steps_arr}, CAST(acc.idx + 1 AS INT)) {win},
    named_struct('idx', acc.idx + 1L,
                 'ts0', coalesce(acc.ts0, e.t),
                 'tsl', e.t),
    acc))
"""
    return (
        ev.select(by, F.expr(fold).alias("__st"))  # fold evaluated once
        .select(
            by,
            F.col("__st.idx").cast("long").alias("steps_completed"),
            F.col("__st.ts0").alias("ts_first"),
            F.col("__st.tsl").alias("ts_last"),
        )
    )


def funnel_sql(
    table: str,
    steps: list[str],
    on: str = "ts",
    by: str = "user_id",
    type_col: str = "event_type",
    window_seconds: float | None = None,
) -> str:
    """DuckDB twin of :func:`funnel` — the fold replayed as a recursive
    CTE over each key's time-ordered relevant events."""
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    k = len(steps)
    from ..functions.xdialect import DUCK, X as _X

    _xd = _X(DUCK)
    steps_list = "[" + ", ".join(_xd.lit_str(s) for s in steps) + "]"
    win = (
        f"AND (w.idx = 0 OR epoch(o.{on}) - w.ts0 <= {float(window_seconds)!r})"
        if window_seconds is not None
        else ""
    )
    return f"""
WITH RECURSIVE ordered AS (
  SELECT {by}, epoch({on}) AS t, {type_col} AS ty,
         ROW_NUMBER() OVER (PARTITION BY {by} ORDER BY epoch({on}), {type_col}) AS rn,
         {on}
  FROM {table}
  WHERE {type_col} IN (SELECT unnest({steps_list}))
),
walk(key, rn, idx, ts0, tsl) AS (
  SELECT {by}, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
  FROM ordered GROUP BY {by}
  UNION ALL
  SELECT w.key, w.rn + 1,
         CASE WHEN w.idx < {k} AND o.ty = {steps_list}[w.idx + 1] {win}
              THEN w.idx + 1 ELSE w.idx END,
         CASE WHEN w.idx < {k} AND o.ty = {steps_list}[w.idx + 1] {win}
              THEN COALESCE(w.ts0, epoch(o.{on})) ELSE w.ts0 END,
         CASE WHEN w.idx < {k} AND o.ty = {steps_list}[w.idx + 1] {win}
              THEN epoch(o.{on}) ELSE w.tsl END
  FROM walk w JOIN ordered o ON o.{by} = w.key AND o.rn = w.rn + 1
),
final AS (
  SELECT key, idx, ts0, tsl,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY rn DESC) AS last_rn
  FROM walk
)
SELECT key AS {by}, idx AS steps_completed, ts0 AS ts_first, tsl AS ts_last
FROM final WHERE last_rn = 1
"""


def retention_cohorts(
    events: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    bucket_seconds: int = 604_800,
) -> DataFrame:
    """Cohort retention: keys grouped into cohorts by their FIRST event's
    time bucket (default weekly, as epoch-bucket index — calendar-free, so
    both engines bucket identically), counting distinct keys active in
    each later bucket. Returns (cohort, bucket_offset, n_active) with
    offset 0 = the cohort's own bucket; the classic retention-triangle
    input.

    Scale shape: one groupBy finds each key's first event (min aggregate,
    map-side combine), joined back on the key (the only wide join —
    co-partitioned on ``by``), then distinct (key, offset) + a count per
    (cohort, offset): shuffles carry key-sized rows only, never raw
    events past the first join."""
    sec = _seconds(events, on)
    b = F.lit(int(bucket_seconds))
    first = events.groupBy(by).agg(F.min(sec).alias("__t0"))
    act = (
        events.select(F.col(by), sec.alias("__t"))
        .join(first, by)
        .select(
            by,
            F.floor(F.col("__t0") / b).cast("long").alias("cohort"),
            (F.floor(F.col("__t") / b) - F.floor(F.col("__t0") / b))
            .cast("long")
            .alias("bucket_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort", "bucket_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )


def retention_cohorts_sql(
    table: str,
    on: str = "ts",
    by: str = "user_id",
    bucket_seconds: int = 604_800,
) -> str:
    """DuckDB twin of :func:`retention_cohorts`."""
    return f"""
WITH first AS (
  SELECT {by}, MIN(epoch({on})) AS t0 FROM {table} GROUP BY {by}
),
act AS (
  SELECT DISTINCT e.{by},
         CAST(FLOOR(f.t0 / {bucket_seconds}) AS BIGINT) AS cohort,
         CAST(FLOOR(epoch(e.{on}) / {bucket_seconds})
              - FLOOR(f.t0 / {bucket_seconds}) AS BIGINT) AS bucket_offset
  FROM {table} e JOIN first f USING ({by})
)
SELECT cohort, bucket_offset, CAST(COUNT(*) AS BIGINT) AS n_active
FROM act GROUP BY cohort, bucket_offset
"""
