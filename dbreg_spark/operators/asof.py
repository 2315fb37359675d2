"""As-of (point-in-time) joins — an operator Spark lacks natively.

For every left row, attach the right row with the greatest ``on`` ≤ left's
``on`` (direction="backward", the point-in-time lookup) or the smallest
``on`` ≥ left's (direction="forward"), matching on the ``by`` keys — the
join a feature pipeline needs to ask "what was this user's state when the
event happened" without leaking the future.

Scale shape: the union-tag + windowed carry-forward formulation — left and
right are unioned, shuffled ONCE on the ``by`` keys, sorted within
partitions by (time, side), and the right values are propagated with
``last(..., ignorenulls=True)`` over an unbounded-preceding window. That is
one shuffle of |L| + |R| rows and a per-key sort — same cost as a sort-merge
join, with no range-explosion (a naive ``l.ts >= r.ts`` range join is
O(|L|·|R|) within key). The window partitions by key, so parallelism is the
key cardinality; one pathologically hot key serializes its own partition
(the usual window caveat — pre-split such keys upstream if they exist).

DuckDB has native ``ASOF JOIN``; the oracle twin uses it, making the gate an
engine-vs-engine semantic check rather than a self-referential one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql import types as T


def _seconds(df: DataFrame, colname: str):
    """Numeric seconds for a time column: timestamps (with or without zone)
    via epoch, numerics as-is (TIMESTAMP_NTZ cannot cast to numeric
    directly)."""
    dt = df.schema[colname].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return F.col(colname).cast("timestamp").cast("double")
    return F.col(colname).cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join ``left`` to ``right`` on time column ``on`` within ``by``
    keys. Right rows must be unique per (by, on) — pre-aggregate ties
    (e.g. ``groupBy(by, on).agg(max(...))``) or the carried row among
    equal timestamps is unspecified. Returns all left columns plus each
    value column as ``<name><suffix>`` and ``<on><suffix>`` (the matched
    right timestamp; null = no match). ``tolerance_seconds`` voids matches
    further than the tolerance from the left timestamp."""
    if isinstance(by, str):
        by = [by]
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rcols = value_cols or [c for c in right.columns if c not in by + [on]]

    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        F.col(on).alias(f"__r_{on}"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
    )
    l = left.withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    # equal timestamps: the right row sorts before (backward) / after
    # (forward) the left row, so an exactly-coincident state is visible —
    # the inclusive semantics of SQL ASOF (l.ts >= r.ts / l.ts <= r.ts)
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    carried = [f"__r_{on}"] + [f"__r_{c}" for c in rcols]
    for c in carried:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = u.where(F.col("__side") == 1)
    if tolerance_seconds is not None:
        gap = F.abs(_seconds(out, on) - _seconds(out, f"__r_{on}"))
        within = gap <= F.lit(float(tolerance_seconds))
        for c in carried:
            out = out.withColumn(c, F.when(within, F.col(c)))
    return out.select(
        *left.columns,
        F.col(f"__r_{on}").alias(f"{on}{suffix}"),
        *[F.col(f"__r_{c}").alias(f"{c}{suffix}") for c in rcols],
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
