"""Semi-structured (JSON) field extraction — typed column projection out of
JSON string columns, the first step of ingesting event/log payloads.

The reference engine has no JSON surface; this is Spark-native pipeline
plumbing (events-table ``props`` payloads, API logs, crawl metadata).
Extraction is a pure column expression — ``get_json_object`` lives inside
whole-stage codegen, so a typed projection costs one scan with zero
shuffles and the surrounding filter/column pruning still reaches parquet.

Cross-engine contract: Spark ``get_json_object(col, '$.path')`` and DuckDB
``json_extract_string(col, '$.path')`` both return the unquoted string
value of the path (NULL when absent), and ``TRY_CAST`` maps malformed
numerics to NULL on both engines (Spark 4 runs ANSI mode, so a plain CAST
would raise — TRY_CAST is the portable spelling).

At 100 TB: stateless row-local projection — streaming-safe, partition
count preserved, no skew surface. Extract once, early, and drop the raw
JSON string before any shuffle so the shuffle carries typed columns, not
payload text (guidance the docstring of :func:`json_fields` repeats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dbreg_spark.functions.xdialect import DUCK, SPARK, X

# (alias, json path, SQL type) — the type names below are the portable
# subset (BIGINT / DOUBLE / BOOLEAN work verbatim on both engines; STRING
# is spelled per-dialect).
FieldSpec = tuple[str, str, str]


def json_field_expr(x: X, col: str, path: str, sql_type: str) -> str:
    """One typed JSON field as a dialect expression.

    ``path`` is a JSONPath like ``$.k`` or ``$.a.b`` (the dotted subset
    both engines support identically); it is escaped via ``lit_str``
    (JSON keys may legally contain quotes)."""
    if not path.startswith("$"):
        raise ValueError(f"JSON path must start with '$': {path!r}")
    p = x.lit_str(path)
    if x.e == SPARK:
        raw = f"get_json_object({col}, {p})"
    else:
        # json_valid guard: DuckDB's json_extract_string RAISES on
        # malformed JSON while Spark's get_json_object returns NULL —
        # the operator contract is Spark's (malformed payload → NULL
        # fields, the only sane behavior over a 100 TB crawl)
        raw = (
            f"CASE WHEN json_valid({col}) "
            f"THEN json_extract_string({col}, {p}) END"
        )
    t = sql_type.upper()
    if t in ("STRING", "VARCHAR"):
        return raw  # extraction already yields the dialect's string type
    return f"TRY_CAST({raw} AS {t})"


def json_fields(
    df: DataFrame,
    fields: list[FieldSpec],
    col: str = "props",
    drop_raw: bool = False,
) -> DataFrame:
    """Project typed columns out of a JSON string column.

    ``fields`` is a list of ``(alias, '$.path', sql_type)``; missing paths
    and malformed values become NULL (TRY_CAST semantics on both engines).
    With ``drop_raw=True`` the JSON column itself is dropped — do that
    before any shuffle so downstream exchanges carry typed scalars, not
    payload strings.
    """
    x = X(SPARK)
    keep = [c for c in df.columns if not (drop_raw and c == col)]
    return df.select(
        *keep,
        *[
            F.expr(json_field_expr(x, col, path, t)).alias(a)
            for a, path, t in fields
        ],
    )


def json_fields_sql(
    table: str,
    fields: list[FieldSpec],
    col: str = "props",
    select_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`json_fields` (``select_cols`` defaults to
    ``*`` which keeps the raw column, matching ``drop_raw=False``)."""
    x = X(DUCK)
    base = select_cols if select_cols is not None else ["*"]
    exprs = [
        f"{json_field_expr(x, col, path, t)} AS {a}" for a, path, t in fields
    ]
    return "SELECT " + ", ".join(base + exprs) + f" FROM {table}"


def json_keys_expr(x: X, col: str) -> str:
    """Array of top-level JSON keys; malformed/NULL payload → NULL on
    both engines (Spark's json_object_keys does that natively; the
    DuckDB twin guards with json_valid since json_keys raises)."""
    if x.e == SPARK:
        return f"json_object_keys({col})"
    return f"CASE WHEN json_valid({col}) THEN json_keys({col}) END"


def json_key_stats(df: DataFrame, col: str = "props") -> DataFrame:
    """Profile a JSON payload column: one row per top-level key with its
    occurrence count and coverage (fraction of ALL rows carrying the
    key) — the schema-discovery step before committing a pipeline to
    :func:`json_fields` extractions. Malformed/NULL payloads contribute
    no keys but stay in the coverage denominator.

    Scale shape: one explode scan into a (key, partial count) shuffle —
    the key universe is tiny, map-side combine collapses it; the total
    row count is one count() job (parquet metadata-cheap). Output is
    deterministic: descending count, then key."""
    x = X(SPARK)
    total = df.count()
    keys = df.select(
        F.explode(F.expr(json_keys_expr(x, col))).alias("key")
    )
    return (
        keys.groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .withColumn(
            "coverage",
            F.round(F.col("n_rows").cast("double") / F.lit(float(max(total, 1))), 6),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
    )


def json_key_stats_sql(table: str, col: str = "props") -> str:
    x = X(DUCK)
    return f"""
WITH __tot AS (SELECT GREATEST(COUNT(*), 1) AS n FROM {table}),
__k AS (SELECT unnest({json_keys_expr(x, col)}) AS key FROM {table})
SELECT key, CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(COUNT(*)::DOUBLE / (SELECT n FROM __tot), 6) AS coverage
FROM __k GROUP BY key
ORDER BY n_rows DESC, key ASC
"""
