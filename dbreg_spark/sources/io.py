"""Data-source helpers: parquet loading (incl. nanosecond-timestamp repair),
session construction, and the standard testdata star schema.

Spark (as of 4.x) refuses parquet TIMESTAMP(NANOS) columns unless
``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case they surface
as BIGINT nanoseconds. :func:`load_parquet` detects those columns from the
parquet footer via pyarrow and rebuilds proper timestamp columns
(micro precision) so downstream code sees the same schema DuckDB does.
"""

from __future__ import annotations

import glob
import os
import sys

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def get_session(
    app_name: str = "dbreg_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's default tuning:
    AQE on (runtime re-planning, skew-join handling), nanos-parquet
    compatibility, and Arrow-accelerated pandas interchange.

    Local mode runs everything in the driver JVM, whose 1g default heap
    starves N concurrent hash-aggregation tasks of execution memory
    (observed: UNABLE_TO_ACQUIRE_MEMORY on a 10M-row groupBy under
    local[32]); when this call CREATES the session, driver memory
    defaults to 512m × parallelism clamped to [2g, 32g] (override with
    ``driver_memory`` or ``$SPARK_GRAFT_DRIVER_MEM``). On a real cluster
    executor memory comes from the deployment, not from here."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    if master:
        b = b.master(master)
    elif not SparkSession.getActiveSession():
        b = b.master(f"local[{cpus}]")
    if not SparkSession.getActiveSession():
        mem = (
            driver_memory
            or os.environ.get("SPARK_GRAFT_DRIVER_MEM")
            or _default_local_driver_mem(master or f"local[{cpus}]")
        )
        if mem is not None:
            b = b.config("spark.driver.memory", mem)
    if not SparkSession.getActiveSession():
        local_dir = _default_local_spark_dir(master or f"local[{cpus}]")
        if local_dir is not None:
            os.makedirs(local_dir, exist_ok=True)
            b = b.config("spark.local.dir", local_dir)
            # one visible line when the tmpfs default engages (VERDICT r9
            # #8): with < 32 GiB free in /dev/shm the default silently
            # falls back to Spark's own dir, and two "identical" local
            # runs can differ 10x for environment reasons — make which
            # mode a run used greppable from its log.
            print(
                f"[dbreg-spark] spark.local.dir -> {local_dir} "
                "(local-mode shuffle/spill on tmpfs; override with "
                "$SPARK_GRAFT_LOCAL_DIR)",
                file=sys.stderr,
            )
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return b.getOrCreate()


def _default_local_driver_mem(master: str) -> str | None:
    """Driver-memory default for LOCAL masters only: 512m × parallelism
    clamped to [2g, 32g]. ``local[N]`` / ``local[N,F]`` parse N;
    ``local`` / ``local[*]`` use the machine's cores. Any non-local
    master returns None — a cluster's driver/executor memory belongs to
    the deployment, and digit-scraping a ``spark://host:7077`` URL here
    would derive nonsense from the port number."""
    if not master.startswith("local"):
        return None
    inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
    n_str = inner.split(",")[0].strip()
    par = int(n_str) if n_str.isdigit() else (os.cpu_count() or 4)
    return f"{min(max(par // 2, 2), 32)}g"


def _default_local_spark_dir(master: str) -> str | None:
    """``spark.local.dir`` default for LOCAL masters only: shuffle and
    spill files go to a RAM-backed tmpfs (``/dev/shm``) when it has
    ≥ 32 GiB headroom, else Spark's own default stands. Override with
    ``$SPARK_GRAFT_LOCAL_DIR`` (any path, incl. a real scratch disk).

    Why: local mode has no provisioned shuffle disks — shuffle writes
    land wherever ``java.io.tmpdir`` points, and on a slow or shared
    block device the kernel's dirty-page writeback throttling stalls
    EVERY subsequent query, not just the shuffle-heavy one (measured on
    this sandbox: 42-70 MB/s sustained writes; identical bench
    iterations ascending 20 s → 210 s as writeback backlog accumulated).
    Shuffle/spill data is transient within a session, so tmpfs is safe:
    nothing outlives the JVM. On a real cluster local dirs come from the
    deployment (fast NVMe per executor) — a non-local master returns
    None here for the same reason ``_default_local_driver_mem`` does."""
    if not master.startswith("local"):
        return None
    override = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if override:
        return override
    shm = "/dev/shm"
    try:
        st = os.statvfs(shm)
        if st.f_bavail * st.f_frsize >= 32 << 30:
            return os.path.join(shm, "dbreg-spark-local")
    except OSError:
        pass
    return None


def _nano_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns], from the file footer."""
    try:
        import pyarrow.parquet as pq
    except ImportError:
        return []
    files = sorted(glob.glob(os.path.join(path, "*.parquet"))) if os.path.isdir(
        path
    ) and not path.endswith(".parquet") else [path]
    if os.path.isdir(path) and path.endswith(".parquet"):
        # a directory-style parquet dataset
        inner = sorted(glob.glob(os.path.join(path, "*.parquet")))
        files = inner or [path]
    for f in files:
        try:
            schema = pq.read_schema(f)
        except Exception:
            continue
        return [
            name
            for name, typ in zip(schema.names, schema.types)
            if str(typ).startswith("timestamp[ns")
        ]
    return []


def load_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet, restoring nanosecond-timestamp columns to timestamps."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        # config is session-level but must be set before the scan is planned
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in _nano_timestamp_cols(path):
        if c in df.columns:
            df = df.withColumn(c, F.timestamp_micros((F.col(c) / F.lit(1000)).cast("long")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, register: bool = True) -> dict:
    """Load every testdata table under ``sf_dir``; optionally register temp
    views under the bare table names."""
    out = {}
    for t in TPCH_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            df = load_parquet(spark, p)
            if register:
                df.createOrReplaceTempView(t)
            out[t] = df
    return out


# --------------------------------------------------------------------------
# sinks
# --------------------------------------------------------------------------


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
    target_file_mb: int = 256,
    sort_within_partitions: list[str] | None = None,
) -> None:
    """Parquet sink with scale-sane file sizing: estimates the output size
    from the optimized plan's statistics and repartitions so each file
    lands near ``target_file_mb`` (the small-file problem — thousands of
    KB-sized parquet files — costs more at read time than the extra
    shuffle costs at write time). ``partition_by`` writes hive-style
    directory partitions (partition pruning for free on read);
    ``sort_within_partitions`` orders rows inside each file so min/max
    page statistics become selective (zone-map pruning for range
    predicates).

    With ``partition_by`` the spread is skew-aware: a per-directory row
    count (one extra aggregation scan of ``df`` — cache upstream if the
    plan is expensive) sizes a salt per partition value, so a hot
    partition value is split across ``ceil(its_rows / rows_per_file)``
    tasks instead of landing as one oversized file written by one
    straggler task, while small partition values keep a single file. The
    salt is a content hash — deterministic under task retries."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        size = None
    if size is not None and size > 0:
        n_files = max(1, min(100_000, round(size / (target_file_mb * (1 << 20)))))
        if partition_by:
            # collect the per-directory counts ONCE (broadcast-small by
            # construction: one row per partition dir); total and the
            # per-dir file counts derive locally, so the input plan runs
            # exactly twice (probe + write), never three times
            count_rows = (
                df.groupBy(*partition_by)
                .agg(F.count(F.lit(1)).alias("__dir_rows"))
                .collect()
            )
            total = sum(r["__dir_rows"] for r in count_rows)
            rows_per_file = max(1, total // n_files)
            spark = df.sparkSession
            from pyspark.sql import types as _T

            nf_schema = _T.StructType(
                [
                    _T.StructField(f"__p_{i}", df.schema[c].dataType)
                    for i, c in enumerate(partition_by)
                ]
                + [_T.StructField("__dir_files", _T.IntegerType())]
            )
            nf_tbl = spark.createDataFrame(
                [
                    tuple(r[c] for c in partition_by)
                    + (max(1, -(-r["__dir_rows"] // rows_per_file)),)
                    for r in count_rows
                ],
                schema=nf_schema,
            )
            # salt from the hashable non-partition columns only (F.hash
            # rejects map types); falls back to a constant when none exist
            def _hashable(dt) -> bool:
                if isinstance(dt, _T.MapType):
                    return False
                if isinstance(dt, _T.ArrayType):
                    return _hashable(dt.elementType)
                if isinstance(dt, _T.StructType):
                    return all(_hashable(f.dataType) for f in dt.fields)
                return True

            value_cols = [
                f.name
                for f in df.schema.fields
                if f.name not in partition_by and _hashable(f.dataType)
            ]
            salt_src = (
                F.hash(*[F.col(c) for c in value_cols])
                if value_cols
                else F.lit(0)
            )
            # null-safe join: a NULL partition value is a real directory
            # (__HIVE_DEFAULT_PARTITION__) — a plain inner equi-join would
            # silently DROP those rows (null keys never match)
            cond = None
            for i, c in enumerate(partition_by):
                eq = df[c].eqNullSafe(nf_tbl[f"__p_{i}"])
                cond = eq if cond is None else cond & eq
            df = (
                df.join(F.broadcast(nf_tbl), cond)
                .withColumn("__salt", F.pmod(salt_src, F.col("__dir_files")))
                .repartition(
                    n_files,
                    *[F.col(c) for c in partition_by],
                    F.col("__salt"),
                )
                .drop(
                    "__dir_files",
                    "__salt",
                    *[f"__p_{i}" for i in range(len(partition_by))],
                )
            )
        else:
            df = df.repartition(n_files)
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "error", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).json(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "error",
) -> None:
    """Persist ``df`` as a BUCKETED parquet table (``bucketBy`` +
    optional ``sortBy``, registered in the session catalog) — the Spark
    mechanism for CO-LOCATED joins and aggregations: two tables bucketed
    on the same keys into the same bucket count join with ZERO exchange
    (and with ``sort_by`` on the join keys, zero sort), because the
    bucket id pins each key's rows to one file set per side.

    This is the pre-shuffle trade at 100 TB: pay the shuffle ONCE at
    write time, then every subsequent join/groupBy on the bucket keys is
    exchange-free — the right call for fact tables that are repeatedly
    joined on the same key (events by user_id, documents by doc_id).
    Bucket pruning also applies to equality filters on the first bucket
    column. Requires a catalog table (Spark cannot express bucketing on
    a bare directory); pass ``path`` to control the storage location.

    Pinned by ``tests/test_plans.py::test_bucketed_join_has_no_exchange``.
    """
    if not bucket_by:
        raise ValueError("bucket_by must name at least one column")
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
