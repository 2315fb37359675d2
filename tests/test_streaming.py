"""Structured-Streaming operators driven from file sources with
availableNow triggers into memory sinks."""

import os
import shutil
import tempfile
import uuid

import pandas as pd
import pytest
import pyspark.sql.functions as F


@pytest.fixture(scope="module")
def event_stream_dir(spark, tables):
    """Write the events table out as a small parquet directory usable as a
    streaming file source."""
    d = tempfile.mkdtemp(prefix="dbreg_stream_")
    tables["events"].repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts(spark, tables, event_stream_dir):
    from dbreg_spark.streaming.ops import windowed_event_counts

    schema = tables["events"].schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    out = windowed_event_counts(stream, window="1 day", watermark="2 days")
    name = f"win_{uuid.uuid4().hex[:8]}"
    _run_stream(out, name)
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    # oracle: batch computation of the same windows
    want = (
        tables["events"]
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.sum("value").alias("sum_value"))
        .toPandas()
    )
    # append mode: windows still above the final watermark are withheld, so
    # the emitted set is a prefix of the batch oracle — every emitted row
    # must match the oracle exactly
    want["window_start"] = want["window"].map(lambda w: w["start"])
    merged = got.merge(
        want[["window_start", "event_type", "n", "sum_value"]],
        on=["window_start", "event_type"],
        suffixes=("", "_want"),
    )
    assert len(merged) == len(got) > 0
    assert (merged["n"] == merged["n_want"]).all()
    assert got["n"].sum() >= 0.5 * want["n"].sum()


def test_streaming_dedup(spark, event_stream_dir, tables):
    from dbreg_spark.streaming.ops import streaming_dedup

    # documents-as-stream with injected duplicate text keyed by event ts
    docs = tables["documents"].limit(50)
    ev = tables["events"].select("ts").limit(50)
    pdf_docs = docs.toPandas()
    pdf_ts = ev.toPandas()
    pdf = pd.concat(
        [
            pdf_docs.assign(ts=pdf_ts["ts"].values),
            pdf_docs.head(10).assign(ts=pdf_ts["ts"].head(10).values),  # dups
        ]
    )
    d = tempfile.mkdtemp(prefix="dbreg_dedup_stream_")
    try:
        sdf = spark.createDataFrame(pdf)
        sdf.coalesce(1).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(sdf.schema).parquet(d)
        out = streaming_dedup(stream, text_col="text", ts_col="ts")
        name = f"dd_{uuid.uuid4().hex[:8]}"
        _run_stream(out, name)
        got = spark.sql(f"SELECT * FROM {name}").toPandas()
        assert len(got) == 50  # 60 in, 10 dups dropped
        assert got["doc_id"].is_unique
        assert "__fp" not in got.columns  # internal key never leaks
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sessionize(spark, tables):
    from dbreg_spark.streaming.ops import sessionize

    # two users, two bursts separated by > gap
    rows = []
    base = pd.Timestamp("2026-01-01 00:00:00")
    for u in [1, 2]:
        for i in range(5):
            rows.append((u, base + pd.Timedelta(seconds=10 * i), 1.0))
        for i in range(3):
            rows.append((u, base + pd.Timedelta(hours=2, seconds=10 * i), 2.0))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    d = tempfile.mkdtemp(prefix="dbreg_sess_stream_")
    try:
        sdf = spark.createDataFrame(pdf)
        sdf.coalesce(1).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(sdf.schema).parquet(d)
        out = sessionize(stream, gap="30 minutes", watermark="4 hours")
        name = f"sess_{uuid.uuid4().hex[:8]}"
        _run_stream(out, name)
        got = spark.sql(f"SELECT * FROM {name}").toPandas()
        # both bursts arrive in one batch → the first (closed) session per
        # user is emitted; the still-open one stays in state
        assert len(got) == 2
        assert set(got["user_id"]) == {1, 2}
        assert (got["n_events"] == 5).all()
        assert (got["total_value"] == 5.0).all()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sessionize_exact_gap_matches_builtin(spark):
    """Exact-gap boundary parity: Spark's session_window MERGES an event at
    exactly last + gap (inclusive horizon — pinned here empirically), and
    the custom sessionize must agree; an event 1s past the gap splits."""
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2],
            "ts": pd.to_datetime(
                [
                    "2026-01-01 12:00:00",
                    "2026-01-01 12:30:00",  # exactly gap later → merges
                    "2026-01-01 12:00:00",
                    "2026-01-01 12:30:01",  # 1s past the gap → splits
                ]
            ),
            "value": [1.0, 1.0, 1.0, 1.0],
        }
    )
    d = tempfile.mkdtemp(prefix="dbreg_gap_stream_")
    try:
        sdf = spark.createDataFrame(pdf)
        sdf.coalesce(1).write.mode("overwrite").parquet(d)
        from dbreg_spark.streaming.ops import sessionize, sessionize_builtin

        stream1 = spark.readStream.schema(sdf.schema).parquet(d)
        nameb = f"gapb_{uuid.uuid4().hex[:8]}"
        _run_stream(
            sessionize_builtin(stream1, gap="30 minutes", watermark="4 hours"),
            nameb, mode="complete",
        )
        builtin = spark.sql(f"SELECT * FROM {nameb}").toPandas()
        assert len(builtin[builtin["user_id"] == 1]) == 1  # merged
        assert len(builtin[builtin["user_id"] == 2]) == 2  # split
        stream2 = spark.readStream.schema(sdf.schema).parquet(d)
        namec = f"gapc_{uuid.uuid4().hex[:8]}"
        _run_stream(sessionize(stream2, gap="30 minutes", watermark="4 hours"), namec)
        custom = spark.sql(f"SELECT * FROM {namec}").toPandas()
        # append mode: only user 2's CLOSED first session is emitted —
        # user 1's exact-gap event merged, leaving nothing closed
        assert set(custom["user_id"]) == {2}
        assert len(custom) == 1 and custom.iloc[0]["n_events"] == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sessionize_late_events_and_event_time_close(spark):
    """Cross-batch out-of-order events: a late run strictly before the open
    session becomes its own emitted session (never silently folded into a
    later session), and the open session closes on the WATERMARK passing
    last + gap (event time), not wall clock."""
    from dbreg_spark.streaming.ops import sessionize

    d = tempfile.mkdtemp(prefix="dbreg_late_stream_")
    try:
        schema = None
        batches = [
            # batch 1: the open session 12:00-12:05
            pd.DataFrame({"user_id": [1, 1],
                          "ts": pd.to_datetime(["2026-01-01 12:00:00", "2026-01-01 12:05:00"]),
                          "value": [1.0, 1.0]}),
            # batch 2: a LATE event at 10:30 (inside the 4h watermark),
            # disjoint from [12:00-gap, ...] → its own session
            pd.DataFrame({"user_id": [1],
                          "ts": pd.to_datetime(["2026-01-01 10:30:00"]),
                          "value": [5.0]}),
            # batch 3: another user far later → watermark passes 12:35,
            # closing user 1's open session by event-time timeout
            pd.DataFrame({"user_id": [2],
                          "ts": pd.to_datetime(["2026-01-01 20:00:00"]),
                          "value": [9.0]}),
        ]
        for i, b in enumerate(batches):
            sdf = spark.createDataFrame(b)
            schema = sdf.schema
            sdf.coalesce(1).write.mode("append").parquet(d)
            # distinct mtimes so maxFilesPerTrigger=1 replays in order
            import time as _time

            _time.sleep(1.1)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        name = f"late_{uuid.uuid4().hex[:8]}"
        _run_stream(sessionize(stream, gap="30 minutes", watermark="4 hours"), name)
        got = (
            spark.sql(f"SELECT * FROM {name}")
            .toPandas()
            .sort_values("session_start")
            .reset_index(drop=True)
        )
        u1 = got[got["user_id"] == 1].reset_index(drop=True)
        assert len(u1) == 2
        assert u1.iloc[0]["session_start"] == pd.Timestamp("2026-01-01 10:30:00")
        assert u1.iloc[0]["n_events"] == 1 and u1.iloc[0]["total_value"] == 5.0
        # the 12:00 session closed by event-time timeout with correct stats
        assert u1.iloc[1]["session_start"] == pd.Timestamp("2026-01-01 12:00:00")
        assert u1.iloc[1]["session_end"] == pd.Timestamp("2026-01-01 12:05:00")
        assert u1.iloc[1]["n_events"] == 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sessionize_builtin(spark, tables):
    from dbreg_spark.streaming.ops import sessionize_builtin

    rows = []
    base = pd.Timestamp("2026-01-01 00:00:00")
    for u in [1, 2]:
        for i in range(5):
            rows.append((u, base + pd.Timedelta(seconds=10 * i), 1.0))
        for i in range(3):
            rows.append((u, base + pd.Timedelta(hours=2, seconds=10 * i), 2.0))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    d = tempfile.mkdtemp(prefix="dbreg_sessb_stream_")
    try:
        sdf = spark.createDataFrame(pdf)
        sdf.coalesce(1).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(sdf.schema).parquet(d)
        out = sessionize_builtin(stream, gap="30 minutes", watermark="4 hours")
        name = f"sessb_{uuid.uuid4().hex[:8]}"
        # append mode emits a session only after a LATER batch's watermark
        # passes it; a single availableNow batch emits nothing — complete
        # mode surfaces the session grouping itself for the assertion
        _run_stream(out, name, mode="complete")
        got = spark.sql(f"SELECT * FROM {name}").toPandas()
        assert len(got) == 4
        assert sorted(got["n_events"]) == [3, 3, 5, 5]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_csv_json_path_sources(spark, tmp_path):
    """resolve_source dispatches csv/json paths (reference reads csv paths
    via DuckDB auto-detection, README.md:122-127)."""
    from dbreg_spark import dbreg

    pdf = pd.DataFrame({"y": [1.0, 2, 3, 4, 5, 6], "x": [2.0, 4, 5, 4, 5, 7]})
    csv = str(tmp_path / "t.csv")
    pdf.to_csv(csv, index=False)
    m = dbreg("y ~ x", spark=spark, path=csv, strategy="moments")
    # Sxy = Sxx = 13.5 for this data -> slope exactly 1
    assert abs(float(m.coef()["x"]) - 1.0) < 1e-12

    js = str(tmp_path / "t.json")
    pdf.to_json(js, orient="records", lines=True)
    m2 = dbreg("y ~ x", spark=spark, path=js, strategy="moments")
    assert abs(float(m2.coef()["x"]) - float(m.coef()["x"])) < 1e-12


def test_streaming_moments_global(spark, tables, event_stream_dir):
    """Global streaming moments (complete mode) must equal the batch moment
    row, and its solved coefficients the batch dbreg moments fit."""
    import numpy as np

    from dbreg_spark import dbreg
    from dbreg_spark.streaming.ops import coef_from_moments, streaming_moments

    schema = tables["events"].schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    out = streaming_moments(stream, "value ~ user_id")
    name = f"mom_{uuid.uuid4().hex[:8]}"
    _run_stream(out, name, mode="complete")
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    assert len(got) == 1
    beta = coef_from_moments(got.iloc[0], ["user_id"])
    m = dbreg("value ~ user_id", tables["events"], strategy="moments")
    np.testing.assert_allclose(
        beta[["(Intercept)", "user_id"]].to_numpy(),
        m.coef()[["(Intercept)", "user_id"]].to_numpy(),
        rtol=1e-9,
    )


def test_streaming_moments_windowed(spark, tables, event_stream_dir):
    """Per-window moment rows: each emitted window solves to the same
    coefficients as a batch OLS on that window's rows."""
    import numpy as np

    from dbreg_spark.streaming.ops import coef_from_moments, streaming_moments
    from fixtures import ols_fit

    schema = tables["events"].schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    out = streaming_moments(stream, "value ~ user_id", window="1 day", watermark="2 days")
    name = f"momw_{uuid.uuid4().hex[:8]}"
    _run_stream(out, name)
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    assert len(got) >= 3
    pdf = tables["events"].select("ts", "user_id", "value").toPandas()
    row = got.sort_values("window_start").iloc[1]
    lo, hi = row["window_start"], row["window_end"]
    sub = pdf[(pdf["ts"] >= lo) & (pdf["ts"] < hi)]
    X = np.column_stack([np.ones(len(sub)), sub["user_id"].to_numpy(float)])
    beta, _ = ols_fit(X, sub["value"].to_numpy(float))
    got_beta = coef_from_moments(row, ["user_id"])
    np.testing.assert_allclose(
        got_beta[["(Intercept)", "user_id"]].to_numpy(), beta, rtol=1e-8
    )


def test_streaming_moments_fe_bounds(spark, tables, event_stream_dir):
    """1 FE is supported (windowed only); k≥2 is refused; 1 FE without a
    window is refused (unbounded per-level state)."""
    import pytest as _pt

    from dbreg_spark.streaming.ops import streaming_moments

    schema = tables["events"].schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    with _pt.raises(ValueError, match="at most one fixed effect"):
        streaming_moments(
            stream, "value ~ user_id | event_type + device", window="1 day"
        )
    with _pt.raises(ValueError, match="window="):
        streaming_moments(stream, "value ~ user_id | event_type")


def test_streaming_within_moments_1fe_matches_batch_demean(
    spark, tables, event_stream_dir
):
    """The 1-FE online regression (chained two-stage streaming aggregation)
    must reproduce the BATCH demean estimator — coefficient and iid SE —
    on every emitted window, from a replayed stream."""
    import numpy as np

    from dbreg_spark import dbreg
    from dbreg_spark.streaming.ops import (
        streaming_moments,
        within_fit_from_moments,
    )

    schema = tables["events"].schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    out = streaming_moments(
        stream, "value ~ user_id | event_type", window="1 day", watermark="2 days"
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    _run_stream(out, name)
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    assert len(got) >= 3
    ev = tables["events"]
    for _, row in got.sort_values("window_start").head(3).iterrows():
        fit = within_fit_from_moments(row, ["user_id"])
        sub = ev.where(
            (F.col("ts") >= F.lit(row["window_start"]))
            & (F.col("ts") < F.lit(row["window_end"]))
        )
        m = dbreg("value ~ user_id | event_type", sub, strategy="demean")
        np.testing.assert_allclose(
            fit.loc["user_id", "estimate"], float(m.coef()["user_id"]), rtol=1e-8
        )
        np.testing.assert_allclose(
            fit.loc["user_id", "std.error"], float(m.se()["user_id"]), rtol=1e-6
        )


def test_streaming_text_pipeline_and_file_sink(spark, tables):
    """The pipeline column operators (text stats, hash split) compose with
    Structured Streaming unchanged — pure column expressions are
    batch/stream agnostic — and land in a parquet FILE SINK with a
    checkpoint (the production shape; memory sinks are test-only)."""
    from dbreg_spark.operators import sampling, text

    src = tempfile.mkdtemp(prefix="dbreg_docs_src_")
    sink = tempfile.mkdtemp(prefix="dbreg_docs_sink_")
    chk = tempfile.mkdtemp(prefix="dbreg_docs_chk_")
    try:
        docs = tables["documents"]
        docs.repartition(2).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        enriched = sampling.hash_split(
            text.text_stats(stream), {"train": 0.9, "val": 0.1}
        )
        q = (
            enriched.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        back = spark.read.parquet(sink)
        assert back.count() == docs.count()
        want = sampling.hash_split(
            text.text_stats(docs), {"train": 0.9, "val": 0.1}
        ).toPandas().sort_values("doc_id").reset_index(drop=True)
        got = back.toPandas().sort_values("doc_id").reset_index(drop=True)
        assert (got["split"].to_numpy() == want["split"].to_numpy()).all()
        assert (
            got["quality_score"].to_numpy() == want["quality_score"].to_numpy()
        ).all()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)


@pytest.fixture(scope="module")
def docs_stream_dir(spark, tables):
    d = tempfile.mkdtemp(prefix="dbreg_docstream_")
    tables["documents"].repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stateless_text_operators_stream(spark, tables, docs_stream_dir):
    """The per-document quality/scrub stages (text_stats, redact_pii) are
    stateless column transforms, so the SAME operator code runs unchanged
    on a streaming DataFrame — pin that property and that the streamed
    result equals the batch result."""
    from dbreg_spark.operators import text as tx

    schema = tables["documents"].schema
    stream = spark.readStream.schema(schema).parquet(docs_stream_dir)
    out = tx.redact_pii(tx.text_stats(stream).select(
        "doc_id",
        F.concat(
            F.lit("q"), F.col("quality_score").cast("string"),
            F.lit(" mail x@y.io"),
        ).alias("text"),
    ))
    name = f"txt_{uuid.uuid4().hex[:8]}"
    _run_stream(out, name)
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    want = tx.redact_pii(tx.text_stats(tables["documents"]).select(
        "doc_id",
        F.concat(
            F.lit("q"), F.col("quality_score").cast("string"),
            F.lit(" mail x@y.io"),
        ).alias("text"),
    )).toPandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert (got["n_email"] == 1).all()
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_streaming_corpus_stats(spark, tables):
    """Windowed quality monitoring over a doc stream equals the same
    operator applied to the batch frame (documents get synthetic event
    times spread over 3 days)."""
    from dbreg_spark.streaming.ops import streaming_corpus_stats

    docs = tables["documents"].withColumn(
        "ts",
        F.expr(
            "timestamp('2025-03-01 00:00:00') + make_interval(0, 0, 0, 0, 0, 0, doc_id * 2000)"
        ),
    )
    d = tempfile.mkdtemp(prefix="dbreg_qstream_")
    try:
        docs.repartition(4).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(docs.schema).parquet(d)
        out = streaming_corpus_stats(stream, window="1 day", watermark="1 day")
        name = f"q_{uuid.uuid4().hex[:8]}"
        _run_stream(out, name)
        got = (
            spark.sql(f"SELECT * FROM {name}").toPandas()
            .sort_values(["window_start", "source"]).reset_index(drop=True)
        )
        want = (
            streaming_corpus_stats(docs, window="1 day", watermark="1 day")
            .toPandas()
            .sort_values(["window_start", "source"]).reset_index(drop=True)
        )
        # append-mode may withhold windows above the final watermark; all
        # emitted rows must match the batch mirror exactly
        merged = got.merge(
            want, on=["window_start", "source"], suffixes=("", "_want")
        )
        assert len(merged) == len(got) and len(got) > 0
        for c in ("n_docs", "n_null", "total_tokens", "mean_quality"):
            assert (merged[c] == merged[f"{c}_want"]).all(), c
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_volume_anomaly_matches_batch_gate(spark, tables, event_stream_dir):
    """The streaming anomaly scorer must agree EXACTLY with the batch
    events_anomaly gate on every day it closes (same rows-based trailing
    window, same min-history and zero-std rules)."""
    import __spark_entry__ as em
    from dbreg_spark.streaming.ops import streaming_volume_anomaly

    schema = tables["events"].schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    out = streaming_volume_anomaly(stream, watermark="1 day")
    name = f"anom_{uuid.uuid4().hex[:8]}"
    _run_stream(out, name)
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    assert len(got) > 0
    got["day"] = got["day_start"].dt.strftime("%Y-%m-%d")
    want = spark.sql(em._event_anomaly_sql("spark")).toPandas()
    merged = got.merge(
        want, on=["day", "event_type"], suffixes=("", "_want")
    )
    assert len(merged) == len(got)  # every emitted day exists in batch
    assert (merged["n"] == merged["n_want"]).all()
    import numpy as np

    np.testing.assert_allclose(
        merged["zscore"].astype(float),
        merged["zscore_want"].astype(float),
        rtol=1e-9, equal_nan=True,
    )
    assert (merged["is_anomaly"] == merged["is_anomaly_want"]).all()
    # anomaly days exist in the fixture (7 in the batch gate at sf0.01)
    assert want["is_anomaly"].sum() > 0


def test_stream_static_enrich_matches_batch(spark, tables, event_stream_dir):
    """Stream-static broadcast enrichment: a streamed events source joined
    to the static nation dim equals the same join on the batch frame, and
    unsupported join types are refused."""
    from dbreg_spark.streaming.ops import enrich

    dim = tables["nation"]
    ev = tables["events"]
    stream = spark.readStream.schema(ev.schema).parquet(event_stream_dir)

    def _do(df):
        return enrich(
            df.withColumn("__nk", (F.col("user_id") % 25).cast("int")),
            dim.withColumnRenamed("n_nationkey", "__nk"),
            on="__nk",
            how="inner",
        ).select("event_id", "event_type", "n_name")

    name = f"enr_{uuid.uuid4().hex[:8]}"
    _run_stream(_do(stream), name)
    got = (
        spark.sql(f"SELECT * FROM {name}").toPandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    want = _do(ev).toPandas().sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["n_name"] == want["n_name"]).all()
    # dim side is broadcast: no shuffle of the stream in the batch plan
    plan = _do(ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    with pytest.raises(ValueError, match="inner/left"):
        enrich(stream, dim, on="event_id", how="full")


def test_stateless_web_json_operators_stream(spark, tables, docs_stream_dir):
    """c4_filter, quality_classify, and json_fields are stateless column
    transforms — the same operator code runs unchanged on a streaming
    DataFrame and equals the batch result."""
    from dbreg_spark.operators import semistruct, text as tx, web

    schema = tables["documents"].schema
    stream = spark.readStream.schema(schema).parquet(docs_stream_dir)

    def _chain(df):
        enriched = df.withColumn(
            "text",
            F.expr(
                "concat('A good sentence about ', source, ' here.', chr(10), text)"
            ),
        ).withColumn(
            "props", F.concat(F.lit('{"k": '), F.col("doc_id") % 9, F.lit("}"))
        )
        c4 = web.c4_filter(enriched).select(
            "doc_id", "source", "props",
            F.col("clean_text").alias("text"), "n_lines_kept", "keep",
        )
        clf = tx.quality_classify(c4).select(
            "doc_id", "props", "n_lines_kept", "clf_score"
        )
        return semistruct.json_fields(
            clf, [("k", "$.k", "BIGINT")], col="props", drop_raw=True
        )

    name = f"wjs_{uuid.uuid4().hex[:8]}"
    _run_stream(_chain(stream), name)
    got = (
        spark.sql(f"SELECT * FROM {name}").toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        _chain(tables["documents"]).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_quality_classify_scores_stream(spark, tables, docs_stream_dir):
    """Model-based corpus scoring (quality_classify) is a pure projection
    (pinned by test_plans), so the trained classifier scores a LIVE
    document stream with the same code path — pin that the streamed scores
    equal the batch scores, including with non-default trained weights."""
    from dbreg_spark.operators.text import quality_classify

    w = {"stopword_ratio": 2.0, "mean_token_len": -0.3, "log_tokens": 0.25}
    schema = tables["documents"].schema
    stream = spark.readStream.schema(schema).parquet(docs_stream_dir)
    out = quality_classify(stream, weights=w, bias=0.2).select(
        "doc_id", "clf_score", "clf_keep"
    )
    name = f"clf_{uuid.uuid4().hex[:8]}"
    _run_stream(out, name)
    got = (
        spark.sql(f"SELECT * FROM {name}").toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        quality_classify(tables["documents"], weights=w, bias=0.2)
        .select("doc_id", "clf_score", "clf_keep").toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want)
    assert got["clf_keep"].nunique() > 1  # threshold actually separates


def test_glm_predict_scores_stream(spark):
    """Train once, score forever: a fitted FE-Poisson model's predict()
    is a projection plus a stream-static LEFT join against the recovered
    fixef table, so the same model object scores a LIVE stream — pin that
    streamed fits equal batch fits row-for-row."""
    from dbreg_spark.glm import dbglm

    df = (
        spark.range(2000)
        .select(
            F.col("id"),
            (F.col("id") % 7).cast("string").alias("g"),
            (F.pmod(F.hash("id"), F.lit(100)) / 50.0 - 1.0).alias("x1"),
        )
        .withColumn(
            "y",
            F.floor(
                F.exp(0.3 * F.col("x1"))
                * F.pmod(F.hash(F.col("id") + 1), F.lit(4))
            ).cast("double"),
        )
    )
    m = dbglm("y ~ x1 | g", df, family="poisson")
    d = tempfile.mkdtemp(prefix="dbreg_glmstream_")
    try:
        df.write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(df.schema).parquet(d)
        scored = m.predict(stream).select("id", "fit")
        name = f"glmp_{uuid.uuid4().hex[:8]}"
        _run_stream(scored, name)
        got = (
            spark.sql(f"SELECT * FROM {name}").toPandas()
            .sort_values("id").reset_index(drop=True)
        )
        want = (
            m.predict(df).select("id", "fit").toPandas()
            .sort_values("id").reset_index(drop=True)
        )
        assert len(got) == 2000
        pd.testing.assert_frame_equal(got, want)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_moments_weighted(spark, tables, event_stream_dir):
    """Weighted streaming moments: the emitted row carries the WLS
    sufficient statistics and solves to the batch weighted fit."""
    import numpy as np
    import pyspark.sql.functions as F

    from dbreg_spark import dbreg
    from dbreg_spark.streaming.ops import coef_from_moments, streaming_moments

    schema = tables["events"].schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(event_stream_dir)
        .withColumn("w", F.pmod(F.col("event_id"), F.lit(5)) + F.lit(1.0))
    )
    out = streaming_moments(stream, "value ~ user_id", weights="w")
    name = f"wmom_{uuid.uuid4().hex[:8]}"
    _run_stream(out, name, mode="complete")
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    assert len(got) == 1 and "sum_w" in got.columns
    beta = coef_from_moments(got.iloc[0], ["user_id"])
    batch = tables["events"].withColumn(
        "w", F.pmod(F.col("event_id"), F.lit(5)) + F.lit(1.0)
    )
    m = dbreg("value ~ user_id", batch, strategy="moments", weights="w")
    np.testing.assert_allclose(
        beta[["(Intercept)", "user_id"]].to_numpy(),
        m.coef()[["(Intercept)", "user_id"]].to_numpy(),
        rtol=1e-9,
    )


def test_streaming_moments_weighted_fe_refused(spark, tables, event_stream_dir):
    import pytest as _pt

    from dbreg_spark.streaming.ops import streaming_moments

    schema = tables["events"].schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    with _pt.raises(ValueError, match="no-FE"):
        streaming_moments(
            stream, "value ~ user_id | event_type", window="1 day",
            weights="user_id",
        )


def test_streaming_classifier_metrics(spark, tables, event_stream_dir):
    """Windowed classifier monitor: stream result equals the batch windowed
    aggregation, and the global sums match evaluate.classifier_metrics."""
    import numpy as np
    import pyspark.sql.functions as F

    from dbreg_spark.operators.evaluate import classifier_metrics
    from dbreg_spark.streaming.ops import streaming_classifier_metrics

    schema = tables["events"].schema

    def scored(d):
        return d.withColumn("lab", (F.col("value") > 0).cast("double")).withColumn(
            "p",
            F.least(
                F.greatest(F.pmod(F.col("event_id"), F.lit(100)) / 100.0, F.lit(0.0)),
                F.lit(1.0),
            ),
        )

    stream = scored(spark.readStream.schema(schema).parquet(event_stream_dir))
    out = streaming_classifier_metrics(stream, "lab", "p", window="1 day", watermark="2 days")
    name = f"scm_{uuid.uuid4().hex[:8]}"
    _run_stream(out, name, mode="append")
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    assert len(got) > 1 and (got["n"] > 0).all()
    # append mode withholds the last (unexpired) window — compare the
    # EMITTED windows against the identical batch windowed aggregation
    from dbreg_spark.streaming.ops import streaming_classifier_metrics as scm

    batch = scored(tables["events"])
    ref = scm(batch, "lab", "p", window="1 day", watermark="2 days").toPandas()
    got["ws"] = got["window"].apply(lambda w: w["start"])
    ref["ws"] = ref["window"].apply(lambda w: w["start"])
    j = got.merge(ref, on="ws", suffixes=("", "_b"))
    assert len(j) == len(got)
    for c in ("n", "n_pos", "tp", "fp", "tn", "fn"):
        assert (j[c] == j[f"{c}_b"]).all(), c
    np.testing.assert_allclose(j["log_loss"], j["log_loss_b"], rtol=1e-9)
    np.testing.assert_allclose(j["brier"], j["brier_b"], rtol=1e-9)
    # and the emitted windows' totals match the batch evaluator on the
    # same row subset
    emitted = sorted(got["ws"])
    sub = batch.where(
        F.date_trunc("day", F.col("ts")).isin([str(w) for w in emitted])
    )
    refm = classifier_metrics(sub, "lab", "p").toPandas().iloc[0]
    assert int(got["n"].sum()) == int(refm["n"])
    assert int(got["tp"].sum()) == int(refm["tp"])
