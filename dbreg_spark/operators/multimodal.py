"""Multimodal-column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The container ships no image/audio codecs, so the actual decode step is
STUBBED: :func:`decode_features` computes a deterministic fake feature
vector from the bytes (seeded by content hash) unless a real decoder is
injected. Everything around the stub — schema, batch iteration, partition
sizing, output contract — is the real Spark plumbing a production decoder
would use (mapInPandas keeps each Arrow batch bounded, so executor memory
scales with batch size, not partition size).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def synthesize_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media-shaped table from the documents fixture: the text bytes
    stand in for encoded image/audio payloads (deterministic)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        (F.length(text_col) % 640 + 64).cast("int").alias("width"),
        (F.length(text_col) % 480 + 48).cast("int").alias("height"),
        (F.length(text_col).cast("long") * 10).alias("duration_ms"),
    )


def _make_fake_decoder():
    """Deterministic stand-in for a real decoder: md5-integer PRNG features.

    Feature j is ``(md5int(content || '|' || j) % 2000001 − 10⁶) / 10⁶`` —
    pure integer arithmetic on the first 15 hex chars of md5 (the same
    60-bit hash convention as functions/xdialect.md5int), so the exact
    values are reproducible in ANSI SQL on any engine with md5
    (:func:`decode_features_sql` is the DuckDB twin, making the correctness
    gate hash-matched instead of rows-only).

    A real deployment replaces this with e.g. PIL/torchvision decode — the
    Spark-side contract (bytes in, fixed-dim float vector out) is identical.
    Defined as a *nested* function so cloudpickle serializes it by value:
    executors then don't need dbreg_spark importable on their PYTHONPATH.
    """

    def fake_decode(content, dim):
        import hashlib as _h

        import numpy as _np

        if content is None:
            return _np.zeros(dim, dtype=_np.float64)
        base = bytes(content) + b"|"
        vals = [
            (
                int(_h.md5(base + str(j).encode()).hexdigest()[:15], 16)
                % 2000001
                - 1000000
            )
            / 1000000.0
            for j in range(dim)
        ]
        return _np.asarray(vals, dtype=_np.float64)

    return fake_decode


def decode_features(
    df: DataFrame,
    dim: int = 16,
    decoder: Callable[[bytes, int], np.ndarray] | None = None,
    batch_hint: int = 1024,
) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.

    ``decoder(bytes, dim) -> np.ndarray`` is called per item inside
    mapInPandas. Default is the deterministic stub; pass a real decoder in
    production (raising NotImplementedError here would be the honest stub,
    but a deterministic fake keeps the plumbing testable end-to-end).
    ``batch_hint`` bounds how many items are decoded and held per yielded
    frame: incoming Arrow batches (sized by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``, default 10k) are
    re-chunked to at most this many rows, so peak executor memory per
    task is ~batch_hint × decoded-item size regardless of the Arrow batch
    or partition size.
    """
    dec = decoder or _make_fake_decoder()
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
            T.StructField("n_bytes", T.LongType(), False),
        ]
    )
    hint = max(1, int(batch_hint))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for lo in range(0, len(pdf), hint):
                chunk = pdf.iloc[lo : lo + hint]
                feats = [dec(c, dim).tolist() for c in chunk["content"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].astype("int64"),
                        "kind": chunk["kind"],
                        "features": feats,
                        "n_bytes": chunk["content"].map(
                            lambda b: len(b) if b is not None else 0
                        ).astype("int64"),
                    }
                )

    return df.select("media_id", "kind", "content").mapInPandas(batches, out_schema)


def decode_features_sql(
    table: str, dim: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`synthesize_media` → :func:`decode_features`
    with the default stub decoder: the md5-integer PRNG features are exact
    integer arithmetic, so Spark (Python stub) and DuckDB agree bit-for-bit
    (both compute k/10⁶ for the same integer k)."""
    # NULL text → zero features / 0 bytes, matching the Python stub's
    # explicit None branch (a bare md5(NULL) would propagate NULLs)
    feats = ", ".join(
        f"CASE WHEN {text_col} IS NULL THEN 0.0 ELSE "
        f"((('0x' || substr(md5({text_col} || '|{j}'), 1, 15))::BIGINT "
        f"% 2000001) - 1000000) / 1000000.0 END"
        for j in range(dim)
    )
    return f"""
SELECT {id_col} AS media_id,
  CASE WHEN {id_col} % 3 = 0 THEN 'image'
       WHEN {id_col} % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
  [{feats}] AS features,
  CAST(COALESCE(octet_length(encode({text_col})), 0) AS BIGINT) AS n_bytes
FROM {table}
"""


def decode_features_exploded_sql(
    table: str, dim: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """Row-per-feature twin of :func:`decode_features_sql` (the correctness
    gate uses this shape: scalar columns compare engine-to-engine without
    array-encoding ambiguity)."""
    vals = ", ".join(f"({j})" for j in range(dim))
    feat = (
        f"CASE WHEN d.{text_col} IS NULL THEN 0.0 ELSE "
        f"((('0x' || substr(md5(d.{text_col} || '|' || "
        f"CAST(j.feat_idx AS VARCHAR)), 1, 15))::BIGINT % 2000001) - 1000000) "
        f"/ 1000000.0 END"
    )
    return f"""
SELECT d.{id_col} AS media_id,
  CASE WHEN d.{id_col} % 3 = 0 THEN 'image'
       WHEN d.{id_col} % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
  CAST(COALESCE(octet_length(encode(d.{text_col})), 0) AS BIGINT) AS n_bytes,
  j.feat_idx,
  {feat} AS feat_val
FROM {table} d, (VALUES {vals}) j(feat_idx)
"""


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize: real pixel work requires a codec — NOT available in
    this environment. The plumbing (schema pass-through with updated
    metadata) is real; content transformation raises if forced."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raise NotImplementedError(
                "resize requires an image codec (PIL/opencv) not present in "
                "this container; inject a decoder or run where codecs exist"
            )
            yield pdf  # pragma: no cover

    return df.mapInPandas(batches, df.schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes per-item frame timestamps as an
    array column (pure column math — the decode of those frames is the
    stubbed step). Samples every timestamp strictly inside the duration:
    0, every_ms, …, up to ceil(duration/every)−1 frames (a 1999 ms video
    at 1000 ms sampling yields [0, 1000], not just [0])."""
    last_idx = (
        f"greatest(cast((duration_ms - 1) / {every_ms} as int), 0)"
    )
    return df.where(F.col("kind") == "video").select(
        "media_id",
        F.expr(
            f"transform(sequence(0, {last_idx}), i -> i * {every_ms})"
        ).alias("frame_ts_ms"),
    )
