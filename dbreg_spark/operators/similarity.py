"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_topk` — exact brute-force top-k: broadcast the (small) query
  set against the corpus, cosine via ``zip_with``/``aggregate`` fold
  expressions (JVM-side), per-query ``row_number`` window for the top-k.
  The corpus is never shuffled; the window partitions by query id.
- :func:`hyperplane_lsh_topk` — approximate: bucket corpus and queries by
  random-hyperplane sign bits (literals baked into the plan, seeded), join
  on bucket, rank within bucket. The scale path: candidate set per query is
  the bucket, not the corpus.
- :func:`ivf_topk` — IVF-style: k-means centroids fitted on a driver-side
  sample (numpy), corpus assigned to nearest centroid (Arrow-batched
  X·Cᵀ argmin, see :func:`_assign_cells`), queries probe the nearest
  ``nprobe`` centroids.
- :func:`embedding_neardup_pairs` — cosine near-duplicate pairs via the
  same hyperplane bucketing.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.xdialect import DUCK, SPARK, X


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (p, q) -> p * q), 0D, (acc, v) -> acc + v)"


def _norm(a: str) -> str:
    return f"sqrt({_dot(a, a)})"


def _cos_spark(a: str, b: str) -> str:
    return f"({_dot(a, b)} / nullif({_norm(a)} * {_norm(b)}, 0D))"




def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: returns (query_id, rank, vec_id, cosine)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__cv"))
    joined = c.crossJoin(F.broadcast(q.withColumn("__qv", F.col("__qv").cast("array<double>"))))
    scored = joined.select(
        "query_id",
        id_col,
        F.expr(_cos_spark("__cv", "__qv")).alias("cosine"),
    ).where(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, F.round("cosine", 6).alias("cosine"))
    )


def cosine_topk_sql(
    table: str,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH c AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}),
q AS (SELECT {id_col} AS query_id, v AS qv FROM c WHERE {id_col} IN ({ids})),
scored AS (
  SELECT q.query_id, c.{id_col},
         list_cosine_similarity(c.v, q.qv) AS cosine
  FROM c CROSS JOIN q
  WHERE q.query_id <> c.{id_col}
),
ranked AS (
  SELECT query_id, {id_col}, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, {id_col} ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, {id_col}, ROUND(cosine, 6) AS cosine
FROM ranked WHERE rank <= {k}
"""


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _bucket_expr(vec_col: str, planes: np.ndarray) -> str:
    """Sign-bit bucket id: Σ 2^j · 1[v·h_j > 0], with h_j as literal arrays."""
    bits = []
    for j, h in enumerate(planes):
        # repr(float(v)): numpy 2.x scalar repr is "np.float64(0.5)" —
        # unparseable SQL — so always go through the Python float
        arr = "array(" + ", ".join(f"{repr(float(v))}D" for v in h) + ")"
        bits.append(
            f"CASE WHEN {_dot(vec_col, arr)} > 0D THEN {1 << j} ELSE 0 END"
        )
    return "(" + " + ".join(bits) + ")"


def _band_bucket_exprs(
    vec_col: str, dim: int, n_planes: int, n_bands: int, seed: int
) -> list[str]:
    """One sign-bit bucket expression per band (b bands × r planes, all
    drawn from one seeded stream so Spark and DuckDB agree)."""
    planes = _hyperplanes(dim, n_planes * n_bands, seed)
    return [
        _bucket_expr(vec_col, planes[bnd * n_planes : (bnd + 1) * n_planes])
        for bnd in range(n_bands)
    ]


def auto_planes(n_rows: int, target_bucket: int = 64) -> int:
    """Planes per band sized to the corpus: 2^r buckets with ~target_bucket
    expected occupancy, min 4. At n=10⁹ and target 64 this is r=24 —
    in-bucket candidate volume stays ~n·target instead of n²/2^r."""
    import math

    return max(4, math.ceil(math.log2(max(n_rows, 2) / target_bucket)))


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int | None = None,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via banded (OR-construction) hyperplane LSH: a
    candidate is scored when it shares ANY of the ``n_bands`` sign-bucket
    tables with the query. More planes per band ⇒ smaller buckets (less
    candidate volume); more bands ⇒ recall recovered (miss probability
    (1−p^r)^b). ``n_planes=None`` sizes r to the corpus via
    :func:`auto_planes`. The plan shuffles only (band, bucket, id) plus the
    in-bucket candidates; duplicate candidates across bands are deduped by
    a (query, id) max-aggregation before ranking."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    if n_planes is None:
        n_planes = auto_planes(corpus.count())
    bexprs = _band_bucket_exprs("__v", dim, n_planes, n_bands, seed)
    qexprs = _band_bucket_exprs("__qv", dim, n_planes, n_bands, seed)
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).select(
        F.col(id_col),
        "__v",
        F.posexplode(F.array(*[F.expr(e) for e in bexprs])).alias("band", "bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).select(
        "query_id",
        "__qv",
        F.posexplode(F.array(*[F.expr(e) for e in qexprs])).alias("band", "bucket"),
    )
    joined = c.join(F.broadcast(q), ["band", "bucket"]).where(
        F.col("query_id") != F.col(id_col)
    )
    scored = (
        joined.select(
            "query_id", id_col, F.expr(_cos_spark("__v", "__qv")).alias("cosine")
        )
        .groupBy("query_id", id_col)
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, F.round("cosine", 6).alias("cosine"))
    )


def _duck_plane_lit(h: np.ndarray) -> str:
    return "[" + ", ".join(repr(float(v)) for v in h) + "]::DOUBLE[]"


def _bucket_expr_duck(vec_col: str, planes: np.ndarray) -> str:
    """DuckDB twin of :func:`_bucket_expr` — list_inner_product sums in the
    same element order as the Spark fold, so the sign bits agree."""
    bits = [
        f"CASE WHEN list_inner_product({vec_col}, {_duck_plane_lit(h)}) > 0 "
        f"THEN {1 << j} ELSE 0 END"
        for j, h in enumerate(planes)
    ]
    return "(" + " + ".join(bits) + ")"


def _band_bucket_exprs_duck(
    vec_col: str, dim: int, n_planes: int, n_bands: int, seed: int
) -> list[str]:
    planes = _hyperplanes(dim, n_planes * n_bands, seed)
    return [
        _bucket_expr_duck(vec_col, planes[bnd * n_planes : (bnd + 1) * n_planes])
        for bnd in range(n_bands)
    ]


def hyperplane_lsh_topk_sql(
    table: str,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    n_bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    bexprs = _band_bucket_exprs_duck("v", dim, n_planes, n_bands, seed)
    band_selects = "\nUNION ALL\n".join(
        f"SELECT {id_col}, v, {bi} AS band, {be} AS bucket FROM c"
        for bi, be in enumerate(bexprs)
    )
    return f"""
WITH c AS (
  SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}
),
cb AS (
{band_selects}
),
q AS (SELECT {id_col} AS query_id, v AS qv, band, bucket FROM cb WHERE {id_col} IN ({ids})),
scored AS (
  SELECT q.query_id, cb.{id_col}, MAX(list_cosine_similarity(cb.v, q.qv)) AS cosine
  FROM cb JOIN q USING (band, bucket) WHERE q.query_id <> cb.{id_col}
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, {id_col}, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, {id_col} ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, {id_col}, ROUND(cosine, 6) AS cosine
FROM ranked WHERE rank <= {k}
"""


def embedding_neardup_pairs_sql(
    table: str,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
    seed: int = 42,
) -> str:
    bexprs = _band_bucket_exprs_duck("v", dim, n_planes, n_bands, seed)
    band_selects = "\nUNION ALL\n".join(
        f"SELECT {id_col}, v, {bi} AS band, {be} AS bucket FROM c"
        for bi, be in enumerate(bexprs)
    )
    cap = ""
    if max_bucket is not None:
        cap = (
            f",\ncapped AS (\n  SELECT cb.* FROM cb\n"
            f"  JOIN (SELECT band, bucket FROM cb GROUP BY band, bucket "
            f"HAVING COUNT(*) <= {max_bucket}) ok USING (band, bucket)\n)"
        )
    src = "capped" if max_bucket is not None else "cb"
    return f"""
WITH c AS (
  SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}
),
cb AS (
{band_selects}
){cap}
SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b,
       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM {src} a JOIN {src} b
  ON a.band = b.band AND a.bucket = b.bucket AND a.{id_col} < b.{id_col}
WHERE list_cosine_similarity(a.v, b.v) >= {threshold}
"""


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_cap: int = 100_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Driver-side Lloyd's k-means on a sampled corpus (numpy only)."""
    n = corpus.count()
    frac = min(1.0, sample_cap / max(n, 1))
    # pure fraction, no limit(): limit takes rows in partition order and
    # would bias the k-means sample toward leading partitions (see
    # binning.compute_breaks); expected size is sample_cap ± 3·sqrt(cap)
    pdf = corpus.select(vec_col).sample(fraction=frac, seed=seed).toPandas()
    Xm = np.array(pdf[vec_col].tolist(), dtype=float)
    rng = np.random.default_rng(seed)
    cents = Xm[rng.choice(len(Xm), size=min(n_centroids, len(Xm)), replace=False)]
    xx = (Xm * Xm).sum(axis=1)  # quadratic form: O(n·k) memory, never the
    for _ in range(iters):      # (n, k, dim) broadcast tensor (~GBs at cap)
        d2 = xx[:, None] - 2.0 * Xm @ cents.T + (cents * cents).sum(axis=1)[None, :]
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                cents[c] = Xm[mask].mean(axis=0)
    return cents


def fixed_ivf_centroids(n_centroids: int = 8, dim: int = 64, seed: int = 202) -> np.ndarray:
    """Deterministic centroid fixture (seeded, data-independent) so the
    DuckDB oracle can replay the exact same cell assignment — flips the
    ``similarity_ivf_topk`` gate from rows-only to hash-matched."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_centroids, dim))


def _assign_cells(
    corpus: DataFrame,
    cents: np.ndarray,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, __v, cell) with cell = 1-based index of the nearest centroid,
    via Arrow-batched X·Cᵀ argmin in ``mapInPandas`` — interpreted
    quadratic-form expressions measured 90 s at 500k rows × 128 centroids
    where BLAS takes ~1 s. numpy argmin takes the FIRST minimum, the same
    tie-break as ``array_position(arr, array_min(arr))`` and the DuckDB
    twin's ``ORDER BY d2, cell``; d² differs from the sequential-fold form
    only in the last ulp, so assignments agree unless two centroids are
    equidistant to ~1e-12 (measured margin on the gate fixture: ~1e-2).
    Rows with a NULL vector keep a NULL cell."""
    import pandas as pd
    from pyspark.sql import types as T

    CC = np.ascontiguousarray(np.asarray(cents, dtype=float))
    ccn = (CC * CC).sum(axis=1)

    def assign(batches):
        for pdf in batches:
            ok = pdf["__v"].notna()
            cell = np.full(len(pdf), np.nan)
            if ok.any():
                Xm = np.array(pdf.loc[ok, "__v"].tolist(), dtype=float)
                d2 = (
                    (Xm * Xm).sum(axis=1)[:, None]
                    - 2.0 * Xm @ CC.T
                    + ccn[None, :]
                )
                cell[ok.to_numpy()] = d2.argmin(axis=1) + 1.0  # 1-based
            out = pdf[[id_col, "__v"]].copy()
            out["cell"] = pd.array(
                [None if np.isnan(v) else int(v) for v in cell],
                dtype="Int64",
            )
            yield out

    id_dt = corpus.schema[id_col].dataType
    return corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).mapInPandas(
        assign,
        T.StructType(
            [
                T.StructField(id_col, id_dt),
                T.StructField("__v", T.ArrayType(T.DoubleType())),
                T.StructField("cell", T.LongType()),
            ]
        ),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-style ANN: corpus partitioned by nearest centroid; each query
    scores only the ``nprobe`` nearest partitions. ``centroids`` overrides
    the sampled-kmeans fit (e.g. :func:`fixed_ivf_centroids` for the
    deterministic gate)."""
    cents = (
        np.asarray(centroids, dtype=float)
        if centroids is not None
        else kmeans_centroids(corpus, n_centroids, vec_col, seed=seed)
    )

    c = _assign_cells(corpus, cents, id_col, vec_col)

    # query → nprobe nearest cells (computed on the driver per query set,
    # same quadratic-form arithmetic as the corpus assignment)
    qpdf = queries.select(id_col, vec_col).toPandas()
    qv = np.array(qpdf[vec_col].tolist(), dtype=float)
    d2 = (qv * qv).sum(axis=1)[:, None] - 2.0 * qv @ cents.T + (cents * cents).sum(axis=1)[None, :]
    probe_rows = []
    for i, qid in enumerate(qpdf[id_col]):
        for cell in np.argsort(d2[i], kind="stable")[:nprobe]:
            probe_rows.append((int(qid), int(cell) + 1, qv[i].tolist()))
    spark = corpus.sparkSession
    q = spark.createDataFrame(probe_rows, ["query_id", "cell", "__qv"])
    joined = c.join(F.broadcast(q), "cell").where(F.col("query_id") != F.col(id_col))
    scored = joined.select(
        "query_id", id_col, F.expr(_cos_spark("__v", "__qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, F.round("cosine", 6).alias("cosine"))
    )


def ivf_topk_sql(
    table: str,
    query_ids: list[int],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`ivf_topk` with fixed centroids: cell assignment
    by ROW_NUMBER over the same quadratic-form distances, probe selection in
    SQL (ORDER BY d2, cell — matching the stable argsort tie-break)."""
    cents = np.asarray(centroids, dtype=float)
    ids = ", ".join(str(i) for i in query_ids)
    vals = ",\n    ".join(
        f"({i + 1}, {_duck_plane_lit(c)}, {float(np.dot(c, c))!r})"
        for i, c in enumerate(cents)
    )
    d2 = "(list_inner_product(%s, %s) - 2 * list_inner_product(%s, cents.cv) + cents.cc)"
    d2_corpus = d2 % ("c.v", "c.v", "c.v")
    d2_query = d2 % ("q.v", "q.v", "q.v")
    return f"""
WITH c AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}),
cents AS (SELECT * FROM (VALUES
    {vals}) t(cell, cv, cc)),
assigned AS (
  SELECT {id_col}, v, cell FROM (
    SELECT c.{id_col}, c.v, cents.cell,
           ROW_NUMBER() OVER (PARTITION BY c.{id_col}
             ORDER BY {d2_corpus} ASC, cents.cell ASC) AS rn
    FROM c CROSS JOIN cents
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.{id_col} AS query_id, q.v AS qv, cents.cell,
           ROW_NUMBER() OVER (PARTITION BY q.{id_col}
             ORDER BY {d2_query} ASC, cents.cell ASC) AS rn
    FROM c q CROSS JOIN cents WHERE q.{id_col} IN ({ids})
  ) WHERE rn <= {nprobe}
),
scored AS (
  SELECT p.query_id, a.{id_col}, list_cosine_similarity(a.v, p.qv) AS cosine
  FROM assigned a JOIN probes p USING (cell)
  WHERE p.query_id <> a.{id_col}
),
ranked AS (
  SELECT query_id, {id_col}, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, {id_col} ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, {id_col}, ROUND(cosine, 6) AS cosine
FROM ranked WHERE rank <= {k}
"""


def _bucket_candidates(
    grouped: DataFrame,
    group_cols: list[str],
    id_col: str,
    threshold: float,
    vec_alias: str = "__v",
    slack: float = 1e-9,
) -> DataFrame:
    """Candidate (id_a, id_b, __va, __vb) pairs with BLAS cosine ≥
    ``threshold − slack``, computed per group via applyInPandas (blocked
    matmul, one group per task). The slack makes the prefilter a strict
    superset of any sequential-fold ≥ threshold comparison, so an exact
    recompute downstream is authoritative; vectors ride along so no
    re-join against the corpus is needed."""
    import pandas as pd
    from pyspark.sql import types as T

    thr = float(threshold) - float(slack)

    def cands(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf[vec_alias].notna()].sort_values(id_col)
        m = len(pdf)
        empty = pd.DataFrame(
            {"id_a": pdf[id_col][:0], "id_b": pdf[id_col][:0],
             "__va": pdf[vec_alias][:0], "__vb": pdf[vec_alias][:0]}
        )
        if m < 2:
            return empty
        Xm = np.array(pdf[vec_alias].tolist(), dtype=float)
        ids = pdf[id_col].to_numpy()
        vecs = pdf[vec_alias].to_numpy()
        nrm = np.sqrt((Xm * Xm).sum(axis=1))
        nrm[nrm == 0.0] = np.inf
        outs = []
        cols = np.arange(m)[None, :]
        for lo in range(0, m, 1024):
            hi = min(lo + 1024, m)
            sim = (Xm[lo:hi] @ Xm.T) / (nrm[lo:hi, None] * nrm[None, :])
            ii, jj = np.nonzero(
                (sim >= thr) & (cols > np.arange(lo, hi)[:, None])
            )
            if len(ii):
                ii = ii + lo
                outs.append(
                    pd.DataFrame(
                        {"id_a": ids[ii], "id_b": ids[jj],
                         "__va": vecs[ii], "__vb": vecs[jj]}
                    )
                )
        return pd.concat(outs) if outs else empty

    id_dt = grouped.schema[id_col].dataType
    vec_dt = T.ArrayType(T.DoubleType())
    schema = T.StructType(
        [
            T.StructField("id_a", id_dt),
            T.StructField("id_b", id_dt),
            T.StructField("__va", vec_dt),
            T.StructField("__vb", vec_dt),
        ]
    )
    return grouped.groupBy(*group_cols).applyInPandas(cands, schema)


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = None,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate embedding pairs (cosine ≥ threshold) via banded
    (OR-construction) hyperplane LSH + in-bucket verification.

    Scale shape: ``n_bands`` independent bucket tables of 2^``n_planes``
    cells each — the in-bucket self-join volume is Σ_band Σ_bucket m² with
    m ≈ n/2^r per bucket, i.e. ~b·n²/2^r, tuned by sizing r to the corpus
    (``n_planes=None`` → :func:`auto_planes`). A near-dup pair at cosine c
    is missed by all bands with probability (1−p^r)^b, p = 1−arccos(c)/π.
    ``max_bucket`` drops pathological hot buckets (skew guard) from
    candidate generation — pairs in them are still found via their other
    bands. Duplicate candidates across bands are removed by DISTINCT after
    scoring (cosine is band-independent).

    The in-bucket pairwise step runs as one blocked BLAS matmul per
    (band, bucket) group via grouped ``applyInPandas`` (per-pair SQL
    expressions evaluate interpreted — measured ~30k pairs/core-s vs
    ~1e8 for BLAS). Cross-engine exactness is preserved: BLAS only
    PREFILTERS with 1e-9 slack (|numpy − sequential fold| ≪ 1e-9), and
    the authoritative cosine — the same sequential-fold expression the
    DuckDB twin evaluates — is recomputed on the surviving candidates,
    which the prefilter passes through with their vectors (no re-join)."""
    dim = len(corpus.select(vec_col).first()[0])
    if n_planes is None:
        n_planes = auto_planes(corpus.count())
    bexprs = _band_bucket_exprs("__v", dim, n_planes, n_bands, seed)
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).select(
        F.col(id_col),
        "__v",
        F.posexplode(F.array(*[F.expr(e) for e in bexprs])).alias("band", "bucket"),
    )
    if max_bucket is not None:
        # anti-join against the HOT list (few rows by definition) — the
        # complement OK list is the whole bucket space
        hot = (
            c.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__m"))
            .where(F.col("__m") > max_bucket)
            .select("band", "bucket")
        )
        c = c.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    cands = _bucket_candidates(
        c, ["band", "bucket"], id_col, float(threshold)
    )
    pairs = (
        cands.select(
            "id_a",
            "id_b",
            F.expr(_cos_spark("__va", "__vb")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .distinct()
    )
    return pairs


# --------------------------------------------------------------------------
# semantic deduplication (SemDeDup-style)
# --------------------------------------------------------------------------


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    seed: int = 42,
    max_cell: int = 10_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    embeddings with k-means, then inside each cluster drop every vector
    that has a near-duplicate (cosine ≥ ``threshold``) with a SMALLER id.
    Returns one row per corpus vector: (``id_col``, ``cell``, ``keep``) —
    filter ``keep = 1`` for the retained corpus.

    The drop rule is pairwise and deterministic ("any smaller-id neighbor
    disqualifies"), a conservative superset of the paper's greedy
    sequential scan: in a chain a~b, b~c (a≁c) it drops both b and c,
    where the greedy scan would re-keep c. At the tight thresholds
    semantic dedup runs at (≥0.95), near-dup groups are dense cliques and
    the two rules coincide.

    Scale shape: clustering is what makes 100 TB semantic dedup feasible —
    the corpus is scanned once for cell assignment (centroid distances as
    quadratic-form column expressions), and the O(m²) pairwise cosine runs
    only WITHIN a cell (m ≈ n/k), as one blocked BLAS matmul per cell via
    grouped ``applyInPandas`` (a task materializes one cell, bounded by
    ``max_cell``). Size ``n_centroids`` so cells stay ~1e4-1e5; cells over
    ``max_cell`` rows are excluded from pairing (all their vectors kept)
    as a skew guard — raise k instead of the guard when it triggers.
    ``centroids`` overrides the sampled-kmeans fit (e.g.
    :func:`fixed_ivf_centroids` for the deterministic gate).

    Oracle note: numpy's pairwise summation differs from DuckDB's
    sequential ``list_cosine_similarity`` in the last ulp; the keep flags
    agree unless a pair's cosine sits within float noise (~1e-13) of the
    threshold — measure the margin when pinning a new fixture."""
    cents = (
        np.asarray(centroids, dtype=float)
        if centroids is not None
        else kmeans_centroids(corpus, n_centroids, vec_col, seed=seed)
    )

    c = _assign_cells(corpus, cents, id_col, vec_col)
    pairable = c
    if max_cell is not None:
        hot = (
            c.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("__m"))
            .where(F.col("__m") > max_cell)
            .select("cell")
        )
        pairable = c.join(F.broadcast(hot), ["cell"], "left_anti")

    # per-cell pairwise cosine via grouped applyInPandas (the sanctioned
    # Arrow escape hatch, like sessionize/pack_greedy): a SQL pairwise
    # self-join evaluates one interpreted 64-term expression per pair
    # (higher-order-function folds are CodegenFallback, and flattened
    # element sums blow past JIT method limits — both measured ~30-70k
    # pairs/core-s), while one BLAS matmul per cell does ~1e8/core-s.
    # Each task materializes ONE cell, bounded by max_cell: X is m×dim
    # doubles (5 MB at m=1e4, dim=64) and the similarity matrix is
    # computed in 1024-row blocks, never m×m at once.
    import pandas as pd
    from pyspark.sql import types as T

    thr = float(threshold)

    def cell_dropped(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf["__v"].notna()].sort_values(id_col)
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({id_col: pdf[id_col][:0]})
        Xm = np.array(pdf["__v"].tolist(), dtype=float)
        nrm = np.sqrt((Xm * Xm).sum(axis=1))
        nrm[nrm == 0.0] = np.inf  # zero vectors: cosine undefined -> never similar
        dropped_mask = np.zeros(m, dtype=bool)
        for lo in range(0, m, 1024):
            hi = min(lo + 1024, m)
            sim = (Xm[lo:hi] @ Xm.T) / (nrm[lo:hi, None] * nrm[None, :])
            # pair (i, j) with i < j drops j: row index i in [lo, hi),
            # column j > i strictly
            ge = sim >= thr
            cols = np.arange(m)[None, :]
            rows = np.arange(lo, hi)[:, None]
            dropped_mask |= (ge & (cols > rows)).any(axis=0)
        return pd.DataFrame({id_col: pdf[id_col].to_numpy()[dropped_mask]})

    id_dt = c.schema[id_col].dataType
    dropped = (
        pairable.groupBy("cell")
        .applyInPandas(cell_dropped, T.StructType([T.StructField(id_col, id_dt)]))
        .withColumn("__drop", F.lit(1))
    )
    return (
        c.join(dropped, id_col, "left")
        .select(
            id_col,
            F.col("cell").cast("long").alias("cell"),
            F.col("__drop").isNull().cast("int").alias("keep"),
        )
    )


def semantic_dedup_sql(
    table: str,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int = 10_000,
) -> str:
    """DuckDB twin of :func:`semantic_dedup` with fixed centroids (same
    quadratic-form cell assignment as :func:`ivf_topk_sql`)."""
    cents = np.asarray(centroids, dtype=float)
    vals = ",\n    ".join(
        f"({i + 1}, {_duck_plane_lit(c)}, {float(np.dot(c, c))!r})"
        for i, c in enumerate(cents)
    )
    d2 = (
        "(list_inner_product(c.v, c.v) - 2 * list_inner_product(c.v, cents.cv)"
        " + cents.cc)"
    )
    return f"""
WITH c AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}),
cents AS (SELECT * FROM (VALUES
    {vals}) t(cell, cv, cc)),
assigned AS (
  SELECT {id_col}, v, cell FROM (
    SELECT c.{id_col}, c.v, cents.cell,
           ROW_NUMBER() OVER (PARTITION BY c.{id_col}
             ORDER BY {d2} ASC, cents.cell ASC) AS rn
    FROM c CROSS JOIN cents
  ) WHERE rn = 1
),
hot AS (
  SELECT cell FROM assigned GROUP BY cell HAVING COUNT(*) > {max_cell}
),
pairable AS (
  SELECT * FROM assigned WHERE cell NOT IN (SELECT cell FROM hot)
),
dropped AS (
  SELECT DISTINCT b.{id_col}
  FROM pairable a JOIN pairable b
    ON a.cell = b.cell AND a.{id_col} < b.{id_col}
  WHERE list_cosine_similarity(a.v, b.v) >= {threshold}
)
SELECT s.{id_col}, CAST(s.cell AS BIGINT) AS cell,
       CAST(d.{id_col} IS NULL AS INT) AS keep
FROM assigned s LEFT JOIN dropped d USING ({id_col})
"""


# --------------------------------------------------------------------------
# embedding hygiene: L2 normalization + symmetric int8 quantization
# --------------------------------------------------------------------------


def l2_normalize(
    corpus: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Unit-normalize embeddings as a pure column expression — no UDF, no
    shuffle. The norm fold is computed ONCE into its own column before the
    per-element transform (inlining the O(d) fold inside the transform
    lambda would re-run it per element — O(d²) per row). Zero vectors pass
    through unchanged."""
    norm = (
        f"sqrt(aggregate({vec_col}, 0D, (a, x) -> a + CAST(x AS DOUBLE) * x))"
    )
    return corpus.select(
        F.col(id_col), F.col(vec_col), F.expr(norm).alias("__norm")
    ).select(
        F.col(id_col),
        F.expr(
            f"transform({vec_col}, x -> ROUND(CAST(x AS DOUBLE) / "
            f"CASE WHEN __norm = 0D THEN 1D ELSE __norm END, 6))"
        ).alias("unit"),
    )


def l2_normalize_sql(
    table: str, vec_col: str = "embedding", id_col: str = "vec_id"
) -> str:
    norm = (
        f"sqrt(list_aggregate(list_transform({vec_col}, "
        f"x -> CAST(x AS DOUBLE) * x), 'sum'))"
    )
    return f"""
SELECT {id_col},
       list_transform({vec_col}, x -> ROUND(CAST(x AS DOUBLE) /
           CASE WHEN __norm = 0 THEN 1 ELSE __norm END, 6)) AS unit
FROM (SELECT {id_col}, {vec_col}, {norm} AS __norm FROM {table}) __n
"""


def quantize_int8(
    corpus: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|/127, codes =
    round(x/scale) ∈ [−127, 127] — the 4× (vs float32) storage/bandwidth
    cut ANN serving uses. Column expressions only; the (id, scale, codes)
    triple is all a dequantizing reader needs. The max|x| fold is computed
    once per row (see :func:`l2_normalize`); an all-zero vector gets
    scale 0 and all-zero codes."""
    amax = f"aggregate({vec_col}, 0D, (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"
    return corpus.select(
        F.col(id_col), F.col(vec_col), F.expr(amax).alias("__amax")
    ).select(
        F.col(id_col),
        F.expr("ROUND(__amax / 127.0D, 9)").alias("scale"),
        F.expr(
            f"transform({vec_col}, x -> CAST(ROUND(CAST(x AS DOUBLE) / "
            f"CASE WHEN __amax = 0D THEN 1D ELSE __amax / 127.0D END, 0) AS INT))"
        ).alias("codes"),
    )


def quantize_int8_sql(
    table: str, vec_col: str = "embedding", id_col: str = "vec_id"
) -> str:
    amax = (
        f"list_aggregate(list_transform({vec_col}, "
        f"x -> abs(CAST(x AS DOUBLE))), 'max')"
    )
    return f"""
SELECT {id_col},
       ROUND(__amax / 127.0, 9) AS scale,
       list_transform({vec_col}, x -> CAST(ROUND(CAST(x AS DOUBLE) /
           CASE WHEN __amax = 0 THEN 1 ELSE __amax / 127.0 END, 0) AS INT)) AS codes
FROM (SELECT {id_col}, {vec_col}, {amax} AS __amax FROM {table}) __n
"""


def random_projection(
    corpus: DataFrame,
    out_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    normalize: bool = False,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``out_dim`` dimensions —
    the standard dimensionality-reduction preprocessing before ANN
    indexing or clustering (pairwise distances preserved to within
    1 ± O(sqrt(log n / out_dim))). The seeded Gaussian matrix (scaled by
    1/sqrt(out_dim)) is deterministic, so the projection is reproducible
    and replayable by the DuckDB twin. ``normalize=True`` L2-normalizes
    the projected vectors (for cosine-based downstream).

    Scale shape: one Arrow-batched X·Rᵀ per batch in ``mapInPandas`` —
    the same BLAS-not-expressions tradeoff as :func:`_assign_cells`
    (measured there: interpreted per-element expressions are ~50×
    slower); no shuffle, output is (id, out_dim floats) per row."""
    import pandas as pd
    from pyspark.sql import types as T

    dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((int(out_dim), dim)) / np.sqrt(float(out_dim))

    def project(batches):
        for pdf in batches:
            ok = pdf["__v"].notna()
            out_vals = [None] * len(pdf)
            if ok.any():
                Xm = np.array(pdf.loc[ok, "__v"].tolist(), dtype=float)
                P = Xm @ R.T
                if normalize:
                    nrm = np.sqrt((P * P).sum(axis=1, keepdims=True))
                    nrm[nrm == 0.0] = 1.0
                    P = P / nrm
                it = iter(P.tolist())
                for j, flag in enumerate(ok.to_numpy()):
                    if flag:
                        out_vals[j] = next(it)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "projected": out_vals}
            )

    id_dt = corpus.schema[id_col].dataType
    return corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).mapInPandas(
        project,
        T.StructType(
            [
                T.StructField(id_col, id_dt),
                T.StructField("projected", T.ArrayType(T.DoubleType())),
            ]
        ),
    )


def random_projection_sql(
    table: str,
    out_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`random_projection` (normalize=False): one
    list_inner_product per output component against the same seeded
    literal rows. numpy matmul vs sequential sums differ in the last
    ulp — compare rounded (the gate rounds to 6 significant digits)."""
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((int(out_dim), dim)) / np.sqrt(float(out_dim))
    comps = ", ".join(
        f"list_inner_product(v, {_duck_plane_lit(r)})" for r in R
    )
    return f"""
WITH c AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table})
SELECT {id_col}, [{comps}] AS projected FROM c
"""


# --------------------------------------------------------------------------
# product quantization (PQ): the compressed-domain ANN scale path
# --------------------------------------------------------------------------


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    sample_cap: int = 100_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Train PQ codebooks (Jegou et al. 2011): split each vector into ``m``
    subvectors and run driver-side k-means with ``n_codes`` centroids per
    subspace on ONE sampled matrix — (m, n_codes, dim/m). The corpus then
    compresses to m small ints per vector (:func:`pq_encode`), and search
    runs in the compressed domain (:func:`pq_topk`) — at 100 TB the codes
    table is ~1% of the raw embeddings and scans accordingly faster."""
    n = corpus.count()
    frac = min(1.0, sample_cap / max(n, 1))
    pdf = corpus.select(vec_col).sample(fraction=frac, seed=seed).toPandas()
    Xm = np.array(pdf[vec_col].tolist(), dtype=float)
    dim = Xm.shape[1]
    if dim % m:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, n_codes, dsub))
    for j in range(m):
        S = Xm[:, j * dsub : (j + 1) * dsub]
        cents = S[rng.choice(len(S), size=min(n_codes, len(S)), replace=False)]
        ss = (S * S).sum(axis=1)
        for _ in range(iters):
            d2 = ss[:, None] - 2.0 * S @ cents.T + (cents * cents).sum(axis=1)[None, :]
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                mask = assign == c
                if mask.any():
                    cents[c] = S[mask].mean(axis=0)
        books[j, : len(cents)] = cents
    return books


def fixed_pq_codebooks(
    m: int = 8, n_codes: int = 16, dim: int = 64, seed: int = 303
) -> np.ndarray:
    """Deterministic, data-independent codebooks (the :func:`fixed_ivf_centroids`
    convention) so the DuckDB oracle replays the exact same codes — keeps
    the ``similarity_pq_topk`` gate hash-matched; real fits use
    :func:`pq_train`."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, n_codes, dim // m)) * 0.12


def _pq_lits(books: np.ndarray, duck: bool) -> list[str]:
    """One literal array-of-arrays per subquantizer, both dialects."""
    out = []
    for j in range(books.shape[0]):
        rows = []
        for cw in books[j]:
            vals = ", ".join(repr(float(v)) for v in cw)
            rows.append(f"[{vals}]" if duck else f"array({vals})")
        out.append(
            "[" + ", ".join(rows) + "]" if duck
            else "array(" + ", ".join(rows) + ")"
        )
    return out


def _pq_code_exprs(vec_col: str, books: np.ndarray, duck: bool) -> list[str]:
    """Per-subquantizer nearest-codeword index (0-based): argmin over the
    literal codeword list of the squared subvector distance. First-match
    tie rule on both engines (array_position / list_position)."""
    m, _k, dsub = books.shape
    lits = _pq_lits(books, duck)
    exprs = []
    for j in range(m):
        sub = (
            f"{vec_col}[{j * dsub + 1}:{(j + 1) * dsub}]" if duck
            else f"slice({vec_col}, {j * dsub + 1}, {dsub})"
        )
        if duck:
            d = (
                f"list_transform({lits[j]}, cw -> list_sum("
                f"list_transform(generate_series(1, {dsub}), "
                f"t -> ({sub}[t] - cw[t]) * ({sub}[t] - cw[t]))))"
            )
            exprs.append(f"(list_position({d}, list_min({d})) - 1)")
        else:
            d = (
                f"transform({lits[j]}, cw -> aggregate("
                f"zip_with({sub}, cw, (a, b) -> (a - b) * (a - b)), "
                f"0D, (acc, x) -> acc + x))"
            )
            exprs.append(f"(array_position({d}, array_min({d})) - 1)")
    return exprs




def pq_encode(
    corpus: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress each vector to ``m`` small-int codes (per-subquantizer
    argmin over the codebook). Returns (``id_col``, code array<int>) —
    zero shuffles: an embarrassingly-parallel Arrow-batched projection.

    r9 optimization (guide §4.2 — hand whole batches to vectorized native
    code): the previous shape rendered the m·k·dsub codeword distances as
    literal column expressions; measured at m=8,k=16,dsub=8 that spends
    ~3 s building/parsing the expression tree plus ~2-3 s PER ACTION in
    optimizer+codegen — a FIXED driver cost that dwarfs the row compute
    at bench scale and re-recurs on every run. The encode is now a
    ``mapInPandas`` numpy argmin (the same disclosed Arrow-batched
    convention as the IVF assign / SemDeDup BLAS sites): per batch, one
    vectorized ``((sub − books[j])²).sum(axis=-1).argmin`` per
    subquantizer. Only (id, vector) cross the Python boundary. Distances
    are float64 with the same left-associative addition order as the old
    expression form (numpy sums axes of length ≤ 8 sequentially), and
    argmin takes the first minimum exactly like
    ``array_position(d, array_min(d))`` — codes verified bit-identical,
    gate hash unchanged. NULL/ragged vectors yield a NULL code, matching
    the old expression-form semantics."""
    import pandas as pd

    m, kc, dsub = books.shape
    dim = m * dsub
    bks = books.astype(np.float64)
    id_type = corpus.schema[id_col].dataType.simpleString()

    def enc(batches):
        for pdf in batches:
            vec = pdf[vec_col]
            ok = np.array(
                [v is not None and len(v) >= dim for v in vec], dtype=bool
            )
            codes: list = [None] * len(pdf)
            if ok.any():
                X = np.vstack(
                    [np.asarray(v[:dim], dtype=np.float64) for v in vec[ok]]
                )
                cc = np.empty((X.shape[0], m), dtype=np.int32)
                for j in range(m):
                    sub = X[:, j * dsub : (j + 1) * dsub]
                    d = ((sub[:, None, :] - bks[j][None, :, :]) ** 2).sum(
                        axis=2
                    )
                    cc[:, j] = d.argmin(axis=1)
                for pos, row in zip(np.flatnonzero(ok), cc):
                    codes[pos] = row
            yield pd.DataFrame({id_col: pdf[id_col], "code": codes})

    return corpus.select(id_col, vec_col).mapInPandas(
        enc, schema=f"{id_col} {id_type}, code array<int>"
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance (ADC): the corpus side
    scans COMPRESSED codes only; each candidate's distance is the sum over
    subquantizers of ||q_sub − codeword(code_j)||² — codewords ride as
    literals, so the whole search is JVM column expressions over
    (id, code) rows plus a broadcast of the queries. Returns
    (query_id, rank, vec_id, adc_dist); ranks break ties by id.

    Scale shape: encode once (store the codes table — m bytes-ish per
    vector), then every search scans codes, never raw vectors; the
    candidate re-rank against raw embeddings (standard PQ practice) is
    ``cosine_topk`` on the returned id set."""
    m, kc, dsub = books.shape
    if codes is None:
        # one-shot convenience; at scale encode ONCE, store the codes
        # table, and pass it via ``codes=`` so every search scans only
        # (id, m small ints) — the point of the compressed domain
        codes = pq_encode(corpus, books, id_col, vec_col)
    # the ADC trick: each query precomputes its (m x k) codeword-distance
    # TABLE once (a per-query-row expression — queries are few), so the
    # per-candidate work drops to m table lookups + adds instead of m
    # recomputed subvector distances per (candidate, query) pair
    # (measured ~3x on the scored side)
    lits = _pq_lits(books, duck=False)
    tab_parts = []
    for j in range(m):
        qsub = f"slice(__qv, {j * dsub + 1}, {dsub})"
        tab_parts.append(
            f"transform({lits[j]}, cw -> aggregate("
            f"zip_with({qsub}, cw, (a, b) -> (a - b) * (a - b)), "
            f"0D, (acc, x) -> acc + x))"
        )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn(
        "__qtab", F.expr("concat(" + ", ".join(tab_parts) + ")")
    ).drop("__qv")
    joined = codes.crossJoin(F.broadcast(q))
    terms = [
        f"element_at(__qtab, {j * kc} + code[{j}] + 1)" for j in range(m)
    ]
    scored = joined.select(
        "query_id",
        id_col,
        F.expr(" + ".join(terms)).alias("adc_dist"),
    ).where(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "rank", id_col, F.round("adc_dist", 6).alias("adc_dist")
        )
    )


def pq_topk_sql(
    table: str,
    books: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`pq_topk` (codebooks as literals, same
    first-match argmin tie rule, same (dist, id) ranking)."""
    m, _kc, dsub = books.shape
    ids = ", ".join(str(i) for i in query_ids)
    code_exprs = _pq_code_exprs("v", books, duck=True)
    lits = _pq_lits(books, duck=True)
    terms = []
    for j in range(m):
        qsub = f"q.qv[{j * dsub + 1}:{(j + 1) * dsub}]"
        cw = f"{lits[j]}[c.code[{j + 1}] + 1]"
        terms.append(
            f"list_sum(list_transform(generate_series(1, {dsub}), "
            f"t -> ({qsub}[t] - {cw}[t]) * ({qsub}[t] - {cw}[t])))"
        )
    return f"""
WITH base AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}),
codes AS (
  SELECT {id_col}, [{", ".join(code_exprs)}] AS code FROM base
),
q AS (SELECT {id_col} AS query_id, v AS qv FROM base WHERE {id_col} IN ({ids})),
scored AS (
  SELECT q.query_id, c.{id_col}, {" + ".join(terms)} AS adc_dist
  FROM codes c CROSS JOIN q
  WHERE q.query_id <> c.{id_col}
),
ranked AS (
  SELECT query_id, {id_col}, adc_dist,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY adc_dist ASC, {id_col} ASC
         ) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, {id_col},
       ROUND(adc_dist, 6) AS adc_dist
FROM ranked WHERE rank <= {k}
"""


def pq_topk_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    books: np.ndarray,
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """The standard PQ recipe end-to-end: ADC over compressed codes makes a
    ``shortlist`` per query, then ONLY the shortlisted raw vectors are
    fetched (semi-join) and re-ranked by exact cosine. At 100 TB the full
    scan touches m-byte codes; the raw-embedding read is
    queries x shortlist rows — independent of corpus size. Returns
    (query_id, rank, vec_id, cosine), exact on the shortlist."""
    if shortlist < k:
        raise ValueError("shortlist must be >= k")
    short = pq_topk(
        corpus, queries, books, k=shortlist, id_col=id_col, vec_col=vec_col,
        codes=codes,
    ).select("query_id", id_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    cand = (
        corpus.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("__cv")
        )
        .join(short, id_col)  # shortlist is tiny: broadcast by AQE
        .join(F.broadcast(q), "query_id")
    )
    scored = cand.select(
        "query_id", id_col, F.expr(_cos_spark("__cv", "__qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "rank", id_col, F.round("cosine", 6).alias("cosine")
        )
    )
