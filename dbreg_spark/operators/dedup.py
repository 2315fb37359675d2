"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-duplicates.

Scale-first shapes:

- exact dedup = hash-groupBy on a normalized fingerprint (one shuffle of
  (hash, id) pairs, never the text);
- MinHash signatures are per-row column expressions (H universal-hash mins
  over the distinct shingle set — no explode, no shuffle);
- LSH banding shuffles only (band_id, band_hash, doc_id) triples; candidate
  pairs come from an equi-join on the band bucket, then exact Jaccard
  verification runs on the candidates only;
- SimHash is 32 fold-expressions over a precomputed word-hash array;
- embedding near-dup buckets by random-hyperplane signs then verifies
  cosine within buckets.

Everything is JVM-side column expressions (no Python UDFs); every operator
has a DuckDB-oracle SQL twin built from the same cross-dialect templates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.xdialect import DUCK, SPARK, WS, X

MH_PRIME = 2_147_483_647  # 2^31 - 1
MH_MODB = 1 << 31

# hot-shingle sets up to this size are inlined as an array literal so the
# anti-join + per-doc retained-count aggregation become ONE map-side
# array_except over the checkpointed shingle table (r10, guide §2.4);
# per-row cost is O(|hs|·|hot|) against a tiny set, so keep it small
_HOT_LITERAL_MAX = 256


def minhash_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MH_PRIME, size=n_hashes)
    b = rng.integers(0, MH_PRIME, size=n_hashes)
    return list(zip(a.tolist(), b.tolist()))


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def _norm_expr(x: X, col: str) -> str:
    return f"lower({x.regexp_replace_all(x.trim_ws(col), WS + '+', ' ')})"


def exact_duplicates(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group rows by normalized-text md5; keep groups, mark canonicals.

    Returns (id, dup_group, group_size, is_canonical) for every row —
    including NULL-text rows, which share the sentinel group '' (md5 of a
    NULL is NULL, and a null-keyed join would silently drop those rows;
    the empty string is not a valid md5, so no collision with real
    groups). The shuffle carries only (hash, id)."""
    x = X(SPARK)
    h = df.select(
        F.col(id_col),
        F.expr(f"COALESCE(md5({_norm_expr(x, col)}), '')").alias("dup_group"),
    )
    w = h.groupBy("dup_group").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.min(id_col).alias("__canon"),
    )
    return (
        h.join(w, "dup_group")
        .select(
            id_col,
            "dup_group",
            "group_size",
            (F.col(id_col) == F.col("__canon")).alias("is_canonical"),
        )
    )


def exact_duplicates_sql(table: str, col: str = "text", id_col: str = "doc_id") -> str:
    x = X(DUCK)
    return f"""
WITH h AS (
  SELECT {id_col}, COALESCE(md5({_norm_expr(x, col)}), '') AS dup_group
  FROM {table}
),
g AS (
  SELECT dup_group, CAST(COUNT(*) AS BIGINT) AS group_size, MIN({id_col}) AS canon
  FROM h GROUP BY dup_group
)
SELECT h.{id_col}, h.dup_group, g.group_size, h.{id_col} = g.canon AS is_canonical
FROM h JOIN g USING (dup_group)
"""


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_words: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Per-document MinHash signature as ``sig_0..sig_{H-1}`` columns.

    Two-stage: the shingle-hash array is materialized once per document,
    then each of the H signatures is a cheap arithmetic fold over it."""
    x = X(SPARK)
    params = minhash_params(n_hashes, seed)
    staged = df.select(
        F.col(id_col),
        F.expr(x.shingle_hashes(col, shingle_words, MH_MODB)).alias("__hs"),
    )
    return staged.select(
        F.col(id_col),
        *[
            F.expr(x.minhash_from_hashes("__hs", a, b, MH_PRIME)).alias(f"sig_{i}")
            for i, (a, b) in enumerate(params)
        ],
    )


def minhash_signatures_sql(
    table: str,
    col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_words: int = 3,
    seed: int = 42,
) -> str:
    x = X(DUCK)
    params = minhash_params(n_hashes, seed)
    cols = [id_col] + [
        f"{x.minhash_from_hashes('__hs', a, b, MH_PRIME)} AS sig_{i}"
        for i, (a, b) in enumerate(params)
    ]
    return (
        f"WITH __staged AS (SELECT {id_col}, "
        f"{x.shingle_hashes(col, shingle_words, MH_MODB)} AS __hs FROM {table})\n"
        "SELECT " + ",\n  ".join(cols) + " FROM __staged"
    )


def _band_exprs(x: X, n_hashes: int, band_rows: int) -> list[str]:
    if n_hashes % band_rows != 0:
        raise ValueError(
            f"n_hashes ({n_hashes}) must be divisible by band_rows "
            f"({band_rows}) — trailing signatures would be computed and "
            "shuffled but silently excluded from banding, giving a "
            "different (b, r) recall curve than requested"
        )
    n_bands = n_hashes // band_rows
    out = []
    for bnd in range(n_bands):
        sig_cols = [f"sig_{bnd * band_rows + j}" for j in range(band_rows)]
        concat = " || '_' || ".join(x.str_cast(c) for c in sig_cols)
        out.append(x.md5int(f"({concat})"))
    return out


def minhash_lsh_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    band_rows: int = 2,
    shingle_words: int = 3,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding, verified by exact
    shingle-set Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b.

    Single-scan plan: the shingle-hash arrays ride INTO the band shuffle
    ((band, bucket, id, hashes) rows), buckets are assembled with
    collect_list, candidate pairs are generated by in-bucket explosion and
    verified inline with exact Jaccard on the integer shingle-hash sets —
    identical on both engines by construction, and several times cheaper
    than string intersects at verification volume. Compared to the
    self-join formulation this reads the corpus ONCE (no re-hashing per
    join side, no cache to leak), at the cost of shuffling the hash arrays
    n_bands times — linear in corpus size, versus multiple full text scans.

    Hot-bucket guard, ON BY DEFAULT: a bucket of m members is m² candidate
    pairs AND one m-element collect_list row — at web scale a single
    million-copy boilerplate page is both a compute and a task-memory
    cliff. Buckets over ``max_bucket`` switch to STAR verification: every
    member is Jaccard-verified against the bucket's min-id member only
    (m comparisons, no collect_list), so true duplicate groups stay fully
    CONNECTED for :func:`dedup_components` — the surfaced edge set within
    a huge bucket is the star, not the clique. Detection is SAMPLED (a
    ~1%% doc probe), so the boundary is soft: buckets from ~max_bucket/2
    up may get star treatment (harmless — star edges are still exact-
    verified and keep groups connected), cliff-sized buckets always do,
    and smaller buckets essentially never. ``None`` restores unguarded
    clique generation."""
    x = X(SPARK)
    params = minhash_params(n_hashes, seed)
    staged = df.select(
        F.col(id_col),
        F.expr(x.shingle_hashes(col, shingle_words, MH_MODB)).alias("__hs"),
    )
    sigs = staged.select(
        F.col(id_col),
        "__hs",
        *[
            F.expr(x.minhash_from_hashes("__hs", a_, b_, MH_PRIME)).alias(f"sig_{i}")
            for i, (a_, b_) in enumerate(params)
        ],
    )
    # one scan computes every band bucket (posexplode of a bucket array);
    # a unionAll-per-band shape would rehash all shingle text once per band
    bands = sigs.select(
        F.col(id_col),
        "__hs",
        F.posexplode(
            F.array(*[F.expr(be) for be in _band_exprs(x, n_hashes, band_rows)])
        ).alias("band", "bucket"),
    )

    def verified(a_id, b_id, a_hs, b_hs):
        inter = F.expr(f"size(array_intersect({a_hs}, {b_hs}))")
        return (
            F.col(a_id).alias("id_a"),
            F.col(b_id).alias("id_b"),
            (
                inter.cast("double")
                / (F.expr(f"size({a_hs})") + F.expr(f"size({b_hs})") - inter)
            ).alias("jaccard"),
        )

    clique_bands = bands
    star_pairs = None
    if max_bucket is not None:
        # Probabilistic skew probe: banding a ~1%% DOCUMENT sample finds
        # any bucket of cliff size with near-certainty (a 1e6-member
        # bucket has ~1e4 sampled members) at ~1%% of a corpus scan —
        # a full-probe variant measured 2x end-to-end overhead on clean
        # corpora, and materializing the bands subtree instead would
        # violate the operator's cache-freedom contract (test_cache).
        # The tiny sampled-hot aggregate is collected; when EMPTY (the
        # common case) the plan below is exactly the unguarded one.
        # Detection threshold: half the expected sampled count at the
        # cap, so buckets from ~max_bucket/2 up may conservatively get
        # star treatment (still correct), smaller ones never.
        frac = min(1.0, 100.0 / float(max_bucket))
        probe_docs = df.sample(fraction=frac, seed=seed) if frac < 1.0 else df
        probe_staged = probe_docs.select(
            F.col(id_col),
            F.expr(x.shingle_hashes(col, shingle_words, MH_MODB)).alias("__hs"),
        )
        probe_sigs = probe_staged.select(
            F.col(id_col),
            *[
                F.expr(x.minhash_from_hashes("__hs", a_, b_, MH_PRIME)).alias(f"sig_{i}")
                for i, (a_, b_) in enumerate(params)
            ],
        )
        probe_bands = probe_sigs.select(
            F.posexplode(
                F.array(*[F.expr(be) for be in _band_exprs(x, n_hashes, band_rows)])
            ).alias("band", "bucket"),
        )
        hot_rows = (
            probe_bands.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__m"))
            .where(F.col("__m") > max(1.0, max_bucket * frac / 2.0))
            .select("band", "bucket")
            .collect()
        )
        hot_keys = {(r["band"], r["bucket"]) for r in hot_rows}
    else:
        hot_keys = set()
    if hot_keys:
        # hot present: the star rescue branches bands 3 ways — checkpoint
        # once so the shingle+minhash scan doesn't re-execute per branch.
        # Only on THIS path: the clean-corpus plan stays checkpoint-free
        # (cache-freedom contract, test_cache) and exactly unguarded
        # (test_plans::test_minhash_guard_clean_corpus_plan_is_unguarded).
        bands = bands.localCheckpoint(eager=True)
        spark = df.sparkSession
        hot = F.broadcast(
            spark.createDataFrame(
                sorted(hot_keys), "band int, bucket bigint"
            )
        )
        clique_bands = bands.join(hot, ["band", "bucket"], "left_anti")
        hot_bands = bands.join(hot, ["band", "bucket"], "left_semi")
        # star: min-id representative per hot bucket (tiny table), each
        # member verified against it — m rows, no collect_list
        reps = hot_bands.groupBy("band", "bucket").agg(
            F.min_by(
                F.struct(F.col(id_col).alias("rid"), F.col("__hs").alias("rhs")),
                F.col(id_col),
            ).alias("__rep")
        )
        star = (
            hot_bands.join(F.broadcast(reps), ["band", "bucket"])
            .where(F.col(id_col) != F.col("__rep.rid"))
            .select(
                F.col("__rep.rid").alias("a_id"),
                F.col(id_col).alias("b_id"),
                F.col("__rep.rhs").alias("a_hs"),
                F.col("__hs").alias("b_hs"),
            )
        )
        star_pairs = star.select(*verified("a_id", "b_id", "a_hs", "b_hs"))
    buckets = (
        clique_bands.groupBy("band", "bucket")
        .agg(F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("__hs").alias("hs"))).alias("members"))
        .where(F.size("members") >= 2)
    )
    cand = (
        buckets.select(F.explode("members").alias("a"), "members")
        .select("a", F.explode("members").alias("b"))
        .where(F.col("a.id") < F.col("b.id"))
    )
    clique_pairs = cand.select(
        *verified("a.id", "b.id", "a.hs", "b.hs")
    )
    pairs = clique_pairs
    if star_pairs is not None:
        pairs = pairs.unionByName(star_pairs)
    return (
        pairs.where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        .distinct()
    )


def shared_span_pairs(
    df: DataFrame,
    span_words: int = 20,
    col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = 1000,
) -> DataFrame:
    """ExactSubstr-style duplicate-span detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    pair of documents sharing an EXACT ``span_words``-token span, with the
    1-based word positions of the span in both documents — the output a
    clipping pass consumes (remove the repeated span from all but one
    occurrence). Documents shorter than ``span_words`` produce no spans.
    Returns (id_a, pos_a, id_b, pos_b, span_hash), id_a < id_b; a doc
    pair sharing a longer run appears once per ``span_words`` window of
    the run (consecutive positions), which is what span-merging downstream
    expects.

    Scale shape: ONE corpus scan emits (id, position, span-hash) via
    posexplode of the n-gram hash array (hashes, not span text, travel);
    the candidate join is an equi-join on the span hash. ``max_df``
    (default on) drops spans occurring in more than ``max_df`` documents
    from pairing — a boilerplate span shared by d docs contributes d²
    pairs, the same cartesian-class blowup the n-gram Jaccard guard
    kills; the reference implementation suffix-array dedups those
    globally instead, which a clipping pass can emulate by removing ALL
    occurrences of over-cap spans (they are surfaced separately by
    :func:`hot_span_table`)."""
    x = X(SPARK)
    grams = x.word_ngrams(col, span_words)
    hashed = x.transform(grams, f"g -> {x.md5int('g')}")
    nwords = x.size(x.split_ws(col))
    spans = df.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"CASE WHEN {nwords} >= {span_words} THEN {hashed} "
                f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
            )
        ).alias("pos0", "h"),
    ).select(
        id_col,
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.col("h").cast("long").alias("h"),
    )
    if max_df is not None:
        hot = (
            spans.groupBy("h")
            .agg(F.count_distinct(F.col(id_col)).alias("__df"))
            .where(F.col("__df") > max_df)
            .select("h")
        )
        spans = spans.join(F.broadcast(hot), "h", "left_anti")
    a, b = spans.alias("a"), spans.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col("a.pos").alias("pos_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("b.pos").alias("pos_b"),
            F.col("a.h").alias("span_hash"),
        )
    )


def shared_span_pairs_sql(
    table: str,
    span_words: int = 20,
    col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = 1000,
) -> str:
    """DuckDB twin of :func:`shared_span_pairs`."""
    x = X(DUCK)
    grams = x.word_ngrams(col, span_words)
    hashed = x.transform(grams, f"g -> {x.md5int('g')}")
    nwords = x.size(x.split_ws(col))
    guard = ""
    if max_df is not None:
        guard = (
            f"\n  WHERE h NOT IN (SELECT h FROM spans0 GROUP BY h "
            f"HAVING COUNT(DISTINCT {id_col}) > {max_df})"
        )
    return f"""
WITH arrs AS (
  SELECT {id_col},
         CASE WHEN {nwords} >= {span_words} THEN {hashed}
              ELSE CAST([] AS BIGINT[]) END AS ha
  FROM {table}
),
spans0 AS (
  SELECT {id_col}, CAST(g.i AS BIGINT) AS pos, CAST(ha[g.i] AS BIGINT) AS h
  FROM arrs, unnest(generate_series(1, len(ha))) AS g(i)
),
spans AS (
  SELECT {id_col}, pos, h FROM spans0{guard}
)
SELECT a.{id_col} AS id_a, CAST(a.pos AS BIGINT) AS pos_a,
       b.{id_col} AS id_b, CAST(b.pos AS BIGINT) AS pos_b,
       a.h AS span_hash
FROM spans a JOIN spans b
  ON a.h = b.h AND a.{id_col} < b.{id_col}
"""


def hot_span_table(
    df: DataFrame,
    span_words: int = 20,
    col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 1000,
) -> DataFrame:
    """The over-cap spans :func:`shared_span_pairs` excludes from pairing:
    (span_hash, df) for spans in more than ``max_df`` documents — the
    boilerplate list a clipping pass removes globally."""
    x = X(SPARK)
    grams = x.word_ngrams(col, span_words)
    hashed = x.transform(grams, f"g -> {x.md5int('g')}")
    nwords = x.size(x.split_ws(col))
    spans = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"CASE WHEN {nwords} >= {span_words} THEN {x.array_distinct(hashed)} "
                f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
            )
        ).alias("h"),
    )
    return (
        spans.groupBy(F.col("h").cast("long").alias("span_hash"))
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .where(F.col("df") > max_df)
    )


def hot_span_table_sql(
    table: str,
    span_words: int = 20,
    col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 1000,
) -> str:
    """DuckDB twin of :func:`hot_span_table`."""
    x = X(DUCK)
    grams = x.word_ngrams(col, span_words)
    hashed = x.transform(grams, f"g -> {x.md5int('g')}")
    nwords = x.size(x.split_ws(col))
    return f"""
WITH arrs AS (
  SELECT {id_col},
         CASE WHEN {nwords} >= {span_words} THEN {x.array_distinct(hashed)}
              ELSE CAST([] AS BIGINT[]) END AS ha
  FROM {table}
),
s AS (
  SELECT {id_col}, CAST(u.h AS BIGINT) AS span_hash
  FROM arrs, unnest(ha) AS u(h)
)
SELECT span_hash, CAST(COUNT(*) AS BIGINT) AS df
FROM s GROUP BY span_hash HAVING COUNT(*) > {max_df}
"""


def dedup_against(
    batch: DataFrame,
    reference: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    band_rows: int = 2,
    shingle_words: int = 3,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Incremental / cross-corpus near-dedup: flag ``batch`` documents that
    near-duplicate (shingle-set Jaccard ≥ threshold) ANY ``reference``
    document — the production dedup mode, where each incoming crawl batch
    is checked against the existing corpus instead of re-deduping
    everything. Returns one row per batch document:
    (``id_col``, n_matches = reference docs above threshold,
    best_jaccard, is_duplicate). Filter ``is_duplicate = 0`` to admit.

    Scale shape: both sides band with the SAME seeded MinHash params, so
    the candidate join is an equi-join on (band, bucket) — candidates ≈
    batch docs × bucket occupancy, never |batch|×|reference|; each side is
    scanned once (shingle hashes ride into the band shuffle, as in
    :func:`minhash_lsh_pairs`), duplicate candidates across bands collapse
    in the per-(batch, ref) aggregation (Jaccard is band-independent), and
    the final shuffle carries one row per verified pair. The reference's
    band table is deterministic — at 100 TB, persist it once and reuse it
    for every incoming batch."""
    x = X(SPARK)
    params = minhash_params(n_hashes, seed)

    def band_table(df: DataFrame, out_id: str) -> DataFrame:
        staged = df.select(
            F.col(id_col).alias(out_id),
            F.expr(x.shingle_hashes(col, shingle_words, MH_MODB)).alias(
                f"__hs_{out_id}"
            ),
        )
        sigs = staged.select(
            out_id,
            f"__hs_{out_id}",
            *[
                F.expr(
                    x.minhash_from_hashes(f"__hs_{out_id}", a_, b_, MH_PRIME)
                ).alias(f"sig_{i}")
                for i, (a_, b_) in enumerate(params)
            ],
        )
        return sigs.select(
            out_id,
            f"__hs_{out_id}",
            F.posexplode(
                F.array(
                    *[F.expr(be) for be in _band_exprs(x, n_hashes, band_rows)]
                )
            ).alias("band", "bucket"),
        )

    bb = band_table(batch, "__bid")
    rb = band_table(reference, "__rid")
    if max_bucket is not None:
        # hot-bucket guard (ON by default): a (band, bucket) shared by
        # m_b batch and m_r reference docs joins as m_b x m_r rows — a
        # boilerplate bucket at web scale is a cartesian cliff. Buckets
        # whose REFERENCE-side occupancy exceeds max_bucket are dropped
        # from candidate generation; a batch doc whose only shared
        # buckets are that hot is (rarely) missed, the documented trade,
        # and pairs remain reachable via their other bands. Detection
        # runs on a ~1%% reference-DOC sample (cliff-sized buckets are
        # found with near-certainty at ~1%% of a reference scan; see
        # minhash_lsh_pairs). Unlike the star path there, a dropped
        # bucket here LOSES candidates, so the detection threshold sits
        # at ~2x the cap: buckets below max_bucket are essentially never
        # dropped (the cap is soft — enforcement certain from ~4x up),
        # and the guard is skipped entirely when the sample is clean.
        frac = min(1.0, 100.0 / float(max_bucket))
        probe_ref = (
            reference.sample(fraction=frac, seed=seed) if frac < 1.0 else reference
        )
        hot_rows = (
            band_table(probe_ref, "__pid")
            .groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__m"))
            .where(F.col("__m") > max(1.0, max_bucket * frac / 2.0))
            .select("band", "bucket")
            .collect()
        )
        if hot_rows:
            spark = batch.sparkSession
            hot = F.broadcast(
                spark.createDataFrame(
                    sorted((r["band"], r["bucket"]) for r in hot_rows),
                    "band int, bucket bigint",
                )
            )
            rb = rb.join(hot, ["band", "bucket"], "left_anti")
            bb = bb.join(hot, ["band", "bucket"], "left_anti")
    inter = F.expr("size(array_intersect(__hs___bid, __hs___rid))")
    jac = inter.cast("double") / (
        F.expr("size(__hs___bid)") + F.expr("size(__hs___rid)") - inter
    )
    verified = (
        bb.join(rb, ["band", "bucket"])
        .select("__bid", "__rid", jac.alias("jaccard"))
        .groupBy("__bid", "__rid")
        .agg(F.max("jaccard").alias("jaccard"))  # identical across bands
        .where(F.col("jaccard") >= jaccard_threshold)
    )
    stats = verified.groupBy("__bid").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.max("jaccard").alias("best_jaccard"),
    )
    return (
        batch.select(F.col(id_col))
        .join(stats.withColumnRenamed("__bid", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_matches"), F.lit(0)).alias("n_matches"),
            F.round(F.coalesce(F.col("best_jaccard"), F.lit(0.0)), 6).alias(
                "best_jaccard"
            ),
            (F.coalesce(F.col("n_matches"), F.lit(0)) > 0)
            .cast("int")
            .alias("is_duplicate"),
        )
    )


def dedup_against_sql(
    batch_sql: str,
    reference_sql: str,
    col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    band_rows: int = 2,
    shingle_words: int = 3,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> str:
    """DuckDB twin of :func:`dedup_against`."""
    x = X(DUCK)
    params = minhash_params(n_hashes, seed)
    sig_cols = ",\n    ".join(
        f"{x.minhash_from_hashes('hs', a_, b_, MH_PRIME)} AS sig_{i}"
        for i, (a_, b_) in enumerate(params)
    )
    b_band_selects = "\n  UNION ALL\n".join(
        f"  SELECT bid, hs, {bi} AS band, {be} AS bucket FROM b_sigs"
        for bi, be in enumerate(_band_exprs(x, n_hashes, band_rows))
    )
    r_band_selects = "\n  UNION ALL\n".join(
        f"  SELECT rid, hs, {bi} AS band, {be} AS bucket FROM r_sigs"
        for bi, be in enumerate(_band_exprs(x, n_hashes, band_rows))
    )
    return f"""
WITH b_staged AS (
  SELECT {id_col} AS bid,
         {x.shingle_hashes(col, shingle_words, MH_MODB)} AS hs
  FROM ({batch_sql})
),
r_staged AS (
  SELECT {id_col} AS rid,
         {x.shingle_hashes(col, shingle_words, MH_MODB)} AS hs
  FROM ({reference_sql})
),
b_sigs AS (SELECT bid, hs, {sig_cols} FROM b_staged),
r_sigs AS (SELECT rid, hs, {sig_cols} FROM r_staged),
b_bands AS (
{b_band_selects}
),
r_bands AS (
{r_band_selects}
),
verified AS (
  SELECT bid, rid, MAX(
           CAST(len(list_intersect(b.hs, r.hs)) AS DOUBLE)
           / (len(b.hs) + len(r.hs) - len(list_intersect(b.hs, r.hs)))
         ) AS jaccard
  FROM b_bands b JOIN r_bands r USING (band, bucket)
  GROUP BY bid, rid
),
hits AS (
  SELECT bid, CAST(COUNT(*) AS BIGINT) AS n_matches,
         MAX(jaccard) AS best_jaccard
  FROM verified WHERE jaccard >= {jaccard_threshold}
  GROUP BY bid
)
SELECT s.bid AS {id_col},
       COALESCE(h.n_matches, 0) AS n_matches,
       ROUND(COALESCE(h.best_jaccard, 0.0), 6) AS best_jaccard,
       CAST(COALESCE(h.n_matches, 0) > 0 AS INT) AS is_duplicate
FROM b_staged s LEFT JOIN hits h ON s.bid = h.bid
"""


def minhash_lsh_pairs_sql(
    table: str,
    col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    band_rows: int = 2,
    shingle_words: int = 3,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> str:
    x = X(DUCK)
    params = minhash_params(n_hashes, seed)
    sig_cols = ",\n    ".join(
        f"{x.minhash_from_hashes('__hs', a, b, MH_PRIME)} AS sig_{i}"
        for i, (a, b) in enumerate(params)
    )
    band_selects = "\nUNION ALL\n".join(
        f"SELECT {id_col}, {bi} AS band, {be} AS bucket FROM sigs"
        for bi, be in enumerate(_band_exprs(x, n_hashes, band_rows))
    )
    # Jaccard over the integer shingle-hash sets — same definition as the
    # Spark side (cross-engine identical by construction)
    jac = (
        f"CAST(len(list_intersect(sa.__hs, sb.__hs)) AS DOUBLE) / "
        f"(len(sa.__hs) + len(sb.__hs) - len(list_intersect(sa.__hs, sb.__hs)))"
    )
    return f"""
WITH __staged AS (
  SELECT {id_col}, {x.shingle_hashes(col, shingle_words, MH_MODB)} AS __hs FROM {table}
),
sigs AS (
  SELECT {id_col},
    {sig_cols}
  FROM __staged
),
bands AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.{id_col} < b.{id_col}
)
SELECT cand.id_a, cand.id_b, ROUND({jac}, 6) AS jaccard
FROM cand
JOIN __staged sa ON sa.{id_col} = cand.id_a
JOIN __staged sb ON sb.{id_col} = cand.id_b
WHERE {jac} >= {jaccard_threshold}
"""


# --------------------------------------------------------------------------
# SimHash (32-bit)
# --------------------------------------------------------------------------


def _simhash_expr(x: X, wh_col: str) -> str:
    bits = []
    for b in range(32):
        vote = x.reduce_bigint(
            wh_col,
            "0",
            f"(acc, h) -> acc + CASE WHEN {x.bitand(x.shiftright('h', str(b)), '1')} = 1 "
            "THEN 1 ELSE -1 END",
        )
        bits.append(f"CASE WHEN ({vote}) > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END")
    return " + ".join(bits)


def simhash(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash over whitespace tokens (word-hash array folded by 32
    bit-vote expressions)."""
    x = X(SPARK)
    wh = x.transform(x.split_ws(col), f"w -> {x.md5int('lower(w)')} % 4294967296")
    staged = df.select(F.col(id_col), F.expr(wh).alias("__wh"))
    return staged.select(
        F.col(id_col), F.expr(_simhash_expr(x, "__wh")).alias("simhash")
    )


def simhash_sql(table: str, col: str = "text", id_col: str = "doc_id") -> str:
    x = X(DUCK)
    wh = x.transform(x.split_ws(col), f"w -> {x.md5int('lower(w)')} % 4294967296")
    return (
        f"WITH staged AS (SELECT {id_col}, {wh} AS __wh FROM {table})\n"
        f"SELECT {id_col}, {_simhash_expr(x, '__wh')} AS simhash FROM staged"
    )


# --------------------------------------------------------------------------
# n-gram Jaccard (all-pairs over shared-shingle candidates)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 1000,
    materialize_shingles: bool = True,
    max_hot_broadcast: int = 1_000_000,
    candidate_partition_rows: int = 2_000_000,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicates: candidates share ≥1 shingle
    (explode → equi-join on shingle hash), then exact Jaccard from the full
    shingle-hash sets. Returns (id_a, id_b, jaccard ≥ threshold).

    ``max_df`` is the scale guard, ON BY DEFAULT: shingles appearing in more
    than ``max_df`` documents are excluded from *candidate generation* (one
    groupBy pre-pass + a broadcast anti-join). A shingle with document
    frequency d contributes d² join rows — a common trigram at corpus scale
    is a cartesian-class explosion, so ``max_df=None`` (no cap) is the
    explicit opt-out for small corpora, not the default. Jaccard itself is
    always computed on the complete shingle sets, so the cap only affects
    which pairs are *surfaced*: a pair sharing nothing but ubiquitous
    shingles is skipped (by construction such pairs sit at low Jaccard for
    any sensible cap).

    ``candidate_partition_rows`` makes the candidate self-join
    PARTITION-ADAPTIVE: the estimated candidate-pair count
    (Σ df·(df−1)/2 over retained shingles, read off the same
    document-frequency aggregate that builds the hot set) divided by this
    target sets the join/aggregation width, floored at the session's
    shuffle width and capped at 4096. With a fixed session width the
    per-partition candidate blocks grow linearly with the corpus
    (sf1→sf5 measured 8.0× for 5× rows, round-8 bench) — widening ∝
    pairs keeps per-partition work bounded, which a conf knob cannot do
    per-operator. (Round 9: the r8 width estimate keyed on exploded
    shingle ROWS, which stay far below the pair count — at the sf5 bench
    point 13M shingle rows produced 197M candidate pairs and the widening
    never fired; the pair-count estimate is the actual work.)

    Round-9 plan shape — the intersection size IS the candidate-pair
    count: shingle lists are distinct per document, so each shared
    retained shingle contributes exactly one self-join row and
    ``groupBy(id_a, id_b).count()`` yields |A∩B| over retained shingles
    directly. The full-array Jaccard is then ARITHMETIC for every pair of
    hot-free documents (the common case: the bench corpus has zero hot
    shingles, so ALL pairs), and pairs touching hot-shingle documents
    pass through an exact ``array_intersect`` verify join guarded by a
    proven upper bound (true |A∩B| ≤ retained count + min of the two
    documents' hot-shingle counts; Jaccard is monotone in |A∩B|, so no
    true positive is dropped). The r8 shape shipped EVERY candidate pair
    twice through array joins + per-pair ``array_intersect`` — 204 s of
    the 314 s sf5 wall; the verify join now sees only upper-bound
    survivors (≈ the output size).

    The shingle-hash table (id, int array) feeds several plan branches;
    ``materialize_shingles`` localCheckpoints it eagerly so the expensive
    tokenize+md5 scan of the corpus runs ONCE, not per branch (measured 2×
    end-to-end at sf0.1; blocks are executor-local and freed on GC).
    ``False`` keeps the fully lazy plan (and skips the driver probes: hot
    broadcast decision and adaptive width fall back to their safe
    defaults — shuffled anti-join, session width).

    The hot-shingle set itself is broadcast only while it holds ≤
    ``max_hot_broadcast`` hashes (counted on the same aggregation pass
    that estimates the candidate volume); past that the anti-join runs as
    a shuffle — identical pairs, no unbounded driver broadcast."""
    x = X(SPARK)
    staged = df.select(
        F.col(id_col),
        F.expr(
            x.array_distinct(
                x.transform(x.word_ngrams(col, shingle_words), f"g -> {x.md5int('g')}")
            )
        ).alias("hs"),
    )
    if materialize_shingles:
        staged = staged.localCheckpoint(eager=True)
    tok = staged.select(F.col(id_col), F.explode("hs").alias("gh"))
    n_full = staged.select(
        F.col(id_col), F.size("hs").alias("__nf")
    )

    sess = df.sparkSession
    cur_width = int(sess.conf.get("spark.sql.shuffle.partitions"))
    n_part = cur_width
    hot_possible = max_df is not None
    hot_literal = None  # small hot set inlined as an array literal (r10)
    if max_df is not None:
        dfreq = tok.groupBy("gh").agg(F.count(F.lit(1)).alias("__df"))
        hot = dfreq.where(F.col("__df") > max_df).select("gh")
        if materialize_shingles:
            # ONE aggregation over the document-frequency table yields both
            # driver decisions: the candidate-volume estimate (adaptive
            # width) and the hot-set size (broadcast vs shuffled anti-join)
            dd = F.col("__df").cast("double")
            st = dfreq.agg(
                F.sum(
                    F.when(F.col("__df") <= max_df, dd * (dd - 1) / 2.0)
                ).alias("__cand"),
                F.count(F.when(F.col("__df") > max_df, F.lit(1))).alias(
                    "__nhot"
                ),
            ).collect()[0]
            cand_est = int(st["__cand"] or 0)
            n_hot = int(st["__nhot"] or 0)
            if candidate_partition_rows:
                n_part = max(
                    cur_width,
                    min(
                        4096,
                        -(-cand_est // int(candidate_partition_rows)),
                    ),
                )
            if n_hot == 0:
                hot_possible = False
            elif n_hot <= min(_HOT_LITERAL_MAX, max_hot_broadcast):
                # r10 (guide §2.4 — remove passes outright): a boilerplate
                # hot set is typically a handful of shingles. Inlined as a
                # sorted array literal, the anti-join becomes a map-side
                # array_except on the checkpointed shingle table, and the
                # per-document retained count __nk becomes size(__hsk) in
                # the SAME projection — deleting the hot checkpoint, the
                # n_kept aggregation (a full token-table pass + shuffle)
                # and the sz checkpoint. Identical pairs: array_except
                # removes exactly the hot elements the anti-join dropped
                # (hs is element-distinct by construction). Capped so the
                # per-row lookup set stays trivially small; bigger hot
                # sets keep the broadcast/shuffled anti-join.
                hot_literal = sorted(
                    int(r["gh"]) for r in hot.collect()
                )
            else:
                hot = hot.localCheckpoint(eager=True)
                if n_hot <= max_hot_broadcast:
                    hot = F.broadcast(hot)
        if hot_possible and hot_literal is not None:
            hot_arr = F.array(*[F.lit(h) for h in hot_literal])
            kept_stage = staged.select(
                F.col(id_col),
                F.size("hs").alias("__nf"),
                F.array_except("hs", hot_arr).alias("__hsk"),
            )
            tok = kept_stage.select(
                F.col(id_col), F.explode("__hsk").alias("gh")
            )
            sz = kept_stage.select(
                F.col(id_col), "__nf", F.size("__hsk").alias("__nk")
            )
        elif hot_possible:
            tok = tok.join(hot, "gh", "left_anti")
    if hot_possible and hot_literal is None:
        # per-document retained-shingle count: pairs whose documents carry
        # no hot shingles get an exact arithmetic Jaccard; the rest go
        # through the verify join below
        n_kept = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("__nk"))
        sz = n_full.join(n_kept, id_col)
        if materialize_shingles:
            # sz feeds BOTH per-side joins onto the pair table below; one
            # doc-sized checkpoint stops the token aggregation subtree
            # from executing twice
            sz = sz.localCheckpoint(eager=True)
    elif not hot_possible:
        sz = n_full.select(
            F.col(id_col), F.col("__nf"), F.col("__nf").alias("__nk")
        )
    # r9 (guide §2.3 — shuffle fewer bytes): the per-document size columns
    # join onto the AGGREGATED pair table, not the exploded token table.
    # The old shape joined sz into tok before the self-join, which (a)
    # shuffled the whole exploded token table against the per-doc table
    # and (b) dragged four int columns through every candidate row; pairs
    # after aggregation are orders of magnitude fewer rows than tokens.
    if n_part > cur_width:
        tok = tok.repartition(n_part, "gh")
    a = tok.alias("a")
    b = tok.alias("b")
    cand = a.join(
        b,
        (F.col("a.gh") == F.col("b.gh"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
    )
    if n_part > cur_width:
        # the pair aggregation is candidate-count-sized: partition it to
        # the same adaptive width (the aggregate reuses that partitioning
        # instead of funnelling through the session default)
        cand = cand.repartition(n_part, "id_a", "id_b")
    pc = (
        cand.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__ik"))
        .join(
            sz.select(
                F.col(id_col).alias("id_a"),
                F.col("__nf").alias("__nfa"),
                F.col("__nk").alias("__nka"),
            ),
            "id_a",
        )
        .join(
            sz.select(
                F.col(id_col).alias("id_b"),
                F.col("__nf").alias("__nfb"),
                F.col("__nk").alias("__nkb"),
            ),
            "id_b",
        )
    )
    # upper bound on the FULL-array intersection: retained-shingle matches
    # plus at most min(hot_a, hot_b) hot-shingle matches
    ub_i = F.col("__ik") + F.least(
        F.col("__nfa") - F.col("__nka"), F.col("__nfb") - F.col("__nkb")
    )
    ub_j = ub_i.cast("double") / (
        F.col("__nfa") + F.col("__nfb") - ub_i
    )
    pre = pc.where(ub_j >= threshold)
    clean_cond = (F.col("__nfa") == F.col("__nka")) & (
        F.col("__nfb") == F.col("__nkb")
    )
    jac_clean = F.col("__ik").cast("double") / (
        F.col("__nfa") + F.col("__nfb") - F.col("__ik")
    )
    out = pre.where(clean_cond).select(
        "id_a", "id_b", jac_clean.alias("jaccard")
    )
    if hot_possible:
        sa = staged.select(
            F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a")
        )
        sb = staged.select(
            F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b")
        )
        inter = F.expr("size(array_intersect(hs_a, hs_b))")
        dirty = (
            pre.where(~clean_cond)
            .select("id_a", "id_b")
            .join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                "id_a",
                "id_b",
                (
                    inter.cast("double")
                    / (F.expr("size(hs_a)") + F.expr("size(hs_b)") - inter)
                ).alias("jaccard"),
            )
            .where(F.col("jaccard") >= threshold)
        )
        out = out.unionByName(dirty)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def ngram_jaccard_pairs_sql(
    table: str,
    col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 1000,
) -> str:
    x = X(DUCK)
    hs = x.array_distinct(
        x.transform(x.word_ngrams(col, shingle_words), f"g -> {x.md5int('g')}")
    )
    df_filter = ""
    if max_df is not None:
        df_filter = (
            f"\n  WHERE gh NOT IN (SELECT gh FROM tok0 GROUP BY gh "
            f"HAVING COUNT(*) > {max_df})"
        )
    jac = (
        "CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) / "
        "(len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))"
    )
    return f"""
WITH staged AS (
  SELECT {id_col}, {hs} AS hs FROM {table}
),
tok0 AS (
  SELECT {id_col}, g.g AS gh FROM staged, unnest(staged.hs) AS g(g)
),
tok AS (
  SELECT {id_col}, gh FROM tok0{df_filter}
),
cand AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM tok a JOIN tok b ON a.gh = b.gh AND a.{id_col} < b.{id_col}
)
SELECT cand.id_a, cand.id_b, ROUND({jac}, 6) AS jaccard
FROM cand
JOIN staged sa ON sa.{id_col} = cand.id_a
JOIN staged sb ON sb.{id_col} = cand.id_b
WHERE {jac} >= {threshold}
"""


# --------------------------------------------------------------------------
# duplicate-group resolution: connected components + canonical selection
# --------------------------------------------------------------------------


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    driver_nmax: int | None = 1_000_000,
) -> DataFrame:
    """Connected components over an undirected edge list. Returns
    ``(id, component)`` where the component id is the minimum node id in
    the component.

    Two tiers. Near-dup edge lists are tiny relative to the corpus (pairs
    survive banding + verification), so when the distinct edge count is at
    most ``driver_nmax`` the components are solved with a driver-side
    union-find (path compression; milliseconds per 100k edges) and the
    node→component map is shipped back as a DataFrame — one count probe
    and one bounded collect instead of diameter× join rounds.

    Past the cap (or with ``driver_nmax=None``), distributed min-label
    propagation: every node repeatedly adopts the smallest label among
    itself and its neighbors until a fixpoint. The iteration state is one
    row per NODE (not per edge); each round is two edge⋈label joins + a
    groupBy-min, localCheckpoint-ed so the plan stays constant-size, with
    convergence checked by an Observation metric riding the same job.
    Rounds needed = graph diameter — near-dup graphs are unions of small
    cliques (diameter ≤ a few), so this terminates in 2-4 rounds at any
    corpus size; a chain-shaped adversarial graph is bounded by
    ``max_iter`` — exhausting it without converging raises (partial labels
    would silently yield a WRONG canonical keep-list downstream; raise
    ``max_iter`` for long-diameter graphs)."""
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).where(F.col(src) != F.col(dst)).distinct()
    e = e.localCheckpoint(eager=True)
    if driver_nmax is not None and e.count() <= driver_nmax:
        return _cc_driver_union_find(e)
    labels = (
        e.select(F.col("__s").alias("id"))
        .union(e.select(F.col("__d").alias("id")))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    for _ in range(max_iter):
        msgs = (
            e.join(labels, e["__s"] == labels["id"])
            .select(F.col("__d").alias("id"), "component")
            .union(
                e.join(labels, e["__d"] == labels["id"]).select(
                    F.col("__s").alias("id"), "component"
                )
            )
            .union(labels.select("id", "component"))
        )
        # the old label rides the min-aggregation so convergence is an
        # Observation metric of the SAME job — no separate compare pass
        merged = msgs.groupBy("id").agg(F.min("component").alias("component"))
        obs = Observation()
        staged = (
            merged.join(
                labels.select("id", F.col("component").alias("__old")), "id"
            )
            .observe(
                obs,
                F.sum(
                    (F.col("component") != F.col("__old")).cast("long")
                ).alias("ch"),
            )
            .select("id", "component")
        )
        new_labels = staged.localCheckpoint(eager=True)
        changed = int(obs.get["ch"] or 0)
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds ({changed} labels still changing); the "
            "graph's diameter exceeds max_iter — raise max_iter (rounds "
            "needed = graph diameter)."
        )
    return labels.select("id", "component")


def _cc_driver_union_find(e: DataFrame) -> DataFrame:
    """Driver tier of :func:`connected_components`: union-find with path
    compression over a collected (bounded) edge list; the node→min-id map
    returns as a DataFrame with the ids' original type."""
    from pyspark.sql import types as T

    pdf = e.toPandas()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf["__s"], pdf["__d"]):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for node in parent:
        r = find(node)
        m = comp_min.get(r)
        if m is None or node < m:
            comp_min[r] = node
    out = pd.DataFrame(
        {
            "id": list(parent.keys()),
            "component": [comp_min[find(n)] for n in parent],
        }
    )
    id_type = e.schema["__s"].dataType
    schema = T.StructType(
        [T.StructField("id", id_type), T.StructField("component", id_type)]
    )
    return e.sparkSession.createDataFrame(out, schema=schema)


def dedup_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    driver_nmax: int | None = 1_000_000,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into duplicate GROUPS over the full
    corpus: every document gets a ``component`` (min doc id of its
    duplicate cluster; singletons map to themselves) and ``is_canonical``
    (the one row per component to keep). The canonical is the minimum id
    PRESENT in ``df`` for that component — so when ``df`` is a filtered
    corpus that no longer contains a component's global min id, the group
    still keeps exactly one canonical row instead of silently losing the
    whole group to a keep-canonicals filter. This is the step a
    training-data pipeline actually ships: pairs → clusters → keep-list.
    ``driver_nmax`` routes small pair sets through the union-find fast
    path (see :func:`connected_components`)."""
    comp = connected_components(pairs, src=src, dst=dst, driver_nmax=driver_nmax)
    labeled = (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("id", id_col), on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("component"),
            F.col("component").isNotNull().alias("__in_graph"),
        )
    )
    # per-component min of the PRESENT ids — one row per pairs-graph
    # component (small by construction), broadcast back
    pmin = (
        labeled.where("__in_graph")
        .groupBy("component")
        .agg(F.min(id_col).alias("__pmin"))
    )
    return (
        labeled.join(F.broadcast(pmin), on="component", how="left")
        .select(
            id_col,
            "component",
            (
                F.col(id_col) == F.coalesce("__pmin", F.col(id_col))
            ).cast("boolean").alias("is_canonical"),
        )
    )


def dedup_components_sql(
    table: str,
    pairs_sql: str,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`dedup_components`: transitive closure of the
    (undirected) pair edges by a recursive CTE, component = min reachable
    id. ``pairs_sql`` is any query yielding (id_a, id_b) — e.g. the
    minhash-LSH pair query — so the full pairs→groups pipeline replays in
    ANSI SQL."""
    # cc_-prefixed CTE names: this query nests inside other oracles'
    # WITH RECURSIVE scopes (corpus_pipeline_sql), where a shared name
    # like `walk` would misbind across recursive scopes
    # cc_pairs/cc_edges are MATERIALIZED (r10): the recursive walk joins
    # cc_edges once per round, and DuckDB otherwise re-inlines the full
    # pairs subquery (the entire minhash-LSH pipeline when composed) into
    # every recursive step. Same rows either way.
    return f"""
WITH RECURSIVE cc_pairs AS MATERIALIZED ({pairs_sql}),
cc_edges AS MATERIALIZED (
  SELECT id_a AS s, id_b AS d FROM cc_pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM cc_pairs
),
cc_walk(id, reach) AS (
  SELECT s, s FROM cc_edges
  UNION
  SELECT w.id, e.d FROM cc_walk w JOIN cc_edges e ON e.s = w.reach
),
cc_comp AS (
  SELECT id, MIN(reach) AS component FROM cc_walk GROUP BY id
),
cc_joined AS (
  SELECT t.{id_col},
         COALESCE(cc_comp.component, t.{id_col}) AS component,
         cc_comp.component IS NOT NULL AS in_graph
  FROM {table} t
  LEFT JOIN cc_comp ON cc_comp.id = t.{id_col}
),
cc_pmin AS (
  SELECT component, MIN({id_col}) AS pm
  FROM cc_joined WHERE in_graph GROUP BY component
)
SELECT j.{id_col}, j.component,
       (j.{id_col} = COALESCE(p.pm, j.{id_col})) AS is_canonical
FROM cc_joined j
LEFT JOIN cc_pmin p USING (component)
"""


def _clip_kept_words_expr(x: X, col: str, starts: str, span_words: int) -> str:
    """Words of ``col`` not covered by any span starting at a 1-based word
    position in the ``starts`` array. Index-lambda bases differ: Spark's
    filter index is 0-based, DuckDB's is 1-based — normalized to 1-based
    here."""
    idx = "(i + 1)" if x.e == SPARK else "i"
    covered = x.filter(starts, f"s -> s <= {idx} AND {idx} < s + {span_words}")
    return x.filter(
        x.split_ws(col), f"(w, i) -> {x.size(covered)} = 0"
    )


def clip_spans(
    df: DataFrame,
    spans: DataFrame,
    span_words: int = 20,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove every occurrence of the listed spans from the corpus — the
    clipping pass that consumes :func:`hot_span_table` (global boilerplate
    deletion, the ExactSubstr remedy for spans too common to pairwise
    dedup). ``spans`` needs a ``span_hash`` column (any subset of the
    corpus's ``span_words``-token window hashes).

    A word is clipped when ANY listed span covers it; remaining words are
    rejoined with single spaces (whitespace is normalized by
    reconstruction — acceptable for training text, disclosed here). NULL
    documents pass through as NULL. Returns the input columns with ``col``
    replaced by the clipped text plus (n_words, n_words_kept).

    Scale shape: one posexplode scan of window hashes, an equi-join
    against the broadcast span list, a per-doc collect_list of matching
    START POSITIONS only (bounded by hits, not words), then a row-local
    rebuild. The corpus text itself never shuffles."""
    x = X(SPARK)
    grams = x.word_ngrams(col, span_words)
    hashed = x.transform(grams, f"g -> {x.md5int('g')}")
    nwords = x.size(x.split_ws(col))
    windows = df.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"CASE WHEN {nwords} >= {span_words} THEN {hashed} "
                f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
            )
        ).alias("pos0", "h"),
    )
    hits = windows.join(
        F.broadcast(spans.select(F.col("span_hash").cast("long").alias("h"))),
        "h",
    ).select(id_col, (F.col("pos0") + 1).cast("long").alias("start"))
    starts = hits.groupBy(id_col).agg(
        F.array_sort(F.collect_set("start")).alias("__starts")
    )
    joined = df.join(starts, id_col, "left")
    st = "coalesce(__starts, CAST(array() AS ARRAY<BIGINT>))"
    kept = _clip_kept_words_expr(x, col, st, span_words)
    keep_cols = [c for c in df.columns if c != col]
    return joined.select(
        *keep_cols,
        F.expr(
            f"CASE WHEN {col} IS NULL THEN NULL "
            + "ELSE " + x.array_join_expr(kept, "' '") + " END"
        ).alias(col),
        F.expr(
            f"CASE WHEN {col} IS NULL THEN NULL ELSE {nwords} END"
        ).cast("long").alias("n_words"),
        F.expr(
            f"CASE WHEN {col} IS NULL THEN NULL ELSE {x.size(kept)} END"
        ).cast("long").alias("n_words_kept"),
    )


def clip_spans_sql(
    table: str,
    spans_sql: str,
    span_words: int = 20,
    col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`clip_spans` (``spans_sql`` is a query with a
    ``span_hash`` column, e.g. :func:`hot_span_table_sql`)."""
    x = X(DUCK)
    grams = x.word_ngrams(col, span_words)
    hashed = x.transform(grams, f"g -> {x.md5int('g')}")
    nwords = x.size(x.split_ws(col))
    st = "coalesce(s.__starts, CAST([] AS BIGINT[]))"
    kept = _clip_kept_words_expr(x, f"d.{col}", st, span_words)
    join_expr = x.array_join_expr(kept, "' '")
    return f"""
WITH __arrs AS (
  SELECT {id_col},
         CASE WHEN {nwords} >= {span_words} THEN {hashed}
              ELSE CAST([] AS BIGINT[]) END AS ha
  FROM {table}
),
__w AS (
  SELECT {id_col}, CAST(ha[g.i] AS BIGINT) AS h, CAST(g.i AS BIGINT) AS pos
  FROM __arrs, unnest(generate_series(1, len(ha))) AS g(i)
),
__hits AS (
  SELECT DISTINCT w.{id_col}, CAST(w.pos AS BIGINT) AS start
  FROM __w w JOIN ({spans_sql}) sp ON w.h = CAST(sp.span_hash AS BIGINT)
),
__starts AS (
  SELECT {id_col}, list_sort(list(start)) AS __starts
  FROM __hits GROUP BY {id_col}
)
SELECT d.{id_col},
       CASE WHEN d.{col} IS NULL THEN NULL ELSE {join_expr} END AS {col},
       CAST(CASE WHEN d.{col} IS NULL THEN NULL ELSE {x.size(x.split_ws(f'd.{col}'))} END AS BIGINT) AS n_words,
       CAST(CASE WHEN d.{col} IS NULL THEN NULL ELSE {x.size(kept)} END AS BIGINT) AS n_words_kept
FROM {table} d LEFT JOIN __starts s USING ({id_col})
"""
