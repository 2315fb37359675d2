"""One-stop namespace for the training-data pipeline operators.

``from dbreg_spark import pipeline as P`` exposes the full corpus-pipeline
surface — dedup (exact / fuzzy / semantic / incremental / span-level),
similarity search, text quality and scrubbing, tokenization and batch
assembly, deterministic sampling and mixing, temporal joins and event
analytics, embedding hygiene, multimodal plumbing, and reporting —
without memorizing which ``operators.*`` module each lives in. Every
function here has a DuckDB oracle twin (``<name>_sql``) in its home
module and a correctness gate in ``__spark_entry__``; import from the
home module when you need the twin.
"""

from __future__ import annotations

from .operators.asof import (
    asof_join,
    funnel,
    interval_join,
    retention_cohorts,
)
from .operators.dedup import (
    clip_spans,
    connected_components,
    dedup_against,
    dedup_components,
    exact_duplicates,
    hot_span_table,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shared_span_pairs,
    simhash,
)
from .operators.multimodal import (
    decode_features,
    frame_sample_plan,
    resize_stub,
    synthesize_media,
)
from .operators.bpe import (
    BpeModel,
    encode_bpe,
    learn_bpe,
    word_frequencies,
)
from .operators.evaluate import (
    calibration_table,
    classifier_metrics,
    regression_metrics,
)
from .operators.numeric import (
    correlation_matrix,
    mad_outliers,
    standardize,
    vif,
    winsorize,
)
from .operators.report import corpus_report
from .operators.semistruct import json_fields, json_key_stats
from .operators.web import c4_filter, domain_stats, extract_urls
from .streaming.ops import enrich, streaming_corpus_stats, streaming_volume_anomaly
from .operators.sampling import (
    hash_split,
    top_fraction_by_group,
    plan_mixture,
    sample_mixture,
    stratified_sample,
)
from .operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    hyperplane_lsh_topk,
    ivf_topk,
    kmeans_centroids,
    l2_normalize,
    pq_encode,
    pq_topk,
    pq_topk_rerank,
    pq_train,
    quantize_int8,
    random_projection,
    semantic_dedup,
)
from .operators.text import (
    assemble_packs,
    bm25_topk,
    chunk_text,
    decontaminate,
    encode_tokens,
    fingerprints,
    importance_sample,
    importance_weights,
    lm_bigram_score,
    lm_quality_score,
    fit_quality_classifier,
    pack_greedy,
    redact_pii,
    quality_classify,
    repetition_stats,
    text_stats,
    vocab_with_ids,
    vocabulary,
)

__all__ = [
    # dedup
    "exact_duplicates", "minhash_signatures", "minhash_lsh_pairs",
    "ngram_jaccard_pairs", "simhash", "connected_components",
    "dedup_components", "dedup_against", "shared_span_pairs",
    "hot_span_table", "clip_spans", "semantic_dedup",
    # similarity / embeddings
    "cosine_topk", "hyperplane_lsh_topk", "ivf_topk",
    "embedding_neardup_pairs", "kmeans_centroids", "l2_normalize",
    "quantize_int8", "random_projection", "pq_train", "pq_encode",
    "pq_topk", "pq_topk_rerank",
    # text
    "text_stats", "fingerprints", "repetition_stats", "lm_quality_score", "lm_bigram_score",
    "redact_pii", "decontaminate", "vocabulary", "vocab_with_ids", "quality_classify",
    "classifier_metrics", "calibration_table", "regression_metrics",
    "BpeModel", "learn_bpe", "encode_bpe", "word_frequencies",
    "winsorize", "standardize", "mad_outliers", "correlation_matrix", "vif",
    "fit_quality_classifier",
    "encode_tokens", "bm25_topk", "importance_weights",
    "importance_sample", "chunk_text", "pack_greedy", "assemble_packs",
    # web-corpus cleaning / semi-structured
    "c4_filter", "extract_urls", "domain_stats", "json_fields", "json_key_stats",
    # sampling / mixing
    "hash_split", "stratified_sample", "plan_mixture", "sample_mixture",
    "top_fraction_by_group",
    # temporal / events
    "asof_join", "interval_join", "funnel", "retention_cohorts", "enrich",
    # multimodal
    "synthesize_media", "decode_features", "resize_stub",
    "frame_sample_plan",
    # reporting / monitoring
    "corpus_report", "streaming_corpus_stats", "streaming_volume_anomaly",
    # composed end-to-end
    "corpus_pipeline", "corpus_pipeline_sql",
]


def corpus_pipeline(
    df,
    *,
    budget: int = 1000,
    n_hashes: int = 16,
    band_rows: int = 2,
    shingle_words: int = 2,
    jaccard_threshold: float = 0.3,
    keep: str = "canonical",
):
    """The composed end-to-end corpus pipeline a training run actually
    ships: MinHash-LSH near-dup pairs -> connected components -> keep one
    canonical doc per duplicate group -> Gopher repetition filter ->
    greedy sequence packing. Returns the packed manifest
    (doc_id, source, pack_seq, pack_offset).

    ``keep``: which document survives each duplicate group —
    "canonical" (min present doc id, dedup_components' default) or
    "best_quality" (argmax of the composite text-quality score, ties to
    the smaller id; the ranking window runs over the SLIM
    (doc_id, component, quality) table, never the text).

    Every stage is its own gated operator; this composition exercises what
    only shows up end-to-end at 100 TB — cumulative shuffle volume,
    lineage length across the localCheckpointed stages, and the cache
    boundaries between them. The plan stays fully distributed: the only
    driver transfers are the stages' own bounded collects (union-find
    under ``driver_nmax`` edges, broadcast keep-lists)."""
    import pyspark.sql.functions as F

    from .operators.dedup import dedup_components, minhash_lsh_pairs
    from .operators.text import pack_greedy, repetition_stats

    if keep not in ("canonical", "best_quality"):
        raise ValueError("keep must be 'canonical' or 'best_quality'")
    pairs = minhash_lsh_pairs(
        df,
        n_hashes=n_hashes,
        band_rows=band_rows,
        shingle_words=shingle_words,
        jaccard_threshold=jaccard_threshold,
    )
    comp = dedup_components(df, pairs)
    if keep == "canonical":
        keep_ids = comp.where("is_canonical").select("doc_id")
    else:
        from pyspark.sql import Window

        from .functions.xdialect import SPARK, X
        from .operators.text import quality_score_expr

        q = df.select(
            "doc_id",
            F.expr(quality_score_expr(X(SPARK), "text")).alias("__q"),
        )
        win = Window.partitionBy("component").orderBy(
            F.col("__q").desc(), F.col("doc_id")
        )
        keep_ids = (
            comp.join(q, "doc_id")
            .withColumn("__rn", F.row_number().over(win))
            .where("__rn = 1")
            .select("doc_id")
        )
    # r10 (guide §2.4/§5): the keep-list and the repetition-survivor list
    # are the pipeline's stage frontiers — slim doc_id tables consumed by
    # MULTIPLE downstream subtrees. Un-checkpointed, keep_ids replayed its
    # whole upstream (df-id scan + component map + present-min aggregate)
    # once per reference (repetition_stats reads `kept` twice), and
    # pack_greedy's sub-shard probe is an ACTION that executed the entire
    # composed plan once before the final pass re-ran it — the corpus was
    # scanned 14x per run and the 8->32-core scaling ratio was 1.05
    # (driver/planning-bound). localCheckpointing both frontiers runs each
    # stage ONCE and truncates the plan the final action re-analyzes.
    keep_ids = keep_ids.localCheckpoint(eager=True)
    kept = df.join(keep_ids, "doc_id", "inner")
    rep = repetition_stats(kept)
    # r9: the repetition survivors are a SUBSET of keep_ids, so the clean
    # corpus is df ⋈ survivors directly — joining kept again would replay
    # the df ⋈ keep_ids subtree (one extra full text scan + join in the
    # same plan; guide §2.4, remove duplicated subtrees). Row set is
    # identical: kept ∩ ok = df ⋈ (keep ∩ ok) = df ⋈ ok.
    surv = (
        rep.where(F.col("is_repetitive") == 0)
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    clean = df.join(surv, "doc_id", "inner")
    return pack_greedy(clean, budget=budget)


def corpus_pipeline_sql(
    table: str,
    *,
    budget: int = 1000,
    n_hashes: int = 16,
    band_rows: int = 2,
    shingle_words: int = 2,
    jaccard_threshold: float = 0.3,
    keep: str = "canonical",
) -> str:
    """DuckDB twin of :func:`corpus_pipeline`: the stage oracles composed
    as nested subqueries (each stage's own WITH RECURSIVE stays scoped to
    its derived table)."""
    from .operators.dedup import dedup_components_sql, minhash_lsh_pairs_sql
    from .operators.text import pack_greedy_sql, repetition_stats_sql

    pairs_sql = minhash_lsh_pairs_sql(
        table,
        n_hashes=n_hashes,
        band_rows=band_rows,
        shingle_words=shingle_words,
        jaccard_threshold=jaccard_threshold,
    )
    comp_sql = dedup_components_sql(table, pairs_sql)
    if keep == "canonical":
        kept_sql = (
            f"SELECT t.* FROM {table} t JOIN (\n{comp_sql}\n) __comp"
            " ON t.doc_id = __comp.doc_id AND __comp.is_canonical"
        )
    elif keep == "best_quality":
        from .functions.xdialect import DUCK, X
        from .operators.text import quality_score_expr

        qs = quality_score_expr(X(DUCK), "t.text")
        keep_ids_sql = (
            "SELECT doc_id FROM ("
            "SELECT c.doc_id, ROW_NUMBER() OVER ("
            "PARTITION BY c.component "
            f"ORDER BY ({qs}) DESC, c.doc_id"
            f") AS __rn FROM (\n{comp_sql}\n) c "
            f"JOIN {table} t ON t.doc_id = c.doc_id"
            ") WHERE __rn = 1"
        )
        kept_sql = (
            f"SELECT t.* FROM {table} t JOIN (\n{keep_ids_sql}\n) __keep"
            " ON t.doc_id = __keep.doc_id"
        )
    else:
        raise ValueError("keep must be 'canonical' or 'best_quality'")
    # r10: the stage results are MATERIALIZED CTEs in a nested scope, so
    # the kept corpus (which embeds the recursive connected-components
    # walk) and the repetition table each evaluate ONCE — inlined as bare
    # subqueries, DuckDB re-evaluated kept inside rep AND clean, and the
    # outer pack walk re-inlined the whole composition per recursive step
    # (583 s at sf0.001 vs ~2 s materialized). Same rows either way.
    rep_sql = repetition_stats_sql("cp_kept")
    clean_with_ctes = (
        "(\nWITH cp_kept AS MATERIALIZED (\n"
        f"{kept_sql}\n),\n"
        f"cp_rep AS MATERIALIZED (\n{rep_sql}\n)\n"
        "SELECT k.* FROM cp_kept k JOIN cp_rep"
        " ON k.doc_id = cp_rep.doc_id AND cp_rep.is_repetitive = 0"
        "\n) __clean"
    )
    return pack_greedy_sql(clean_with_ctes, budget=budget)
