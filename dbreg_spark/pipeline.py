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
    "quantize_int8", "random_projection",
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
]
