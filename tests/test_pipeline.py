"""End-to-end corpus pipeline composition through the facade: the full
quality-filter → dedup → decontaminate → split → encode → pack chain a
training-data job runs, with row accounting asserted at every stage.
Everything is lazy DataFrame composition — the point is that the operator
outputs feed each other without materialization or schema glue."""

import pyspark.sql.functions as F
import pytest

from dbreg_spark import pipeline as P


@pytest.fixture(scope="module")
def docs(tables):
    return tables["documents"]


def test_end_to_end_corpus_pipeline(spark, docs):
    n0 = docs.count()

    # 1. quality: per-doc stats + repetition + LM perplexity, one keep flag
    stats = P.text_stats(docs).select("doc_id", "quality_score", "n_tokens")
    rep = P.repetition_stats(docs).select("doc_id", "is_repetitive")
    lm = P.lm_quality_score(docs, max_vocab=1000).select("doc_id", "perplexity")
    med_ppl = lm.approxQuantile("perplexity", [0.9], 0.001)[0]
    quality = (
        stats.join(rep, "doc_id").join(lm, "doc_id")
        .withColumn(
            "keep_quality",
            (
                (F.col("quality_score") > 0.2)
                & (F.col("is_repetitive") == 0)
                & (F.col("perplexity") <= med_ppl)
            ).cast("int"),
        )
    )
    assert quality.count() == n0  # no doc lost by the quality stage

    # 2. dedup: exact canonicals ∩ semantic-independent survivors of the
    #    near-dup graph (pairs -> components -> canonical keep list)
    exact = P.exact_duplicates(docs)
    pairs = P.minhash_lsh_pairs(
        docs, n_hashes=16, band_rows=2, shingle_words=2, jaccard_threshold=0.3
    )
    comp = P.dedup_components(docs, pairs)
    keep_ids = (
        exact.where("is_canonical").select("doc_id")
        .intersect(comp.where("is_canonical").select("doc_id"))
    )
    n_kept_dedup = keep_ids.count()
    assert 0 < n_kept_dedup <= n0

    # 3. decontaminate against the src0 "benchmark" slice
    clean = P.decontaminate(docs, docs.where("source = 'src0'"), ngram_words=5)
    survivors = (
        quality.where("keep_quality = 1")
        .join(keep_ids, "doc_id")
        .join(clean.where("is_contaminated = 0"), "doc_id")
        .select("doc_id", "n_tokens")
    )
    n_surv = survivors.count()
    assert 0 < n_surv < n0  # every stage actually filtered something

    # 4. deterministic split, then encode + pack the train split
    final = docs.join(survivors.select("doc_id"), "doc_id")
    split = P.hash_split(final, {"train": 0.9, "val": 0.1})
    train = split.where("split = 'train'")
    vocab = P.vocab_with_ids(train, max_vocab=2000)
    enc = P.encode_tokens(train, vocab)
    packed = P.pack_greedy(
        enc.join(train.select("doc_id", "source"), "doc_id"),
        budget=512,
        size_col="n_tokens",
    )
    n_train = train.count()
    assert packed.count() == n_train  # packing loses nothing
    # pack accounting: token sums within each pack respect the budget
    # (oversized docs alone in a pack are the only allowed overflow)
    tok = enc.select("doc_id", "n_tokens")
    psum = (
        packed.join(tok, "doc_id")
        .groupBy("source", "pack_seq")
        .agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("m"))
    )
    bad = psum.where("t > 512 AND m > 1").count()
    assert bad == 0
    # encode round trip: no split doc exceeds its own token count in OOV
    assert enc.where("n_oov > n_tokens").count() == 0


def test_assemble_packs_reconstruction(spark, docs):
    """Pack assembly preserves every token exactly once and respects the
    budget (oversized docs alone excepted)."""
    train = docs.limit(200)
    vocab = P.vocab_with_ids(train, max_vocab=500)
    enc = P.encode_tokens(train, vocab)
    sized = enc.join(train.select("doc_id", "source"), "doc_id")
    packs = P.pack_greedy(sized, budget=256, size_col="n_tokens")
    from dbreg_spark.operators.text import assemble_packs

    out = assemble_packs(enc, packs)
    total_in = enc.agg(F.sum("n_tokens")).collect()[0][0]
    total_out = out.agg(F.sum("n_tokens")).collect()[0][0]
    assert total_in == total_out
    over = out.where("n_tokens > 256 AND n_docs > 1").count()
    assert over == 0
    # order within a pack follows offsets: spot-check one multi-doc pack
    row = out.where("n_docs > 1").first()
    if row is not None:
        members = (
            packs.where(
                (F.col("source") == row["source"])
                & (F.col("pack_seq") == row["pack_seq"])
            )
            .join(enc, "doc_id")
            .orderBy("pack_offset")
            .collect()
        )
        manual = [t for m in members for t in m["token_ids"]]
        assert manual == list(row["token_ids"])


def test_experiment_analysis_composition(spark):
    """The two halves of the engine compose: deterministic hash-split
    treatment assignment feeds dbreg, which recovers a known lift with a
    covering confidence interval."""
    import numpy as np

    from dbreg_spark import dbreg
    from dbreg_spark.operators.sampling import hash_split

    n = 20_000
    users = spark.range(n).selectExpr(
        "id AS user_id", "pmod(hash(id * 31), 8) AS segment"
    )
    assigned = hash_split(users, {"treat": 0.5, "control": 0.5}, id_col="user_id")
    rng_expr = (
        "2.0 * CAST(split = 'treat' AS INT)"
        " + segment * 0.5"
        " + (pmod(hash(user_id * 77), 1000) / 1000.0 - 0.5) * 6.0"
    )
    data = assigned.selectExpr(
        "user_id", "CAST(split = 'treat' AS DOUBLE) AS treated",
        "CAST(segment AS BIGINT) AS segment", f"{rng_expr} AS y",
    )
    m = dbreg("y ~ treated | segment", data, strategy="compress", vcov="hc1")
    est, se = m.coef()["treated"], m.se()["treated"]
    assert abs(est - 2.0) < 4 * se  # CI covers the true lift
    assert se < 0.1                  # and is tight at n=20k
    # assignment is balanced within noise
    counts = assigned.groupBy("split").count().toPandas().set_index("split")["count"]
    assert abs(counts["treat"] - counts["control"]) < 4 * np.sqrt(n)


def test_corpus_pipeline_composed_matches_stagewise(spark, docs):
    """VERDICT r06 #6: the ONE-call composed pipeline (corpus_pipeline)
    must equal running its stages by hand, and its packed manifest covers
    exactly the canonical+clean survivors."""
    from dbreg_spark.pipeline import corpus_pipeline

    out = corpus_pipeline(docs).toPandas()

    pairs = P.minhash_lsh_pairs(
        docs, n_hashes=16, band_rows=2, shingle_words=2,
        jaccard_threshold=0.3,
    )
    comp = P.dedup_components(docs, pairs)
    kept = docs.join(
        comp.where("is_canonical").select("doc_id"), "doc_id"
    )
    rep = P.repetition_stats(kept)
    clean = kept.join(
        rep.where(F.col("is_repetitive") == 0).select("doc_id"), "doc_id"
    )
    ref = P.pack_greedy(clean, budget=1000).toPandas()

    key = lambda d: sorted(  # noqa: E731
        zip(d["doc_id"], d["source"], d["pack_seq"], d["pack_offset"])
    )
    assert key(out) == key(ref)
    assert len(out) == clean.count() > 0
    assert len(out) < docs.count()  # both filters actually removed docs


def test_corpus_pipeline_keep_best_quality(spark, docs, duck):
    """keep='best_quality': each duplicate group keeps its argmax-quality
    member (ties to the smaller id), verified two ways — against the
    composed DuckDB twin, and semantically against a stagewise argmax."""
    from dbreg_spark.functions.xdialect import SPARK, X
    from dbreg_spark.operators.text import quality_score_expr
    from dbreg_spark.pipeline import corpus_pipeline, corpus_pipeline_sql
    import dbreg_spark.pipeline as P

    out = (
        corpus_pipeline(docs, keep="best_quality")
        .orderBy("doc_id")
        .collect()
    )
    sql = corpus_pipeline_sql("documents", keep="best_quality")
    orows = duck.execute(
        f"SELECT * FROM ({sql}) t ORDER BY doc_id"
    ).fetchall()
    assert [tuple(r) for r in out] == [tuple(r) for r in orows]

    # semantic check: the kept doc of every multi-member group maximizes
    # the quality score (stagewise reference, window-free)
    pairs = P.minhash_lsh_pairs(
        docs, n_hashes=16, band_rows=2, shingle_words=2,
        jaccard_threshold=0.3,
    )
    comp = P.dedup_components(docs, pairs).toPandas()
    q = docs.selectExpr(
        "doc_id", f"{quality_score_expr(X(SPARK), 'text')} AS q"
    ).toPandas().set_index("doc_id")["q"]
    kept_ids = {r[0] for r in out}
    groups = comp.groupby("component")["doc_id"].apply(list)
    import pytest as _pt

    for _, members in groups.items():
        best = sorted(members, key=lambda d: (-q[d], d))[0]
        survivors = [d for d in members if d in kept_ids]
        # groups fully removed by the repetition filter may have none
        if survivors:
            assert survivors == [best] or q[survivors[0]] == _pt.approx(q[best])

    with _pt.raises(ValueError, match="keep must be"):
        corpus_pipeline(docs, keep="nope")
