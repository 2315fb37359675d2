#!/usr/bin/env python
"""Phase probes for the expensive bench families (guide §1.4: noop sink).

Each probe isolates one stage of an operator's plan and times it on the
sf0.1 inputs with the same session shape as bench.py. Not part of the
bench contract — a measurement tool for OPTIMIZATION_r09.md.

Usage: python tools_probe_phases.py [probe ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(label, fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} min {min(ts):7.3f}  all {[round(t,3) for t in ts]}", flush=True)


def main():
    only = set(sys.argv[1:])

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    import pyspark.sql.functions as F

    from dbreg_spark.functions.xdialect import SPARK, X
    from dbreg_spark.sources.io import get_session, load_tables

    spark = get_session(
        "probe_phases", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, SF_DIR, register=True)
    docs = t["documents"]
    li = t["lineitem"]
    for df in t.values():
        df.count()

    x = X(SPARK)

    def want(name):
        return not only or name in only

    sc = spark.sparkContext

    if want("minhash"):
        from dbreg_spark.operators.dedup import (
            MH_MODB,
            MH_PRIME,
            _band_exprs,
            minhash_lsh_pairs,
            minhash_params,
        )

        sc.setJobDescription("probe: minhash shingle+md5 scan only")
        staged = docs.select(
            F.col("doc_id"),
            F.expr(x.shingle_hashes("text", 2, MH_MODB)).alias("__hs"),
        )
        timeit("minhash: shingle+md5 scan", lambda: noop(staged))

        params = minhash_params(16)
        sigs = staged.select(
            F.col("doc_id"), "__hs",
            *[
                F.expr(x.minhash_from_hashes("__hs", a_, b_, MH_PRIME)).alias(f"sig_{i}")
                for i, (a_, b_) in enumerate(params)
            ],
        )
        sc.setJobDescription("probe: minhash + 16 sigs")
        timeit("minhash: + 16 sig transforms", lambda: noop(sigs))

        bands = sigs.select(
            F.col("doc_id"), "__hs",
            F.posexplode(
                F.array(*[F.expr(be) for be in _band_exprs(x, 16, 2)])
            ).alias("band", "bucket"),
        )
        sc.setJobDescription("probe: minhash bands exploded")
        timeit("minhash: + band explode (no shuffle)", lambda: noop(bands))

        buckets = (
            bands.groupBy("band", "bucket")
            .agg(F.collect_list(F.struct(F.col("doc_id").alias("id"), F.col("__hs").alias("hs"))).alias("members"))
            .where(F.size("members") >= 2)
        )
        sc.setJobDescription("probe: minhash buckets (shuffle)")
        timeit("minhash: + bucket shuffle+collect_list", lambda: noop(buckets))

        sc.setJobDescription("probe: minhash full")
        timeit("minhash: full operator", lambda: minhash_lsh_pairs(
            docs, n_hashes=16, band_rows=2, shingle_words=2, jaccard_threshold=0.3
        ).count())

    if want("repetition"):
        from dbreg_spark.operators.text import repetition_stats, _repetition_token_arrays

        arrs = _repetition_token_arrays(x, "text", 2, 5)
        tagged = "concat(%s)" % ", ".join(
            f"{x.transform(a, f'v -> named_struct({chr(39)}kind{chr(39)}, {chr(39)}{k}{chr(39)}, {chr(39)}tok{chr(39)}, v)')}"
            for k, a in arrs.items()
        )
        expl = docs.select(
            F.col("doc_id"), F.explode(F.expr(tagged)).alias("__t")
        ).select("doc_id", F.col("__t.kind").alias("kind"), F.col("__t.tok").alias("tok"))
        sc.setJobDescription("probe: repetition tokenize+explode only")
        timeit("repetition: tokenize+explode scan", lambda: noop(expl))
        counts = expl.groupBy("doc_id", "kind", "tok").agg(F.count(F.lit(1)).alias("c"))
        sc.setJobDescription("probe: repetition + token shuffle")
        timeit("repetition: + (id,kind,tok) groupBy", lambda: noop(counts))
        sc.setJobDescription("probe: repetition full")
        timeit("repetition: full operator", lambda: noop(repetition_stats(docs)))

    if want("ngram"):
        from dbreg_spark.operators.dedup import ngram_jaccard_pairs

        staged = docs.select(
            F.col("doc_id"),
            F.expr(
                x.array_distinct(
                    x.transform(x.word_ngrams("text", 3), f"g -> {x.md5int('g')}")
                )
            ).alias("hs"),
        )
        sc.setJobDescription("probe: ngram shingle scan")
        timeit("ngram: shingle+md5 scan", lambda: noop(staged))
        sc.setJobDescription("probe: ngram full")
        timeit("ngram: full operator", lambda: ngram_jaccard_pairs(
            docs, shingle_words=3, threshold=0.5
        ).count())
        docs_hot = docs.withColumn(
            "text",
            F.concat(
                F.lit("common boilerplate header shared across this corpus "),
                F.col("text"),
            ),
        )
        sc.setJobDescription("probe: ngram hot full")
        timeit("ngram_hot: full operator", lambda: ngram_jaccard_pairs(
            docs_hot, shingle_words=3, threshold=0.5
        ).count())

    if want("conley"):
        from dbreg_spark import dbreg

        li_geo = li.withColumn(
            "lat", (F.pmod(F.col("l_partkey"), F.lit(1200)) / 20.0 - 30.0)
        ).withColumn(
            "lon", (F.pmod(F.col("l_suppkey"), F.lit(3000)) / 20.0 - 75.0)
        )
        sc.setJobDescription("probe: conley full fit")
        timeit("conley: full dbreg fit", lambda: dbreg(
            "l_extendedprice ~ l_quantity + l_discount", li_geo,
            vcov="conley ~ lat + lon", conley_cutoff=0.5,
            conley_kernel="bartlett", conley_distance="euclidean",
            strategy="moments",
        ), n=4)

    if want("fepois"):
        from dbreg_spark import dbglm

        sc.setJobDescription("probe: fepois full fit")
        timeit("fepois: full dbglm fit", lambda: dbglm(
            "l_linenumber ~ l_quantity + l_discount | l_returnflag",
            li, family="poisson", vcov="~ l_linestatus",
        ), n=4)
        from dbreg_spark.glm import _FEPOIS_PASS_STATS
        print("fepois pass stats:", _FEPOIS_PASS_STATS, flush=True)

    if want("pq"):
        from dbreg_spark.operators import similarity

        emb = t["embeddings"]
        qs = emb.where("vec_id < 5")
        books = similarity.fixed_pq_codebooks()
        codes = similarity.pq_encode(emb, books)
        sc.setJobDescription("probe: pq encode only")
        timeit("pq: encode only", lambda: noop(codes))
        sc.setJobDescription("probe: pq full")
        timeit("pq: full topk", lambda: similarity.pq_topk(emb, qs, books, k=10).count())

    if want("pipeline"):
        from dbreg_spark.pipeline import corpus_pipeline

        sc.setJobDescription("probe: pipeline full")
        timeit("pipeline: full", lambda: corpus_pipeline(docs).count())

    if want("multi"):
        from dbreg_spark import dbglm_multi

        li_ret = li.withColumn(
            "is_return", (F.col("l_returnflag") == "R").cast("double")
        )
        sc.setJobDescription("probe: glm multi lockstep")
        timeit("glm_multi_sw_logit: full", lambda: dbglm_multi(
            "is_return ~ l_quantity + csw(l_discount, l_linenumber, l_tax)",
            li_ret, family="binomial", vcov="hc1",
        ), n=4)


if __name__ == "__main__":
    main()
