#!/usr/bin/env python
"""Round-10 phase probes (guide §1.4: noop sink / timed stage isolation).

Targets = VERDICT r9 "Next round" items: pipeline_corpus orchestration,
dedup_ngram_jaccard_hot, glm_multi_sw_logit residual, reg_conley pair
join, reg_demean_3fe_iter, text_repetition. Measurement tool only — not
part of the bench contract.

Usage: python tools_probe_r10.py [probe ...]
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
    print(
        f"{label:52s} min {min(ts):7.3f}  all {[round(t, 3) for t in ts]}",
        flush=True,
    )


def main():
    only = set(sys.argv[1:])

    def want(name):
        return not only or name in only

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    import pyspark.sql.functions as F

    from dbreg_spark.sources.io import get_session, load_tables

    spark = get_session(
        "probe_r10", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, SF_DIR, register=True)
    docs = t["documents"]
    li = t["lineitem"]

    if want("pipeline"):
        from dbreg_spark.operators.dedup import dedup_components, minhash_lsh_pairs
        from dbreg_spark.operators.text import pack_greedy, repetition_stats
        from dbreg_spark.pipeline import corpus_pipeline

        spark.sparkContext.setJobDescription("probe: pipeline full")
        timeit("pipeline_corpus full count", lambda: corpus_pipeline(docs).count())

        def stages():
            w = []
            t0 = time.perf_counter()
            pairs = minhash_lsh_pairs(
                docs, n_hashes=16, band_rows=2, shingle_words=2,
                jaccard_threshold=0.3,
            )
            w.append(("build pairs (lazy+probe collect)", time.perf_counter() - t0))
            t0 = time.perf_counter()
            comp = dedup_components(docs, pairs)
            w.append(("dedup_components (cc actions)", time.perf_counter() - t0))
            t0 = time.perf_counter()
            keep_ids = comp.where("is_canonical").select("doc_id")
            kept = docs.join(keep_ids, "doc_id", "inner")
            rep = repetition_stats(kept)
            surv = rep.where(F.col("is_repetitive") == 0).select("doc_id")
            clean = docs.join(surv, "doc_id", "inner")
            pg = pack_greedy(clean, budget=1000)
            w.append(("compose rest (lazy)", time.perf_counter() - t0))
            t0 = time.perf_counter()
            n = pg.count()
            w.append(("final count action", time.perf_counter() - t0))
            for lbl, s in w:
                print(f"    stage {lbl:38s} {s:7.3f}", flush=True)
            return n

        spark.sparkContext.setJobDescription("probe: pipeline stages")
        print("pipeline stage split (run 1):")
        stages()
        print("pipeline stage split (run 2):")
        stages()

    if want("ngram_hot"):
        from dbreg_spark.operators import dedup

        docs_hot = docs.withColumn(
            "text",
            F.concat(
                F.lit("common boilerplate header shared across this corpus "),
                F.col("text"),
            ),
        )
        spark.sparkContext.setJobDescription("probe: ngram hot full")
        timeit(
            "ngram_jaccard_hot full count",
            lambda: dedup.ngram_jaccard_pairs(
                docs_hot, shingle_words=3, threshold=0.5
            ).count(),
        )
        timeit(
            "ngram_jaccard main full count",
            lambda: dedup.ngram_jaccard_pairs(
                docs, shingle_words=3, threshold=0.5
            ).count(),
        )
        # stage splits inside the hot variant
        from dbreg_spark.functions.xdialect import SPARK, X

        x = X(SPARK)

        def hot_stages():
            w = []
            t0 = time.perf_counter()
            staged = docs_hot.select(
                F.col("doc_id"),
                F.expr(
                    x.array_distinct(
                        x.transform(
                            x.word_ngrams("text", 3), f"g -> {x.md5int('g')}"
                        )
                    )
                ).alias("hs"),
            ).localCheckpoint(eager=True)
            w.append(("staged checkpoint", time.perf_counter() - t0))
            tok = staged.select(F.col("doc_id"), F.explode("hs").alias("gh"))
            t0 = time.perf_counter()
            dfreq = tok.groupBy("gh").agg(F.count(F.lit(1)).alias("__df"))
            dd = F.col("__df").cast("double")
            st = dfreq.agg(
                F.sum(F.when(F.col("__df") <= 1000, dd * (dd - 1) / 2.0)).alias("c"),
                F.count(F.when(F.col("__df") > 1000, F.lit(1))).alias("h"),
            ).collect()[0]
            w.append((f"dfreq agg collect (cand={st['c']}, hot={st['h']})", time.perf_counter() - t0))
            hot = dfreq.where(F.col("__df") > 1000).select("gh")
            t0 = time.perf_counter()
            hot = hot.localCheckpoint(eager=True)
            w.append(("hot checkpoint", time.perf_counter() - t0))
            tok2 = tok.join(F.broadcast(hot), "gh", "left_anti")
            t0 = time.perf_counter()
            n_kept = tok2.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__nk"))
            szdf = staged.select("doc_id", F.size("hs").alias("__nf")).join(
                n_kept, "doc_id"
            ).localCheckpoint(eager=True)
            w.append(("sz checkpoint (n_kept agg)", time.perf_counter() - t0))
            a = tok2.alias("a")
            b = tok2.alias("b")
            cand = a.join(
                b,
                (F.col("a.gh") == F.col("b.gh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            ).select(
                F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
            )
            t0 = time.perf_counter()
            pc = cand.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("__ik"))
            m = pc.count()
            w.append((f"self-join + pair agg count ({m} pairs)", time.perf_counter() - t0))
            for lbl, s in w:
                print(f"    stage {lbl:48s} {s:7.3f}", flush=True)

        print("ngram_hot stage split (run 1):")
        hot_stages()
        print("ngram_hot stage split (run 2):")
        hot_stages()

    if want("glm_multi"):
        import cProfile
        import pstats

        from dbreg_spark.multi_glm import dbglm_multi

        li_ret = li.withColumn(
            "is_return", (F.col("l_returnflag") == "R").cast("double")
        )

        def run():
            return dbglm_multi(
                "is_return ~ l_quantity + csw(l_discount, l_linenumber, l_tax)",
                li_ret, family="binomial", vcov="hc1",
            )

        spark.sparkContext.setJobDescription("probe: glm_multi")
        timeit("glm_multi_sw_logit full", run, n=2)
        pr = cProfile.Profile()
        pr.enable()
        run()
        pr.disable()
        ps = pstats.Stats(pr).sort_stats("cumulative")
        ps.print_stats(28)

    if want("conley"):
        from dbreg_spark import dbreg

        li_geo = li.withColumn(
            "lat", (F.pmod(F.col("l_partkey"), F.lit(1200)) / 20.0 - 30.0)
        ).withColumn(
            "lon", (F.pmod(F.col("l_suppkey"), F.lit(1200)) / 20.0 - 30.0)
        )

        def run():
            return dbreg(
                "l_extendedprice ~ l_quantity + l_discount", li_geo,
                vcov="conley ~ lat + lon", conley_cutoff=0.5,
                conley_kernel="bartlett", conley_distance="euclidean",
                strategy="moments",
            )

        spark.sparkContext.setJobDescription("probe: conley")
        timeit("reg_conley full", run, n=3)

        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        run()
        pr.disable()
        ps = pstats.Stats(pr).sort_stats("cumulative")
        ps.print_stats(24)

    if want("demean3"):
        from dbreg_spark import dbreg

        def run():
            return dbreg(
                "l_extendedprice ~ l_quantity + l_discount | "
                "l_returnflag + l_linestatus + l_linenumber",
                li, strategy="demean", vcov="hc1",
            )

        spark.sparkContext.setJobDescription("probe: demean3")
        timeit("reg_demean_3fe_iter full", run, n=3)

    if want("repetition"):
        from dbreg_spark.operators.text import repetition_stats

        spark.sparkContext.setJobDescription("probe: repetition")
        timeit(
            "text_repetition full",
            lambda: repetition_stats(docs).agg(F.sum("is_repetitive")).collect(),
        )

    spark.stop()


if __name__ == "__main__":
    main()
