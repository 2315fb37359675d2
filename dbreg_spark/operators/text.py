"""Text-analysis operators for training-data pipelines.

All metrics are plain column expressions (JVM-side, codegen-friendly — no
Python UDFs) built from the cross-dialect templates in
:mod:`dbreg_spark.functions.xdialect`, so each operator has a DuckDB oracle
that is the same computation by construction.

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length/punctuation/stopword signals), n-gram-heuristic language ID,
document fingerprinting (normalized md5 + rolling word hash), greedy
sequence packing, overlap-aware context-window chunking, train/eval
decontamination, PII redaction, Gopher-style repetition filters,
CCNet-style LM perplexity scoring, BM25 keyword retrieval, DSIR
importance weighting + deterministic weighted resampling, and corpus
vocabulary/IDF induction. The stateful scans (pack_greedy) use grouped
``applyInPandas`` — the disclosed Arrow escape hatch; everything else is
column expressions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.xdialect import DUCK, SPARK, WS, X

# BPE-ish tokenization: letter runs, single digits, punctuation marks.
# The negated class spells out whitespace (WS) instead of \s — Java and
# RE2 disagree on whether \x0B is whitespace (see xdialect.WS).
BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\r\f]"
PUNCT_RE = r"[!-/:-@\[-`{-~]"

STOPWORDS_EN = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "that"]
# tiny marker lists for the language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "y", "los", "es"],
    "it": ["il", "la", "e", "che", "di"],
}


def _in_list(words: list[str]) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def text_stats_exprs(x: X, col: str) -> list[tuple[str, str]]:
    """(alias, expression) pairs for the per-document text statistics."""
    words = x.split_ws(col)
    n_tok = f"CASE WHEN length({x.trim_ws(col)}) = 0 THEN 0 ELSE {x.size(words)} END"
    n_stop = x.size(x.filter(words, f"t -> lower(t) IN {_in_list(STOPWORDS_EN)}"))
    n_uniq = x.size(x.array_distinct(words))
    exprs = [
        ("n_chars_c", f"CAST(length({col}) AS BIGINT)"),
        ("n_tokens", f"CAST({n_tok} AS BIGINT)"),
        ("n_tokens_bpe", f"CAST({x.regexp_count(col, BPE_RE)} AS BIGINT)"),
        (
            "punct_ratio",
            f"CAST(length({col}) - length({x.regexp_replace_all(col, PUNCT_RE, '')}) AS DOUBLE)"
            f" / greatest(length({col}), 1)",
        ),
        (
            "digit_ratio",
            f"CAST(length({col}) - length({x.regexp_replace_all(col, '[0-9]', '')}) AS DOUBLE)"
            f" / greatest(length({col}), 1)",
        ),
        (
            "stopword_ratio",
            f"CAST({n_stop} AS DOUBLE) / greatest({n_tok}, 1)",
        ),
        (
            "unique_token_ratio",
            f"CAST({n_uniq} AS DOUBLE) / greatest({n_tok}, 1)",
        ),
        (
            "mean_token_len",
            f"CAST(length({x.regexp_replace_all(col, WS, '')}) AS DOUBLE)"
            f" / greatest({n_tok}, 1)",
        ),
    ]
    return exprs


def quality_score_expr(x: X, col: str) -> str:
    """Composite quality score in [0, 1]: favors mid-length documents with
    some stopwords, low punctuation/digit noise, and lexical diversity."""
    words = x.split_ws(col)
    n_tok = f"CASE WHEN length({x.trim_ws(col)}) = 0 THEN 0 ELSE {x.size(words)} END"
    n_stop = x.size(x.filter(words, f"t -> lower(t) IN {_in_list(STOPWORDS_EN)}"))
    n_uniq = x.size(x.array_distinct(words))
    len_score = f"least(CAST({n_tok} AS DOUBLE) / 100.0, 1.0)"
    stop_score = f"least(CAST({n_stop} AS DOUBLE) / greatest({n_tok}, 1) * 5.0, 1.0)"
    div_score = f"CAST({n_uniq} AS DOUBLE) / greatest({n_tok}, 1)"
    punct = (
        f"CAST(length({col}) - length({x.regexp_replace_all(col, PUNCT_RE, '')}) AS DOUBLE)"
        f" / greatest(length({col}), 1)"
    )
    return (
        f"0.25 * {len_score} + 0.25 * {stop_score} + 0.25 * {div_score} "
        f"+ 0.25 * (1.0 - least({punct} * 10.0, 1.0))"
    )


def lang_id_expr(x: X, col: str) -> str:
    """Greatest-marker-hit language guess; 'und' when nothing matches."""
    words = f"__w"
    scores = {
        lang: x.size(x.filter(x.split_ws(col), f"t -> lower(t) IN {_in_list(ms)}"))
        for lang, ms in LANG_MARKERS.items()
    }
    langs = list(scores)
    best = f"greatest({', '.join(scores.values())})"
    cases = " ".join(
        f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in langs
    )
    return f"CASE WHEN {best} = 0 THEN 'und' ELSE CASE {cases} END END"


def fingerprint_exprs(x: X, col: str) -> list[tuple[str, str]]:
    """Document fingerprints: md5 of whitespace-normalized lowercase text,
    plus a rolling 40-bit polynomial hash over word hashes (order-sensitive,
    overflow-free on both engines)."""
    norm = f"lower({x.regexp_replace_all(x.trim_ws(col), WS + '+', ' ')})"
    words = x.split_ws(col)
    word_h = x.transform(words, f"w -> {x.md5int('lower(w)')} % 1099511627776")
    rolling = x.reduce_bigint(
        word_h, "0", "(acc, h) -> (acc * 31 + h) % 1099511627776"
    )
    return [
        ("fp_md5", f"md5({norm})"),
        ("fp_rolling", f"CAST({rolling} AS BIGINT)"),
    ]


# --------------------------------------------------------------------------
# Spark-side entry points
# --------------------------------------------------------------------------


def text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    x = X(SPARK)
    keep = [c for c in df.columns if c != col]
    return df.select(
        *keep,
        *[F.expr(e).alias(a) for a, e in text_stats_exprs(x, col)],
        F.expr(quality_score_expr(x, col)).alias("quality_score"),
        F.expr(lang_id_expr(x, col)).alias("lang_pred"),
    )


def fingerprints(df: DataFrame, col: str = "text") -> DataFrame:
    x = X(SPARK)
    keep = [c for c in df.columns if c != col]
    return df.select(
        *keep, *[F.expr(e).alias(a) for a, e in fingerprint_exprs(x, col)]
    )


# --------------------------------------------------------------------------
# DuckDB oracle SQL
# --------------------------------------------------------------------------


def text_stats_sql(table: str, col: str = "text", id_col: str = "doc_id") -> str:
    x = X(DUCK)
    cols = [f"{id_col}"]
    cols += [f"{e} AS {a}" for a, e in text_stats_exprs(x, col)]
    cols.append(f"{quality_score_expr(x, col)} AS quality_score")
    cols.append(f"{lang_id_expr(x, col)} AS lang_pred")
    return "SELECT " + ",\n  ".join(cols) + f" FROM {table}"


def fingerprints_sql(table: str, col: str = "text", id_col: str = "doc_id") -> str:
    x = X(DUCK)
    cols = [id_col] + [f"{e} AS {a}" for a, e in fingerprint_exprs(x, col)]
    return "SELECT " + ",\n  ".join(cols) + f" FROM {table}"


# --------------------------------------------------------------------------
# greedy sequence packing (training-batch assembly)
# --------------------------------------------------------------------------


def pack_greedy(
    df: DataFrame,
    budget: int,
    size_col: str = "n_chars",
    shard_col: str = "source",
    id_col: str = "doc_id",
    max_rows_per_task: int | None = 2_000_000,
) -> DataFrame:
    """Greedy sequential packing of documents into ≤ ``budget``-sized packs,
    shard-local (the way sample packing actually runs at 100 TB: each shard
    packs independently, so the operator parallelizes per ``shard_col``
    group with zero cross-shard coordination). Documents are taken in
    ``id_col`` order; a document that would overflow the running pack opens
    the next one (an oversized document occupies a pack alone). Returns
    (``id_col``, ``shard_col``, pack_seq, pack_offset) — ``pack_seq``
    numbers packs within the shard, ``pack_offset`` is the document's start
    position in its pack.

    Stateful sequential scan → grouped ``applyInPandas`` (Arrow-batched;
    the sanctioned custom-operator escape hatch, like the sessionizer) with
    a recursive-CTE SQL twin for the oracle.

    ``applyInPandas`` materializes one GROUP per task, so shards whose row
    count exceeds ``max_rows_per_task`` (a groupBy-count probe of the
    3-column projection; ~2M rows ≈ low hundreds of MB of pandas) are
    AUTOMATICALLY sub-sharded by a hash bucket of ``id_col`` before packing
    — packing quality is shard-local anyway, finer shards only add pack
    boundaries, never overflow a pack. Sub-shard pack numbers are
    renumbered to stay contiguous and unique within the original shard
    (doc order holds within each sub-shard, not across them). Pass
    ``max_rows_per_task=None`` to skip the probe and trust the shard key."""
    import pandas as pd
    from pyspark.sql import types as T

    proj = df.select(id_col, shard_col, size_col)

    def make_pack(extra_cols):
        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(id_col)
            seqs, offs = [], []
            seq, acc = 0, 0
            first = True
            for n in pdf[size_col].astype("int64"):
                if not first and acc + n > budget:
                    seq += 1
                    acc = 0
                offs.append(acc)
                seqs.append(seq)
                acc += int(n)
                first = False
            out = {
                id_col: pdf[id_col].astype("int64"),
                # keep NULL shards NULL — astype(str) would stringify
                # them to the literal "None", colliding with a real shard
                # of that name and breaking joins back to the corpus
                shard_col: pdf[shard_col].astype(object).where(
                    pdf[shard_col].notna(), None
                ),
                "pack_seq": pd.Series(seqs, dtype="int64").values,
                "pack_offset": pd.Series(offs, dtype="int64").values,
            }
            for c in extra_cols:
                out[c] = pdf[c].astype("int64")
            return pd.DataFrame(out)

        return pack

    base_fields = [
        T.StructField(id_col, T.LongType()),
        T.StructField(shard_col, T.StringType()),
        T.StructField("pack_seq", T.LongType()),
        T.StructField("pack_offset", T.LongType()),
    ]

    big = None
    if max_rows_per_task is not None:
        counts = proj.groupBy(shard_col).agg(
            F.count(F.lit(1)).alias("__n")
        )
        big = (
            counts.where(F.col("__n") > max_rows_per_task)
            .select(
                shard_col,
                F.ceil(F.col("__n") / F.lit(float(max_rows_per_task)))
                .cast("int")
                .alias("__nsub"),
            )
            .collect()
        )
    if not big:
        return proj.groupBy(shard_col).applyInPandas(
            make_pack([]), T.StructType(base_fields)
        )

    # oversized shards: sub-shard by a hash bucket of the id, pack within
    # (shard, sub), then renumber so pack_seq is contiguous per shard —
    # the renumbering tables are one row per (shard, sub), tiny
    from pyspark.sql import Window

    spark = df.sparkSession
    nsub_schema = T.StructType(
        [
            T.StructField("__shard_key", proj.schema[shard_col].dataType),
            T.StructField("__nsub", T.IntegerType()),
        ]
    )
    nsub_tbl = spark.createDataFrame(
        [(r[0], r[1]) for r in big], schema=nsub_schema
    )
    # null-safe join: a NULL shard value is a real (and possibly
    # oversized) group — a plain left join would never match it and
    # silently bypass the max_rows_per_task guard
    p2 = (
        proj.join(
            F.broadcast(nsub_tbl),
            proj[shard_col].eqNullSafe(nsub_tbl["__shard_key"]),
            how="left",
        )
        .drop("__shard_key")
        .withColumn(
            "__sub",
            F.when(F.col("__nsub").isNull(), F.lit(0)).otherwise(
                F.pmod(F.hash(F.col(id_col)), F.col("__nsub"))
            ),
        )
        .drop("__nsub")
    )
    sub_schema = T.StructType(
        base_fields + [T.StructField("__sub", T.LongType())]
    )
    packed = p2.groupBy(shard_col, "__sub").applyInPandas(
        make_pack(["__sub"]), sub_schema
    )
    # both the renumbering probe and the final join consume `packed`;
    # materialize it once or the applyInPandas packing of the whole
    # corpus runs twice — at exactly the sizes the guard targets
    packed = packed.localCheckpoint(eager=True)
    per_sub = packed.groupBy(shard_col, "__sub").agg(
        (F.max("pack_seq") + 1).alias("__np")
    )
    w = (
        Window.partitionBy(shard_col)
        .orderBy("__sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_sub.select(
        shard_col,
        "__sub",
        F.coalesce(F.sum("__np").over(w), F.lit(0)).alias("__seq_off"),
    )
    # null-safe on the shard key: a NULL shard is a real group (the
    # null-safe guard join above routed it here) and a plain equi-join
    # would drop every row of it
    off = offsets.withColumnRenamed(shard_col, "__off_shard")
    return (
        packed.join(
            F.broadcast(off),
            packed[shard_col].eqNullSafe(off["__off_shard"])
            & (packed["__sub"] == off["__sub"]),
        )
        .withColumn("pack_seq", F.col("pack_seq") + F.col("__seq_off"))
        .select(id_col, shard_col, "pack_seq", "pack_offset")
    )


def pack_greedy_sql(
    table: str,
    budget: int,
    size_col: str = "n_chars",
    shard_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`pack_greedy`: the greedy accumulator as a
    row-by-row recursive CTE per shard (oracle-scale only — recursion depth
    = rows per shard)."""
    # pk_-prefixed CTE names: safe to nest among other recursive oracles
    # (corpus_pipeline_sql) — a shared `walk` would misbind across scopes.
    # pk_ordered is MATERIALIZED (r10): the recursive walk joins it once
    # per row, and DuckDB otherwise re-inlines the (possibly deeply
    # composed) ``table`` subquery into every recursive step — measured
    # 583 s for the sf0.001 corpus_pipeline oracle vs ~2 s materialized.
    # Same rows either way.
    return f"""
WITH RECURSIVE pk_ordered AS MATERIALIZED (
  SELECT {id_col}, {shard_col}, {size_col},
         ROW_NUMBER() OVER (PARTITION BY {shard_col} ORDER BY {id_col}) AS rn
  FROM {table}
),
pk_walk(doc_id, shard, rn, pack_seq, pack_offset, acc) AS (
  SELECT {id_col}, {shard_col}, rn,
         CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST({size_col} AS BIGINT)
  FROM pk_ordered WHERE rn = 1
  UNION ALL
  SELECT o.{id_col}, o.{shard_col}, o.rn,
         CASE WHEN w.acc + o.{size_col} > {budget}
              THEN w.pack_seq + 1 ELSE w.pack_seq END,
         CASE WHEN w.acc + o.{size_col} > {budget}
              THEN CAST(0 AS BIGINT) ELSE w.acc END,
         CASE WHEN w.acc + o.{size_col} > {budget}
              THEN CAST(o.{size_col} AS BIGINT) ELSE w.acc + o.{size_col} END
  FROM pk_walk w JOIN pk_ordered o
    ON o.{shard_col} = w.shard AND o.rn = w.rn + 1
)
SELECT doc_id AS {id_col}, shard AS {shard_col}, pack_seq, pack_offset
FROM pk_walk
"""


# --------------------------------------------------------------------------
# context-window chunking
# --------------------------------------------------------------------------


def chunk_text(
    df: DataFrame,
    max_chars: int = 1000,
    overlap: int = 0,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into ≤ ``max_chars`` chunks with ``overlap``
    characters of left context carried into each subsequent chunk — the
    context-window splitting step of a training pipeline. Returns
    (``id_col``, chunk_id, chunk_start, chunk) where ``chunk_start`` is the
    1-based character offset; documents at or under ``max_chars``
    (including empty ones) yield exactly one chunk.

    Pure column expressions: chunk count = ceil((len − overlap) / stride)
    with stride = max_chars − overlap, ``posexplode(sequence(...))`` per
    doc, one ``substring`` per chunk — embarrassingly parallel, zero
    shuffles, whole-stage codegen. Output size ≈ input × (1 +
    overlap/stride); no driver involvement at any corpus size.

    Documents with a NULL text column keep exactly one output row with a
    NULL chunk (both engines' GREATEST ignores the NULL length, so the
    chunk count is 1) — no document silently disappears; filter
    ``chunk IS NOT NULL`` downstream if NULL docs should be dropped."""
    if overlap >= max_chars:
        raise ValueError("overlap must be smaller than max_chars")
    stride = max_chars - overlap
    ln = F.length(F.col(col))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((ln - F.lit(overlap)) / F.lit(float(stride)))
    ).cast("int")
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        F.col(col),
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("chunk_id").cast("long") * stride + 1).alias("chunk_start"),
        F.substring(
            F.col(col), F.col("chunk_id") * stride + 1, max_chars
        ).alias("chunk"),
    )


def chunk_text_sql(
    table: str,
    max_chars: int = 1000,
    overlap: int = 0,
    col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`chunk_text`."""
    if overlap >= max_chars:
        raise ValueError("overlap must be smaller than max_chars")
    stride = max_chars - overlap
    return f"""
SELECT {id_col},
       CAST(g.i AS BIGINT) AS chunk_id,
       CAST(g.i * {stride} + 1 AS BIGINT) AS chunk_start,
       substr({col}, (g.i * {stride} + 1)::INTEGER, {max_chars}) AS chunk
FROM {table},
     unnest(generate_series(0,
        GREATEST(1, CAST(CEIL((LENGTH({col}) - {overlap}) / {float(stride)}) AS BIGINT)) - 1
     )) AS g(i)
"""


# --------------------------------------------------------------------------
# train/eval decontamination
# --------------------------------------------------------------------------


def decontaminate(
    corpus: DataFrame,
    reference: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    ngram_words: int = 8,
    min_hits: int = 1,
    broadcast_reference: bool = True,
) -> DataFrame:
    """Train/eval decontamination: flag corpus documents sharing word
    n-grams with a reference (benchmark/eval) set — the standard n-gram
    overlap check run before training so test data never leaks into the
    training corpus. Returns one row per corpus document:
    (``id_col``, ``n_hits`` = distinct contaminated n-grams,
    ``is_contaminated`` = 1 when ``n_hits ≥ min_hits``). Filter with
    ``.where("is_contaminated = 0")`` to produce the clean corpus.

    Scale shape: the reference's distinct n-gram hashes are broadcast
    (eval sets are small by construction — benchmarks are KBs against a
    100 TB corpus), the corpus is scanned ONCE (explode of per-doc
    distinct n-gram hashes → broadcast inner join → groupBy count), and
    the only shuffle carries (id, count) pairs. Set
    ``broadcast_reference=False`` for a pathologically large reference
    (falls back to a shuffle join on the n-gram hash).

    ``ngram_words`` defaults to 8 — long enough that a match is evidence
    of copying rather than phrase reuse (the 8-to-13-gram range is the
    published convention for benchmark decontamination)."""
    x = X(SPARK)

    def ng(c: str) -> str:
        return x.array_distinct(
            x.transform(x.word_ngrams(c, ngram_words), f"g -> {x.md5int('g')}")
        )

    ref = reference.select(F.explode(F.expr(ng(col))).alias("gh")).distinct()
    if broadcast_reference:
        ref = F.broadcast(ref)
    tok = corpus.select(F.col(id_col), F.explode(F.expr(ng(col))).alias("gh"))
    hits = (
        tok.join(ref, "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits)
            .cast("int")
            .alias("is_contaminated"),
        )
    )


def decontaminate_sql(
    table: str,
    reference_sql: str,
    col: str = "text",
    id_col: str = "doc_id",
    ngram_words: int = 8,
    min_hits: int = 1,
) -> str:
    """DuckDB twin of :func:`decontaminate`; ``reference_sql`` is any query
    with the same text column (e.g. a filtered subset of ``table``)."""
    x = X(DUCK)

    def ng(c: str) -> str:
        return x.array_distinct(
            x.transform(x.word_ngrams(c, ngram_words), f"g -> {x.md5int('g')}")
        )

    return f"""
WITH ref AS (
  SELECT DISTINCT t.gh FROM ({reference_sql}) r, unnest({ng(col)}) AS t(gh)
),
tok AS (
  SELECT {id_col}, t.gh FROM {table}, unnest({ng(col)}) AS t(gh)
),
hits AS (
  SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM tok JOIN ref USING (gh)
  GROUP BY {id_col}
)
SELECT d.{id_col},
       COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) >= {min_hits} AS INT) AS is_contaminated
FROM {table} d LEFT JOIN hits h USING ({id_col})
"""


# --------------------------------------------------------------------------
# repetition statistics (Gopher-style quality filters)
# --------------------------------------------------------------------------

# Gopher-inspired repetition thresholds (Rae et al. 2021, table A1 family):
# a document breaching ANY of them is flagged repetitive.
REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_ngram_char_frac": 0.20,
    "dup_ngram_char_frac": 0.15,
}


def _repetition_token_arrays(
    x: X, col: str, top_ngram: int, dup_ngram: int
) -> dict[str, str]:
    """The three token arrays the repetition metrics count over: non-blank
    lines, ``top_ngram``-grams, ``dup_ngram``-grams. Documents with fewer
    than n words contribute NO n-grams (the metric is 0, not the whole-doc
    shingle the minhash path uses)."""
    lines = x.filter(
        x.split_re(col, r"\n"), f"l -> length({x.trim_ws('l')}) > 0"
    )
    words = x.split_ws(col)
    out = {"L": lines}
    for kind, n in (("T", top_ngram), ("D", dup_ngram)):
        out[kind] = (
            f"CASE WHEN {x.size(words)} >= {n} "
            f"THEN {x.word_ngrams(col, n)} "
            f"ELSE {x.empty_str_array()} END"
        )
    return out


def repetition_stats(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    top_ngram: int = 2,
    dup_ngram: int = 5,
    thresholds: dict[str, float] = REPETITION_THRESHOLDS,
) -> DataFrame:
    """Gopher-style repetition quality metrics per document — the standard
    "remove boilerplate / machine-generated repetition" filter stage of an
    LLM training-data pipeline (Rae et al. 2021; reproduced by RefinedWeb /
    FineWeb / DataTrove). Returns one row per document:

    - ``n_lines``: non-blank line count
    - ``dup_line_frac``: fraction of lines whose exact text occurs more
      than once (all occurrences counted)
    - ``dup_line_char_frac``: characters of those duplicated lines over
      total document characters
    - ``top_ngram_char_frac``: characters covered by the single most
      frequent word ``top_ngram``-gram (count × gram length) over total
    - ``dup_ngram_char_frac``: characters of duplicate occurrences (beyond
      the first) of word ``dup_ngram``-grams over total
    - ``is_repetitive``: 1 when any metric breaches ``thresholds``

    Since n-gram occurrences overlap, count × length upper-bounds true
    character coverage; the char fractions are capped at 1.0 (same
    convention both engines).

    NULL/empty documents get all-zero metrics (no row is dropped).

    Scale shape: the three token families (lines, short grams, long grams)
    travel as ONE tagged array, so the corpus is scanned ONCE;
    explode_outer → two-level groupBy means the only shuffle carries
    (id, nchars, kind, token) rows with map-side partial counts — linear
    in corpus size, no per-doc O(tokens²) array scans, no Python.
    explode_outer (r10, guide §2.4) keeps NULL/empty documents as a
    NULL-token row, so every document reconstructs from the ONE exploded
    subtree — the former second corpus scan + (id, length) join existed
    only to re-surface empty documents. The DuckDB twin unions three
    unnest scans (same computation; the oracle table is small)."""
    x = X(SPARK)
    arrs = _repetition_token_arrays(x, col, top_ngram, dup_ngram)
    tagged = "concat(%s)" % ", ".join(
        f"{x.transform(a, f'v -> named_struct({chr(39)}kind{chr(39)}, {chr(39)}{k}{chr(39)}, {chr(39)}tok{chr(39)}, v)')}"
        for k, a in arrs.items()
    )
    expl = df.select(
        F.col(id_col),
        F.length(F.col(col)).cast("long").alias("__nch0"),
        F.explode_outer(F.expr(tagged)).alias("__t"),
    ).select(
        id_col,
        "__nch0",
        F.col("__t.kind").alias("kind"),
        F.col("__t.tok").alias("tok"),
    )
    counts = expl.groupBy(id_col, "kind", "tok").agg(
        F.count(F.lit(1)).alias("c"),
        # constant per document; min() re-combines partials for free
        F.min("__nch0").alias("__nch1"),
    )
    tl = F.length(F.col("tok"))
    per_doc = counts.groupBy(id_col).agg(
        F.min("__nch1").alias("__nch"),
        F.sum(F.when(F.col("kind") == "L", F.col("c"))).alias("__nl"),
        F.sum(
            F.when((F.col("kind") == "L") & (F.col("c") > 1), F.col("c"))
        ).alias("__ndl"),
        F.sum(
            F.when((F.col("kind") == "L") & (F.col("c") > 1), F.col("c") * tl)
        ).alias("__dlc"),
        F.max(F.when(F.col("kind") == "T", F.col("c") * tl)).alias("__top"),
        F.sum(
            F.when(
                (F.col("kind") == "D") & (F.col("c") > 1),
                (F.col("c") - 1) * tl,
            )
        ).alias("__dgc"),
    )
    nch = F.greatest(F.coalesce(F.col("__nch"), F.lit(0)), F.lit(1))
    z = lambda c: F.coalesce(c, F.lit(0)).cast("double")  # noqa: E731
    one = F.lit(1.0)
    # n-gram occurrences overlap, so count × length is an UPPER BOUND on
    # character coverage — cap at 1.0 to keep the metrics in [0, 1]
    metrics = {
        "dup_line_frac": z(F.col("__ndl"))
        / F.greatest(F.coalesce(F.col("__nl"), F.lit(0)), F.lit(1)),
        "dup_line_char_frac": F.least(z(F.col("__dlc")) / nch, one),
        "top_ngram_char_frac": F.least(z(F.col("__top")) / nch, one),
        "dup_ngram_char_frac": F.least(z(F.col("__dgc")) / nch, one),
    }
    unknown = set(thresholds) - set(metrics)
    if unknown:
        raise ValueError(
            f"repetition_stats: unknown threshold keys {sorted(unknown)}; "
            f"valid: {sorted(metrics)}"
        )
    flag = F.lit(False)
    for k, thr in thresholds.items():
        flag = flag | (metrics[k] > F.lit(float(thr)))
    return per_doc.select(
        id_col,
        F.coalesce(F.col("__nl"), F.lit(0)).cast("long").alias("n_lines"),
        *[v.alias(k) for k, v in metrics.items()],
        flag.cast("int").alias("is_repetitive"),
    )


def repetition_stats_sql(
    table: str,
    col: str = "text",
    id_col: str = "doc_id",
    top_ngram: int = 2,
    dup_ngram: int = 5,
    thresholds: dict[str, float] = REPETITION_THRESHOLDS,
) -> str:
    """DuckDB twin of :func:`repetition_stats` (three unnest scans unioned
    in place of Spark's single tagged-array explode — same counts)."""
    x = X(DUCK)
    arrs = _repetition_token_arrays(x, col, top_ngram, dup_ngram)
    scans = "\n  UNION ALL\n".join(
        f"  SELECT {id_col}, '{k}' AS kind, t.tok "
        f"FROM {table}, unnest({a}) AS t(tok)"
        for k, a in arrs.items()
    )
    flag = " OR ".join(
        f"{k} > {float(thr)}" for k, thr in thresholds.items()
    )
    return f"""
WITH toks AS (
{scans}
),
counts AS (
  SELECT {id_col}, kind, tok, COUNT(*) AS c
  FROM toks GROUP BY {id_col}, kind, tok
),
per_doc AS (
  SELECT {id_col},
         SUM(CASE WHEN kind = 'L' THEN c END) AS nl,
         SUM(CASE WHEN kind = 'L' AND c > 1 THEN c END) AS ndl,
         SUM(CASE WHEN kind = 'L' AND c > 1 THEN c * LENGTH(tok) END) AS dlc,
         MAX(CASE WHEN kind = 'T' THEN c * LENGTH(tok) END) AS top,
         SUM(CASE WHEN kind = 'D' AND c > 1 THEN (c - 1) * LENGTH(tok) END) AS dgc
  FROM counts GROUP BY {id_col}
),
m AS (
  SELECT d.{id_col},
         CAST(COALESCE(p.nl, 0) AS BIGINT) AS n_lines,
         COALESCE(p.ndl, 0)::DOUBLE / GREATEST(COALESCE(p.nl, 0), 1) AS dup_line_frac,
         LEAST(COALESCE(p.dlc, 0)::DOUBLE / GREATEST(COALESCE(d.nch, 0), 1), 1.0) AS dup_line_char_frac,
         LEAST(COALESCE(p.top, 0)::DOUBLE / GREATEST(COALESCE(d.nch, 0), 1), 1.0) AS top_ngram_char_frac,
         LEAST(COALESCE(p.dgc, 0)::DOUBLE / GREATEST(COALESCE(d.nch, 0), 1), 1.0) AS dup_ngram_char_frac
  FROM (SELECT {id_col}, LENGTH({col}) AS nch FROM {table}) d
  LEFT JOIN per_doc p USING ({id_col})
)
SELECT {id_col}, n_lines, dup_line_frac, dup_line_char_frac,
       top_ngram_char_frac, dup_ngram_char_frac,
       CAST(({flag}) AS INT) AS is_repetitive
FROM m
"""


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# Patterns stay inside the Java-regex ∩ RE2 common subset (no lookaround,
# no backreferences) so both engines match identically. Order matters and
# is fixed: emails first (an email contains dots like an IP), then IPs,
# then phone numbers (the loosest pattern last so it cannot eat the
# structured ones).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\. ]{7,}[0-9]", "<PHONE>"),
]


def redact_pii_exprs(x: X, col: str) -> tuple[str, list[tuple[str, str]]]:
    """(redacted-text expression, [(count alias, count expression)]).
    Each count is measured on the PROGRESSIVELY-REDACTED text (after the
    earlier patterns' replacements), exactly like the replacements
    themselves — so n_<type> equals the number of <TYPE> placeholders in
    the output and the counts reconcile: an IPv4 already rewritten to
    <IP> is never double-counted by the looser phone pattern."""
    red = col
    counts = []
    for name, pat, tok in PII_PATTERNS:
        counts.append((f"n_{name}", x.regexp_count(red, pat)))
        red = x.regexp_replace_all(red, pat, tok)
    return red, counts


def redact_pii(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Scrub personally identifiable information — emails, IPv4 addresses,
    phone numbers — replacing each with a typed placeholder token
    (``<EMAIL>``/``<IP>``/``<PHONE>``), the anonymization pass an LLM
    training pipeline runs before release (cf. FineWeb). Returns
    (``id_col``, redacted ``col``, per-type match counts). Pure regex
    column expressions (one scan, zero shuffles, no Python); the patterns
    live in the Java∩RE2 regex subset so the DuckDB twin matches
    byte-for-byte."""
    x = X(SPARK)
    red, counts = redact_pii_exprs(x, col)
    keep = [c for c in df.columns if c != col]
    return df.select(
        *keep,
        F.expr(red).alias(col),
        *[F.expr(e).cast("long").alias(a) for a, e in counts],
    )


def redact_pii_sql(table: str, col: str = "text", id_col: str = "doc_id") -> str:
    x = X(DUCK)
    red, counts = redact_pii_exprs(x, col)
    cols = [id_col, f"{red} AS {col}"] + [
        f"CAST({e} AS BIGINT) AS {a}" for a, e in counts
    ]
    return "SELECT " + ",\n  ".join(cols) + f" FROM {table}"


# --------------------------------------------------------------------------
# LM quality scoring (CCNet-style perplexity filter)
# --------------------------------------------------------------------------


def lm_quality_score(
    corpus: DataFrame,
    reference: DataFrame | None = None,
    col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int | None = 50_000,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """CCNet-style language-model quality scoring: per-document perplexity
    under an add-one-smoothed unigram model fit on ``reference`` (default:
    the corpus itself) — the "does this read like the reference corpus"
    filter stage (Wenzek et al. 2020 use a KenLM 5-gram; the unigram model
    is its Spark-native, engine-replayable analog). Returns one row per
    document: (``id_col``, ``n_tokens``, ``avg_logp``, ``perplexity``)
    with perplexity = exp(−avg_logp). Lower perplexity = more reference-
    like; rank or threshold downstream. Empty/NULL docs get n_tokens 0,
    avg_logp 0, perplexity 1 (no row dropped).

    Model: p(t) = (c_t + 1) / (T + V), where c_t is the token's reference
    count (0 for out-of-vocabulary), T total reference tokens, V full
    reference vocabulary size. ``max_vocab`` keeps only the top tokens by
    count (deterministic ties by token) — rarer tokens score as OOV — so
    the count table stays broadcastable; T and V are computed BEFORE the
    cap, so the distribution is unchanged, only the tail is coarsened.

    Scale shape: one groupBy over the reference builds the count table
    (map-side combine, (token, 1) shuffle); the corpus is scanned once —
    explode → broadcast join (``broadcast_vocab=False`` falls back to a
    shuffle hash join for an uncapped vocabulary) → per-doc aggregate
    carrying (id, sum, count) only. No Python in the hot path."""
    x = X(SPARK)
    ref = reference if reference is not None else corpus
    tok_arr = x.filter(
        x.transform(x.split_ws(col), "w -> lower(w)"), "w -> length(w) > 0"
    )
    ref_toks = ref.select(F.explode(F.expr(tok_arr)).alias("token"))
    counts = ref_toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = counts.agg(
        F.sum("c").alias("T"), F.count(F.lit(1)).alias("V")
    ).collect()[0]
    T, V = int(tot["T"] or 0), int(tot["V"] or 0)
    if T + V == 0:
        raise ValueError(
            "lm_quality_score: the reference corpus has no tokens "
            "(empty or all-NULL text) — the unigram model is undefined"
        )
    if max_vocab is not None:
        counts = counts.orderBy(F.desc("c"), F.asc("token")).limit(max_vocab)
    if broadcast_vocab:
        counts = F.broadcast(counts)
    denom = float(T + V)
    doc_toks = corpus.select(
        F.col(id_col), F.explode(F.expr(tok_arr)).alias("token")
    )
    scored = doc_toks.join(counts, "token", "left").select(
        id_col,
        F.log((F.coalesce(F.col("c"), F.lit(0)) + 1.0) / F.lit(denom)).alias(
            "__lp"
        ),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.avg("__lp").alias("avg_logp"),
    )
    return (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("avg_logp"), F.lit(0.0)).alias("avg_logp"),
            F.exp(-F.coalesce(F.col("avg_logp"), F.lit(0.0))).alias("perplexity"),
        )
    )


def lm_quality_score_sql(
    table: str,
    reference_sql: str | None = None,
    col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int | None = 50_000,
) -> str:
    """DuckDB twin of :func:`lm_quality_score` (T and V from the uncapped
    count table, exactly as the Spark side computes them)."""
    x = X(DUCK)
    tok_arr = x.filter(
        x.transform(x.split_ws(col), "w -> lower(w)"), "w -> length(w) > 0"
    )
    ref = reference_sql if reference_sql is not None else f"SELECT * FROM {table}"
    cap = (
        f",\nvocab AS (SELECT token, c FROM counts ORDER BY c DESC, token ASC LIMIT {max_vocab})"
        if max_vocab is not None
        else ",\nvocab AS (SELECT token, c FROM counts)"
    )
    return f"""
WITH ref_toks AS (
  SELECT t.tok AS token FROM ({ref}) r, unnest({tok_arr}) AS t(tok)
),
counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM ref_toks GROUP BY token
),
tv AS (
  SELECT COALESCE(SUM(c), 0) + COUNT(*) AS denom FROM counts
){cap},
doc_toks AS (
  SELECT {id_col}, t.tok AS token FROM {table}, unnest({tok_arr}) AS t(tok)
),
scored AS (
  SELECT d.{id_col},
         LN((COALESCE(v.c, 0) + 1.0) / (SELECT denom FROM tv)) AS lp
  FROM doc_toks d LEFT JOIN vocab v USING (token)
),
per_doc AS (
  SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_tokens, AVG(lp) AS avg_logp
  FROM scored GROUP BY {id_col}
)
SELECT b.{id_col},
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.avg_logp, 0.0) AS avg_logp,
       EXP(-COALESCE(p.avg_logp, 0.0)) AS perplexity
FROM {table} b LEFT JOIN per_doc p USING ({id_col})
"""


# --------------------------------------------------------------------------
# token encoding (tokenizer apply)
# --------------------------------------------------------------------------


def vocab_with_ids(
    df: DataFrame,
    col: str = "text",
    min_df: int = 1,
    max_vocab: int | None = 30_000,
) -> DataFrame:
    """:func:`vocabulary` plus a dense integer id per token: id 1..V in
    (df DESC, token ASC) order — frequent tokens get small ids, ties are
    deterministic; id 0 is reserved for OOV. The ranking window runs over
    the (capped) vocabulary table, not the corpus."""
    from pyspark.sql import Window

    v = vocabulary(df, col=col, min_df=min_df, max_vocab=max_vocab)
    w = Window.orderBy(F.desc("df"), F.asc("token"))
    return v.select(
        "token", F.row_number().over(w).cast("long").alias("token_id"), "df"
    )


def encode_tokens(
    corpus: DataFrame,
    vocab: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = 0,
) -> DataFrame:
    """Encode documents to token-id sequences under a ``vocab`` table
    (token, token_id) — the tokenizer-apply step between vocabulary
    induction and sequence packing. Lowercase whitespace tokens in
    document order; out-of-vocabulary tokens encode as ``oov_id``.
    Returns (``id_col``, token_ids array, n_tokens, n_oov); empty/NULL
    docs get an empty array. ``vocab`` must be unique per token (as
    :func:`vocab_with_ids` produces) — a duplicated token would multiply
    the joined positions.

    Scale shape: one corpus scan — positional explode, broadcast join of
    the vocab (vocabularies are capped/broadcastable by construction;
    a 30k-row map is KBs), and an order-restoring
    ``sort_array(collect_list(struct(pos, id)))`` per document. The
    shuffle carries (doc, pos, id) triples once."""
    x = X(SPARK)
    tok_arr = x.filter(
        x.transform(x.split_ws(col), "w -> lower(w)"), "w -> length(w) > 0"
    )
    toks = corpus.select(
        F.col(id_col), F.posexplode(F.expr(tok_arr)).alias("pos", "token")
    )
    enc = toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        id_col,
        "pos",
        F.coalesce(F.col("token_id"), F.lit(int(oov_id))).alias("tid"),
    )
    agg = enc.groupBy(id_col).agg(
        F.expr("transform(sort_array(collect_list(struct(pos, tid))), s -> s.tid)")
        .alias("token_ids"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum((F.col("tid") == int(oov_id)).cast("long")).alias("n_oov"),
    )
    empty = F.expr("CAST(array() AS ARRAY<BIGINT>)")
    return (
        corpus.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("token_ids"), empty).alias("token_ids"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("long").alias("n_oov"),
        )
    )


def vocab_with_ids_sql(
    table: str,
    col: str = "text",
    min_df: int = 1,
    max_vocab: int | None = 30_000,
) -> str:
    inner = vocabulary_sql(table, col=col, min_df=min_df, max_vocab=max_vocab)
    return f"""
SELECT token,
       CAST(ROW_NUMBER() OVER (ORDER BY df DESC, token ASC) AS BIGINT) AS token_id,
       df
FROM ({inner})
"""


def encode_tokens_sql(
    table: str,
    vocab_sql: str,
    col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = 0,
) -> str:
    """DuckDB twin of :func:`encode_tokens` (list aggregation ordered by
    position restores document order)."""
    x = X(DUCK)
    tok_arr = x.filter(
        x.transform(x.split_ws(col), "w -> lower(w)"), "w -> length(w) > 0"
    )
    return f"""
WITH arrs AS (
  SELECT {id_col}, {tok_arr} AS toks FROM {table}
),
toks AS (
  SELECT {id_col}, CAST(g.i AS BIGINT) AS pos, toks[g.i] AS token
  FROM arrs, unnest(generate_series(1, len(toks))) AS g(i)
),
enc AS (
  SELECT t.{id_col}, t.pos, COALESCE(v.token_id, {oov_id}) AS tid
  FROM toks t LEFT JOIN ({vocab_sql}) v USING (token)
),
agg AS (
  SELECT {id_col},
         list(tid ORDER BY pos ASC) AS token_ids,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CAST(tid = {oov_id} AS INT)) AS BIGINT) AS n_oov
  FROM enc GROUP BY {id_col}
)
SELECT b.{id_col},
       COALESCE(a.token_ids, CAST([] AS BIGINT[])) AS token_ids,
       COALESCE(a.n_tokens, 0) AS n_tokens,
       COALESCE(a.n_oov, 0) AS n_oov
FROM {table} b LEFT JOIN agg a USING ({id_col})
"""


def lm_bigram_score(
    corpus: DataFrame,
    reference: DataFrame | None = None,
    col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int | None = 50_000,
    max_bigrams: int | None = 200_000,
) -> DataFrame:
    """Bigram LM quality scoring — one fidelity step up from
    :func:`lm_quality_score` toward CCNet's KenLM filter: each document's
    first token scores under the add-one unigram model, every later token
    under p(wᵢ | wᵢ₋₁) = (c₂(wᵢ₋₁, wᵢ) + 1) / (c₁(wᵢ₋₁) + V), all counts
    from ``reference`` (default: the corpus itself). Returns
    (``id_col``, n_tokens, avg_logp, perplexity); empty/NULL docs score
    neutral (perplexity 1).

    ``max_vocab`` / ``max_bigrams`` cap the two count tables to their
    top-N by count (deterministic ties) so both broadcast; out-of-cap
    tokens/bigrams score with count 0 while T, V, and the context counts
    keep their uncapped values, so the distribution is only coarsened in
    the tail.

    Scale shape: two groupBys over the reference build the count tables
    (map-side combine); the corpus is scanned once — each document's
    (prev, cur, is_first) triples come from one positional zip (no
    self-join), then two broadcast joins and a per-doc aggregate carrying
    (id, sum, count)."""
    x = X(SPARK)
    ref = reference if reference is not None else corpus
    tok_arr = x.filter(
        x.transform(x.split_ws(col), "w -> lower(w)"), "w -> length(w) > 0"
    )

    def triples(df: DataFrame, with_id: bool) -> DataFrame:
        # (prev, cur, is_first) per token: zip the token array with its
        # shifted self — pure column exprs, one pass
        # zip_with pads the shorter side with NULLs, so the zip of toks
        # with (NULL ++ toks) has one trailing (cur=NULL) element — drop
        # it (real tokens are never NULL: the tokenizer filters empties)
        zipped = (
            f"filter(zip_with({tok_arr}, concat(array(CAST(NULL AS STRING)), {tok_arr}),"
            " (c, p) -> named_struct('cur', c, 'prev', p)), s -> s.cur IS NOT NULL)"
        )
        cols = [F.col(id_col)] if with_id else []
        return df.select(
            *cols, F.explode(F.expr(zipped)).alias("__t")
        ).select(
            *([id_col] if with_id else []),
            F.col("__t.cur").alias("cur"),
            F.col("__t.prev").alias("prev"),
            F.col("__t.prev").isNull().cast("int").alias("is_first"),
        )

    # r9 (guide §1.2 — remove passes at the algorithm level): ONE
    # tokenize+explode+shuffle over the reference builds the (prev, cur)
    # table; the unigram table is its marginal (first tokens carry
    # prev = NULL, and real tokens are never NULL — the tokenizer drops
    # empties — so prev IS NULL ⟺ is_first). The pre-r9 shape ran the
    # expensive triples subtree twice (two full scans, two token
    # shuffles); counts are identical by construction.
    ref_t = triples(ref, with_id=False)
    bi = ref_t.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).cast("long").alias("c2")
    )
    bi = bi.localCheckpoint(eager=True)
    c1 = bi.groupBy(F.col("cur").alias("token")).agg(
        F.sum("c2").cast("long").alias("c1")
    )
    tot = c1.agg(F.sum("c1").alias("T"), F.count(F.lit(1)).alias("V")).collect()[0]
    T, V = int(tot["T"] or 0), int(tot["V"] or 0)
    if T + V == 0:
        raise ValueError(
            "lm_bigram_score: the reference corpus has no tokens "
            "(empty or all-NULL text) — the model is undefined"
        )
    c2 = bi.where(F.col("prev").isNotNull())
    if max_vocab is not None:
        c1 = c1.orderBy(F.desc("c1"), F.asc("token")).limit(max_vocab)
    if max_bigrams is not None:
        c2 = c2.orderBy(F.desc("c2"), F.asc("prev"), F.asc("cur")).limit(max_bigrams)

    doc_t = triples(corpus, with_id=True)
    scored = (
        doc_t.join(
            F.broadcast(c1.select(F.col("token").alias("prev"), "c1")),
            "prev",
            "left",
        )
        .join(
            F.broadcast(
                c1.select(F.col("token").alias("cur"), F.col("c1").alias("__cu"))
            ),
            "cur",
            "left",
        )
        .join(F.broadcast(c2), ["prev", "cur"], "left")
        .select(
            id_col,
            F.when(
                F.col("is_first") == 1,
                F.log(
                    (F.coalesce(F.col("__cu"), F.lit(0)) + 1.0)
                    / F.lit(float(T + V))
                ),
            )
            .otherwise(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + 1.0)
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(V)))
                )
            )
            .alias("__lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.avg("__lp").alias("avg_logp"),
    )
    return (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("avg_logp"), F.lit(0.0)).alias("avg_logp"),
            F.exp(-F.coalesce(F.col("avg_logp"), F.lit(0.0))).alias("perplexity"),
        )
    )


def lm_bigram_score_sql(
    table: str,
    reference_sql: str | None = None,
    col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int | None = 50_000,
    max_bigrams: int | None = 200_000,
) -> str:
    """DuckDB twin of :func:`lm_bigram_score`."""
    x = X(DUCK)
    tok_arr = x.filter(
        x.transform(x.split_ws(col), "w -> lower(w)"), "w -> length(w) > 0"
    )
    ref = reference_sql if reference_sql is not None else f"SELECT * FROM {table}"
    v_cap = f"ORDER BY c1 DESC, token ASC LIMIT {max_vocab}" if max_vocab is not None else ""
    b_cap = (
        f"ORDER BY c2 DESC, prev ASC, cur ASC LIMIT {max_bigrams}"
        if max_bigrams is not None
        else ""
    )
    return f"""
WITH ref_arr AS (
  SELECT {tok_arr} AS toks FROM ({ref})
),
ref_t AS (
  SELECT toks[g.i] AS cur,
         CASE WHEN g.i = 1 THEN NULL ELSE toks[g.i - 1] END AS prev,
         CAST(g.i = 1 AS INT) AS is_first
  FROM ref_arr, unnest(generate_series(1, len(toks))) AS g(i)
),
c1_all AS (
  SELECT cur AS token, CAST(COUNT(*) AS BIGINT) AS c1 FROM ref_t GROUP BY cur
),
tv AS (
  SELECT COALESCE(SUM(c1), 0) AS T, COUNT(*) AS V FROM c1_all
),
c1 AS (SELECT token, c1 FROM c1_all {v_cap}),
c2_all AS (
  SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS c2
  FROM ref_t WHERE is_first = 0 GROUP BY prev, cur
),
c2 AS (SELECT prev, cur, c2 FROM c2_all {b_cap}),
doc_arr AS (
  SELECT {id_col}, {tok_arr} AS toks FROM {table}
),
doc_t AS (
  SELECT {id_col}, toks[g.i] AS cur,
         CASE WHEN g.i = 1 THEN NULL ELSE toks[g.i - 1] END AS prev,
         CAST(g.i = 1 AS INT) AS is_first
  FROM doc_arr, unnest(generate_series(1, len(toks))) AS g(i)
),
scored AS (
  SELECT d.{id_col},
         CASE WHEN d.is_first = 1
           THEN LN((COALESCE(cu.c1, 0) + 1.0)
                   / ((SELECT T FROM tv) + (SELECT V FROM tv)))
           ELSE LN((COALESCE(b.c2, 0) + 1.0)
                   / (COALESCE(p.c1, 0) + (SELECT V FROM tv)))
         END AS lp
  FROM doc_t d
  LEFT JOIN c1 p ON p.token = d.prev
  LEFT JOIN c1 cu ON cu.token = d.cur
  LEFT JOIN c2 b ON b.prev = d.prev AND b.cur = d.cur
),
per_doc AS (
  SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_tokens, AVG(lp) AS avg_logp
  FROM scored GROUP BY {id_col}
)
SELECT t.{id_col},
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.avg_logp, 0.0) AS avg_logp,
       EXP(-COALESCE(p.avg_logp, 0.0)) AS perplexity
FROM {table} t LEFT JOIN per_doc p USING ({id_col})
"""


# --------------------------------------------------------------------------
# BM25 keyword search
# --------------------------------------------------------------------------


def bm25_topk(
    corpus: DataFrame,
    query: str,
    k: int = 10,
    col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-ranked keyword search over the corpus — the retrieval step of
    corpus mining ("find the docs most about X") and of quality-subset
    selection. Lowercase whitespace tokens; the standard Robertson/
    Sparck-Jones BM25 with smoothed IDF ln(1 + (N−df+0.5)/(df+0.5)).
    Returns the top ``k`` (``id_col``, score) by score (ties broken by id,
    deterministic). Documents matching no query term never appear.

    Scale shape: per-term document frequencies come from one aggregation
    over the CORPUS TOKENS RESTRICTED TO THE QUERY TERMS (the broadcast
    query-term filter prunes before the shuffle, so the groupBy carries at
    most |terms| × docs-containing-them rows, not the whole corpus
    vocabulary); scoring is a second scan with the same filter, a
    broadcast join of the tiny (term, df) table, a per-(doc, term) tf
    count, and a per-doc sum — then a distributed TakeOrdered top-k. N
    and avg doc length are one tiny aggregate."""
    terms = sorted({w.lower() for w in query.split() if w})
    if not terms:
        raise ValueError("bm25_topk: query contains no terms")
    x = X(SPARK)
    tok_arr = x.filter(
        x.transform(x.split_ws(col), "w -> lower(w)"), "w -> length(w) > 0"
    )
    ndoc = (
        f"CASE WHEN {col} IS NULL OR length({x.trim_ws(col)}) = 0 THEN 0 "
        f"ELSE {x.size(x.split_ws(col))} END"
    )
    base = corpus.select(
        F.col(id_col),
        F.expr(tok_arr).alias("__toks"),
        F.expr(ndoc).cast("double").alias("__len"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("N"), F.avg("__len").alias("avgdl")
    ).collect()[0]
    N, avgdl = int(stats["N"]), float(stats["avgdl"] or 0.0)
    if N == 0 or avgdl == 0.0:
        raise ValueError("bm25_topk: corpus has no tokens")
    term_lit = "array(" + ", ".join(x.lit_str(t) for t in terms) + ")"
    hits = base.select(
        id_col,
        "__len",
        F.explode(
            F.expr(f"filter(__toks, t -> array_contains({term_lit}, t))")
        ).alias("term"),
    )
    tf = hits.groupBy(id_col, "__len", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        1.0 + (F.lit(float(N)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("__len") / F.lit(avgdl))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    scored = (
        tf.join(F.broadcast(dfs), "term")
        .select(id_col, contrib.alias("__s"))
        .groupBy(id_col)
        .agg(F.sum("__s").alias("score"))
    )
    return (
        scored.orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("score", 6).alias("score"))
    )


def bm25_topk_sql(
    table: str,
    query: str,
    k: int = 10,
    col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk`."""
    terms = sorted({w.lower() for w in query.split() if w})
    x = X(DUCK)
    tok_arr = x.filter(
        x.transform(x.split_ws(col), "w -> lower(w)"), "w -> length(w) > 0"
    )
    ndoc = (
        f"CASE WHEN {col} IS NULL OR length({x.trim_ws(col)}) = 0 THEN 0 "
        f"ELSE {x.size(x.split_ws(col))} END"
    )
    tlist = ", ".join(x.lit_str(t) for t in terms)
    return f"""
WITH base AS (
  SELECT {id_col}, {tok_arr} AS toks,
         CAST({ndoc} AS DOUBLE) AS len FROM {table}
),
stats AS (
  SELECT COUNT(*) AS N, AVG(len) AS avgdl FROM base
),
hits AS (
  SELECT {id_col}, len, t.term
  FROM base, unnest(list_filter(toks, t -> t IN ({tlist}))) AS t(term)
),
tf AS (
  SELECT {id_col}, len, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM hits GROUP BY {id_col}, len, term
),
dfs AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.{id_col},
         SUM(
           LN(1.0 + ((SELECT N FROM stats) - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.tf * ({k1} + 1.0))
           / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.len / (SELECT avgdl FROM stats)))
         ) AS score
  FROM tf JOIN dfs USING (term)
  GROUP BY tf.{id_col}
)
SELECT {id_col}, ROUND(score, 6) AS score
FROM scored
ORDER BY score DESC, {id_col} ASC
LIMIT {k}
"""


# --------------------------------------------------------------------------
# DSIR-style importance weighting / resampling
# --------------------------------------------------------------------------


def importance_weights(
    corpus: DataFrame,
    target: DataFrame,
    source: DataFrame | None = None,
    col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int | None = 50_000,
) -> DataFrame:
    """DSIR-style data-selection weights (Xie et al. 2023): per-document
    log importance weight ln p_target(x) − ln p_source(x) under add-one-
    smoothed unigram models fit on a small ``target`` (domain) set and on
    ``source`` (default: the corpus itself). Positive = more target-like.
    Returns (``id_col``, n_tokens, log_weight); feed to
    :func:`importance_sample` to draw the reweighted subset, or threshold
    directly. Weights stay in LOG space — exp(n·Δavg) overflows doubles
    for long documents.

    Scale shape: two :func:`lm_quality_score` passes (each one corpus
    scan + a broadcast-capped vocabulary) and a per-id join of their
    O(1)-per-doc outputs."""
    lt = lm_quality_score(
        corpus, reference=target, col=col, id_col=id_col, max_vocab=max_vocab
    ).select(
        id_col,
        "n_tokens",
        F.col("avg_logp").alias("__t"),
    )
    ls = lm_quality_score(
        corpus,
        reference=source if source is not None else corpus,
        col=col,
        id_col=id_col,
        max_vocab=max_vocab,
    ).select(id_col, F.col("avg_logp").alias("__s"))
    return lt.join(ls, id_col).select(
        id_col,
        "n_tokens",
        (F.col("n_tokens") * (F.col("__t") - F.col("__s"))).alias("log_weight"),
    )


def importance_weights_sql(
    table: str,
    target_sql: str,
    source_sql: str | None = None,
    col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int | None = 50_000,
) -> str:
    """DuckDB twin of :func:`importance_weights`."""
    lt = lm_quality_score_sql(
        table, reference_sql=target_sql, col=col, id_col=id_col, max_vocab=max_vocab
    )
    ls = lm_quality_score_sql(
        table, reference_sql=source_sql, col=col, id_col=id_col, max_vocab=max_vocab
    )
    return f"""
SELECT t.{id_col}, t.n_tokens,
       t.n_tokens * (t.avg_logp - s.avg_logp) AS log_weight
FROM ({lt}) t JOIN ({ls}) s USING ({id_col})
"""


def importance_sample(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    log_weight_col: str = "log_weight",
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling without replacement from importance weights, the
    DSIR selection step: k docs drawn with probability ∝ exp(log_weight)
    via exponential clocks (Efraimidis-Spirakis), key = ln(−ln u) −
    log_weight with u a DETERMINISTIC md5-hash uniform of (seed, id) — no
    RNG, reproducible under retries/repartition, same draw on both
    engines. Returns (``id_col``, sample_rank) for the k selected docs.

    Distributed top-k (TakeOrdered): no global sort materializes."""
    from pyspark.sql import Window

    x = X(SPARK)
    u = f"(({x.md5int(f'concat({chr(39)}{seed}:{chr(39)}, CAST({id_col} AS STRING))')} + 1) / 1152921504606846978.0)"
    key = F.expr(f"ln(-ln({u}))") - F.col(log_weight_col)
    ranked = (
        weights.select(id_col, key.alias("__key"))
        .orderBy(F.asc("__key"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.asc("__key"), F.asc(id_col))
    return ranked.select(
        id_col, F.row_number().over(w).cast("long").alias("sample_rank")
    )


def importance_sample_sql(
    weights_sql: str,
    k: int,
    id_col: str = "doc_id",
    log_weight_col: str = "log_weight",
    seed: int = 42,
) -> str:
    x = X(DUCK)
    u = f"(({x.md5int(f'concat({chr(39)}{seed}:{chr(39)}, CAST({id_col} AS VARCHAR))')} + 1) / 1152921504606846978.0)"
    return f"""
SELECT {id_col},
       CAST(ROW_NUMBER() OVER (ORDER BY LN(-LN({u})) - {log_weight_col} ASC, {id_col} ASC) AS BIGINT) AS sample_rank
FROM ({weights_sql})
ORDER BY LN(-LN({u})) - {log_weight_col} ASC, {id_col} ASC
LIMIT {k}
"""


# --------------------------------------------------------------------------
# vocabulary induction (tokenizer prep)
# --------------------------------------------------------------------------


def vocabulary(
    df: DataFrame,
    col: str = "text",
    min_df: int = 1,
    max_vocab: int | None = None,
) -> DataFrame:
    """Corpus vocabulary with document frequencies and smoothed IDF
    (ln((N+1)/(df+1)) + 1): lowercase whitespace tokens, distinct per doc
    (document frequency, not term frequency), one explode + one groupBy —
    the shuffle carries (token, 1) pairs only. ``min_df`` prunes the long
    tail before it reaches the driver-facing result; ``max_vocab`` keeps the
    top tokens by df (ties broken by token for determinism)."""
    x = X(SPARK)
    n_docs = df.count()
    toks = df.select(
        F.explode(
            F.array_distinct(
                F.expr(
                    x.filter(
                        x.transform(x.split_ws(col), "w -> lower(w)"),
                        "w -> length(w) > 0",
                    )
                )
            )
        ).alias("token")
    )
    out = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .where(F.col("df") >= min_df)
        .withColumn(
            "idf",
            F.round(F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0, 6),
        )
    )
    if max_vocab is not None:
        out = out.orderBy(F.desc("df"), F.asc("token")).limit(max_vocab)
    return out


def vocabulary_sql(
    table: str,
    col: str = "text",
    min_df: int = 1,
    max_vocab: int | None = None,
) -> str:
    x = X(DUCK)
    toks = x.array_distinct(
        x.filter(x.transform(x.split_ws(col), "w -> lower(w)"), "w -> length(w) > 0")
    )
    limit = ""
    if max_vocab is not None:
        limit = f"\nORDER BY df DESC, token ASC\nLIMIT {max_vocab}"
    return f"""
WITH toks AS (
  SELECT t.tok AS token FROM {table}, unnest({toks}) AS t(tok)
),
v AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY token
)
SELECT token, df,
       ROUND(LN(((SELECT COUNT(*) FROM {table}) + 1.0) / (df + 1.0)) + 1.0, 6) AS idf
FROM v
WHERE df >= {min_df}{limit}
"""


def assemble_packs(
    encoded: DataFrame,
    packs: DataFrame,
    id_col: str = "doc_id",
    shard_col: str = "source",
    ids_col: str = "token_ids",
) -> DataFrame:
    """Materialize :func:`pack_greedy` assignments into packed training
    sequences: join the :func:`encode_tokens` output to the pack table and
    concatenate each pack's documents in offset order. Returns one row per
    pack: (``shard_col``, pack_seq, n_docs, n_tokens, token_ids).

    Scale shape: one equi-join on the id, one groupBy per (shard, pack) —
    collect_list is bounded by the pack budget by construction (a pack
    holds at most ``budget`` tokens), so row size is capped no matter the
    corpus size."""
    joined = packs.join(encoded.select(id_col, ids_col), id_col)
    return (
        joined.groupBy(shard_col, "pack_seq")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr(
                f"flatten(transform(sort_array(collect_list("
                f"struct(pack_offset, {ids_col}))), s -> s.{ids_col}))"
            ).alias(ids_col),
        )
        .select(
            shard_col,
            "pack_seq",
            "n_docs",
            F.size(ids_col).cast("long").alias("n_tokens"),
            ids_col,
        )
    )


# --------------------------------------------------------------------------
# Model-based quality classification (FineWeb-Edu-style filter apply)
# --------------------------------------------------------------------------

# Default weights: a hand-set logistic model over the text_stats features —
# a stand-in shape for weights trained offline (the real pipeline trains a
# classifier on LLM-annotated samples and applies it at scale; applying IS
# the distributed part). Signs encode the usual priors: stopword presence
# and lexical diversity up, punctuation/digit noise down, token volume
# saturating via the log.
QUALITY_CLF_WEIGHTS = {
    "log_tokens": 0.6,
    "stopword_ratio": 3.0,
    "unique_token_ratio": 1.5,
    "punct_ratio": -4.0,
    "digit_ratio": -6.0,
    "mean_token_len": -0.15,
}
QUALITY_CLF_BIAS = -2.0


def quality_classify_exprs(
    x: X,
    col: str,
    weights: dict[str, float],
    bias: float,
    threshold: float,
) -> list[tuple[str, str]]:
    """(alias, expression) for the classifier output. Features are the
    :func:`text_stats_exprs` aliases plus ``log_tokens`` =
    ``ln(1 + n_tokens)``; unknown weight keys raise."""
    feats = dict(text_stats_exprs(x, col))
    feats["log_tokens"] = f"ln(1.0 + {feats['n_tokens']})"
    unknown = set(weights) - set(feats)
    if unknown:
        raise ValueError(
            f"quality_classify: unknown feature(s) {sorted(unknown)}; "
            f"valid: {sorted(feats)}"
        )
    z = " + ".join(
        [repr(float(bias))]
        + [f"({w!r}) * ({feats[k]})" for k, w in sorted(weights.items())]
    )
    # the feature tree is the expensive part (several regex/array passes
    # over the text) — callers project z ONCE and derive score + keep from
    # the projected column, so the features are evaluated once per row
    score_of_z = "1.0 / (1.0 + exp(-(__z)))"
    return [
        ("__z", z),
        ("clf_score", score_of_z),
        ("clf_keep", f"CAST({score_of_z} >= {float(threshold)!r} AS INT)"),
    ]


def quality_classify(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    bias: float = QUALITY_CLF_BIAS,
    col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Apply a linear (logistic) quality classifier over per-document text
    features — the model-based filtering stage of an LLM data pipeline
    (FineWeb-Edu / DCLM style: train a small classifier offline on scored
    samples, then score the WHOLE corpus with it). ``weights`` maps
    :func:`text_stats` feature names (plus ``log_tokens``) to
    coefficients; the default set is a documented stand-in — pass your
    trained weights.

    Returns the input (minus ``col``) + ``clf_score`` in (0, 1) and the
    ``clf_keep`` flag. Pure column expressions: one stateless scan, zero
    shuffles, streaming-safe; a trained 10⁶-feature model would instead
    broadcast a (term, weight) table and reuse the ``lm_quality_score``
    join shape. The threshold compare reads the raw score — a document
    whose score lands within ~1 ulp of ``threshold`` could in principle
    flag differently across engines (libm vs JVM exp); probability
    ~1e-16 per document, accepted."""
    x = X(SPARK)
    w = QUALITY_CLF_WEIGHTS if weights is None else weights
    (za, ze), *outs = quality_classify_exprs(x, col, w, bias, threshold)
    keep = [c for c in df.columns if c != col]
    base = df.select(*keep, F.expr(ze).alias(za))
    return base.select(
        *keep, *[F.expr(e).alias(a) for a, e in outs]
    )


def fit_quality_classifier(
    labeled: DataFrame,
    label_col: str,
    col: str = "text",
    features: list[str] | None = None,
    vcov: str = "iid",
    l2: float = 0.0,
):
    """TRAIN the :func:`quality_classify` model in-engine: a distributed-
    IRLS logistic regression (``dbglm``) of a 0/1 quality label on the
    :func:`text_stats` features — the FineWeb-Edu/DCLM loop closed inside
    the engine (annotate a sample → fit here → ``quality_classify`` the
    whole corpus with the returned weights).

    Returns ``(weights, bias, model)`` where ``weights``/``bias`` plug
    directly into :func:`quality_classify` / :func:`quality_classify_sql`
    (collinearity-dropped features are simply absent from ``weights``),
    and ``model`` is the full :class:`dbreg_spark.glm.GlmModel` for
    inference on the coefficients. If a feature separates the labels
    perfectly (the MLE diverges with a non-convergence warning), pass a
    small ridge penalty ``l2`` — the fit regularizes to bounded weights.

    Scale shape: one stateless projection computes the feature columns
    (the same expression tree ``quality_classify`` applies), then each
    IRLS iteration is a single aggregation pass — the labeled sample
    never needs to fit anywhere; fitting on 10⁹ labeled rows costs ~6
    scans of them."""
    from ..glm import dbglm

    x = X(SPARK)
    feats = dict(text_stats_exprs(x, col))
    feats["log_tokens"] = f"ln(1.0 + {feats['n_tokens']})"
    names = list(features) if features is not None else sorted(QUALITY_CLF_WEIGHTS)
    unknown = set(names) - set(feats)
    if unknown:
        raise ValueError(
            f"fit_quality_classifier: unknown feature(s) {sorted(unknown)}; "
            f"valid: {sorted(feats)}"
        )
    proj = labeled.select(
        F.col(label_col).cast("double").alias("__qlabel"),
        *[F.expr(feats[n]).alias(n) for n in names],
    )
    model = dbglm(
        "__qlabel ~ " + " + ".join(names), proj, family="binomial",
        vcov=vcov, l2=l2,
    )
    coefs = model.coef()
    bias = float(coefs.get("(Intercept)", 0.0))
    weights = {n: float(coefs[n]) for n in names if n in coefs.index}
    return weights, bias, model


def quality_classify_sql(
    table: str,
    weights: dict[str, float] | None = None,
    bias: float = QUALITY_CLF_BIAS,
    col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> str:
    x = X(DUCK)
    w = QUALITY_CLF_WEIGHTS if weights is None else weights
    (za, ze), *outs = quality_classify_exprs(x, col, w, bias, threshold)
    inner = f"SELECT {id_col}, {ze} AS {za} FROM {table}"
    cols = [id_col] + [f"{e} AS {a}" for a, e in outs]
    return "SELECT " + ",\n  ".join(cols) + f" FROM ({inner}) __zt"
