"""Byte-pair-encoding tokenizer: distributed training + scale-safe apply.

Classic BPE (Sennrich et al. 2016, the subword-nmt formulation) trains on a
WORD-FREQUENCY table, not the raw corpus — so the distributed part of
training is exactly one scan (tokenize → explode → groupBy(word) count →
top ``max_words``), and the merge loop runs driver-side over the bounded
table with incremental pair-count updates. That is the same shape every
production tokenizer trainer uses (HF tokenizers, sentencepiece): the
corpus reduces to (word, freq) before any merge is considered.

Applying BPE is a per-word symbol-merge loop — inherently iterative Python.
The scale insight: the segmentation depends only on the word, so segment
each DISTINCT word once and broadcast the (word → token-id array) map; the
corpus path is then a pure JVM plan (posexplode → broadcast join → ordered
flatten) with ZERO Python in the per-row hot path. The word map is bounded
by taking the top ``max_apply_words`` corpus words by frequency — tail
words (rare by construction) encode as ``unk_id`` and are counted per doc
so the OOV mass is visible.

No reference counterpart (the reference is a regression library). The
training gate is rows-only (iterative merges are not SQL-expressible); the
tests pin it against an independent from-scratch reference implementation.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.xdialect import DUCK, SPARK, X


def _word_array_expr(col: str, lowercase: bool) -> str:
    x = X(SPARK)
    arr = x.split_ws(col)
    if lowercase:
        arr = x.transform(arr, "w -> lower(w)")
    return x.filter(arr, "w -> length(w) > 0")


def word_frequencies(
    df: DataFrame,
    col: str = "text",
    max_words: int | None = 1_000_000,
    lowercase: bool = True,
) -> DataFrame:
    """(word, freq) over the corpus — the single distributed pass of BPE
    training. One explode + one groupBy (map-side combined, the shuffle
    carries (word, partial-count) pairs); ``max_words`` keeps the top rows
    by frequency, ties broken by word for determinism (TakeOrdered — never
    a global sort of the full table)."""
    out = (
        df.select(F.explode(F.expr(_word_array_expr(col, lowercase))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    if max_words is not None:
        out = out.orderBy(F.desc("freq"), F.asc("word")).limit(int(max_words))
    return out


def word_frequencies_sql(
    from_clause: str, col: str = "text", max_words: int | None = 1_000_000
) -> str:
    """DuckDB twin of :func:`word_frequencies` (lowercase variant)."""
    x = X(DUCK)
    arr = x.filter(
        x.transform(x.split_ws(col), "w -> lower(w)"), "w -> length(w) > 0"
    )
    limit = f"\nLIMIT {int(max_words)}" if max_words is not None else ""
    return (
        f"SELECT word, CAST(COUNT(*) AS BIGINT) AS freq\n"
        f"FROM (SELECT UNNEST({arr}) AS word {from_clause})\n"
        f"GROUP BY word ORDER BY freq DESC, word ASC{limit}"
    )


END_OF_WORD = "</w>"


@dataclass
class BpeModel:
    """Learned merges (in order) + the token vocabulary they induce.

    ``vocab`` maps token string → id: ids 0..k-1 are the base symbols
    (sorted single characters and ``char + end_of_word`` variants seen in
    training), then one id per merge in merge order — the conventional BPE
    id layout. ``unk_id`` is reserved ABOVE the vocabulary (len(vocab)),
    so no learned token ever collides with it.
    """

    merges: list[tuple[str, str]]
    vocab: dict[str, int]
    end_of_word: str = END_OF_WORD
    lowercase: bool = True
    _ranks: dict | None = field(default=None, repr=False, compare=False)

    @property
    def unk_id(self) -> int:
        return len(self.vocab)

    def ranks(self) -> dict:
        if self._ranks is None:
            self._ranks = {pair: i for i, pair in enumerate(self.merges)}
        return self._ranks

    def segment(self, word: str) -> list[str]:
        """Segment one word into BPE tokens (the classic greedy
        lowest-rank-first merge loop)."""
        if not word:
            return []
        syms = list(word[:-1]) + [word[-1] + self.end_of_word]
        ranks = self.ranks()
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    def encode_word(self, word: str) -> list[int]:
        """Token ids for one word; unseen base symbols map to unk_id."""
        return [self.vocab.get(s, self.unk_id) for s in self.segment(word)]

    # -- persistence --------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "merges": [list(m) for m in self.merges],
                "vocab": self.vocab,
                "end_of_word": self.end_of_word,
                "lowercase": self.lowercase,
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "BpeModel":
        d = json.loads(s)
        return cls(
            merges=[tuple(m) for m in d["merges"]],
            vocab={k: int(v) for k, v in d["vocab"].items()},
            end_of_word=d["end_of_word"],
            lowercase=bool(d.get("lowercase", True)),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "BpeModel":
        with open(path) as f:
            return cls.from_json(f.read())


def learn_bpe(
    df: DataFrame,
    col: str = "text",
    num_merges: int = 1000,
    max_words: int = 1_000_000,
    min_pair_freq: int = 2,
    lowercase: bool = True,
    end_of_word: str = END_OF_WORD,
) -> BpeModel:
    """Train BPE merges on the corpus.

    ONE distributed pass (see :func:`word_frequencies`) bounds the problem
    to ≤ ``max_words`` (word, freq) rows on the driver; the merge loop is
    incremental (pair counts updated only in words containing the merged
    pair — the subword-nmt algorithm), deterministic (ties broken by pair
    lexicographically), and stops early when the best pair's corpus
    frequency drops below ``min_pair_freq``.
    """
    rows = word_frequencies(df, col, max_words, lowercase).collect()
    word_freqs = [(r["word"], int(r["freq"])) for r in rows]
    return learn_bpe_from_frequencies(
        word_freqs, num_merges, min_pair_freq, end_of_word, lowercase
    )


def learn_bpe_from_frequencies(
    word_freqs: list[tuple[str, int]],
    num_merges: int = 1000,
    min_pair_freq: int = 2,
    end_of_word: str = END_OF_WORD,
    lowercase: bool = True,
) -> BpeModel:
    """Driver-side BPE over a (word, freq) table — exposed separately so a
    pre-aggregated table (e.g. from a saved parquet) can train without a
    corpus scan."""
    words: list[list[str]] = []
    freqs: list[int] = []
    for w, c in word_freqs:
        if not w:
            continue
        words.append(list(w[:-1]) + [w[-1] + end_of_word])
        freqs.append(int(c))

    # pair -> total count; pair -> {word index} (indices into words)
    pair_count: dict = {}
    pair_words: dict = {}

    def add_word_pairs(wi: int, sign: int) -> None:
        syms, c = words[wi], freqs[wi]
        for a, b in zip(syms, syms[1:]):
            pair_count[(a, b)] = pair_count.get((a, b), 0) + sign * c
            if sign > 0:
                pair_words.setdefault((a, b), set()).add(wi)

    for wi in range(len(words)):
        add_word_pairs(wi, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        best = None
        for pair, cnt in pair_count.items():
            if cnt < min_pair_freq:
                continue
            if best is None or cnt > best[1] or (cnt == best[1] and pair < best[0]):
                best = (pair, cnt)
        if best is None:
            break
        (a, b), _cnt = best
        merges.append((a, b))
        merged = a + b
        affected = list(pair_words.get((a, b), ()))
        for wi in affected:
            syms = words[wi]
            if len(syms) < 2:
                continue
            add_word_pairs(wi, -1)
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            add_word_pairs(wi, +1)
        pair_count.pop((a, b), None)
        pair_words.pop((a, b), None)

    # vocabulary: base symbols first (sorted), then merge tokens in order
    base = set()
    for w, _c in word_freqs:
        if not w:
            continue
        base.update(w[:-1])
        base.add(w[-1] + end_of_word)
    vocab: dict[str, int] = {}
    for s in sorted(base):
        vocab[s] = len(vocab)
    for a, b in merges:
        t = a + b
        if t not in vocab:
            vocab[t] = len(vocab)
    return BpeModel(
        merges=merges, vocab=vocab, end_of_word=end_of_word, lowercase=lowercase
    )


def build_word_map(
    model: BpeModel, words: list[str]
) -> list[tuple[str, list[int]]]:
    """(word → token-ids) entries for the broadcast apply map. A word
    containing symbols unseen at training time can't be encoded — keep it
    OUT of the map so it takes the one-unk OOV path and is COUNTED in
    n_oov_words (an in-map entry would emit one unk per untrained symbol
    with oov=0, silently hiding exactly the high-frequency OOV mass that
    column exists to surface)."""
    unk = int(model.unk_id)
    mapping = []
    for w in words:
        ids = model.encode_word(w)
        if unk not in ids:
            mapping.append((w, ids))
    return mapping


def encode_bpe(
    corpus: DataFrame,
    model: BpeModel,
    col: str = "text",
    id_col: str = "doc_id",
    max_apply_words: int = 2_000_000,
) -> DataFrame:
    """Encode documents to BPE token-id sequences.

    Returns (``id_col``, token_ids array<long>, n_tokens, n_oov_words).
    Scale shape (see module docstring): the top ``max_apply_words`` corpus
    words by frequency are segmented ONCE driver-side and broadcast as a
    (word → id array) map; the corpus pass is posexplode → broadcast join →
    order-restoring flatten — no Python per row. Words outside the map (the
    frequency tail) and words containing untrained symbols encode as one
    ``model.unk_id`` each and are counted in ``n_oov_words``.
    """
    spark = corpus.sparkSession
    wf = word_frequencies(corpus, col, max_apply_words, model.lowercase)
    seen = [r["word"] for r in wf.select("word").collect()]
    unk = int(model.unk_id)
    mapping = build_word_map(model, seen)

    from pyspark.sql import types as T

    map_schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("ids", T.ArrayType(T.LongType())),
        ]
    )
    wmap = spark.createDataFrame(
        [(w, [int(i) for i in ids]) for w, ids in mapping], schema=map_schema
    )

    toks = corpus.select(
        F.col(id_col),
        F.posexplode(F.expr(_word_array_expr(col, model.lowercase))).alias(
            "pos", "word"
        ),
    )
    enc = toks.join(F.broadcast(wmap), "word", "left").select(
        id_col,
        "pos",
        F.coalesce(F.col("ids"), F.array(F.lit(unk).cast("long"))).alias("ids"),
        F.col("ids").isNull().cast("long").alias("oov"),
    )
    agg = enc.groupBy(id_col).agg(
        F.expr(
            "flatten(transform(sort_array(collect_list(struct(pos, ids))),"
            " s -> s.ids))"
        ).alias("token_ids"),
        F.sum("oov").cast("long").alias("n_oov_words"),
    )
    empty = F.expr("CAST(array() AS ARRAY<BIGINT>)")
    return (
        corpus.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("token_ids"), empty).alias("token_ids"),
            F.coalesce(F.size("token_ids"), F.lit(0))
            .cast("long")
            .alias("n_tokens"),
            F.coalesce(F.col("n_oov_words"), F.lit(0))
            .cast("long")
            .alias("n_oov_words"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins for the encode path
# ---------------------------------------------------------------------------


def duckdb_word_frequencies(
    sf_dir: str,
    table: str = "documents",
    col: str = "text",
    max_words: int | None = 1_000_000,
) -> list[tuple[str, int]]:
    """(word, freq) via DuckDB over the same parquet — an engine-independent
    twin of the training frequency pass, so a DuckDB-side oracle can train
    the SAME model without Spark (merges are shared driver code either way;
    the frequency-pass parity itself is gated by ``text_bpe_wordfreq``)."""
    import duckdb

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{table}.parquet')"
        )
        rows = con.execute(
            word_frequencies_sql(f"FROM {table}", col, max_words)
        ).fetchall()
    finally:
        con.close()
    return [(w, int(c)) for w, c in rows]


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def encode_bpe_summary_sql(
    from_clause: str,
    model: BpeModel,
    word_ids: list[tuple[str, list[int]]],
    col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`encode_bpe`'s summary columns — per document:
    ``n_tokens``, ``n_oov_words``, and ``ids_sum`` (Σ token ids, an
    order-insensitive content check on the broadcast map join). The
    driver-learned (word → ids) map rides in as a VALUES table carrying
    each word's token count and id sum; the twin is then the same
    tokenize → left join → per-doc aggregate the Spark plan runs. Token
    ORDER is not checked here (the Spark side's order-restoring flatten is
    pinned by tests/test_bpe.py against the driver encoder)."""
    x = X(DUCK)
    arr = x.split_ws(col)
    if model.lowercase:
        arr = x.transform(arr, "w -> lower(w)")
    arr = x.filter(arr, "w -> length(w) > 0")
    unk = int(model.unk_id)
    vals = ",\n    ".join(
        f"({_sql_str(w)}, {len(ids)}, {sum(int(i) for i in ids)})"
        for w, ids in word_ids
    ) or "('', 0, 0)"  # length>0 tokenization means '' never matches
    return f"""WITH wmap(word, n_ids, ids_sum) AS (
  VALUES
    {vals}
),
toks AS (
  SELECT {id_col}, UNNEST({arr}) AS word
  {from_clause}
),
agg AS (
  SELECT t.{id_col},
         SUM(COALESCE(m.n_ids, 1)) AS n_tokens,
         SUM(CASE WHEN m.word IS NULL THEN 1 ELSE 0 END) AS n_oov_words,
         SUM(COALESCE(m.ids_sum, {unk})) AS ids_sum
  FROM toks t LEFT JOIN wmap m USING (word)
  GROUP BY t.{id_col}
)
SELECT d.{id_col},
       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_oov_words, 0) AS BIGINT) AS n_oov_words,
       CAST(COALESCE(a.ids_sum, 0) AS BIGINT) AS ids_sum
FROM (SELECT {id_col} {from_clause}) d LEFT JOIN agg a USING ({id_col})"""
