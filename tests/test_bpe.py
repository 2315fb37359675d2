"""BPE training/apply vs an independent naive reference implementation.

The reference below recounts every pair from scratch each iteration (no
incremental updates, no shared code with the engine) and uses the same
deterministic tie rule (max count, then lexicographically smallest pair) —
so any bookkeeping bug in the engine's incremental trainer diverges.
"""

import numpy as np
import pandas as pd
import pytest

from dbreg_spark.operators.bpe import (
    BpeModel,
    encode_bpe,
    learn_bpe,
    learn_bpe_from_frequencies,
    word_frequencies,
    word_frequencies_sql,
)

EOW = "</w>"


def ref_bpe(word_freqs, num_merges, min_pair_freq=2):
    """Naive reference: full pair recount every iteration."""
    words = {}
    for w, c in word_freqs:
        if w:
            words[tuple(list(w[:-1]) + [w[-1] + EOW])] = (
                words.get(tuple(list(w[:-1]) + [w[-1] + EOW]), 0) + c
            )
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, c in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + c
        counts = {p: c for p, c in counts.items() if c >= min_pair_freq}
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append(best)
        a, b = best
        new_words = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges


def ref_segment(word, merges):
    syms = list(word[:-1]) + [word[-1] + EOW]
    ranks = {p: i for i, p in enumerate(merges)}
    while len(syms) > 1:
        pairs = [(ranks[p], i) for i, p in enumerate(zip(syms, syms[1:])) if p in ranks]
        if not pairs:
            break
        _, i = min(pairs)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


WORDS = [
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
    ("new", 4), ("west", 2), ("slowest", 1), ("lowest", 2),
]


def test_learn_matches_naive_reference():
    m = learn_bpe_from_frequencies(WORDS, num_merges=15)
    ref = ref_bpe(WORDS, 15)
    assert m.merges == ref


def test_segment_matches_reference():
    m = learn_bpe_from_frequencies(WORDS, num_merges=15)
    for w, _ in WORDS + [("lowish", 0), ("steward", 0)]:
        assert m.segment(w) == ref_segment(w, m.merges)


def test_segmentation_reconstructs_word():
    m = learn_bpe_from_frequencies(WORDS, num_merges=10)
    for w, _ in WORDS:
        assert "".join(m.segment(w)) == w + EOW


def test_min_pair_freq_stops_early():
    m = learn_bpe_from_frequencies(WORDS, num_merges=10_000, min_pair_freq=4)
    ref = ref_bpe(WORDS, 10_000, min_pair_freq=4)
    assert m.merges == ref
    assert len(m.merges) < 10_000  # exhausted below the cap


def test_vocab_layout_and_unk_reserved():
    m = learn_bpe_from_frequencies(WORDS, num_merges=8)
    ids = list(m.vocab.values())
    assert ids == list(range(len(ids)))  # dense 0..k-1
    assert m.unk_id == len(m.vocab)
    for a, b in m.merges:
        assert a + b in m.vocab


def test_save_load_roundtrip(tmp_path):
    m = learn_bpe_from_frequencies(WORDS, num_merges=8)
    p = str(tmp_path / "bpe.json")
    m.save(p)
    m2 = BpeModel.load(p)
    assert m2.merges == m.merges and m2.vocab == m.vocab
    assert m2.segment("lowest") == m.segment("lowest")


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(17)
    vocab_words = [w for w, _ in WORDS]
    docs = []
    for i in range(200):
        k = rng.integers(3, 12)
        docs.append(
            (i, " ".join(rng.choice(vocab_words, size=k).tolist()))
        )
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    return spark.createDataFrame(pdf), pdf


@pytest.mark.slowparity
def test_learn_bpe_distributed_equals_driver(corpus):
    df, pdf = corpus
    m = learn_bpe(df, num_merges=12)
    # driver twin from pandas word counts
    wc = (
        pdf.text.str.split().explode().str.lower().value_counts().items()
    )
    m2 = learn_bpe_from_frequencies(list(wc), num_merges=12)
    assert m.merges == m2.merges


def test_word_frequencies_matches_duckdb(corpus):
    import duckdb

    df, pdf = corpus
    got = word_frequencies(df, max_words=50).toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    o = con.execute(word_frequencies_sql("FROM docs", max_words=50)).fetchdf()
    pd.testing.assert_frame_equal(
        got.sort_values(["freq", "word"], ascending=[False, True]).reset_index(drop=True),
        o.sort_values(["freq", "word"], ascending=[False, True]).reset_index(drop=True),
    )


def test_encode_bpe_matches_driver_segmentation(corpus):
    df, pdf = corpus
    m = learn_bpe(df, num_merges=12)
    enc = encode_bpe(df, m).toPandas().set_index("doc_id")
    for _, r in pdf.head(20).iterrows():
        expect = []
        for w in r.text.lower().split():
            expect.extend(m.encode_word(w))
        got = list(enc.loc[r.doc_id, "token_ids"])
        assert got == expect
        assert enc.loc[r.doc_id, "n_tokens"] == len(expect)
        assert enc.loc[r.doc_id, "n_oov_words"] == 0


def test_encode_bpe_oov_words_become_unk(spark, corpus):
    df, _ = corpus
    m = learn_bpe(df, num_merges=12)
    extra = spark.createDataFrame(
        pd.DataFrame({"doc_id": [900], "text": ["low qqqq low"]})
    )
    # 'q' never appears in training, so 'qqqq' cannot be encoded — the
    # contract is ONE unk for the whole word, counted in n_oov_words,
    # even though 'qqqq' is frequent enough to enter the apply map
    enc = encode_bpe(extra, m).toPandas().iloc[0]
    ids = list(enc["token_ids"])
    low_ids = m.encode_word("low")
    assert ids == low_ids + [m.unk_id] + low_ids
    assert enc["n_oov_words"] == 1


def test_encode_bpe_empty_doc(spark, corpus):
    df, _ = corpus
    m = learn_bpe(df, num_merges=5)
    extra = spark.createDataFrame(
        pd.DataFrame({"doc_id": [901, 902], "text": ["", "   "]})
    )
    enc = encode_bpe(extra, m).toPandas().set_index("doc_id")
    for i in (901, 902):
        assert list(enc.loc[i, "token_ids"]) == []
        assert enc.loc[i, "n_tokens"] == 0


def test_bpe_trainer_hypothesis_fuzz():
    """Property: the incremental trainer equals the naive-recount reference
    on arbitrary small word multisets (random words, random counts)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcde", min_size=1, max_size=8)

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(word, st.integers(min_value=1, max_value=9)),
            min_size=1,
            max_size=20,
        ),
        st.integers(min_value=1, max_value=12),
    )
    def check(word_freqs, k):
        # collapse duplicate words (the engine takes a frequency TABLE)
        agg = {}
        for w, c in word_freqs:
            agg[w] = agg.get(w, 0) + c
        wf = sorted(agg.items())
        m = learn_bpe_from_frequencies(wf, num_merges=k)
        assert m.merges == ref_bpe(wf, k)
        for w, _ in wf:
            assert m.segment(w) == ref_segment(w, m.merges)
            assert "".join(m.segment(w)) == w + EOW

    check()
