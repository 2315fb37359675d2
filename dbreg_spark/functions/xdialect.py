"""Cross-dialect SQL expression builders (Spark SQL ↔ DuckDB).

The pipeline operators (dedup / text analysis / similarity) are written once
as SQL expression templates and rendered for both engines, so every operator
ships with a DuckDB oracle that is the same computation by construction.
The cross-engine primitives were verified to agree bit-for-bit:
``md5int('hello') = 419982666956583591`` on both engines.

Everything here is JVM-side (no Python UDFs): Spark evaluates these inside
whole-stage codegen via ``F.expr``.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"

# Explicit whitespace class for tokenization. Java regex \s includes
# vertical tab (\x0B); RE2 (DuckDB) does not — the explicit class makes
# both engines tokenize EVERY string identically (verified divergence on
# 'a\x0bb' with \s+: Spark 2 tokens, DuckDB 1).
WS = "[ \\t\\n\\r\\f]"

# Known cross-engine boundary (documented, not fixable at the SQL layer):
# lower() uses each engine's Unicode case mapping — the JVM applies FULL
# case mapping (U+0130 'İ' → 'i' + U+0307, two codepoints) while DuckDB's
# utf8proc applies SIMPLE mapping ('İ' → 'i'). Operators that lowercase
# (fingerprints, vocabulary, LM scoring, dedup normalization) are
# byte-identical across engines except for such characters; U+0130 is the
# only one below U+0250. Found by the hypothesis cross-engine property
# tests, which exclude exactly that character.


class X:
    """Expression factory for one dialect."""

    def __init__(self, engine: str):
        if engine not in (SPARK, DUCK):
            raise ValueError(engine)
        self.e = engine

    # -- literals / regex ---------------------------------------------------
    def rx(self, pattern: str) -> str:
        """A regex as a SQL string literal. Spark SQL string literals process
        backslash escapes; DuckDB's do not."""
        if self.e == SPARK:
            return "'" + pattern.replace("\\", "\\\\").replace("'", "\\'") + "'"
        return "'" + pattern.replace("'", "''") + "'"

    # -- arrays -------------------------------------------------------------
    def size(self, arr: str) -> str:
        return f"size({arr})" if self.e == SPARK else f"len({arr})"

    def seq(self, lo: str, hi: str) -> str:
        return (
            f"sequence({lo}, {hi})" if self.e == SPARK else f"generate_series({lo}, {hi})"
        )

    def transform(self, arr: str, lam: str) -> str:
        fn = "transform" if self.e == SPARK else "list_transform"
        return f"{fn}({arr}, {lam})"

    def filter(self, arr: str, lam: str) -> str:
        fn = "filter" if self.e == SPARK else "list_filter"
        return f"{fn}({arr}, {lam})"

    def array_join(self, arr: str, sep: str) -> str:
        fn = "array_join" if self.e == SPARK else "array_to_string"
        return f"{fn}({arr}, '{sep}')"

    def slice(self, arr: str, i: str, n: int) -> str:
        if self.e == SPARK:
            return f"slice({arr}, {i}, {n})"
        return f"list_slice({arr}, {i}, {i} + {n - 1})"

    def empty_str_array(self) -> str:
        """A typed empty ARRAY<STRING> literal."""
        if self.e == SPARK:
            return "array_remove(array(''), '')"
        return "CAST([] AS VARCHAR[])"

    def array_min(self, arr: str) -> str:
        return f"array_min({arr})" if self.e == SPARK else f"list_min({arr})"

    def array_distinct(self, arr: str) -> str:
        return f"array_distinct({arr})" if self.e == SPARK else f"list_distinct({arr})"

    def reduce_bigint(self, arr: str, init: str, lam: str) -> str:
        """Fold an array into a BIGINT accumulator. NULL array → NULL on
        BOTH engines: Spark's ``aggregate(NULL, …)`` is NULL already, but
        DuckDB's ``list_prepend(init, NULL)`` yields ``[init]`` (folding a
        NULL list to the seed) — found by the cross-engine fuzz on NULL
        text — so the twin guards explicitly."""
        if self.e == SPARK:
            return f"aggregate({arr}, cast({init} as bigint), {lam})"
        return (
            f"CASE WHEN {arr} IS NULL THEN NULL ELSE "
            f"list_reduce(list_prepend(cast({init} as bigint), {arr}), {lam}) END"
        )

    def explode_alias(self, arr_expr: str, alias: str) -> str:
        """FROM-clause fragment exploding an array column."""
        if self.e == SPARK:
            return f"LATERAL VIEW explode({arr_expr}) t AS {alias}"
        return f", unnest({arr_expr}) AS _u({alias})"

    # -- strings ------------------------------------------------------------
    def trim_ws(self, s: str) -> str:
        """Strip leading/trailing WS-class characters — the dialect-neutral
        trim. Bare ``trim()`` DIVERGES across engines: DuckDB strips
        Unicode Zs (U+00A0 …) while Spark strips only ASCII space, and
        neither strips ``\\t``/``\\n`` (found by hypothesis on
        ``'000 00\\xa0'``). Anchors are ``\\A``/``\\z`` (both Java regex
        and RE2 support them) instead of ``^``/``$`` because Java's ``$``
        also matches before a FINAL LINE TERMINATOR — including U+0085,
        which is not in the WS class — while RE2's does not."""
        return self.regexp_replace_all(s, f"\\A{WS}+|{WS}+\\z", "")

    def split_ws(self, s: str) -> str:
        t = self.trim_ws(s)
        if self.e == SPARK:
            return f"split({t}, {self.rx(WS + '+')})"
        return f"string_split_regex({t}, {self.rx(WS + '+')})"

    def split_re(self, s: str, pattern: str) -> str:
        """Split on a regex (no trim — caller decides)."""
        if self.e == SPARK:
            return f"split({s}, {self.rx(pattern)})"
        return f"string_split_regex({s}, {self.rx(pattern)})"

    def regexp_count(self, s: str, pattern: str) -> str:
        if self.e == SPARK:
            return f"size(regexp_extract_all({s}, {self.rx(pattern)}, 0))"
        return f"len(regexp_extract_all({s}, {self.rx(pattern)}))"

    def regexp_replace_all(self, s: str, pattern: str, repl: str) -> str:
        if self.e == SPARK:
            return f"regexp_replace({s}, {self.rx(pattern)}, '{repl}')"
        return f"regexp_replace({s}, {self.rx(pattern)}, '{repl}', 'g')"

    def rlike(self, s: str, pattern: str) -> str:
        """Boolean regex match (unanchored contains-match on both engines:
        Spark ``rlike`` and DuckDB ``regexp_matches`` both search, not
        full-match)."""
        if self.e == SPARK:
            return f"({s} rlike {self.rx(pattern)})"
        return f"regexp_matches({s}, {self.rx(pattern)})"

    def regexp_extract(self, s: str, pattern: str, group: int) -> str:
        """First match's capture group ``group`` (same 1-based group
        numbering on both engines; no match → '' on Spark, '' on DuckDB)."""
        return f"regexp_extract({s}, {self.rx(pattern)}, {group})"

    def regexp_extract_all(self, s: str, pattern: str) -> str:
        """Array of ALL full matches of ``pattern`` in ``s``."""
        if self.e == SPARK:
            return f"regexp_extract_all({s}, {self.rx(pattern)}, 0)"
        return f"regexp_extract_all({s}, {self.rx(pattern)})"

    def array_join_expr(self, arr: str, sep_expr: str) -> str:
        """array_join with an arbitrary separator EXPRESSION (e.g.
        ``chr(10)`` — the cross-dialect way to spell a newline, since
        Spark string literals process ``\\n`` and DuckDB's do not).

        Empty-array contract pinned to Spark's: empty → ``''``, NULL →
        NULL. DuckDB's ``array_to_string`` returns NULL for an EMPTY list,
        so the twin guards on ``len()`` (NULL array falls through the CASE
        to ``array_to_string(NULL)`` = NULL)."""
        if self.e == SPARK:
            return f"array_join({arr}, {sep_expr})"
        return (
            f"CASE WHEN len({arr}) = 0 THEN '' "
            f"ELSE array_to_string({arr}, {sep_expr}) END"
        )

    # -- hashing ------------------------------------------------------------
    def md5int(self, s: str) -> str:
        """Deterministic 60-bit integer hash of a string — identical on both
        engines (first 15 hex chars of md5)."""
        if self.e == SPARK:
            return f"cast(conv(substring(md5({s}), 1, 15), 16, 10) as bigint)"
        return f"(('0x' || substr(md5({s}), 1, 15)))::BIGINT"

    def lit_str(self, v: str) -> str:
        """A Python string as a SQL string literal, escaped for the
        dialect — use for any USER-PROVIDED value interpolated into an
        expression (query terms, step names, split labels), or an
        apostrophe crashes the parser."""
        if self.e == SPARK:
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        return "'" + v.replace("'", "''") + "'"

    def str_cast(self, a: str) -> str:
        t = "STRING" if self.e == SPARK else "VARCHAR"
        return f"CAST({a} AS {t})"

    def bitand(self, a: str, b: str) -> str:
        return f"({a} & {b})"

    def shiftright(self, a: str, n: str) -> str:
        if self.e == SPARK:
            return f"shiftright({a}, {n})"
        return f"({a} >> ({n})::INTEGER)"

    # -- composite: word n-gram shingles -----------------------------------
    def word_ngrams(self, s: str, n: int) -> str:
        """Array of word n-gram strings of ``s`` (whitespace tokens).

        Docs with fewer than ``n`` words yield ONE shingle (the whole doc) —
        same contract on both engines. The Spark construction chains
        ``zip_with`` over shifted copies (measured 5x faster than a
        slice+array_join per index, bit-identical output); DuckDB has no
        zip_with, so the oracle keeps the per-index slice form.
        """
        words = self.split_ws(s)
        if n == 1:
            return words
        if self.e == SPARK:
            expr = words
            for k in range(1, n):
                shifted = f"slice({words}, {k + 1}, size({words}))"
                expr = (
                    f"zip_with({expr}, {shifted}, (a, b) -> "
                    f"CASE WHEN a IS NULL OR b IS NULL THEN NULL "
                    f"ELSE concat(a, ' ', b) END)"
                )
            ngrams = f"filter({expr}, v -> v IS NOT NULL)"
            whole = f"array({self.array_join(words, ' ')})"
            return f"CASE WHEN {self.size(words)} < {n} THEN {whole} ELSE {ngrams} END"
        count = f"greatest({self.size(words)} - {n - 1}, 1)"
        joined = self.array_join(self.slice(words, "i", n), " ")
        return self.transform(self.seq("1", count), f"i -> {joined}")

    def shingle_hashes(self, s: str, n_shingle: int, modb: int) -> str:
        """Array of distinct-shingle hashes, reduced mod ``modb`` — computed
        ONCE per document and shared by all H minhash functions (md5 per
        shingle is the expensive part).

        Spark stores the array as INT (r9, guide §2.3 — narrower types):
        values are < modb = 2³¹ by construction, so the cast is lossless,
        and these arrays are the dominant payload of every minhash band
        shuffle — bigint elements doubled its bytes for nothing. DuckDB
        keeps BIGINT (the oracle never shuffles; values are identical)."""
        sh = self.array_distinct(self.word_ngrams(s, n_shingle))
        h = f"{self.md5int('g')} % {modb}"
        if self.e == SPARK:
            h = f"CAST({h} AS INT)"
        return self.transform(sh, f"g -> {h}")

    def minhash_from_hashes(self, h_arr: str, a: int, b: int, prime: int) -> str:
        """One MinHash value from a precomputed shingle-hash array:
        min over h of (a·h + b) mod p (a·h stays inside int64 by
        construction: a < p < 2³¹, h < modb = 2³¹ — the CAST pins the
        multiply to 64-bit now that Spark's h is a 32-bit INT; DuckDB's h
        is already BIGINT, where the CAST is a no-op)."""
        return self.array_min(
            self.transform(
                h_arr, f"h -> (CAST({a} AS BIGINT) * h + {b}) % {prime}"
            )
        )

    def minhash_sig(self, s: str, n_shingle: int, a: int, b: int, prime: int, modb: int) -> str:
        """One MinHash value straight from text (single-hash convenience)."""
        return self.minhash_from_hashes(self.shingle_hashes(s, n_shingle, modb), a, b, prime)
