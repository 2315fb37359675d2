"""Property-based tests (hypothesis): formula-parser invariants and the
cross-engine round-to-significant-digits expression every oracle hash
depends on."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dbreg_spark.formula import parse_formula

names = st.from_regex(r"[a-z_][a-z0-9_]{0,6}", fullmatch=True).filter(
    lambda s: s not in ("_",)
)


@st.composite
def formulas(draw):
    y = draw(names)
    n_terms = draw(st.integers(1, 4))
    terms = []
    vars_used = set()
    for _ in range(n_terms):
        k = draw(st.integers(1, 3))
        vs = draw(
            st.lists(names.filter(lambda v, y=y: v != y), min_size=k, max_size=k,
                     unique=True)
        )
        op = draw(st.sampled_from([":", "*"]))
        terms.append(op.join(vs))
        vars_used.update(vs)
    fe = draw(st.lists(names.filter(lambda v, y=y: v != y), max_size=2, unique=True))
    fml = f"{y} ~ {' + '.join(terms)}"
    if fe:
        fml += " | " + " + ".join(fe)
    return fml, y, vars_used, fe


@given(formulas())
@settings(max_examples=200, deadline=None)
def test_parse_formula_invariants(fx):
    fml, y, vars_used, fe = fx
    p = parse_formula(fml)
    assert p.yvar == y
    # every RHS variable surfaces in xvars; nothing else does
    assert set(p.xvars) == vars_used
    assert p.fe == fe
    # a*b always expands to the mains plus the interaction
    for t in p.terms:
        if t.order > 1:
            pass  # pure ':' terms need no mains
    # term ordering: orders are non-decreasing (R terms() grouping)
    orders = [t.order for t in p.terms]
    assert orders == sorted(orders)
    # labels are unique
    labels = [t.label for t in p.terms]
    assert len(labels) == len(set(labels))


@given(st.lists(names, min_size=2, max_size=3, unique=True))
@settings(max_examples=100, deadline=None)
def test_star_expands_to_powerset_of_mains(vs):
    fml = "y ~ " + "*".join(v for v in vs if v != "y")
    vs = [v for v in vs if v != "y"]
    if not vs:
        return
    p = parse_formula(fml)
    got = {t.sorted_key for t in p.terms}
    # a*b*c => all non-empty subsets
    import itertools

    want = set()
    for r in range(1, len(vs) + 1):
        for c in itertools.combinations(sorted(vs), r):
            want.add(tuple(c))
    assert got == want


@pytest.fixture(scope="module")
def _round_engines(spark, duck):
    import __spark_entry__ as em

    def both(vals):
        expr = em._round_sig_sql("v")
        sdf = spark.createDataFrame([(float(v),) for v in vals], ["v"])
        sdf.createOrReplaceTempView("_round_t")
        got_s = [
            r[0] for r in spark.sql(f"SELECT {expr} FROM _round_t").collect()
        ]
        duck.execute("CREATE OR REPLACE TABLE _round_d AS SELECT * FROM (VALUES "
                     + ",".join(f"({float(v)!r}::DOUBLE)" for v in vals)
                     + ") t(v)")
        got_d = [r[0] for r in duck.execute(f"SELECT {expr} FROM _round_d").fetchall()]
        return got_s, got_d

    return both


def _bounded_floats():
    """Doubles within the rounding expression's documented validity range
    (|v| in [1e-15, 1e15] or 0): outside it 10^k (k > 22) is inexact and
    the engines legitimately differ by 1 ulp (see _round_sig_sql)."""
    mag = st.floats(min_value=1e-15, max_value=1e15, allow_nan=False)
    signed = st.builds(lambda m, s: m * s, mag, st.sampled_from([-1.0, 1.0]))
    return st.one_of(st.just(0.0), signed)


@given(st.lists(_bounded_floats(), min_size=1, max_size=50))
@settings(max_examples=20, deadline=None)
def test_round_sig_cross_engine(_round_engines, vals):
    got_s, got_d = _round_engines(vals)
    for v, a, b in zip(vals, got_s, got_d):
        assert (a == b) or (math.isnan(a) and math.isnan(b)), (v, a, b)
        if v != 0 and not math.isnan(a) and a != 0:
            # 6 significant digits preserved
            assert abs(a - v) <= abs(v) * 1e-5 + 1e-300


# -- cross-engine text-operator parity on arbitrary text ---------------------
#
# The tokenizer uses an explicit whitespace class (xdialect.WS) because
# Java's \s and RE2's \s disagree on vertical tab — this property pins that
# EVERY generated string (controls included) tokenizes identically on both
# engines. One Spark job per example over a 60-doc batch keeps it fast.

# U+0130 excluded: JVM full case mapping vs DuckDB simple case mapping
# disagree on lower('İ') — the documented boundary in xdialect.py.
_text_chars = st.characters(
    min_codepoint=0x09, max_codepoint=0x24F,
    exclude_categories=("Cs",),
).filter(
    lambda ch: (ord(ch) >= 0x20 or ord(ch) in (9, 10, 11, 12, 13))
    and ord(ch) != 0x130
)


@given(st.lists(st.text(_text_chars, max_size=120), min_size=40, max_size=60))
@settings(max_examples=3, deadline=None)
def test_text_stats_cross_engine_on_arbitrary_text(spark, texts):
    import duckdb
    import pandas as pd

    from dbreg_spark.operators import text as tx

    rows = [(i, t) for i, t in enumerate(texts)] + [(len(texts), None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        tx.text_stats(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t_in", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = (
        con.execute(tx.text_stats_sql("t_in"))
        .fetchdf().sort_values("doc_id").reset_index(drop=True)
    )
    for c in got.columns:
        if got[c].dtype.kind == "f":
            np.testing.assert_allclose(
                got[c].astype(float), want[c].astype(float),
                rtol=1e-9, err_msg=c, equal_nan=True,
            )
        else:
            assert got[c].fillna("§").tolist() == want[c].fillna("§").tolist(), c


@given(st.lists(st.text(_text_chars, max_size=120), min_size=40, max_size=60))
@settings(max_examples=3, deadline=None)
def test_repetition_cross_engine_on_arbitrary_text(spark, texts):
    import duckdb
    import pandas as pd

    from dbreg_spark.operators import text as tx

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        tx.repetition_stats(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t_in", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = (
        con.execute(tx.repetition_stats_sql("t_in"))
        .fetchdf().sort_values("doc_id").reset_index(drop=True)
    )
    for c in got.columns:
        if got[c].dtype.kind == "f":
            np.testing.assert_allclose(
                got[c].astype(float), want[c].astype(float), rtol=1e-9, err_msg=c
            )
        else:
            assert got[c].tolist() == want[c].tolist(), c


@given(st.lists(st.text(_text_chars, max_size=100), min_size=30, max_size=40))
@settings(max_examples=3, deadline=None)
def test_hashing_paths_cross_engine_on_arbitrary_text(spark, texts):
    """Fingerprints (md5 + rolling word hash) and MinHash signatures are
    integer/hash-exact across engines for arbitrary text — any tokenizer
    or hash divergence flips them outright, so exact equality is the
    assertion."""
    import duckdb
    import pandas as pd

    from dbreg_spark.operators import dedup, text as tx

    # the None row pins NULL-text parity: DuckDB list_prepend(init, NULL)
    # is [init], which folded a NULL doc's rolling hash to the seed until
    # reduce_bigint's twin grew a NULL guard (found by the offline fuzz)
    rows = [(i, t) for i, t in enumerate(texts)] + [(len(texts), None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register("t_in", pd.DataFrame(rows, columns=["doc_id", "text"]))

    got_fp = (
        tx.fingerprints(df).select("doc_id", "fp_md5", "fp_rolling")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want_fp = (
        con.execute(tx.fingerprints_sql("t_in"))
        .fetchdf().sort_values("doc_id").reset_index(drop=True)
    )
    assert got_fp["fp_md5"].fillna("§").tolist() == want_fp["fp_md5"].fillna("§").tolist()
    assert got_fp["fp_rolling"].fillna(-1).tolist() == want_fp["fp_rolling"].fillna(-1).tolist()

    got_mh = (
        dedup.minhash_signatures(df, n_hashes=4, shingle_words=2)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want_mh = (
        con.execute(
            dedup.minhash_signatures_sql("t_in", n_hashes=4, shingle_words=2)
        )
        .fetchdf().sort_values("doc_id").reset_index(drop=True)
    )
    for c in ("sig_0", "sig_1", "sig_2", "sig_3"):
        assert got_mh[c].fillna(-1).tolist() == want_mh[c].fillna(-1).tolist(), c


def test_trim_ws_cross_engine_regression(spark):
    """Deterministic pin of the bare-trim() divergence hypothesis found:
    DuckDB's trim strips Unicode Zs (U+00A0) while Spark's strips only
    ASCII space, so any expression built on bare trim diverges. trim_ws
    strips exactly the explicit WS class on both engines — NBSP is content,
    tabs/newlines are whitespace, and U+0085 (a Java line terminator, which
    a $-anchored pattern would mis-handle) stays put."""
    import duckdb
    import pandas as pd

    from dbreg_spark.functions.xdialect import DUCK, SPARK, X
    from dbreg_spark.operators import text as tx

    cases = ["000 00\xa0", " a ", "\ta\n", "a \x85", "\xa0", "", "\x0b a"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    got = df.selectExpr(
        "doc_id", X(SPARK).trim_ws("text") + " AS t"
    ).toPandas().sort_values("doc_id")
    con = duckdb.connect()
    con.register("t_in", pd.DataFrame(enumerate(cases), columns=["doc_id", "text"]))
    want = con.execute(
        f"SELECT doc_id, {X(DUCK).trim_ws('text')} AS t FROM t_in ORDER BY doc_id"
    ).fetchdf()
    assert got["t"].tolist() == want["t"].tolist()
    # NBSP and U+0085 are content; \x0b (vertical tab) is deliberately NOT
    # in the WS class (Java \s and RE2 \s disagree on it)
    assert got["t"].tolist() == [
        "000 00\xa0", "a", "a", "a \x85", "\xa0", "", "\x0b a"
    ]
    # the original falsifying doc now yields identical repetition metrics
    rep_got = tx.repetition_stats(df).toPandas().sort_values("doc_id")
    rep_want = con.execute(tx.repetition_stats_sql("t_in")).fetchdf().sort_values("doc_id")
    for c in ("n_lines", "top_ngram_char_frac", "dup_line_frac"):
        assert rep_got[c].tolist() == rep_want[c].tolist(), c
    con.close()


@given(st.lists(st.text(_text_chars, max_size=100), min_size=30, max_size=40))
@settings(max_examples=3, deadline=None)
def test_c4_filter_cross_engine_on_arbitrary_text(spark, texts):
    """The C4 line filter (regex-heavy: terminal-punct \\z match, WS-class
    word counts, LIKE blocklist, newline splits, array_join on kept lines)
    is byte-identical across engines on arbitrary text."""
    import duckdb
    import pandas as pd

    from dbreg_spark.operators import web as wb

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        wb.c4_filter(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t_in", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = (
        con.execute(wb.c4_filter_sql("t_in"))
        .fetchdf().sort_values("doc_id").reset_index(drop=True)
    )
    for c in ("clean_text", "n_lines", "n_lines_kept"):
        assert got[c].fillna("§").tolist() == want[c].fillna("§").tolist(), c
    for c in ("has_lorem_ipsum", "has_brace", "keep"):
        assert (
            got[c].astype("object").fillna("§").tolist()
            == want[c].astype("object").fillna("§").tolist()
        ), c
    con.close()


@given(st.lists(st.text(_text_chars, max_size=100), min_size=30, max_size=40))
@settings(max_examples=3, deadline=None)
def test_extract_urls_cross_engine_on_arbitrary_text(spark, texts):
    """URL extraction + normalization (extract_all, fragment/punct strips,
    host/domain captures) matches across engines on arbitrary text — the
    URL char class excludes Java's line-terminator set precisely so this
    holds."""
    import duckdb
    import pandas as pd

    from dbreg_spark.operators import web as wb

    # salt some rows with URL-ish fragments so matches actually occur
    salted = [
        t + " http://x" + str(i % 3) + ".Example.org/p#f." if i % 2 else t
        for i, t in enumerate(texts)
    ]
    rows = [(i, t) for i, t in enumerate(salted)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        wb.extract_urls(df).toPandas()
        .sort_values(["doc_id", "url"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t_in", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = (
        con.execute(wb.extract_urls_sql("t_in"))
        .fetchdf().sort_values(["doc_id", "url"]).reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ("url", "url_norm", "host", "domain"):
        assert got[c].fillna("§").tolist() == want[c].fillna("§").tolist(), c
    con.close()


@st.composite
def multi_formulas(draw):
    y_n = draw(st.integers(1, 3))
    ys = draw(st.lists(names, min_size=y_n, max_size=y_n, unique=True))
    base = draw(
        st.lists(
            names.filter(lambda v: v not in ys), min_size=0, max_size=2,
            unique=True,
        )
    )
    kind = draw(st.sampled_from(["sw", "sw0", "csw", "csw0"]))
    n_g = draw(st.integers(1, 3))
    groups = draw(
        st.lists(
            names.filter(lambda v: v not in ys and v not in base),
            min_size=n_g, max_size=n_g, unique=True,
        )
    )
    lhs = ys[0] if y_n == 1 else "c(" + ", ".join(ys) + ")"
    rhs = " + ".join(base + [f"{kind}({', '.join(groups)})"])
    return lhs + " ~ " + rhs, ys, base, kind, groups


@given(multi_formulas())
@settings(max_examples=200, deadline=None)
def test_parse_multi_formula_invariants(fx):
    from dbreg_spark.formula import parse_formula as _pf
    from dbreg_spark.multi import parse_multi_formula

    fml, ys, base, kind, groups = fx
    spec = parse_multi_formula(fml)
    assert spec.lhs == ys
    want = len(groups) + (1 if kind.endswith("0") else 0)
    assert len(spec.steps) == want
    parsed_steps = []
    for label, rhs1 in spec.steps:
        if not rhs1 or rhs1 == "1":
            # the empty sw0/csw0 step with no base terms is intercept-only
            # and refused downstream by parse_formula; skip parsing it
            assert kind.endswith("0") and not base
            parsed_steps.append(set())
            continue
        p = _pf(f"{ys[0]} ~ {rhs1}")
        terms = {t.label for t in p.terms}
        # every base term appears in every step
        assert set(base) <= terms
        parsed_steps.append(terms)
    if kind.startswith("csw"):
        # cumulative: each step's terms nest in the next
        chain = [s for s in parsed_steps if s]
        for a, b in zip(chain, chain[1:]):
            assert a <= b
    else:
        # plain sw: exactly one group per non-empty step
        for s, g in zip(
            parsed_steps[1:] if kind.endswith("0") else parsed_steps, groups
        ):
            assert g in s
