"""Web-corpus cleaning (C4 line filter, URL/domain analytics) and
semi-structured JSON extraction vs DuckDB oracles + handmade expectations."""

import pandas as pd
import pytest

from dbreg_spark.operators import semistruct, web


@pytest.fixture(scope="module")
def docs(tables):
    return tables["documents"]


def _cmp(spark_pdf, duck_pdf, keys):
    a = spark_pdf.sort_values(keys).reset_index(drop=True)
    b = duck_pdf.sort_values(keys).reset_index(drop=True)
    assert len(a) == len(b), f"row counts differ: {len(a)} vs {len(b)}"
    for c in a.columns:
        assert a[c].fillna("§").tolist() == b[c].fillna("§").tolist(), c


# ------------------------------------------------------------------ JSON ----


def test_json_fields_vs_duckdb(tables, duck):
    fields = [("k", "$.k", "BIGINT"), ("absent", "$.absent", "STRING")]
    got = (
        semistruct.json_fields(tables["events"], fields, col="props")
        .select("event_id", "k", "absent")
        .toPandas()
    )
    want = duck.execute(
        semistruct.json_fields_sql(
            "events", fields, col="props", select_cols=["event_id"]
        )
    ).fetchdf()
    _cmp(got, want, ["event_id"])


def test_json_fields_handmade_and_parity(spark, duck):
    rows = [
        (1, '{"k": 7, "s": "hi", "nested": {"x": 1.5}, "b": true}'),
        (2, '{"k": "notanumber"}'),
        (3, "not json at all"),
        (4, None),
        (5, '{"k": null}'),
    ]
    fields = [
        ("k", "$.k", "BIGINT"),
        ("s", "$.s", "STRING"),
        ("x", "$.nested.x", "DOUBLE"),
    ]
    df = spark.createDataFrame(rows, "id long, props string")
    got = (
        semistruct.json_fields(df, fields, col="props", drop_raw=True)
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    assert list(got.columns) == ["id", "k", "s", "x"]
    assert got["k"].fillna(-1).tolist() == [7, -1, -1, -1, -1]
    assert got["s"].fillna("§").tolist() == ["hi", "§", "§", "§", "§"]
    assert got["x"].fillna(-1).tolist() == [1.5, -1, -1, -1, -1]
    duck.register("json_in", pd.DataFrame(rows, columns=["id", "props"]))
    want = duck.execute(
        semistruct.json_fields_sql(
            "json_in", fields, col="props", select_cols=["id"]
        )
    ).fetchdf()
    for c in ("k", "x"):
        assert got[c].fillna(-1).tolist() == want[c].fillna(-1).tolist(), c
    assert got["s"].fillna("§").tolist() == want["s"].fillna("§").tolist()


def test_json_fields_no_shuffle_plan(tables):
    out = semistruct.json_fields(
        tables["events"], [("k", "$.k", "BIGINT")], col="props"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_json_fields_bad_path_raises(tables):
    with pytest.raises(ValueError, match="JSON path"):
        semistruct.json_fields(
            tables["events"], [("k", "k", "BIGINT")], col="props"
        )


# -------------------------------------------------------------- C4 filter ----


_C4_ROWS = [
    # every line passes
    (1, 'First proper sentence here.\nSecond good line as well!'),
    # line rules: no terminal punct / too few words / javascript boilerplate
    (2, 'No terminal punctuation here\nOk.\nPlease enable javascript to view.'),
    # doc-level lorem ipsum flag kills the doc even with good lines
    (3, 'A perfectly fine sentence.\nLorem Ipsum dolor sit amet.'),
    # curly brace flag (code/templating residue)
    (4, 'Valid sentence over here.\nbody { margin: 0; }'),
    # nothing survives -> keep false via min_lines
    (5, 'just\nshort\nbits'),
    # blocklist is case-insensitive
    (6, 'Read our Cookie Policy today.\nThis line is clean and long enough.'),
]


def test_c4_filter_handmade(spark):
    df = spark.createDataFrame(_C4_ROWS, "doc_id long, text string")
    got = (
        web.c4_filter(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.loc[0, "clean_text"] == _C4_ROWS[0][1]
    assert (got.loc[0, "n_lines"], got.loc[0, "n_lines_kept"]) == (2, 2)
    assert bool(got.loc[0, "keep"])
    # doc 2: only 'Ok.' fails min_words, first line lacks punct, third is js
    assert got.loc[1, "clean_text"] == ""
    assert got.loc[1, "n_lines_kept"] == 0
    assert not bool(got.loc[1, "keep"])
    # doc 3: lorem ipsum flag (case-insensitive), line itself would pass
    assert bool(got.loc[2, "has_lorem_ipsum"])
    assert not bool(got.loc[2, "keep"])
    assert got.loc[2, "n_lines_kept"] == 2
    # doc 4: brace flag; the css line also fails the line rules
    assert bool(got.loc[3, "has_brace"])
    assert not bool(got.loc[3, "keep"])
    assert got.loc[3, "clean_text"] == "Valid sentence over here."
    # doc 5: nothing survives
    assert got.loc[4, "n_lines_kept"] == 0 and not bool(got.loc[4, "keep"])
    # doc 6: cookie-policy line dropped, second line kept
    assert got.loc[5, "clean_text"] == "This line is clean and long enough."
    assert bool(got.loc[5, "keep"])


def test_c4_filter_vs_duckdb(spark, duck):
    df = spark.createDataFrame(_C4_ROWS, "doc_id long, text string")
    got = (
        web.c4_filter(df)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    duck.register("c4_in", pd.DataFrame(_C4_ROWS, columns=["doc_id", "text"]))
    want = duck.execute(web.c4_filter_sql("c4_in")).fetchdf()
    got = got[[c for c in want.columns]]
    for c in ("has_lorem_ipsum", "has_brace", "keep"):
        got[c] = got[c].astype(bool)
        want[c] = want[c].astype(bool)
    _cmp(got, want, ["doc_id"])


def test_c4_filter_no_shuffle_plan(docs):
    out = web.c4_filter(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_c4_filter_custom_rules(spark):
    df = spark.createDataFrame(
        [(1, "One two.\nOne two three four.")], "doc_id long, text string"
    )
    got = web.c4_filter(df, min_words=4, blocklist=[]).toPandas()
    assert got.loc[0, "clean_text"] == "One two three four."


# ------------------------------------------------------------------- URLs ----


def test_extract_urls_handmade_and_parity(spark, duck):
    rows = [
        (1, "see https://Example.COM/Path?q=1#frag and more"),
        (2, "ends with url http://a.b.test.org/x."),
        (3, "no urls here"),
        (4, 'quoted "https://quoted.io/z" link'),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        web.extract_urls(df).toPandas()
        .sort_values(["doc_id", "url"]).reset_index(drop=True)
    )
    # one row per occurrence; docs without URLs (or NULL) contribute none
    assert got["doc_id"].tolist() == [1, 2, 4]
    assert got.loc[0, "url_norm"] == "https://Example.COM/Path?q=1"
    assert got.loc[0, "host"] == "example.com"
    assert got.loc[0, "domain"] == "example.com"
    # trailing sentence punctuation stripped, subdomain reduced
    assert got.loc[1, "url_norm"] == "http://a.b.test.org/x"
    assert got.loc[1, "host"] == "a.b.test.org"
    assert got.loc[1, "domain"] == "test.org"
    assert got.loc[2, "host"] == "quoted.io"
    duck.register("url_in", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = duck.execute(web.extract_urls_sql("url_in")).fetchdf()
    _cmp(got, want, ["doc_id", "url"])


def test_domain_stats_counts_and_order(spark, duck):
    rows = [
        (1, "https://a.com/1 https://a.com/2 https://b.com/x"),
        (2, "https://b.com/y"),
        (3, "https://a.com/3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = web.domain_stats(df).toPandas()
    # a.com: 3 urls over 2 docs; b.com: 2 urls over 2 docs — volume order
    assert got["domain"].tolist() == ["a.com", "b.com"]
    assert got["n_urls"].tolist() == [3, 2]
    assert got["n_docs"].tolist() == [2, 2]
    duck.register("dom_in", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = duck.execute(web.domain_stats_sql("dom_in")).fetchdf()
    _cmp(got, want, ["domain"])


def test_domain_stats_top_n_plan_is_take_ordered(spark):
    rows = [(i, f"https://d{i % 5}.com/x") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = web.domain_stats(df, top_n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert len(out.collect()) == 3


# ------------------------------------------------- quality classifier ----


def test_quality_classify_parity_and_semantics(spark, duck, docs):
    from dbreg_spark.operators import text as tx

    got = (
        tx.quality_classify(docs).select("doc_id", "clf_score", "clf_keep")
        .toPandas()
    )
    want = duck.execute(
        "SELECT doc_id, clf_score, clf_keep FROM ("
        + tx.quality_classify_sql("documents")
        + ") q"
    ).fetchdf()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = want.sort_values("doc_id").reset_index(drop=True)
    import numpy as np

    np.testing.assert_allclose(a["clf_score"], b["clf_score"], rtol=1e-9)
    assert a["clf_keep"].tolist() == b["clf_keep"].tolist()
    assert ((a["clf_score"] > 0) & (a["clf_score"] < 1)).all()


def test_quality_classify_orders_noise_below_prose(spark):
    from dbreg_spark.operators import text as tx

    rows = [
        (1, "the table shows a clear value and it is that simple to read"),
        (2, "0x3f9 0x2ae 0x991 0x4d2 0x777 0x123 0x456 0x789 0xabc 0xdef"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        tx.quality_classify(df).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    # stopword-rich prose outscores digit/punct noise
    assert got.loc[0, "clf_score"] > got.loc[1, "clf_score"]
    # NULL text -> NULL score and NULL keep (no row dropped)
    assert pd.isna(got.loc[2, "clf_score"]) and pd.isna(got.loc[2, "clf_keep"])
    # threshold moves the flag
    all_keep = tx.quality_classify(df, threshold=0.0).toPandas()
    assert all_keep.dropna()["clf_keep"].tolist() == [1, 1]


def test_quality_classify_unknown_feature_raises(docs):
    from dbreg_spark.operators import text as tx

    with pytest.raises(ValueError, match="unknown feature"):
        tx.quality_classify(docs, weights={"nope": 1.0})


def test_quality_classify_no_shuffle_plan(docs):
    from dbreg_spark.operators import text as tx

    out = tx.quality_classify(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------ review-finding pins ----


def test_c4_blocklist_escaping_case_and_wildcards(spark, duck):
    """Blocklist entries are plain case-insensitive substrings: quotes
    don't crash, mixed case still matches, % and _ are literals."""
    rows = [
        (1, "Please don't sell my personal information today."),
        (2, "A line with 100% guarantees here."),
        (3, "Completely clean sentence right here."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bl = ["Don't SELL my personal information", "100% guarantee"]
    got = (
        web.c4_filter(df, blocklist=bl).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert got["n_lines_kept"].tolist() == [0, 0, 1]
    duck.register("bl_in", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = duck.execute(web.c4_filter_sql("bl_in", blocklist=bl)).fetchdf()
    assert want.sort_values("doc_id")["n_lines_kept"].tolist() == [0, 0, 1]
    # an underscore entry must not act as a single-char wildcard
    got2 = web.c4_filter(df, blocklist=["cl_an"]).toPandas()
    assert got2.sort_values("doc_id")["n_lines_kept"].tolist() == [1, 1, 1]


def test_c4_clean_text_trims_crlf_lines(spark, duck):
    rows = [(1, "Good first line here.\r\nSecond good line too.")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = web.c4_filter(df).toPandas()
    assert got.loc[0, "clean_text"] == "Good first line here.\nSecond good line too."
    assert "\r" not in got.loc[0, "clean_text"]
    duck.register("crlf_in", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = duck.execute(web.c4_filter_sql("crlf_in")).fetchdf()
    assert want.loc[0, "clean_text"] == got.loc[0, "clean_text"]


def test_extract_urls_uppercase_scheme(spark, duck):
    rows = [(1, "shouting HTTP://EXAMPLE.COM/PAGE and Https://Foo.Bar/x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = web.extract_urls(df).toPandas().sort_values("url").reset_index(drop=True)
    assert len(got) == 2
    assert set(got["host"]) == {"example.com", "foo.bar"}
    duck.register("uc_in", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = duck.execute(web.extract_urls_sql("uc_in")).fetchdf()
    _cmp(got, want.sort_values("url").reset_index(drop=True), ["doc_id", "url"])


def test_json_fields_path_with_quote(spark, duck):
    rows = [(1, '{"user\'s_id": 5}')]
    fields = [("v", "$.user's_id", "BIGINT")]
    df = spark.createDataFrame(rows, "id long, props string")
    got = semistruct.json_fields(df, fields, col="props").toPandas()
    duck.register("q_in", pd.DataFrame(rows, columns=["id", "props"]))
    want = duck.execute(
        semistruct.json_fields_sql("q_in", fields, col="props", select_cols=["id"])
    ).fetchdf()
    # both engines parse without a SQL error; extracted values agree
    assert got["v"].fillna(-1).tolist() == want["v"].fillna(-1).tolist()


def test_json_key_stats_handmade_and_parity(spark, duck):
    rows = [
        (1, '{"a": 1, "b": 2}'),
        (2, '{"a": 3}'),
        (3, "broken {"),
        (4, None),
        (5, '{"a": 1, "c": [1, 2]}'),
    ]
    df = spark.createDataFrame(rows, "id long, props string")
    got = semistruct.json_key_stats(df).toPandas()
    # a: 3/5, b: 1/5, c: 1/5 — malformed and NULL stay in the denominator
    assert got["key"].tolist() == ["a", "b", "c"]
    assert got["n_rows"].tolist() == [3, 1, 1]
    assert got["coverage"].tolist() == [0.6, 0.2, 0.2]
    duck.register("jk_in", pd.DataFrame(rows, columns=["id", "props"]))
    want = duck.execute(semistruct.json_key_stats_sql("jk_in")).fetchdf()
    _cmp(got, want, ["key"])


def test_json_key_stats_empty_universe(spark):
    df = spark.createDataFrame([(1, None), (2, "nope")], "id long, props string")
    assert semistruct.json_key_stats(df).count() == 0
