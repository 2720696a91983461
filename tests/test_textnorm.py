"""Golden + property tests for the frozen text layer.

Golden values ported from the reference's own tests
(/root/reference/format/format_test.go:9-32,
 /root/reference/transform/transform_test.go:35-306) plus the SURVEY.md 2.3
quirk cases derived from format/format.go:99-118 source-order semantics.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from engine import textnorm as tn

# (name, expected_start, expected_ending)
T1_GOLDEN = [
    # the reference's own golden case, format/format_test.go:13-31
    ("TEST LIMITED", "TEST", " LIMITED"),
    # trailing punctuation stripped pre-match but reappears in the ending
    ("TEST LIMITED...", "TEST", " LIMITED..."),
    # quirk: LIMITED (source idx 44) matches before UNLIMITED (idx 69); the
    # space-trim no-ops (preceding char 'N') so nothing is split
    ("FOO UNLIMITED", "FOO UNLIMITED", ""),
    # name exactly equal to a suffix: no preceding space, trim no-ops
    ("LIMITED", "LIMITED", ""),
    # multi-word suffix forms win by source order
    ("ACME LIMITED LIABILITY PARTNERSHIP", "ACME", " LIMITED LIABILITY PARTNERSHIP"),
    ("X LTD...THE", "X", " LTD...THE"),
    ("BLAH CYFYNGEDIG", "BLAH", " CYFYNGEDIG"),
    ("A & B LIMITED", "A & B", " LIMITED"),
    ("CAFÉ LTD", "CAFÉ", " LTD"),
    ("NO SUFFIX HERE", "NO SUFFIX HERE", ""),
    ("", "", ""),
    # CCG CYF (idx 9) precedes CYF (idx 26): longest wins here by order
    ("FOO CCG CYF", "FOO", " CCG CYF"),
    # trailing whitespace only
    ("BAR PLC  ", "BAR", " PLC  "),
]


@pytest.mark.parametrize("name,start,ending", T1_GOLDEN)
def test_split_name_endings_py(name, start, ending):
    assert tn.split_company_name_endings_py(name) == (start, ending)


def test_split_name_endings_vectorized_matches_py():
    names = [g[0] for g in T1_GOLDEN] + [f"CO {i} LIMITED" for i in range(50)]
    out = tn.split_company_name_endings_series(pd.Series(names))
    for i, n in enumerate(names):
        s, e = tn.split_company_name_endings_py(n)
        assert out["name_start"].iloc[i] == s, n
        assert out["name_ending"].iloc[i] == e, n


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8", categories=["L", "N", "P", "Z"]), max_size=60))
def test_split_name_endings_property(name):
    s, e = tn.split_company_name_endings_py(name)
    # start is always a prefix of the original name; start+ending == name
    # whenever a suffix matched (ending != "")
    assert name.startswith(s) or s == tn._NON_WORD_END_RE.sub("", name)
    if e:
        assert s + e == name
    out = tn.split_company_name_endings_series(pd.Series([name]))
    assert out["name_start"].iloc[0] == s
    assert out["name_ending"].iloc[0] == e


ANALYZER_GOLDEN = [
    # (func, input, expected)
    (tn.analyzer_startswith_py, "Hello World Ltd", "helloworldltd"),
    (tn.analyzer_startswith_py, "  A  B ", "ab"),
    (tn.startswith_no_ws_punc_py, "A.B & C!", "abc"),
    (tn.analyzer_unique_tf_py, "The the THE cat Cat", ["the", "cat"]),
    (tn.analyzer_limit_first_py, "Alpha Beta Gamma", "alpha"),
    (tn.analyzer_limit_first_py, "...", None),
    (tn.analyzer_elastic_py, "Foo-Bar baz", ["Foo", "Bar", "baz"]),
    (tn.analyzer_whitespace_token_py, "Café au lait", ["cafe", "café", "au", "lait"]),
    (tn.analyzer_keyword_token_sort_py, "A & B Ltd.", "aandbltd"),
    (tn.analyzer_keyword_token_sort_py, "CAFÉ LTD", "cafltd"),  # É stripped pre-fold
    (tn.analyzer_edge_ngram_py, "Cab", ["ca", "cab"]),
    (tn.simple_tokenize_py, "ab1cd ef", ["ab", "cd", "ef"]),
    (tn.standard_tokenize_py, "ab1cd_x ef!", ["ab1cd_x", "ef"]),
]


@pytest.mark.parametrize("func,inp,expected", ANALYZER_GOLDEN)
def test_analyzer_golden(func, inp, expected):
    assert func(inp) == expected


def test_edge_ngram_bounds():
    out = tn.analyzer_edge_ngram_py("abcdefghijklmnopqrstuvwxyz")
    assert out[0] == "ab" and len(out[-1]) == 20 and len(out) == 19


ALPHAKEY_GOLDEN = [
    ("TEST LIMITED", "TEST", "TEST"),
    ("B A LIMITED", "BA", "AB"),
    ("CAFÉ NOIR LTD", "CAFENOIR", "CAFENOIR"),
    ("ZEBRA APPLE PLC", "ZEBRAAPPLE", "APPLEZEBRA"),
    ("A & B LIMITED", "AB", "AB"),
]


@pytest.mark.parametrize("name,same,ordered", ALPHAKEY_GOLDEN)
def test_alphakey_golden(name, same, ordered):
    assert tn.alphakey_py(name) == (same, ordered)


def test_spark_cols_match_py(spark):
    """Every *_col analyzer must equal its frozen *_py twin row-for-row."""
    import pyspark.sql.functions as F

    vals = [
        "Hello World Ltd",
        "A.B & C!",
        "The the THE cat Cat",
        "Alpha Beta Gamma",
        "Foo-Bar baz",
        "Café au lait",
        "A & B Ltd.",
        "TEST LIMITED",
        "FOO UNLIMITED",
        "x",
        "ab1cd_x ef!",
        "ÀÇÉ ltd",
        "",
    ]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = df.select(
        tn.analyzer_startswith_col(F.col("s")).alias("l1"),
        tn.startswith_no_ws_punc_col(F.col("s")).alias("l2"),
        tn.analyzer_unique_tf_col(F.col("s")).alias("l3"),
        tn.analyzer_limit_first_col(F.col("s")).alias("l4"),
        tn.analyzer_elastic_col(F.col("s")).alias("l5"),
        tn.analyzer_whitespace_token_col(F.col("s")).alias("l6"),
        tn.analyzer_keyword_token_sort_col(F.col("s")).alias("l7"),
        tn.analyzer_edge_ngram_col(F.col("s")).alias("l8"),
        tn.simple_tokenize_col(F.col("s")).alias("l9"),
        tn.standard_tokenize_col(F.col("s")).alias("l10"),
        tn.split_company_name_endings_col("s").alias("t1"),
        tn.alphakey_col("s").alias("ak"),
        tn.edge_ngram_ascii_col(F.col("s")).alias("l8a"),
    ).collect()
    for v, row in zip(vals, got):
        assert row["l1"] == tn.analyzer_startswith_py(v), v
        assert row["l2"] == tn.startswith_no_ws_punc_py(v), v
        assert row["l3"] == tn.analyzer_unique_tf_py(v), v
        assert row["l4"] == tn.analyzer_limit_first_py(v), v
        assert row["l5"] == tn.analyzer_elastic_py(v), v
        assert row["l6"] == tn.analyzer_whitespace_token_py(v), v
        assert row["l7"] == tn.analyzer_keyword_token_sort_py(v), v
        assert row["l8"] == tn.analyzer_edge_ngram_py(v), v
        assert row["l9"] == tn.simple_tokenize_py(v), v
        assert row["l10"] == tn.standard_tokenize_py(v), v
        assert (row["t1"]["name_start"], row["t1"]["name_ending"]) == tn.split_company_name_endings_py(v), v
        assert (row["ak"]["same_as_alpha_key"], row["ak"]["ordered_alpha_key"]) == tn.alphakey_py(v), v
        if v.isascii():
            assert row["l8a"] == tn.analyzer_edge_ngram_py(v), v


def test_stop_analyzer_py_col_equivalence(spark):
    """L11 ES stop analyzer: letter tokenizer + Lucene English stopword
    list; the py and JVM column paths agree on adversarial inputs."""
    import engine.textnorm as tn

    assert tn.analyzer_stop_py("The quick AND the dead, if any") == [
        "quick", "dead", "any"
    ]
    assert tn.analyzer_stop_py("to be or not to be") == []
    assert len(tn.ENGLISH_STOPWORDS) == 33
    vals = [
        "The quick AND the dead, if any",
        "to be or not to be",
        "x2go İstanbul WILL-power there.these,they",
        "", "   ", "a an and are as at",
        "Thé þorn is not a stopword",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    rows = df.select("v", tn.analyzer_stop_col(F.col("v")).alias("l11")).collect()
    for row in rows:
        assert row["l11"] == tn.analyzer_stop_py(row["v"]), row["v"]
