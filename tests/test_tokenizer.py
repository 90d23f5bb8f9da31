"""Tokenizer: golden vectors + three-engine parity (Spark JVM / Python / DuckDB).

The input_hint invariant is byte-identical terms per url across engines —
this test IS that invariant at t1 scale.
"""

import duckdb
import pytest

from colbert_spark.functions.tokenizer import (
    DUCKDB_TOKEN_REGEX,
    py_html_to_text,
    py_tokenize,
    tokens_col,
)

GOLDEN = [
    ("Hello, World! 123", ["hello", "world", "123"]),
    ("foo_bar-baz", ["foo", "bar", "baz"]),
    ("中文测试abc", ["中", "文", "测", "试", "abc"]),
    ("", []),
    ("  a  b  ", ["a", "b"]),
    ("x1y2z3", ["x1y2z3"]),
    ("don't stop", ["don", "t", "stop"]),
    ("UPPER lower MiXeD", ["upper", "lower", "mixed"]),
    ("tabs\tand\nnewlines", ["tabs", "and", "newlines"]),
    ("...!!!", []),
    ("42", ["42"]),
    ("naïve café", ["na", "ve", "caf"]),  # non-ascii letters are separators
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_py_tokenize_golden(text, expected):
    assert py_tokenize(text) == expected


def test_html_to_text():
    html = b"<html><head><style>p{x:1}</style><script>var x=1;</script></head><body><p>Hello <b>World</b></p></body></html>"
    text = py_html_to_text(html)
    assert py_tokenize(text) == ["hello", "world"]


def test_parity_python_duckdb():
    for text, expected in GOLDEN:
        got = duckdb.sql(
            "select regexp_extract_all(lower(?), ?)", params=[text, DUCKDB_TOKEN_REGEX]
        ).fetchone()[0]
        assert got == expected, text


def test_parity_python_spark(spark):
    texts = [t for t, _ in GOLDEN]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r["text"]: r["toks"] for r in df.select("text", tokens_col().alias("toks")).collect()}
    for text, expected in GOLDEN:
        assert got[text] == expected, text


def test_parity_on_synth_corpus(spark, tiny_corpus):
    """Every synthetic page tokenizes identically in Spark and Python, and
    tokenize(extract(html)) == tokenize(text)."""
    from colbert_spark.functions.tokenizer import html_text_col

    df = spark.createDataFrame(tiny_corpus[["url", "text", "html"]])
    rows = df.select(
        "url",
        tokens_col("text").alias("toks"),
        tokens_col().alias("_t"),
    ).drop("_t")
    spark_toks = {r["url"]: r["toks"] for r in rows.collect()}
    html_rows = df.withColumn("etext", html_text_col("html")).select(
        "url", tokens_col("etext").alias("toks")
    )
    html_toks = {r["url"]: r["toks"] for r in html_rows.collect()}
    for _, row in tiny_corpus.iterrows():
        expected = py_tokenize(row["text"])
        assert spark_toks[row["url"]] == expected
        assert html_toks[row["url"]] == expected
