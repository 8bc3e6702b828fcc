"""Analyzer-chain unit goldens (FIXTURES.md §4; reference chains
schema.xml:510-526 and :580-610)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from easy_solr4files_index_spark.functions.tokenizer import (
    LUCENE_STOPWORDS,
    make_tokenize_udf,
    tokenize_catenate_duckdb_sql,
    tokenize_expr,
    tokenize_expr_catenate,
    tokenize_py,
    tokenize_py_catenate,
)

GOLDENS = [
    # camelCase splits on case change (schema.xml:592 splitOnCaseChange analog)
    ("getHttpResponse", ["get", "http", "response"]),
    # acronym run then word: HTTPServer -> http server
    ("HTTPServer", ["http", "server"]),
    # SCREAMING_SNAKE
    ("MAX_BUFFER_SIZE", ["max", "buffer", "size"]),
    # snake_case + kebab-case
    ("uri_path my-var", ["uri", "path", "my", "var"]),
    # digits stay attached unless a delimiter intervenes
    ("answer42 final-Answer42 utf8_codec", ["answer42", "final", "answer42", "utf8", "codec"]),
    # stopwords dropped (Lucene default set)
    ("the quick AND a fox WILL run", ["quick", "fox", "run"]),
    # path segments split on / and .
    ("src/main/util/StringUtils.java", ["src", "main", "util", "string", "utils", "java"]),
    # empty / stopwords-only
    ("", []),
    ("the a an of", []),
    # unicode: non-ascii letters act as delimiters under [^a-z0-9]
    ("naïve café", ["na", "ve", "caf"]),
]


@pytest.mark.parametrize("raw,expected", GOLDENS)
def test_python_spec(raw, expected):
    assert tokenize_py(raw) == expected


def test_expr_matches_python_spec(spark):
    raws = [g[0] for g in GOLDENS] + [None]
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    got = df.select(tokenize_expr("raw").alias("t")).collect()
    for row, raw in zip(got, raws):
        assert row["t"] == tokenize_py(raw), raw


def test_arrow_udf_matches_python_spec(spark):
    raws = [g[0] for g in GOLDENS] + [None]
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    tok = make_tokenize_udf(LUCENE_STOPWORDS)
    got = df.select(tok("raw").alias("t")).collect()
    for row, raw in zip(got, raws):
        assert row["t"] == tokenize_py(raw), raw


def test_catenation_mode(spark):
    tok = make_tokenize_udf(LUCENE_STOPWORDS, catenate=True)
    df = spark.createDataFrame([("getHTTPResponse uri_path plain",)], "raw string")
    got = df.select(tok("raw").alias("t")).collect()[0]["t"]
    # parts, then catenated multi-part identifiers (WDGF catenateWords=1)
    assert got == ["get", "http", "response", "uri", "path", "plain",
                   "gethttpresponse", "uripath"]


# catenate-chain goldens: base split tokens, then the delimiter-deleted
# catenated form of every multi-part word (WDGF catenateWords=1,
# schema.xml:592) — all four implementations must agree on these
CAT_GOLDENS = [
    ("getHTTPResponse uri_path plain",
     ["get", "http", "response", "uri", "path", "plain",
      "gethttpresponse", "uripath"]),
    # path word: parts + catenation of the whole path
    ("docs/00000007.txt", ["docs", "00000007", "txt", "docs00000007txt"]),
    # stopwords filtered from BOTH the base and catenated streams; a
    # catenation that lands ON a stopword ("a-n" -> "an") is dropped
    ("the a-n fox", ["n", "fox"]),
    # single-part words emit no catenation
    ("plain words only", ["plain", "words", "only"]),
    ("", []),
]


@pytest.mark.parametrize("raw,expected", CAT_GOLDENS)
def test_py_catenate_goldens(raw, expected):
    assert tokenize_py_catenate(raw) == expected


def test_expr_catenate_matches_python(spark):
    raws = [g[0] for g in GOLDENS] + [g[0] for g in CAT_GOLDENS] + [None]
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    got = df.select(tokenize_expr_catenate("raw").alias("t")).collect()
    for row, raw in zip(got, raws):
        assert row["t"] == tokenize_py_catenate(raw), raw


def test_arrow_catenate_matches_python(spark):
    raws = [g[0] for g in GOLDENS] + [g[0] for g in CAT_GOLDENS] + [None]
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    tok = make_tokenize_udf(LUCENE_STOPWORDS, catenate=True)
    got = df.select(tok("raw").alias("t")).collect()
    for row, raw in zip(got, raws):
        assert row["t"] == tokenize_py_catenate(raw), raw


def test_duckdb_catenate_matches_python():
    import duckdb
    con = duckdb.connect()
    stop = ", ".join(f"'{w}'" for w in LUCENE_STOPWORDS)
    expr = tokenize_catenate_duckdb_sql("raw")
    raws = [g[0] for g in GOLDENS] + [g[0] for g in CAT_GOLDENS] + [None]
    for raw in raws:
        # the twin leaves stop/empty filtering downstream, same as the
        # oracle's stop_where — apply it here to compare full chains
        got = con.execute(
            f"SELECT list_filter({expr}, t -> t <> '' AND t NOT IN ({stop})) "
            "FROM (SELECT ? AS raw)", [raw]).fetchone()[0]
        assert got == tokenize_py_catenate(raw), raw
