"""Query-surface semantics: typed parse errors (Q8 — the reference maps
Solr parse exceptions to HTTP 400, Solr.scala:116-125) and query-side
synonym expansion (X5 — identity when the synonym set is empty, like the
reference's empty synonyms.txt)."""

from __future__ import annotations

import pytest

from easy_solr4files_index_spark.operators.index_build import build_index
from easy_solr4files_index_spark.operators.query import (QueryParseError,
                                                         search)
from easy_solr4files_index_spark.sources.docs_source import synth_code_docs


@pytest.fixture(scope="module")
def idx(spark):
    i = build_index(spark, synth_code_docs(spark, n_docs=80, seed=3))
    yield i
    i.unpersist()


def test_undefined_filter_field_raises(idx):
    with pytest.raises(QueryParseError, match="undefined filter field"):
        search(idx, "parse", filters={"no_such_col": ["x"]}).collect()


def test_unknown_filter_op_raises(idx):
    with pytest.raises(QueryParseError, match="unknown filter op"):
        search(idx, "parse", filters=["xor", ["in", "lang", ["java"]]]).collect()


def test_invalid_limit_skip_default_like_reference(idx):
    """SearchServlet.scala:76-77: invalid limit/skip silently default to
    10/0 — NOT an error (only parse errors 400)."""
    rows = search(idx, "parse", k=-3, skip=-1).collect()
    assert 0 < len(rows) <= 10


def test_empty_synonyms_is_identity(idx):
    a = [(r["doc_id"], r["score"]) for r in search(idx, "parse merge").collect()]
    b = [(r["doc_id"], r["score"])
         for r in search(idx, "parse merge", synonyms={}).collect()]
    assert a == b


def test_synonyms_expand_the_disjunction(idx):
    """search('parse', {parse: [merge]}) == search('parse merge')."""
    a = [(r["doc_id"], r["score"])
         for r in search(idx, "parse", synonyms={"parse": ["merge"]}).collect()]
    b = [(r["doc_id"], r["score"]) for r in search(idx, "parse merge").collect()]
    assert a == b
