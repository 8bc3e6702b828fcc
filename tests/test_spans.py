"""Substring-level span dedup (functions/spans.py): DuckDB parity,
planted cross-document boilerplate detection, strip semantics, and
partition invariance."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from easy_solr4files_index_spark.functions import spans

SF_DIR = "/root/testdata/sf0.01"

# ~18 analyzer tokens of lowercase boilerplate (license chrome — the
# classic cross-doc repeated span doc-level dedup cannot see)
BOILER = ("this material is provided as is without warranty of any kind "
          "express or implied including fitness and merchantability")
_PLANT_SQL = ("(SELECT * REPLACE (CASE WHEN doc_id % 7 = 0 "
              f"THEN coalesce(text, '') || ' {BOILER}' "
              "ELSE text END AS text) FROM documents)")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def planted(docs):
    return docs.withColumn(
        "text", F.when(F.col("doc_id") % 7 == 0,
                       F.concat_ws(" ", F.coalesce("text", F.lit("")),
                                   F.lit(BOILER)))
        .otherwise(F.col("text")))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    return con


def test_intervals_and_stats_match_duckdb(docs, duck):
    for w, cross in ((8, False), (15, False), (8, True)):
        got = sorted(map(tuple, spans.dup_span_intervals(
            docs, w=w, cross_doc=cross).collect()))
        exp = sorted(map(tuple, duck.execute(spans.dup_span_intervals_sql(
            w=w, cross_doc=cross)).fetchall()))
        assert got == exp and len(got) > 0
    got_s = sorted(map(tuple, spans.dup_span_stats(docs, w=15).collect()))
    exp_s = sorted(map(tuple,
                       duck.execute(spans.dup_span_stats_sql(w=15)).fetchall()))
    assert got_s == exp_s


def test_planted_boilerplate_found_and_parity(planted, duck):
    """Every doc_id % 7 == 0 doc shares the same ~18-token suffix: with
    w=15 each must carry a duplicated span, and the whole planted-corpus
    stats table must match the DuckDB twin over the same augmentation."""
    st = spans.dup_span_stats(planted, w=15).collect()
    flagged = {r["doc_id"] for r in st if r["n_spans"] > 0}
    expected_ids = {r["doc_id"] for r in st if r["doc_id"] % 7 == 0}
    assert expected_ids <= flagged
    got = sorted(map(tuple, st))
    exp = sorted(map(tuple, duck.execute(
        spans.dup_span_stats_sql(w=15, source=_PLANT_SQL)).fetchall()))
    assert got == exp


def test_strip_removes_boilerplate(planted, spark):
    """strip_dup_spans removes every duplicated-span occurrence: no
    cleaned text may contain the planted boilerplate, and docs with no
    spans keep their full token stream."""
    from easy_solr4files_index_spark.functions.tokenizer import tokenize_py

    clean = spans.strip_dup_spans(planted, w=15)
    joined = (planted.select("doc_id", "text")
              .join(clean, "doc_id").collect())
    boiler_join = " ".join(tokenize_py(BOILER, ()))
    stats = {r["doc_id"]: r for r in
             spans.dup_span_stats(planted, w=15).collect()}
    for r in joined:
        assert boiler_join not in r["clean_text"]
        if stats[r["doc_id"]]["n_spans"] == 0:
            assert r["clean_text"] == " ".join(
                tokenize_py(r["text"] or "", ()))
        else:
            kept = (stats[r["doc_id"]]["total_tokens"]
                    - stats[r["doc_id"]]["dup_tokens"])
            n_clean = len(r["clean_text"].split()) if r["clean_text"] else 0
            assert n_clean == kept


def test_partition_invariance(planted):
    a = sorted(map(tuple, spans.dup_span_intervals(planted, w=15).collect()))
    b = sorted(map(tuple, spans.dup_span_intervals(
        planted.repartition(17), w=15).collect()))
    assert a == b


def test_xx64_hasher_same_spans(planted):
    """The xxhash64 production hasher finds the IDENTICAL span set as
    the md5 oracle-parity hasher (hash choice is semantics-invariant
    modulo collisions, absent at this scale)."""
    a = sorted(map(tuple, spans.dup_span_intervals(
        planted, w=15, hasher="md5").collect()))
    b = sorted(map(tuple, spans.dup_span_intervals(
        planted, w=15, hasher="xx64").collect()))
    assert a == b


def test_span_structural_invariants(planted):
    """Structural invariants over every produced row: spans lie inside
    the document, are at least w tokens, pairwise disjoint and
    gap-separated (adjacent/overlapping grams were merged), and the
    per-doc stats exactly account for them."""
    w = 15
    iv = spans.dup_span_intervals(planted, w=w).collect()
    st = {r["doc_id"]: r for r in spans.dup_span_stats(planted, w=w).collect()}

    per_doc: dict = {}
    for r in iv:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_tokens"]))
    for did, ss in per_doc.items():
        total = st[did]["total_tokens"]
        ss.sort()
        prev_end = -1
        for s, e, n in ss:
            assert 0 <= s < e <= total
            assert n == e - s >= w
            assert s > prev_end  # merged: no overlap, no adjacency
            prev_end = e
        assert st[did]["n_spans"] == len(ss)
        assert st[did]["dup_tokens"] == sum(n for _, _, n in ss)
        assert st[did]["dup_tokens"] <= total
    for did, r in st.items():
        if did not in per_doc:
            assert r["n_spans"] == 0 and r["dup_tokens"] == 0
