"""Physical index: encode/write/load roundtrip, block-max WAND ==
logical exact == numpy oracle, metrics/lineage invariants, kill/resume
(SURVEY.md §5.2.3-5.2.4)."""

from __future__ import annotations

import numpy as np
import pytest

from easy_solr4files_index_spark.functions.codec import decode_postings
from easy_solr4files_index_spark.operators.index_build import IndexConfig, build_index
from easy_solr4files_index_spark.operators.postings import open_index, write_index
from easy_solr4files_index_spark.operators.query import search
from easy_solr4files_index_spark.operators.wand import search_blockmax
from easy_solr4files_index_spark.oracle.bm25_oracle import build_oracle, oracle_search
from easy_solr4files_index_spark.sources.docs_source import synth_code_docs

CFG = IndexConfig(bucket_span=64, term_buckets=8)  # small span => many blocks


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    docs = synth_code_docs(spark, n_docs=250, seed=23)
    index_dir = str(tmp_path_factory.mktemp("fts") / "index")
    report = write_index(spark, docs, index_dir, CFG, lineage_groups=4)
    pidx = open_index(spark, index_dir)
    lidx = build_index(spark, docs, CFG)
    oracle = build_oracle([r.asDict() for r in docs.collect()])
    yield pidx, lidx, oracle, report
    lidx.unpersist()


QUERIES = [
    ("parse", 10, 0, None),
    ("parse merge token", 10, 0, None),
    ("license", 20, 0, None),                 # hot term: many blocks, prune path
    ("buildIndex cache", 10, 0, None),
    ("query score", 10, 0, {"lang": ["java", "python"]}),
    ("merge", 5, 7, None),
    (None, 10, 2, {"lang": ["go"]}),
    ("the a an", 10, 0, None),
    ("zzz_nonexistent_term", 10, 0, None),
]


@pytest.mark.parametrize("text,k,skip,filters", QUERIES)
def test_wand_rank_identical(built, text, k, skip, filters):
    pidx, lidx, oracle, _ = built
    got = search_blockmax(pidx, text, k=k, skip=skip, filters=filters,
                          round_score=None).collect()
    exp = oracle_search(oracle, text, k=k, skip=skip, filters=filters)
    assert [g["doc_id"] for g in got] == [e["doc_id"] for e in exp], text
    assert [g["score"] for g in got] == pytest.approx([e["score"] for e in exp], rel=1e-9)


@pytest.mark.parametrize("text,k", [("parse merge token", 10), ("license", 25)])
def test_prune_equals_exhaustive(built, text, k):
    pidx, *_ = built
    a = search_blockmax(pidx, text, k=k, prune=True, round_score=None).collect()
    b = search_blockmax(pidx, text, k=k, prune=False, round_score=None).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [(r["doc_id"], r["score"]) for r in b]


@pytest.fixture(scope="module")
def built_many_buckets(spark, tmp_path_factory):
    """bucket_span=8 over 600 docs -> 75 buckets: with k<=5 the hot set
    P=32 < 75, so phase-B pruning GENUINELY engages (the n_buckets<=P
    fast path must not swallow these cases)."""
    cfg = IndexConfig(bucket_span=8, term_buckets=8)
    docs = synth_code_docs(spark, n_docs=600, seed=41)
    index_dir = str(tmp_path_factory.mktemp("ftsmb") / "index")
    write_index(spark, docs, index_dir, cfg, lineage_groups=1)
    pidx = open_index(spark, index_dir)
    assert pidx.n_buckets > 32  # guard: pruning must be reachable
    oracle = build_oracle([r.asDict() for r in docs.collect()])
    return pidx, oracle


@pytest.fixture
def force_prune(monkeypatch):
    """Pin the prune cutover factor to 1 so the two-phase pruned plan
    engages on these deliberately small fixtures (the default factor 4
    keeps small indexes on the cheaper one-job exhaustive plan)."""
    from easy_solr4files_index_spark.operators import wand
    monkeypatch.setattr(wand, "_PRUNE_MIN_BUCKET_FACTOR", 1)


@pytest.mark.parametrize("text,k,skip", [
    ("parse", 5, 0), ("license", 5, 0), ("parse merge token", 3, 0),
    ("buildIndex cache", 5, 2), ("license merge", 4, 0),
])
def test_real_pruning_rank_identical(built_many_buckets, force_prune, text, k, skip):
    pidx, oracle = built_many_buckets
    a = search_blockmax(pidx, text, k=k, skip=skip, prune=True,
                        round_score=None).collect()
    b = search_blockmax(pidx, text, k=k, skip=skip, prune=False,
                        round_score=None).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
        [(r["doc_id"], r["score"]) for r in b], text
    exp = oracle_search(oracle, text, k=k, skip=skip)
    assert [r["doc_id"] for r in a] == [e["doc_id"] for e in exp], text


def test_prune_tie_at_tau_keeps_lower_docid(spark, tmp_path, force_prune):
    """Regression for the ub >= tau fix: docs with IDENTICAL (tf, dl)
    tie exactly on score; a tied doc in a pruned bucket whose doc_id is
    lower than the k-th hot-phase doc must still win the tie-break."""
    from easy_solr4files_index_spark.sources.docs_source import DOCS_SCHEMA
    rows = []
    for i in range(200):
        # every 3rd doc is byte-identical content => exact score ties
        body = "alpha beta gamma" if i % 3 == 0 else f"filler{i} unique{i} text{i}"
        rows.append(("r0", f"p{i:04d}", f"c{i:04d}", "java", body))
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    cfg = IndexConfig(bucket_span=4, term_buckets=4, include_path_tokens=False)
    d = str(tmp_path / "ties")
    write_index(spark, docs, d, cfg, lineage_groups=1)
    pidx = open_index(spark, d)
    assert pidx.n_buckets > 32
    a = search_blockmax(pidx, "alpha", k=4, prune=True, round_score=None).collect()
    b = search_blockmax(pidx, "alpha", k=4, prune=False, round_score=None).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
        [(r["doc_id"], r["score"]) for r in b]
    # tie-break is doc_id asc among equal scores
    assert [r["doc_id"] for r in a] == sorted(r["doc_id"] for r in a)


def test_postings_invariants(built):
    """docID-sortedness inside blocks; df == Σ block n per term;
    sha256 invariant vs source (input_hint)."""
    pidx, lidx, oracle, _ = built
    rows = pidx.postings.collect()
    assert rows
    for r in rows[:200]:
        ids, tfs, dls = decode_postings(r["doc_ids"], r["tfs"], r["dls"], r["n"])
        assert np.all(np.diff(ids.astype(np.int64)) > 0), "doc_ids must be strictly sorted"
        assert tfs.min() >= 1
        span_lo = r["bucket"] * pidx.config.bucket_span
        assert span_lo <= ids.min() and ids.max() < span_lo + pidx.config.bucket_span
    # df consistency
    import pyspark.sql.functions as F
    per_term = pidx.postings.groupBy("term").agg(F.sum("n").alias("n")).collect()
    df_map = {r["term"]: r["df"] for r in pidx.termstats.collect()}
    for r in per_term:
        assert df_map[r["term"]] == r["n"], r["term"]
    # sha256 equality between physical store and logical store
    mismatch = (pidx.docs_store.select("doc_id", "sha256")
                .join(lidx.docs_store.select("doc_id", F.col("sha256").alias("s2")), "doc_id")
                .filter("sha256 <> s2").count())
    assert mismatch == 0


def test_metrics_and_lineage(built):
    pidx, lidx, _, report = built
    import pyspark.sql.functions as F
    m = pidx.metrics
    assert m.count() > 0
    total_postings = m.agg(F.sum("rows_indexed")).collect()[0][0]
    assert total_postings == lidx.tf.count()
    assert m.filter("skew_factor >= 1.0").count() == m.count()
    stages = {(r["stage"], r["partition_id"]) for r in pidx.lineage.collect()}
    assert ("docs_store", 0) in stages and ("termstats", 0) in stages
    assert {s for s, _ in stages} == {"docs_store", "termstats", "postings", "positions"}


def test_kill_resume_identical(spark, tmp_path):
    """kill after 2 postings groups; resume; final index equals an
    uninterrupted build (checkpoint-resume, north_rule)."""
    docs = synth_code_docs(spark, n_docs=120, seed=31)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    with pytest.raises(RuntimeError, match="injected failure"):
        write_index(spark, docs, d1, CFG, lineage_groups=4, fail_after_group=2)
    report = write_index(spark, docs, d1, CFG, lineage_groups=4)  # resume
    assert report.stages_skipped  # completed work was not redone
    assert any(s.startswith("postings") for s in report.stages_skipped)
    write_index(spark, docs, d2, CFG, lineage_groups=4)
    a, b = open_index(spark, d1), open_index(spark, d2)

    def canon(pidx):
        return sorted(
            (r["term"], r["bucket"], r["n"], bytes(r["doc_ids"]), bytes(r["tfs"]),
             bytes(r["dls"]), round(r["max_tfnorm"], 12))
            for r in pidx.postings.collect())

    assert canon(a) == canon(b)
    assert a.n_docs == b.n_docs and a.avgdl == b.avgdl
    got = search_blockmax(a, "parse merge", k=10, round_score=None).collect()
    exp = search_blockmax(b, "parse merge", k=10, round_score=None).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [(r["doc_id"], r["score"]) for r in exp]


def test_physical_matches_logical_on_testdata(spark, built):
    pidx, lidx, oracle, _ = built
    for text in ["parse", "license merge"]:
        a = search_blockmax(pidx, text, k=10, round_score=None).collect()
        b = search(lidx, text, k=10, round_score=None).collect()
        assert [(r["doc_id"],) for r in a] == [(r["doc_id"],) for r in b]
        assert [r["score"] for r in a] == pytest.approx([r["score"] for r in b], rel=1e-12)


@pytest.mark.parametrize("text,k,skip,filters", QUERIES)
def test_fetch_by_id_page_identical(built, monkeypatch, text, k, skip, filters):
    """Stored-field fetch strategies are interchangeable: forcing the
    large-store path (collect k winner ids, fetch via a doc_id IN (...)
    filter pushed to parquet row-group stats) returns byte-identical
    pages to the default broadcast-join path."""
    import easy_solr4files_index_spark.operators.wand as wand_mod

    pidx, *_ = built
    if text is None:
        pytest.skip("match-all path bypasses scoring/fetch")
    base = search_blockmax(pidx, text, k=k, skip=skip, filters=filters,
                           round_score=None).collect()
    monkeypatch.setattr(wand_mod, "_FETCH_BY_ID_BYTES", 0)
    forced = search_blockmax(pidx, text, k=k, skip=skip, filters=filters,
                             round_score=None).collect()
    assert [tuple(r) for r in forced] == [tuple(r) for r in base], text


@pytest.mark.parametrize("text,k,skip,filters", QUERIES)
def test_search_with_found_page_and_count(built, text, k, skip, filters):
    """Single-pass physical numFound: the page matches search_blockmax
    and found matches the oracle's full match count (with fq applied)."""
    from easy_solr4files_index_spark.operators.wand import search_with_found

    pidx, _, oracle, _ = built
    page, found = search_with_found(pidx, text, k=k, skip=skip,
                                    filters=filters, round_score=None)
    got = page.collect()
    exp_page = search_blockmax(pidx, text, k=k, skip=skip, filters=filters,
                               round_score=None).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
        [(r["doc_id"], r["score"]) for r in exp_page], text
    exp_all = oracle_search(oracle, text, k=10 ** 9, skip=0, filters=filters)
    assert found == len(exp_all), text


def test_search_envelope_physical_shape(built):
    import json

    from easy_solr4files_index_spark.operators.wand import (
        search_envelope_physical)

    pidx, *_ = built
    env = json.loads(search_envelope_physical(pidx, "parse merge", k=5))
    # reference summary shape: Solr.scala:91-103 / api.yml:172-256
    assert set(env["summary"]) == {"text", "skip", "limit", "time_allowed",
                                   "found", "returned"}
    assert env["summary"]["found"] >= env["summary"]["returned"] == \
        len(env["fileitems"]) == 5


def test_search_budgeted_partial_and_complete(built_many_buckets, force_prune):
    """T3 timeAllowed (SearchServlet.scala:97): a zero budget skips the
    completion pass and flags partial=True with the exact top-k over the
    hot subset; an ample budget returns the normal exact answer with
    partial=False."""
    from easy_solr4files_index_spark.operators.wand import search_budgeted

    pidx, oracle = built_many_buckets
    text, k = "license merge", 4

    full, partial = search_budgeted(pidx, text, k=k, time_allowed_ms=1e9,
                                    round_score=None)
    assert partial is False
    exp = oracle_search(oracle, text, k=k, skip=0)
    assert [r["doc_id"] for r in full.collect()] == [e["doc_id"] for e in exp]

    page, partial = search_budgeted(pidx, text, k=k, time_allowed_ms=0.0,
                                    round_score=None)
    rows = page.collect()
    assert partial is True
    assert 0 < len(rows) <= k
    # partial results are a SUBSET of real matches with exact scores
    truth = {e["doc_id"]: e["score"] for e in
             oracle_search(oracle, text, k=10 ** 9, skip=0)}
    for r in rows:
        assert r["doc_id"] in truth
        assert r["score"] == pytest.approx(truth[r["doc_id"]], rel=1e-9)


def test_search_budgeted_small_index_completes(built):
    """Below the hot-set size the plan is exhaustive in one pass — the
    budget can never split it, so partial is always False."""
    from easy_solr4files_index_spark.operators.wand import search_budgeted

    pidx, *_ = built
    page, partial = search_budgeted(pidx, "parse", k=5, time_allowed_ms=0.0,
                                    round_score=None)
    assert partial is False
    assert len(page.collect()) == 5


def test_degraded_docs_counted_and_metadata_only(spark, tmp_path):
    """E2 graceful degradation (reference Solr.scala:65-68,
    package.scala:110-118): a doc whose content contributes no text
    (null / whitespace-only — the post-extraction shape of a broken
    file) still indexes its metadata + path tokens AND is counted in
    the build's feedback summary (BuildReport.degraded_docs,
    globals.json, PhysicalIndex)."""
    from pyspark.sql import functions as F

    from easy_solr4files_index_spark.operators.maintenance import (
        upsert_repos_physical)

    docs = synth_code_docs(spark, n_docs=60, seed=5)
    broken = spark.createDataFrame(
        [("org0/broken", "bin/Corrupt0001.pdf", "c0", "text", None),
         ("org0/broken", "bin/Corrupt0002.pdf", "c1", "text", "   ")],
        "repo string, path string, commit string, lang string, content string")
    index_dir = str(tmp_path / "idx")
    report = write_index(spark, docs.unionByName(broken), index_dir,
                         CFG, lineage_groups=1)
    assert report.degraded_docs == 2

    pidx = open_index(spark, index_dir)
    assert pidx.degraded_docs == 2
    # metadata-only: reachable by match-all + metadata filter and by its
    # PATH tokens (copyField path -> text), invisible to content terms
    rows = search_blockmax(pidx, None, k=10,
                           filters={"repo": ["org0/broken"]}).collect()
    assert {r["path"] for r in rows} == {"bin/Corrupt0001.pdf",
                                         "bin/Corrupt0002.pdf"}
    hits = search_blockmax(pidx, "corrupt0001", k=5).collect()
    assert [r["path"] for r in hits] == ["bin/Corrupt0001.pdf"]
    # the flag is an ordinary filterable docs_store column
    assert pidx.docs_store.filter(F.col("meta_only")).count() == 2

    # an appended segment's degradation events ACCUMULATE (per-ingest
    # feedback, like the reference's summary — deletes don't decrement)
    more = spark.createDataFrame(
        [("org0/broken", "bin/Corrupt0003.pdf", "c2", "text", "")],
        "repo string, path string, commit string, lang string, content string")
    upsert_repos_physical(spark, index_dir, more, auto_compact=False)
    assert open_index(spark, index_dir).degraded_docs == 3
