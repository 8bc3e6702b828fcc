"""Incremental maintenance for the ANN family (functions/ivf.py,
functions/ivfpq.py) — the vector-side twin of the text index's O(bag)
story: append assigns against frozen centroids/codebooks and only
appends files; delete is a tombstone append visible to every reader;
compact rewrites ONLY touched cell partitions (untouched files
byte-identical)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from easy_solr4files_index_spark.functions import ivf as ivfm
from easy_solr4files_index_spark.functions import ivfpq as ipqm
from easy_solr4files_index_spark.functions.similarity import cosine_topk

SF_DIR = "/root/testdata/sf0.01"
QIDS = [0, 3, 9]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _res(df):
    return sorted((r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
                  for r in df.collect())


def _q(emb, ids):
    return ivfm.queries_from_emb(emb, ids)


def test_ivf_append_equals_rebuild_over_union(spark, emb, tmp_path):
    """build(old) + append(new) must search rank-identically to
    build(old ∪ new) at ANY nprobe: the append uses the build's own
    assignment rule against the same (frozen, id<k-seeded) centroids."""
    old = emb.filter(F.col("vec_id") < 300)
    new = emb.filter(F.col("vec_id") >= 300)
    d_inc = str(tmp_path / "ivf_inc")
    d_full = str(tmp_path / "ivf_full")
    inc = ivfm.ivf_build(spark, old, d_inc, n_centroids=8)
    ivfm.ivf_append(inc, new)
    full = ivfm.ivf_build(spark, emb, d_full, n_centroids=8)
    q = _q(emb, QIDS)
    for nprobe in (8, 3):
        assert _res(ivfm.ivf_search(inc, q, k=5, nprobe=nprobe)) == \
               _res(ivfm.ivf_search(full, q, k=5, nprobe=nprobe))
    # exact dial == brute force over the union
    assert _res(ivfm.ivf_search(inc, q, k=5, nprobe=8)) == \
           _res(cosine_topk(emb, QIDS, k=5))


def test_ivf_delete_and_compact(spark, emb, tmp_path):
    d = str(tmp_path / "ivf_del")
    idx = ivfm.ivf_build(spark, emb, d, n_centroids=8)
    q = _q(emb, QIDS)
    before = _res(ivfm.ivf_search(idx, q, k=5, nprobe=8))
    victims = sorted({n for _, n, _, _ in before})[:3]
    ivfm.ivf_delete(idx, victims)

    want = _res(cosine_topk(emb.filter(~F.col("vec_id").isin(victims)),
                            QIDS, k=5))
    got = _res(ivfm.ivf_search(idx, q, k=5, nprobe=8))
    assert got == want
    assert not any(n in victims for _, n, _, _ in got)

    # compact rewrites ONLY partitions holding a victim; untouched cell
    # files stay byte-identical (same inode/mtime)
    cells_dir = os.path.join(d, "cells")
    touched = {r["centroid_id"] for r in
               (spark.read.parquet(cells_dir)
                .filter(F.col("vec_id").isin(victims))
                .select("centroid_id").distinct().collect())}
    untouched_stats = {
        p: os.stat(os.path.join(cells_dir, p)).st_mtime_ns
        for p in os.listdir(cells_dir)
        if p.startswith("centroid_id=")
        and int(p.split("=")[1]) not in touched}
    assert untouched_stats  # the test corpus spans multiple cells
    ivfm.ivf_compact(idx)
    assert idx.tombstones() is None
    for p, mtime in untouched_stats.items():
        assert os.stat(os.path.join(cells_dir, p)).st_mtime_ns == mtime
    assert _res(ivfm.ivf_search(idx, q, k=5, nprobe=8)) == want
    # reopen sees the compacted state
    assert _res(ivfm.ivf_search(ivfm.ivf_open(spark, d), q, k=5,
                                nprobe=8)) == want


def test_ivfpq_append_delete_compact(spark, emb, tmp_path):
    """Composed-index maintenance: append encodes with frozen books and
    appends both datasets; delete hides the vector from the compressed
    scan too; compact folds both tables; exact dials stay rank-identical
    to brute force over the current live set throughout."""
    old = emb.filter(F.col("vec_id") < 300)
    new = emb.filter(F.col("vec_id") >= 300)
    d = str(tmp_path / "ivfpq_inc")
    idx = ipqm.ivfpq_build(spark, old, d, n_centroids=8, m=4, ksub=16)
    ipqm.ivfpq_append(idx, new)
    n = emb.count()
    q = _q(emb, QIDS)

    got = _res(ipqm.ivfpq_search(idx, emb, QIDS, k=5, nprobe=8, shortlist=n))
    assert got == _res(cosine_topk(emb, QIDS, k=5))

    victims = sorted({nb for _, nb, _, _ in got})[:2]
    ipqm.ivfpq_delete(idx, victims)
    live = emb.filter(~F.col("vec_id").isin(victims))
    want = _res(cosine_topk(live, QIDS, k=5))
    assert _res(ipqm.ivfpq_search(idx, emb, QIDS, k=5, nprobe=8,
                                  shortlist=n)) == want

    ipqm.ivfpq_compact(idx)
    assert idx.ivf.tombstones() is None
    assert _res(ipqm.ivfpq_search(idx, emb, QIDS, k=5, nprobe=8,
                                  shortlist=n)) == want
    # codes table lost the victims physically, not just logically
    codes_ids = {r["vec_id"] for r in
                 idx.cells_codes.select("vec_id").collect()}
    assert not (set(victims) & codes_ids)
    # the batch kernel sees the same maintained state
    qdf = ivfm.queries_from_emb(emb, QIDS)
    assert _res(ipqm.ivfpq_search_batch(idx, emb, qdf, k=5, nprobe=8,
                                        shortlist=n)) == want
