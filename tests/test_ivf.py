"""Materialized IVF index (functions/ivf.py): exactness at full probe,
recall sweep, and — the round-3 scale claim — the query's cells scan is
PARTITION-PRUNED (`PartitionFilters: centroid_id IN (...)`), so cells
touched = nprobe × queries, independent of corpus size."""

from __future__ import annotations

import contextlib
import io
import tempfile

import pytest
from pyspark.sql import functions as F

from easy_solr4files_index_spark.functions import ivf, similarity

SF = "/root/testdata/sf0.001"
QIDS = [0, 1, 2, 5]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def index(spark, emb):
    d = tempfile.mkdtemp(prefix="ivfidx_")
    return ivf.ivf_build(spark, emb, d, n_centroids=8)


@pytest.fixture(scope="module")
def index_kmeans(spark, emb):
    d = tempfile.mkdtemp(prefix="ivfkm_")
    return ivf.ivf_build(spark, emb, d, n_centroids=8, kmeans_iters=3)


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"], r["rank"]) for r in df.collect()}


def test_full_probe_equals_brute_force(emb, index):
    q = ivf.queries_from_emb(emb, QIDS)
    got = ivf.ivf_search(index, q, k=5, nprobe=8)
    brute = similarity.cosine_topk(emb, QIDS, k=5)
    assert _pairs(got) == _pairs(brute)


def test_full_probe_equals_brute_force_kmeans_cells(emb, index_kmeans):
    """Cell assignment (first-k seeds vs kmeans centroids) must never
    change the FULL-probe answer — exactness is probe-set-independent."""
    q = ivf.queries_from_emb(emb, QIDS)
    got = ivf.ivf_search(index_kmeans, q, k=5, nprobe=8)
    brute = similarity.cosine_topk(emb, QIDS, k=5)
    assert _pairs(got) == _pairs(brute)


def test_recall_sweep_monotone_to_one(emb, index):
    qids = [0, 1, 2, 5, 9]
    k = 5
    truth: dict[int, set] = {qq: set() for qq in qids}
    for r in similarity.cosine_topk(emb, qids, k=k).collect():
        truth[r["query_id"]].add(r["neighbor_id"])
    q = ivf.queries_from_emb(emb, qids)
    recalls = []
    for nprobe in (1, 2, 4, 8):
        got: dict[int, set] = {qq: set() for qq in qids}
        for r in ivf.ivf_search(index, q, k=k, nprobe=nprobe).collect():
            got[r["query_id"]].add(r["neighbor_id"])
        hit = sum(len(got[qq] & truth[qq]) for qq in qids)
        recalls.append(hit / sum(len(truth[qq]) for qq in qids))
    assert recalls[-1] == 1.0
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"


def test_cells_scan_is_partition_pruned(emb, index):
    """The materialized layout's whole point: at nprobe=1 the plan reads
    ~1/8 of the cell directories, shown as a static PartitionFilter."""
    q = ivf.queries_from_emb(emb, [0])
    result = ivf.ivf_search(index, q, k=5, nprobe=1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        result.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the cells scan must carry the centroid_id IN (...) partition filter
    pruned_scan = [ln for ln in plan.splitlines()
                   if "PartitionFilters" in ln and "centroid_id" in ln]
    assert pruned_scan, f"no centroid_id partition filter in plan:\n{plan}"


def test_probe_cells_count(emb, index):
    q = ivf.queries_from_emb(emb, QIDS)
    pairs = ivf.probe_cells(index, q, nprobe=2)
    assert len(pairs) == 2 * len(QIDS)
    per_q: dict[int, int] = {}
    for qq, _ in pairs:
        per_q[qq] = per_q.get(qq, 0) + 1
    assert all(v == 2 for v in per_q.values())


def test_open_roundtrip(spark, emb, index):
    reopened = ivf.ivf_open(spark, index.index_dir)
    assert reopened.n_centroids == 8
    q = ivf.queries_from_emb(emb, [0, 1])
    assert _pairs(ivf.ivf_search(reopened, q, k=3)) == \
        _pairs(ivf.ivf_search(index, q, k=3))
