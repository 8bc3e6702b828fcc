"""ANN query path (functions/similarity.ivf_topk) and composed dedup
(functions/dedup.dedup_apply, simhash_candidates): exactness at full
probe, the recall/nprobe trade-off, and candidate-count ≪ all-pairs —
the at-scale claims behind the operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from easy_solr4files_index_spark.functions import dedup, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"], r["rank"]) for r in df.collect()}


def test_ivf_full_probe_equals_brute_force(emb):
    qids = [0, 1, 2, 5]
    brute = similarity.cosine_topk(emb, qids, k=5)
    ivf = similarity.ivf_topk(emb, qids, k=5, n_centroids=8, nprobe=8)
    assert _pairs(ivf) == _pairs(brute)


def test_ivf_recall_sweep_monotone_to_one(emb):
    """recall@k vs brute force rises with nprobe and hits 1.0 at full
    probe — the exactness dial of the pruned path."""
    qids = [0, 1, 2, 5, 9]
    k = 5
    truth = {q: set() for q in qids}
    for r in similarity.cosine_topk(emb, qids, k=k).collect():
        truth[r["query_id"]].add(r["neighbor_id"])
    recalls = []
    for nprobe in (1, 2, 4, 8):
        got = {q: set() for q in qids}
        for r in similarity.ivf_topk(emb, qids, k=k, n_centroids=8,
                                     nprobe=nprobe).collect():
            got[r["query_id"]].add(r["neighbor_id"])
        hit = sum(len(got[q] & truth[q]) for q in qids)
        tot = sum(len(truth[q]) for q in qids)
        recalls.append(hit / tot)
    assert recalls[-1] == 1.0
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"


def test_ivf_scan_is_pruned(emb):
    """At nprobe=1 each query's candidate set is ONE cell, not the
    corpus — the scan-fraction claim, measured."""
    n = emb.count()
    cells = similarity.ivf_assign(emb, n_centroids=8).collect()
    largest = max(r["cnt"] for r in cells)
    one = similarity.ivf_topk(emb, [3], k=3, n_centroids=8, nprobe=1)
    assert one.count() <= 3
    assert largest < n  # cells genuinely partition the corpus


def test_dedup_apply_known_clusters(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),   # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog again and again ok"),  # near dup of 0/1
        (3, "completely different content about spark inverted index engines"),
        (4, "completely different content about spark inverted index engines"),  # exact dup of 3
        (5, "nothing like anything else entirely standalone text block here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    keep = {r["doc_id"]: r["keep_doc_id"]
            for r in dedup.dedup_apply(docs, threshold=0.5).collect()}
    assert keep[0] == 0 and keep[1] == 0 and keep[2] == 0
    assert keep[3] == 3 and keep[4] == 3
    assert keep[5] == 5
    survivors = {d for d, k in keep.items() if d == k}
    assert survivors == {0, 3, 5}


def test_lsh_candidates_far_fewer_than_all_pairs(docs):
    """The scale claim: LSH candidate pairs ≪ n(n-1)/2 — verification
    cost is O(candidates), so dedup_apply never degenerates to the
    quadratic brute force."""
    n = docs.count()
    all_pairs = n * (n - 1) // 2
    cands = dedup.minhash_band_candidates(docs).count()
    assert cands < all_pairs * 0.05, (cands, all_pairs)


def test_simhash_candidates_hamming_exact(docs):
    """Banding must find EVERY pair within the Hamming radius (pigeonhole
    guarantees it); cross-check against the O(n^2) truth on 100 docs."""
    got = {(r["a"], r["b"]): r["hamming"]
           for r in dedup.simhash_candidates(docs, max_hamming=3).collect()}
    sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash32(docs).collect()}
    ids = sorted(sig)
    truth = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sig[a] ^ sig[b]).count("1")
            if h <= 3:
                truth[(a, b)] = h
    assert got == truth
