"""Product quantization (functions/pq.py): exactness gate vs the
brute-force cosine oracle, recall behavior of lossy settings, the ADC →
exact-re-rank refinement, and determinism under repartitioning."""

from __future__ import annotations

import pytest

from easy_solr4files_index_spark.functions import pq
from easy_solr4files_index_spark.functions.similarity import cosine_topk

SF_DIR = "/root/testdata/sf0.01"
QIDS = [0, 7, 23, 111, 250]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def brute(emb):
    rows = cosine_topk(emb, QIDS, k=5).collect()
    return {(r["query_id"], r["neighbor_id"], r["rank"]) for r in rows}


def _recall(rows, brute_set) -> float:
    pairs = {(q, n) for q, n, _ in brute_set}
    hits = sum((r["query_id"], r["neighbor_id"]) in pairs for r in rows)
    return hits / len(pairs)


def test_pq_exact_gate_rank_identical(emb, brute):
    """ksub >= n_vectors with train_iters=0 makes every sub-vector its
    own centroid: ADC distances are exact and top-k is rank-identical
    to brute force — the correctness gate for the whole ADC machinery
    (codebook layout, encode argmin, LUT sum, tie-breaks)."""
    n = emb.count()
    books = pq.pq_train(emb, m=4, ksub=n, train_iters=0)
    codes = pq.pq_encode(emb, books)
    res = pq.pq_search(codes, pq.queries_of(emb, QIDS), books, k=5)
    got = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in res.collect()}
    assert got == brute


def test_pq_lossy_recall_and_codebook_dial(emb, brute):
    """Production (lossy) settings: recall is imperfect but real, and
    grows with codebook size (the ksub dial) — measured 0.24@ksub=16 and
    0.36@ksub=64 on this corpus, asserted with margin."""
    recalls = {}
    for ksub in (4, 16, 64):
        books = pq.pq_train(emb, m=4, ksub=ksub, train_iters=3)
        codes = pq.pq_encode(emb, books)
        rows = pq.pq_search(codes, pq.queries_of(emb, QIDS), books,
                            k=5).collect()
        assert all(len(r.asDict()) == 4 for r in rows)
        recalls[ksub] = _recall(rows, brute)
    assert recalls[16] >= 0.15
    assert recalls[64] >= recalls[4]


def test_pq_rerank_refinement(emb, brute):
    """ADC shortlist → exact-cosine re-rank: recall rises with the
    shortlist (measured 0.36@20 → 0.88@100 here), and shortlist >= corpus
    is rank-identical to brute force (the re-rank is exact, so only
    shortlist misses can lose a true neighbor)."""
    books = pq.pq_train(emb, m=4, ksub=16, train_iters=3)
    codes = pq.pq_encode(emb, books)
    queries = pq.queries_of(emb, QIDS)
    r20 = pq.pq_search_rerank(codes, emb, queries, books, k=5,
                              shortlist=20).collect()
    r100 = pq.pq_search_rerank(codes, emb, queries, books, k=5,
                               shortlist=100).collect()
    assert _recall(r100, brute) >= max(_recall(r20, brute), 0.6)
    rall = pq.pq_search_rerank(codes, emb, queries, books, k=5,
                               shortlist=emb.count()).collect()
    assert {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in rall} == brute


def test_pq_encode_shape_and_partition_invariance(emb):
    """Codes are m smallints < ksub, and both encode and search are
    byte-identical under a different partitioning (the kernels are
    per-row pure + per-partition combiners with deterministic
    tie-breaks)."""
    m, ksub = 4, 16
    books = pq.pq_train(emb, m=m, ksub=ksub, train_iters=3)
    codes1 = {r["vec_id"]: list(r["codes"])
              for r in pq.pq_encode(emb, books).collect()}
    codes2 = {r["vec_id"]: list(r["codes"])
              for r in pq.pq_encode(emb.repartition(7), books).collect()}
    assert codes1 == codes2
    assert all(len(c) == m and max(c) < ksub and min(c) >= 0
               for c in codes1.values())

    queries = pq.queries_of(emb, QIDS)
    s1 = sorted(map(tuple, pq.pq_search(
        pq.pq_encode(emb, books), queries, books, k=5).collect()))
    s2 = sorted(map(tuple, pq.pq_search(
        pq.pq_encode(emb.repartition(7), books), queries, books,
        k=5).collect()))
    assert s1 == s2


def test_pq_batch_matches_per_query_kernel(emb):
    """The DataFrame-batch kernel (broadcast query table + in-kernel
    LUTs + tie-inclusive per-partition cut) returns exactly what the
    per-query driver-LUT kernel returns — same codebooks, same k."""
    books = pq.pq_train(emb, m=4, ksub=16, train_iters=3)
    codes = pq.pq_encode(emb, books)
    per_q = sorted(map(tuple, pq.pq_search(
        codes, pq.queries_of(emb, QIDS), books, k=5).collect()))
    batch = sorted(map(tuple, pq.pq_search_batch(
        codes, pq.queries_df_of(emb, QIDS), books, k=5).collect()))
    assert batch == per_q


def test_pq_batch_rerank_exact_gate_100_queries(spark, emb):
    """Batch re-rank at shortlist >= corpus == brute force over 100
    queries (the driver's ann_batch_rerank gate, asserted locally too);
    also partition-invariant."""
    qids = list(range(100))
    books = pq.pq_train(emb, m=4, ksub=16, train_iters=3)
    codes = pq.pq_encode(emb, books)
    qdf = pq.queries_df_of(emb, qids)
    got = sorted(map(tuple, pq.pq_search_rerank_batch(
        codes, emb, qdf, books, k=3, shortlist=emb.count()).collect()))
    exact = sorted(map(tuple, cosine_topk(emb, qids, k=3).collect()))
    assert got == exact
    got2 = sorted(map(tuple, pq.pq_search_rerank_batch(
        codes.repartition(7), emb, qdf, books, k=3,
        shortlist=emb.count()).collect()))
    assert got2 == got


def test_pq_train_ksub_guard(emb):
    """smallint code storage: ksub past the int16 range must refuse."""
    with pytest.raises(ValueError, match="smallint"):
        pq.pq_train(emb, m=4, ksub=40000, train_iters=0)


def test_ivfpq_exact_gate_and_reopen(spark, emb, brute, tmp_path):
    """IVF+PQ composition (functions/ivfpq.py): nprobe=all +
    shortlist >= corpus is rank-identical to brute force; the persisted
    layout (cells, codes, codebooks) reopens to identical results; the
    codes scan is centroid_id-partition-pruned."""
    from easy_solr4files_index_spark.functions import ivfpq

    d = str(tmp_path / "ivfpq")
    idx = ivfpq.ivfpq_build(spark, emb, d, n_centroids=8, m=4, ksub=16)
    n = emb.count()
    res = ivfpq.ivfpq_search(idx, emb, QIDS, k=5, nprobe=8, shortlist=n)
    got = {(r["query_id"], r["neighbor_id"], r["rank"])
           for r in res.collect()}
    assert got == brute

    idx2 = ivfpq.ivfpq_open(spark, d)
    res2 = ivfpq.ivfpq_search(idx2, emb, QIDS, k=5, nprobe=8, shortlist=n)
    assert {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in res2.collect()} == got

    import io
    import contextlib
    from pyspark.sql import functions as F
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        idx2.cells_codes.filter(F.col("centroid_id").isin([0, 3])).explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "centroid_id" in plan


def test_ivfpq_pruned_recall(spark, emb, brute, tmp_path):
    """Pruned probes keep useful recall (measured 0.68-0.80 at
    nprobe 2-8 / shortlist 50 on this corpus; recall is NOT monotone in
    nprobe under a lossy ADC shortlist — more candidates can crowd true
    neighbors out of the fixed-size shortlist — so the gate is a floor,
    not an ordering)."""
    from easy_solr4files_index_spark.functions import ivfpq

    d = str(tmp_path / "ivfpq")
    idx = ivfpq.ivfpq_build(spark, emb, d, n_centroids=8, m=4, ksub=16)
    rows = ivfpq.ivfpq_search(idx, emb, QIDS, k=5, nprobe=4,
                              shortlist=50).collect()
    assert _recall(rows, brute) >= 0.5


def test_ivfpq_batch_exact_gate_and_matches_per_query(spark, emb, brute,
                                                      tmp_path):
    """ivfpq_search_batch (the DataFrame-query IVFADC path): at
    nprobe=all + shortlist >= corpus it is rank-identical to brute
    force, and at lossy dials it matches the per-query kernel
    row-for-row (the in-kernel stable-argsort probe reproduces
    probe_cells' (cos desc, centroid_id asc) tie-break; random floats
    make residual cos ties vanishingly unlikely)."""
    from easy_solr4files_index_spark.functions import ivfpq
    from easy_solr4files_index_spark.functions.ivf import queries_from_emb

    d = str(tmp_path / "ivfpq_b")
    idx = ivfpq.ivfpq_build(spark, emb, d, n_centroids=8, m=4, ksub=16)
    qdf = queries_from_emb(emb, QIDS).selectExpr("query_id", "qv")
    n = emb.count()

    exact = ivfpq.ivfpq_search_batch(idx, emb, qdf, k=5, nprobe=8,
                                     shortlist=n)
    assert {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in exact.collect()} == brute

    lossy_b = ivfpq.ivfpq_search_batch(idx, emb, qdf, k=5, nprobe=4,
                                       shortlist=50)
    lossy_pq = ivfpq.ivfpq_search(idx, emb, QIDS, k=5, nprobe=4,
                                  shortlist=50)
    key = lambda r: (r["query_id"], r["rank"])
    got_b = sorted(((r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
                    for r in lossy_b.collect()))
    got_q = sorted(((r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
                    for r in lossy_pq.collect()))
    assert got_b == got_q


def test_ivfpq_residual_exact_gate_reopen_and_batch(spark, emb, brute,
                                                    tmp_path):
    """RESIDUAL IVFADC (residual=True — the FAISS-standard composition,
    Jégou 2011 §IV): codes quantize x_n − c_n, ADC targets are
    per-(query, cell) q_n − c_n. Exactness dials (nprobe=all,
    shortlist >= corpus) stay rank-identical to brute force (the re-rank
    is exact cosine regardless of code quality); the persisted residual
    flag round-trips through ivfpq_open; the batch kernel matches the
    per-query kernel row-for-row at lossy dials."""
    from easy_solr4files_index_spark.functions import ivfpq
    from easy_solr4files_index_spark.functions.ivf import queries_from_emb

    d = str(tmp_path / "ivfpq_res")
    idx = ivfpq.ivfpq_build(spark, emb, d, n_centroids=8, m=8, ksub=16,
                            residual=True)
    assert idx.residual
    n = emb.count()
    res = ivfpq.ivfpq_search(idx, emb, QIDS, k=5, nprobe=8, shortlist=n)
    assert {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in res.collect()} == brute

    idx2 = ivfpq.ivfpq_open(spark, d)
    assert idx2.residual

    qdf = queries_from_emb(emb, QIDS).selectExpr("query_id", "qv")
    exact_b = ivfpq.ivfpq_search_batch(idx2, emb, qdf, k=5, nprobe=8,
                                       shortlist=n)
    assert {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in exact_b.collect()} == brute

    lossy_q = sorted((r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
                     for r in ivfpq.ivfpq_search(
                         idx2, emb, QIDS, k=5, nprobe=3,
                         shortlist=40).collect())
    lossy_b = sorted((r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
                     for r in ivfpq.ivfpq_search_batch(
                         idx2, emb, qdf, k=5, nprobe=3,
                         shortlist=40).collect())
    assert lossy_q == lossy_b


def test_ivfpq_residual_beats_nonresidual_recall(spark, emb, brute,
                                                 tmp_path):
    """The point of residual encoding: at IDENTICAL dials (m, ksub,
    nprobe, shortlist) the residual codes rank closer to the true
    neighbors — recall@5 must be >= the non-residual index's (everything
    here is deterministic, so this is a fixed measured ordering, not a
    statistical assertion)."""
    from easy_solr4files_index_spark.functions import ivfpq

    d1 = str(tmp_path / "nonres")
    d2 = str(tmp_path / "res")
    plain = ivfpq.ivfpq_build(spark, emb, d1, n_centroids=8, m=4, ksub=16)
    resid = ivfpq.ivfpq_build(spark, emb, d2, n_centroids=8, m=4, ksub=16,
                              residual=True)
    r_plain = _recall(ivfpq.ivfpq_search(plain, emb, QIDS, k=5, nprobe=8,
                                         shortlist=25).collect(), brute)
    r_res = _recall(ivfpq.ivfpq_search(resid, emb, QIDS, k=5, nprobe=8,
                                       shortlist=25).collect(), brute)
    assert r_res >= r_plain


def test_ivfpq_residual_append(spark, emb, brute, tmp_path):
    """Residual append: new vectors are assigned against frozen
    centroids and their RESIDUALS encoded with the frozen codebooks —
    exact-dial search over the grown corpus equals brute force over the
    union (the same gate as the non-residual append)."""
    from pyspark.sql import functions as F

    from easy_solr4files_index_spark.functions import ivfpq

    d = str(tmp_path / "res_app")
    head = emb.filter(F.col("vec_id") < 300)
    tail = emb.filter(F.col("vec_id") >= 300)
    idx = ivfpq.ivfpq_build(spark, head, d, n_centroids=8, m=8, ksub=16,
                            residual=True)
    ivfpq.ivfpq_append(idx, tail)
    n = emb.count()
    res = ivfpq.ivfpq_search(idx, emb, QIDS, k=5, nprobe=8, shortlist=n)
    assert {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in res.collect()} == brute
