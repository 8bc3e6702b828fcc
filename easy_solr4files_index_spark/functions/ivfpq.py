"""IVF+PQ: the composed production ANN index (FAISS-style IVFADC shape,
non-residual AND residual variants) — the two scale axes of this repo's
ANN family in one layout:

  * I/O axis (functions/ivf.py): the corpus is written ONCE partitioned
    by ``centroid_id``; a query reads only its nprobe probed cells via a
    static partition filter (`PartitionFilters: centroid_id IN (...)`).
  * memory axis (functions/pq.py): inside the cells the scan reads
    m-smallint PQ codes, not raw vectors — the scanned bytes per cell
    are ~m per vector; raw vectors are touched only for the final
    exact-cosine re-rank of the per-query shortlist (pushed-id fetch,
    shortlist × |queries| rows at any corpus size).

Semantics gates (same conventions as the components):
  * nprobe = n_centroids AND shortlist ≥ corpus ⇒ rank-identical to
    brute force (CORRECTNESS `ann_ivfpq_topk` hash-matches the DuckDB
    cosine oracle — the re-rank computes cos with the same Catalyst
    expression as similarity.cosine_topk);
  * smaller nprobe/shortlist/ksub trade recall for scan fraction —
    swept in tests/test_pq.py.

Per-query cell restriction is enforced INSIDE the ADC kernel (each
query only scores candidates from its own probed cells), matching true
IVFADC semantics rather than the union-of-probes shortcut; the kernel
emits per-partition top-shortlist only (combiner shape), so the global
window ranks ≤ shortlist × |queries| × n_partitions rows.

Algorithm is the standard IVFADC construction (Jégou et al., TPAMI 2011
— public literature). The reference repo has no ANN surface; this family
comes from the training-data-pipeline brief.

RESIDUAL encoding (``residual=True``, the FAISS-standard composition,
VERDICT r04 #1): the PQ codebooks quantize x_n − c_n (the normalized
vector minus its assigned normalized centroid) instead of x_n itself.
Residuals concentrate near the origin with far less variance than the
raw vectors, so the same m×ksub code budget spends its precision on the
informative part — default-dial recall roughly doubles at the same probe
cost (BENCH/PIPELINE.md). Query-side the ADC target becomes per-(query,
cell): d2 ≈ ‖(q_n − c_n) − r̂‖², so LUTs are built per probed cell
rather than once per query — still in-kernel and vectorized; a batch
partition holds one cell directory's rows, so the per-cell LUT work is
~one extra chunk×ksub×dim matmul per partition. Exactness dials
(nprobe = all, shortlist ≥ corpus) remain rank-identical to brute force
for BOTH variants because the re-rank is exact cosine regardless of code
quality (CORRECTNESS `ann_ivfpq_res`).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .ivf import IvfIndex, ivf_build, probe_cells, queries_from_emb
from .pq import pq_encode, pq_train
from .similarity import _as_double, _dot, _norm

_PQ_META = "pq_books.json"


def _residuals(cells: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, rv array<double>, centroid_id): rv = v/‖v‖ − c/‖c‖ — the
    residual the FAISS-standard IVFADC quantizes. Pure Catalyst
    (broadcast centroid join + zip_with), pipelined inside the cells
    scan; never re-normalized (see pq_train normalize=False)."""
    from .pq import _normalized

    return (cells.join(F.broadcast(centroids), "centroid_id")
            .select("vec_id",
                    F.zip_with(_normalized(F.col("v")),
                               _normalized(F.col("cv")),
                               lambda a, b: a - b).alias("rv"),
                    "centroid_id"))


def ivfpq_build(spark: SparkSession, emb: DataFrame, index_dir: str,
                n_centroids: int = 8, m: int = 4, ksub: int = 16,
                kmeans_iters: int = 0, train_iters: int = 3,
                vec_col: str = "embedding", id_col: str = "vec_id",
                residual: bool = False) -> "IvfPqIndex":
    """Build = the IVF cell layout (one assignment pass, partitioned
    write) + PQ codebooks + a codes table partitioned the same way.
    Three linear passes over the corpus, all build-time.

    ``residual=True`` trains/encodes over x_n − c_n (module docstring) —
    same layout, same scan shape, better codes."""
    ivf = ivf_build(spark, emb, index_dir, n_centroids=n_centroids,
                    kmeans_iters=kmeans_iters, vec_col=vec_col,
                    id_col=id_col)
    if residual:
        res = _residuals(ivf.cells, ivf.centroids)
        books = pq_train(res, m=m, ksub=ksub, train_iters=train_iters,
                         vec_col="rv", id_col="vec_id", normalize=False)
        codes = (pq_encode(res, books, vec_col="rv", id_col="vec_id",
                           normalize=False)
                 .join(res.select("vec_id", "centroid_id"), "vec_id"))
    else:
        books = pq_train(emb, m=m, ksub=ksub, train_iters=train_iters,
                         vec_col=vec_col, id_col=id_col)
        # codes ride the SAME centroid_id partitioning as the raw cells, so
        # the pruned query scan applies to the compressed table too
        codes = (pq_encode(emb, books, vec_col=vec_col, id_col=id_col)
                 .join(ivf.cells.select("vec_id", "centroid_id"), "vec_id"))
    (codes.repartition("centroid_id")
     .write.mode("overwrite").partitionBy("centroid_id")
     .parquet(os.path.join(index_dir, "cells_codes")))
    tmp = os.path.join(index_dir, _PQ_META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"m": m, "ksub": ksub, "books": books,
                   "residual": bool(residual)}, fh)
    os.replace(tmp, os.path.join(index_dir, _PQ_META))
    return IvfPqIndex(ivf, books, residual=residual)


class IvfPqIndex:
    def __init__(self, ivf: IvfIndex, books: list[list[list[float]]],
                 residual: bool = False):
        self.ivf = ivf
        self.books = books
        self.residual = residual

    @property
    def cells_codes(self) -> DataFrame:
        """(vec_id, codes, centroid_id) partitioned by centroid_id,
        manifest-gated and minus pending tombstones (both shared with
        the IVF layer — one delete/commit covers raw AND compressed
        scans)."""
        return self.ivf._minus_tombstones(self.ivf._visible(
            self.ivf.spark.read.parquet(
                os.path.join(self.ivf.index_dir, "cells_codes"))))


def ivfpq_append(index: IvfPqIndex, new_emb: DataFrame,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> IvfPqIndex:
    """Incremental add for the composed index: the new vectors are
    assigned against the FROZEN centroids (ivf_append — raw cells) and
    encoded with the FROZEN codebooks (the standard IVFADC maintenance
    model: codebooks/centroids move only on retrain), their m-smallint
    codes appended to the same cell partitions. O(|new|); existing
    files untouched. Exactness dials (nprobe=all, shortlist ≥ corpus)
    remain rank-identical to brute force over the grown corpus — the
    re-rank is exact regardless of code quality — and lossy-dial recall
    for OLD vectors is unchanged (their cells and codes are the same
    bytes)."""
    from .ivf import _assign_to_centroids

    assign = _assign_to_centroids(new_emb, index.ivf.centroids,
                                  vec_col=vec_col, id_col=id_col)
    (assign.repartition("centroid_id")
     .write.mode("append").partitionBy("centroid_id")
     .parquet(os.path.join(index.ivf.index_dir, "cells")))
    if index.residual:
        res = _residuals(assign, index.ivf.centroids)
        codes = (pq_encode(res, index.books, vec_col="rv", id_col="vec_id",
                           normalize=False)
                 .join(res.select("vec_id", "centroid_id"), "vec_id"))
    else:
        codes = (pq_encode(new_emb, index.books, vec_col=vec_col,
                           id_col=id_col)
                 .join(assign.select("vec_id", "centroid_id"), "vec_id"))
    (codes.repartition("centroid_id")
     .write.mode("append").partitionBy("centroid_id")
     .parquet(os.path.join(index.ivf.index_dir, "cells_codes")))
    return index


def ivfpq_delete(index: IvfPqIndex, vec_ids: list[int]) -> IvfPqIndex:
    """Shared tombstone set with the IVF layer (one delete covers the
    raw cells AND the codes table)."""
    from .ivf import ivf_delete

    ivf_delete(index.ivf, vec_ids)
    return index


def ivfpq_compact(index: IvfPqIndex) -> IvfPqIndex:
    """Fold tombstones into BOTH partitioned datasets in one
    touched-cells pass (ivf_compact with the codes table riding
    along)."""
    from .ivf import ivf_compact

    ivf_compact(index.ivf, codes_dataset="cells_codes")
    return index


def ivfpq_open(spark: SparkSession, index_dir: str) -> IvfPqIndex:
    from .ivf import ivf_open
    with open(os.path.join(index_dir, _PQ_META)) as fh:
        meta = json.load(fh)
    return IvfPqIndex(ivf_open(spark, index_dir), meta["books"],
                      residual=bool(meta.get("residual", False)))


def ivfpq_search(index: IvfPqIndex, emb: DataFrame,
                 query_ids: list[int], k: int = 5,
                 nprobe: int | None = None, shortlist: int | None = None,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """(query_id, neighbor_id, cos, rank): probe cells → pruned ADC scan
    of the codes table (per-query cell restriction in-kernel) → exact
    cosine re-rank of the shortlist against raw vectors fetched by id."""
    ivf = index.ivf
    nprobe = ivf.n_centroids if nprobe is None else min(nprobe, ivf.n_centroids)
    shortlist = 4 * k if shortlist is None else shortlist

    q = queries_from_emb(emb, query_ids, vec_col=vec_col, id_col=id_col)
    pairs = probe_cells(ivf, q, nprobe)
    cells = sorted({c for _, c in pairs})
    allowed: dict[int, set[int]] = {}
    for qid, c in pairs:
        allowed.setdefault(qid, set()).add(c)

    books = [np.asarray(b, dtype=np.float64) for b in index.books]
    m = len(books)
    dsub = books[0].shape[1]
    qrows = (emb.filter(F.col(id_col).isin(query_ids))
             .select(F.col(id_col).alias("q"), F.col(vec_col).alias("v"))
             .collect())
    qvecs: dict[int, np.ndarray] = {}
    for r in qrows:
        v = np.asarray(list(r["v"]), dtype=np.float64)
        n = np.linalg.norm(v)
        qvecs[int(r["q"])] = v / n if n > 0 else v
    qcells = {qid: np.array(sorted(cs), dtype=np.int64)
              for qid, cs in allowed.items()}

    def _lut_of(target: np.ndarray) -> np.ndarray:
        """(m × ksub) sub-space squared distances of ``target`` to the
        codebooks — the ADC lookup table."""
        return np.stack([
            (((books[j] - target[j * dsub:(j + 1) * dsub][None, :]) ** 2)
             .sum(axis=1)) for j in range(m)])

    residual = index.residual  # plain bool for the task closure (the
    # index object holds the SparkSession — never ship it to workers)
    cnorm_map: dict[int, np.ndarray] = {}
    luts: dict[int, np.ndarray] = {}
    if residual:
        # residual ADC target is per-(query, cell): (q_n − c_n); the
        # normalized centroid map rides the task closure (k×dim floats)
        crows = ivf.centroids.select(
            "centroid_id", _as_double(F.col("cv")).alias("cv")).collect()
        for r in crows:
            cv = np.asarray(list(r["cv"]), dtype=np.float64)
            n = np.linalg.norm(cv)
            cnorm_map[int(r["centroid_id"])] = cv / n if n > 0 else cv
    else:
        luts = {qid: _lut_of(qv) for qid, qv in qvecs.items()}

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            if not len(pdf):
                continue
            codes_np = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            ids = pdf["vec_id"].to_numpy()
            cids = pdf["centroid_id"].to_numpy()
            out = {"query_id": [], "neighbor_id": [], "d2": []}
            for qid, qv in qvecs.items():
                if residual:
                    # one LUT per (query, probed cell present here) — a
                    # partition is one cell directory, so usually one
                    d2 = np.full(ids.shape[0], np.inf)
                    for c in np.unique(cids):
                        if int(c) not in qcells.get(qid, ()):
                            continue
                        rows = cids == c
                        lut = _lut_of(qv - cnorm_map[int(c)])
                        d2[rows] = lut[np.arange(m)[None, :],
                                       codes_np[rows]].sum(axis=1)
                    d2[ids == qid] = np.inf
                    keep = np.isfinite(d2)
                else:
                    keep = np.isin(cids, qcells.get(qid, ())) & (ids != qid)
                    d2 = np.full(ids.shape[0], np.inf)
                    if keep.any():
                        d2[keep] = luts[qid][np.arange(m)[None, :],
                                             codes_np[keep]].sum(axis=1)
                if not keep.any():
                    continue
                dk, idk = d2[keep], ids[keep]
                top = np.lexsort((idk, dk))[:shortlist]
                out["query_id"] += [qid] * len(top)
                out["neighbor_id"] += list(idk[top])
                out["d2"] += list(dk[top])
            if out["query_id"]:
                yield pd.DataFrame(out)

    pruned = (index.cells_codes.filter(F.col("centroid_id").isin(cells))
              .select("vec_id", "codes", "centroid_id"))
    cand = pruned.mapInPandas(
        kernel, "query_id long, neighbor_id long, d2 double")
    qdf = (emb.filter(F.col(id_col).isin(query_ids))
           .select(F.col(id_col).alias("query_id"),
                   _as_double(F.col(vec_col)).alias("qv")))
    return _shortlist_rerank(cand, qdf, emb, k, shortlist, vec_col, id_col)


def _shortlist_rerank(cand: DataFrame, qdf: DataFrame, emb: DataFrame,
                      k: int, shortlist: int, vec_col: str,
                      id_col: str) -> DataFrame:
    """Shared IVFADC tail (per-query and batch kernels): global
    (d2, neighbor_id) shortlist window over the per-partition ADC
    candidates → exact-cosine re-rank of the shortlist against raw
    vectors → deterministic (cos desc, neighbor_id asc) rank ≤ k.
    One home so the tie-break/rounding/schema can never diverge
    between the two kernels (their row-parity is pytest-gated)."""
    wq = Window.partitionBy("query_id").orderBy(F.col("d2").asc(),
                                                F.col("neighbor_id").asc())
    short = (cand.withColumn("rn", F.row_number().over(wq))
             .filter(F.col("rn") <= shortlist)
             .select("query_id", "neighbor_id"))
    raw = emb.select(F.col(id_col).alias("neighbor_id"),
                     _as_double(F.col(vec_col)).alias("v"))
    rerank = (short.join(raw, "neighbor_id")
              .join(F.broadcast(qdf), "query_id")
              .withColumn("cos", F.round(
                  _dot(F.col("qv"), F.col("v"))
                  / (_norm(F.col("qv")) * _norm(F.col("v"))), 6)))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                               F.col("neighbor_id").asc())
    return (rerank.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos", "rank"))


def ivfpq_search_batch(index: IvfPqIndex, emb: DataFrame,
                       queries_df: DataFrame, k: int = 5,
                       nprobe: int | None = None,
                       shortlist: int | None = None,
                       query_chunk: int = 512,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> DataFrame:
    """Batch-scale IVFADC: ``ivfpq_search`` with the query side a
    DataFrame end-to-end — the 10⁵-query corpus-vs-corpus shape
    (VERDICT r03 #4, closing the last per-query-driver-work ANN path).

    ``queries_df`` is (query_id long, qv array<numeric>). The query
    matrix ships as ONE Spark broadcast; the ADC LUTs are derived
    IN-KERNEL, vectorized over query chunks:

      * probe cells are computed ONCE, on the driver (a single
        vectorized matmul — no per-query Python loop): a STABLE argsort
        over centroid_id-ordered columns reproduces probe_cells' exact
        (cos desc, centroid_id asc) tie-break. The same (nq × nprobe)
        matrix feeds the plan-time `centroid_id IN (...)` partition
        filter AND, broadcast, the kernel's per-query cell masks — one
        computation, so the pruned scan and the in-kernel gate can never
        disagree (a recompute could diverge in the last ulp at a cos
        tie and silently drop a probed cell's candidates);
      * cell restriction: the chunk's allowed (chunk × n_centroids)
        boolean mask indexes the batch's centroid column — a candidate
        scores for a query only if its cell is probed BY THAT query
        (true IVFADC semantics, same as the per-query kernel); the
        nprobe = n_centroids exactness dial skips masking entirely;
      * ADC: LUTs once per task for all queries, d2 per chunk via the
        same sum-of-subspace-lookups as pq_search_batch, self matches
        masked, tie-INCLUSIVE per-partition cut at the shortlist-th
        smallest (the deterministic global window resolves ties).
    Exactness gate: nprobe = n_centroids AND shortlist ≥ corpus is
    rank-identical to brute-force cosine_topk (pytest + driver oracle
    via ann_batch_rerank's pattern); lossy dials match the per-query
    ivfpq_search row-for-row on tie-free data (tests/test_pq.py)."""
    ivf = index.ivf
    nprobe = ivf.n_centroids if nprobe is None else min(nprobe, ivf.n_centroids)
    shortlist = 4 * k if shortlist is None else shortlist

    books = [np.asarray(b, dtype=np.float64) for b in index.books]
    m = len(books)
    dsub = books[0].shape[1]

    crows = ivf.centroids.select("centroid_id",
                                 _as_double(F.col("cv")).alias("cv")).collect()
    crows.sort(key=lambda r: int(r["centroid_id"]))  # stable tie-break order
    cent_ids = np.array([int(r["centroid_id"]) for r in crows], dtype=np.int64)
    cmat = np.stack([np.asarray(list(r["cv"]), dtype=np.float64) for r in crows])
    cnorm = np.linalg.norm(cmat, axis=1, keepdims=True)
    cnorm[cnorm == 0] = 1.0
    cmat_n = cmat / cnorm

    qpdf = (queries_df.select("query_id", _as_double(F.col("qv")).alias("qv"))
            .toPandas())
    qids = qpdf["query_id"].to_numpy(np.int64)
    qmat = np.stack(qpdf["qv"].to_numpy()).astype(np.float64)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qmat = qmat / qn

    # ONE probe computation, on the driver (a single vectorized matmul —
    # no per-query Python), used for BOTH the plan-time partition-pruning
    # union AND (broadcast) the kernel's per-query cell masks. Computing
    # probes twice (driver for pruning, kernel for masking) could
    # disagree in the last ulp near cos ties — a kernel-probed cell
    # missing from the pruned scan would silently lose its candidates.
    # Columns are centroid_id-ascending, so the stable descending sort
    # breaks cos ties toward the lower centroid_id — probe_cells' order.
    # nprobe = n_centroids (the exactness dial) needs no masks at all.
    probe_cols = None
    if nprobe < cent_ids.shape[0]:
        cos_qc = qmat @ cmat_n.T
        probe_cols = np.argsort(-cos_qc, axis=1, kind="stable")[:, :nprobe]
        cells = sorted({int(cent_ids[c])
                        for c in np.unique(probe_cols.ravel())})
    else:
        cells = [int(c) for c in cent_ids]

    sc = queries_df.sparkSession.sparkContext
    bq = sc.broadcast((qids, qmat))
    bb = sc.broadcast(books)
    bc = sc.broadcast(cent_ids)
    bp = sc.broadcast(probe_cols)  # (nq × nprobe) column idx, or None
    bcm = sc.broadcast(cmat_n if index.residual else None)
    residual = index.residual

    def kernel(batches):
        import pandas as pd
        qids_, qmat_ = bq.value
        books_, cent_ids_, probe_ = bb.value, bc.value, bp.value
        cmatn_ = bcm.value
        nq = len(qids_)
        if not residual:
            luts = [(((qmat_[:, None, j * dsub:(j + 1) * dsub]
                       - books_[j][None, :, :]) ** 2).sum(axis=2))
                    for j in range(m)]
        # per-chunk probe masks (chunk × n_centroids) expanded from the
        # broadcast driver probe — the SAME probe the pruning used
        allowed_chunks = {}
        if probe_ is not None:
            for lo in range(0, nq, query_chunk):
                hi = min(lo + query_chunk, nq)
                al = np.zeros((hi - lo, cent_ids_.shape[0]), dtype=bool)
                np.put_along_axis(al, probe_[lo:hi], True, axis=1)
                allowed_chunks[lo] = al
        for pdf in batches:
            if not len(pdf):
                continue
            codes_np = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            ids = pdf["vec_id"].to_numpy()
            ccol = np.searchsorted(cent_ids_, pdf["centroid_id"].to_numpy())
            out_q, out_n, out_d = [], [], []
            for lo in range(0, nq, query_chunk):
                hi = min(lo + query_chunk, nq)
                if residual:
                    # per-cell ADC target (q − c): LUTs per (chunk, cell
                    # present in this batch) — a partition is one cell
                    # directory, so normally ONE extra matmul per chunk
                    d2 = np.full((hi - lo, ids.shape[0]), np.inf)
                    for col in np.unique(ccol):
                        rows = np.where(ccol == col)[0]
                        if probe_ is not None:
                            qmask = allowed_chunks[lo][:, col]
                            if not qmask.any():
                                continue
                        t = qmat_[lo:hi] - cmatn_[col][None, :]
                        dcell = (((t[:, None, 0:dsub]
                                   - books_[0][None, :, :]) ** 2)
                                 .sum(axis=2))[:, codes_np[rows, 0]]
                        for j in range(1, m):
                            dcell += (((t[:, None, j * dsub:(j + 1) * dsub]
                                        - books_[j][None, :, :]) ** 2)
                                      .sum(axis=2))[:, codes_np[rows, j]]
                        if probe_ is not None:
                            dcell[~qmask] = np.inf
                        d2[:, rows] = dcell
                else:
                    d2 = luts[0][lo:hi][:, codes_np[:, 0]].copy()
                    for j in range(1, m):
                        d2 += luts[j][lo:hi][:, codes_np[:, j]]
                    if probe_ is not None:  # per-query cell gate
                        d2[~allowed_chunks[lo][:, ccol]] = np.inf
                d2[qids_[lo:hi, None] == ids[None, :]] = np.inf
                n = ids.shape[0]
                if n > shortlist:
                    thresh = np.partition(
                        d2, shortlist - 1, axis=1)[:, shortlist - 1:shortlist]
                    keep = (d2 <= thresh) & np.isfinite(d2)
                else:
                    keep = np.isfinite(d2)
                qi, ci = np.nonzero(keep)
                out_q.append(qids_[lo + qi])
                out_n.append(ids[ci])
                out_d.append(d2[qi, ci])
            if out_q:
                yield pd.DataFrame({"query_id": np.concatenate(out_q),
                                    "neighbor_id": np.concatenate(out_n),
                                    "d2": np.concatenate(out_d)})

    pruned = (index.cells_codes.filter(F.col("centroid_id").isin(cells))
              .select("vec_id", "codes", "centroid_id"))
    cand = pruned.mapInPandas(
        kernel, "query_id long, neighbor_id long, d2 double")
    qdf = queries_df.select("query_id", _as_double(F.col("qv")).alias("qv"))
    return _shortlist_rerank(cand, qdf, emb, k, shortlist, vec_col, id_col)
