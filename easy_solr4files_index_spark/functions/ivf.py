"""Materialized IVF ANN index: the corpus written ONCE partitioned by
``centroid_id``, so a query scans only its probed cells.

Round-2 gap this closes: `similarity.ivf_topk` recomputed the full
corpus→centroid assignment crossJoin inside every query — correct, but
at 100 TB the assignment scan dominates and nprobe saves only the final
exact-cosine step. Here the assignment is a BUILD-time pass (exactly
like the text index pays tokenization once, operators/postings.py), and
the query side is a partition-pruned parquet scan:

    PartitionFilters: [centroid_id IN (probed cells)]

Cells touched per query = nprobe × |queries|, independent of corpus
size — the same pruning shape as the term-bucket lookup
(operators/postings.py:27-29, `tbucket IN (...)`).

Reference note: DANS-KNAW/easy-solr4files-index has no ANN surface;
this operator family comes from the training-data-pipeline brief. The
semantics gate is `similarity.cosine_topk` (nprobe = n_centroids is
EXACTLY brute force, hash-matched against the DuckDB oracle); smaller
nprobe trades recall for scan fraction (sweep: tests/test_similarity_
dedup.py).

Scale notes:
  * centroids are k×dim doubles — always driver/broadcast-safe (k ≤ a
    few thousand even at 100 TB; cell balance comes from kmeans_fit).
  * probe selection is one tiny crossJoin (|queries| × k) collected to
    the driver (≤ nprobe·|queries| ints) to make the partition filter a
    STATIC `isin` — visible to the planner without relying on dynamic
    partition pruning.
  * skewed cells (a hot centroid) are bounded by kmeans recentering;
    pathological skew would be handled the same way the text index
    handles hot terms — split the cell by a secondary hash — noted, not
    needed at current scales.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .similarity import _as_double, _dot, _norm, kmeans_fit

_META = "ivf_meta.json"


@dataclass(frozen=True)
class IvfIndex:
    spark: SparkSession
    index_dir: str
    n_centroids: int

    @property
    def centroids(self) -> DataFrame:
        """(centroid_id int, cv array<double>) — tiny, broadcast side."""
        return self.spark.read.parquet(os.path.join(self.index_dir, "centroids"))

    def manifest(self) -> dict | None:
        """Streaming-managed indexes gate FILE VISIBILITY on an
        atomically-swapped manifest (streaming/ann_ingest.py — the
        Iceberg/Delta snapshot idea, and the same commit discipline as
        the text index's globals.json): readers see only files some
        committed entry lists, so a crashed batch's orphan files are
        invisible until (never) committed. None = a plain batch-built
        index, no read overhead."""
        p = os.path.join(self.index_dir, "manifest.json")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def _visible(self, df: DataFrame) -> DataFrame:
        man = self.manifest()
        if man is None:
            return df
        allowed = sorted({f for files in man["entries"].values()
                          for f in files})
        basename = F.element_at(F.split(F.input_file_name(), "/"), -1)
        allow_df = self.spark.createDataFrame([(f,) for f in allowed],
                                              "fname string")
        return (df.withColumn("fname", basename)
                .join(F.broadcast(allow_df), "fname", "left_semi")
                .drop("fname"))

    def tombstones(self) -> DataFrame | None:
        """Deleted vec_ids (ivf_delete), or None if none pending."""
        p = os.path.join(self.index_dir, "tombstones")
        if not os.path.isdir(p):
            return None
        return self.spark.read.parquet(p)

    def _minus_tombstones(self, df: DataFrame) -> DataFrame:
        t = self.tombstones()
        if t is None:
            return df
        # broadcast anti-join: the tombstone set is delete-batch-sized
        # (compact folds it back to zero), never corpus-sized
        return df.join(F.broadcast(t.select("vec_id")), "vec_id", "left_anti")

    @property
    def cells(self) -> DataFrame:
        """(vec_id, v, centroid_id) partitioned by centroid_id on disk,
        manifest-gated (streaming indexes) and minus pending tombstones
        — every consumer (ivf_search, the IVFADC code join) sees
        deletes and committed appends immediately, never orphans."""
        return self._minus_tombstones(self._visible(
            self.spark.read.parquet(os.path.join(self.index_dir, "cells"))))


def ivf_build(spark: SparkSession, emb: DataFrame, index_dir: str,
              n_centroids: int = 8, kmeans_iters: int = 0,
              vec_col: str = "embedding", id_col: str = "vec_id") -> IvfIndex:
    """One assignment pass (broadcast crossJoin vs k centroids, rank-1
    window) writes the corpus partitioned by centroid_id.

    ``kmeans_iters = 0`` seeds centroids from the first k vectors
    (deterministic, matches `similarity.ivf_topk`'s default); > 0 runs
    `kmeans_fit` first for balanced cells (the production path).
    """
    if kmeans_iters > 0:
        cent = kmeans_fit(emb, k=n_centroids, iters=kmeans_iters,
                          vec_col=vec_col, id_col=id_col)
    else:
        cent = (emb.filter(F.col(id_col) < n_centroids)
                .select(F.col(id_col).cast("int").alias("centroid_id"),
                        _as_double(F.col(vec_col)).alias("cv")))
    cent.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, "centroids"))

    assign = _assign_to_centroids(
        emb, spark.read.parquet(os.path.join(index_dir, "centroids")),
        vec_col=vec_col, id_col=id_col)
    (assign.repartition("centroid_id")
     .write.mode("overwrite").partitionBy("centroid_id")
     .parquet(os.path.join(index_dir, "cells")))

    tmp = os.path.join(index_dir, _META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"n_centroids": int(n_centroids), "metric": "cosine",
                   "kmeans_iters": int(kmeans_iters)}, fh)
    os.replace(tmp, os.path.join(index_dir, _META))
    return IvfIndex(spark, index_dir, int(n_centroids))


def _assign_to_centroids(emb: DataFrame, centroids: DataFrame,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> DataFrame:
    """(vec_id, v, centroid_id): nearest-centroid assignment as ONE
    map-side-combinable max_by aggregate keyed (acos desc, centroid_id
    asc) — the k×|corpus| crossJoin rows collapse to one row per vector
    inside each map task, so the exchange carries |corpus| rows (the
    earlier Window.partitionBy(vec_id) row_number shuffled and SORTED
    all k×|corpus| rows for the same answer). Shared by the build pass
    and incremental append, so an appended vector lands in exactly the
    cell a rebuild would give it."""
    corpus = emb.select(F.col(id_col).alias("vec_id"),
                        _as_double(F.col(vec_col)).alias("v"))
    acos = _dot(F.col("cv"), F.col("v")) / (_norm(F.col("cv")) * _norm(F.col("v")))
    key = F.struct(F.col("acos").alias("a"),
                   (-F.col("centroid_id")).alias("c"))
    return (corpus.crossJoin(F.broadcast(centroids))
            .withColumn("acos", acos)
            .groupBy("vec_id")
            .agg(F.max_by(F.struct("centroid_id", "v"), key).alias("best"))
            .select("vec_id", F.col("best.v").alias("v"),
                    F.col("best.centroid_id").alias("centroid_id")))


def ivf_append(ivf: IvfIndex, new_emb: DataFrame,
               vec_col: str = "embedding", id_col: str = "vec_id") -> IvfIndex:
    """Incremental add: assign the new vectors against the FROZEN
    centroid set (the standard IVF maintenance model — centroids move
    only on an explicit retrain/rebuild) and APPEND them to their cell
    partitions. Cost is O(|new|): existing cell files are never read or
    rewritten — the ANN twin of the text index's O(bag) segment append
    (operators/maintenance.py). Because the assignment rule is the
    build's own (_assign_to_centroids), an appended index is
    file-layout-equivalent to rebuilding over the union with the same
    centroids: searches match rank-for-rank at ANY nprobe."""
    assign = _assign_to_centroids(new_emb, ivf.centroids,
                                  vec_col=vec_col, id_col=id_col)
    (assign.repartition("centroid_id")
     .write.mode("append").partitionBy("centroid_id")
     .parquet(os.path.join(ivf.index_dir, "cells")))
    return ivf


def ivf_delete(ivf: IvfIndex, vec_ids: list[int]) -> IvfIndex:
    """Incremental delete: append the ids to the tombstone set — O(|ids|),
    no cell file is touched. Every reader (cells property) anti-joins
    the tombstones, so deleted vectors stop matching immediately;
    ivf_compact folds them into the layout."""
    if not vec_ids:
        return ivf
    df = ivf.spark.createDataFrame([(int(v),) for v in sorted(set(vec_ids))],
                                   "vec_id long")
    df.coalesce(1).write.mode("append").parquet(
        os.path.join(ivf.index_dir, "tombstones"))
    return ivf


def ivf_compact(ivf: IvfIndex,
                codes_dataset: str | None = None) -> IvfIndex:
    """Fold tombstones into the layout: rewrite ONLY the cell partitions
    that contain a tombstoned vector (O(touched cells), untouched
    partition files are left byte-identical — asserted in tests), then
    drop the tombstone set. ``codes_dataset`` lets the IVFADC layer
    compact its codes table with the same touched-cell pass."""
    import shutil

    t = ivf.tombstones()
    if t is None:
        return ivf
    raw = ivf.spark.read.parquet(os.path.join(ivf.index_dir, "cells"))
    touched = sorted(r["centroid_id"] for r in
                     (raw.join(F.broadcast(t), "vec_id")
                      .select("centroid_id").distinct().collect()))
    datasets = ["cells"] + ([codes_dataset] if codes_dataset else [])
    for name in datasets:
        base = os.path.join(ivf.index_dir, name)
        df = ivf.spark.read.parquet(base)
        # localCheckpoint truncates lineage: the survivors no longer
        # reference the source files about to be replaced
        survivors = (df.filter(F.col("centroid_id").isin(touched))
                     .join(F.broadcast(t), "vec_id", "left_anti")
                     .localCheckpoint(eager=True))
        for c in touched:
            shutil.rmtree(os.path.join(base, f"centroid_id={c}"),
                          ignore_errors=True)
        # (on object storage this whole block is one dynamic partition
        # overwrite; the explicit dir swap also covers cells whose every
        # row was deleted, which dynamic overwrite would leave stale
        # because no replacement rows exist)
        (survivors.repartition("centroid_id")
         .write.mode("append").partitionBy("centroid_id")
         .parquet(base))
    shutil.rmtree(os.path.join(ivf.index_dir, "tombstones"),
                  ignore_errors=True)
    if ivf.manifest() is not None:
        # the rewritten partitions' files are new names — re-snapshot so
        # they are visible and the replaced files drop out
        refresh_manifest(ivf.index_dir)
    return ivf


def _data_files(index_dir: str) -> list[str]:
    """Basenames of every parquet data file under the index's
    partitioned datasets (parquet part names carry write-job UUIDs, so
    basenames are globally unique — format-independent of the
    filesystem's URI scheme)."""
    out = []
    for ds in ("cells", "cells_codes"):
        base = os.path.join(index_dir, ds)
        for root, _dirs, files in os.walk(base):
            out += [f for f in files if f.endswith(".parquet")]
    return sorted(out)


def refresh_manifest(index_dir: str) -> None:
    """Atomically re-snapshot the manifest to exactly the files on disk
    (compact, or a manual batch append onto a streaming-managed index)."""
    path = os.path.join(index_dir, "manifest.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"entries": {"_base": _data_files(index_dir)}}, fh)
    os.replace(tmp, path)


def ivf_open(spark: SparkSession, index_dir: str) -> IvfIndex:
    with open(os.path.join(index_dir, _META)) as fh:
        meta = json.load(fh)
    return IvfIndex(spark, index_dir, int(meta["n_centroids"]))


def probe_cells(ivf: IvfIndex, q: DataFrame, nprobe: int) -> list[tuple[int, int]]:
    """(query_id, centroid_id) pairs — each query's nprobe nearest cells.
    |queries| × k crossJoin, collected (≤ nprobe·|queries| ints)."""
    qcos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    w = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(),
                                               F.col("centroid_id").asc())
    rows = (q.crossJoin(F.broadcast(ivf.centroids))
            .withColumn("qcos", qcos)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= nprobe)
            .select("query_id", "centroid_id").collect())
    return [(int(r["query_id"]), int(r["centroid_id"])) for r in rows]


def ivf_search(ivf: IvfIndex, q: DataFrame, k: int = 5,
               nprobe: int | None = None) -> DataFrame:
    """(query_id, neighbor_id, cos, rank) over the MATERIALIZED layout.

    ``q`` is (query_id, qv array<double>) — tiny, broadcast everywhere.
    The cells scan carries a static `centroid_id IN (...)` predicate, so
    parquet partition pruning reads only the probed directories
    (PLANS.md `ann_ivf_materialized`); nprobe = n_centroids reads every
    cell and equals brute force exactly (the oracle gate).
    """
    nprobe = ivf.n_centroids if nprobe is None else min(nprobe, ivf.n_centroids)
    pairs = probe_cells(ivf, q, nprobe)
    cells = sorted({c for _, c in pairs})
    probes = ivf.spark.createDataFrame(pairs, "query_id long, centroid_id int")

    pruned = ivf.cells.filter(F.col("centroid_id").isin(cells))
    cand = (pruned
            .join(F.broadcast(probes), "centroid_id")
            .join(F.broadcast(q), "query_id")
            .filter(F.col("vec_id") != F.col("query_id")))
    cos = F.round(_dot(F.col("qv"), F.col("v"))
                  / (_norm(F.col("qv")) * _norm(F.col("v"))), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                               F.col("vec_id").asc())
    return (cand.withColumn("cos", cos)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "cos", "rank"))


def queries_from_emb(emb: DataFrame, query_ids: list[int],
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """(query_id, qv) for ivf_search, fetched with a pushed id filter."""
    return (emb.filter(F.col(id_col).isin(query_ids))
            .select(F.col(id_col).alias("query_id"),
                    _as_double(F.col(vec_col)).alias("qv")))
