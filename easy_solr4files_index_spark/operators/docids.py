"""Deterministic dense docID assignment, scalable (no global sort).

The reference keys documents by the composite string ``bagId/filePath``
(Solr.scala:51); Lucene assigns its own internal dense docIDs. Our engine
needs *deterministic* dense ids keyed by (repo, path, commit) so that
BM25 tie-breaks (score desc, doc_id asc) are rank-identical across runs
AND across cluster sizes (north_rule).

``monotonically_increasing_id`` is partition-layout-dependent and a
``row_number() OVER (ORDER BY ...)`` collapses to a single partition —
both wrong at 10^12 rows. Instead, a two-pass prefix-sum scheme:

  1. range-partition by the key and sort within partitions (a total
     order split across P partitions — Spark's distributed sort, no
     single-task bottleneck);
  2. count rows per partition (tiny job), exclusive prefix-sum on the
     driver (P integers);
  3. doc_id = offset[partition] + (local row_number - 1).

The id equals the row's global rank in (repo, path, commit) order, so it
does NOT depend on where the range boundaries fell — RangePartitioner's
sampled boundaries may differ between runs/cluster sizes, but rank is
rank. Keys are unique, so no tie straddles a boundary ambiguously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

KEY = ["repo", "path", "commit"]


def assign_doc_ids(docs: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Returns docs + ``doc_id bigint`` = dense global rank by KEY."""
    if num_partitions is None:
        # 4x the core count: with exactly one task per core a single
        # straggler idles everything else for the whole stage; smaller
        # range partitions give the scheduler slack to rebalance (the
        # prefix-sum cost is P integers on the driver — negligible)
        num_partitions = max(4 * docs.sparkSession.sparkContext.defaultParallelism, 8)
    ranged = docs.repartitionByRange(num_partitions, *KEY).withColumn(
        "_pid", F.spark_partition_id()
    )
    # persist so the pid observed by the count job and the rank job agree
    ranged = ranged.persist()
    counts = {r["_pid"]: r["cnt"] for r in
              ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = docs.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        "_pid int, _offset long",
    )
    w = Window.partitionBy("_pid").orderBy(*KEY)
    out = (
        ranged.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid", "left")
        .withColumn("doc_id", (F.coalesce("_offset", F.lit(0)) + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn", "_offset")
    )
    # hand the persisted range-partitioned input to the caller for release
    # once downstream results are materialized (release_docid_cache) — the
    # cache exists so the count job and the rank job observe one layout;
    # recomputation after release is safe (same RDD lineage => same
    # RangePartitioner seed/boundaries) but uncached, so callers release
    # only after their own materialization point.
    out._docid_range_cache = ranged
    return out


def release_docid_cache(docs_with_ids: DataFrame) -> None:
    """Unpersist the internal cache assign_doc_ids left behind (call after
    the derived outputs are materialized; idempotent, best-effort)."""
    cached = getattr(docs_with_ids, "_docid_range_cache", None)
    if cached is not None:
        try:
            cached.unpersist()
        except Exception:
            pass
