"""Structured Streaming ingest: a stream of docs-shaped batches applied
to the physical index as idempotent per-repo upserts.

The reference's update surface is request-driven micro-batches — each
POST /fileindex/update/:store/:uuid deletes one bag's docs and reindexes
them (UpdateServlet.scala:59-63, EasySolr4filesIndexApp.scala:48-51).
The Spark-native equivalent of that arrival process is a file-source
stream + foreachBatch, where every micro-batch runs the SAME
delete-before-insert cycle via operators.maintenance.upsert_repos_physical:

  * exactly-once effect per batch: the upsert is idempotent per repo
    (delete-before-insert), so a replayed batch converges to the same
    index — the property the reference relies on for its retries.
  * checkpointing: the stream's progress log lives in ``checkpoint_dir``;
    the index's own lineage/tombstone sidecars track the data effects.
  * no custom stateful operator is needed — the index IS the state,
    maintained out-of-band, which matches the reference's semantics
    (no watermarks/windows exist there to preserve).

``trigger availableNow`` drains everything present and stops — the batch
-incremental hybrid this engine's ops model wants; pass
``continuous=True`` for a long-running micro-batch stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.docs_source import DOCS_SCHEMA


def stream_upsert(spark: SparkSession, source_dir: str, index_dir: str,
                  checkpoint_dir: str, continuous: bool = False,
                  schema: str = DOCS_SCHEMA, auto_compact: bool = True):
    """Start (and for availableNow: run to completion) a stream that
    upserts every arriving docs parquet batch into ``index_dir``.
    Returns the StreamingQuery. ``auto_compact=False`` disables the
    threshold-triggered compaction inside each batch's upsert (benchmarks
    time compaction separately; production streams keep the default)."""
    from ..operators.maintenance import upsert_repos_physical

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        upsert_repos_physical(batch.sparkSession, index_dir, batch,
                              auto_compact=auto_compact)

    stream = (spark.readStream.schema(schema).parquet(source_dir)
              .writeStream.foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint_dir))
    if continuous:
        return stream.start()
    q = stream.trigger(availableNow=True).start()
    q.awaitTermination()
    return q
