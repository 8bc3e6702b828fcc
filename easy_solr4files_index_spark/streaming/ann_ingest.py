"""Structured Streaming ingest for the ANN indexes: a stream of
embedding batches appended to a (IVF or IVFADC) index exactly once.

``foreachBatch`` is an at-least-once sink — after a crash between a
completed batch and its checkpoint commit, the SAME batch_id is
redelivered. The text-index stream (streaming/ingest.py) absorbs that
with an idempotent delete-before-insert upsert; a vector APPEND is not
naturally idempotent, so this sink gets transactional semantics the
way a table format does:

  * every committed batch records the parquet files it wrote in the
    index's ``manifest.json`` keyed by batch_id, swapped atomically
    (tmp + rename — the same commit discipline as the text index's
    globals.json, postings.py);
  * readers (IvfIndex.cells / IvfPqIndex.cells_codes) see ONLY
    manifested files, so the half-written files of a batch that crashed
    before its manifest swap are invisible — not double-counted, not
    half-counted; they are dead bytes until a compact re-snapshot;
  * a redelivered batch_id is already in the manifest ⇒ skipped.

The append itself is the frozen-centroid/frozen-codebook incremental
add (functions/ivf.py:ivf_append, functions/ivfpq.py:ivfpq_append):
O(|batch|), existing files never touched, rank-identical to a rebuild
over the union.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _init_manifest(index_dir: str) -> None:
    """First streaming commit against a batch-built index: snapshot the
    pre-existing files as the base entry so they stay visible."""
    from ..functions.ivf import _data_files

    path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(path):
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"entries": {"_base": _data_files(index_dir)}}, fh)
    os.replace(tmp, path)


def _apply_append_batch(batch: DataFrame, batch_id: int, index_dir: str,
                        pq: bool) -> None:
    """One transactional append: skip if committed, write data files,
    commit the new file set under the batch_id with an atomic swap."""
    from ..functions.ivf import _data_files, ivf_open
    from ..functions.ivfpq import ivfpq_append, ivfpq_open

    if batch.isEmpty():
        return
    _init_manifest(index_dir)
    path = os.path.join(index_dir, "manifest.json")
    with open(path) as fh:
        man = json.load(fh)
    key = f"batch_{batch_id}"
    if key in man["entries"]:
        return  # redelivered after a post-commit crash — exactly-once
    spark = batch.sparkSession
    before = set(_data_files(index_dir))
    if pq:
        ivfpq_append(ivfpq_open(spark, index_dir), batch)
    else:
        from ..functions.ivf import ivf_append
        ivf_append(ivf_open(spark, index_dir), batch)
    new_files = sorted(set(_data_files(index_dir)) - before)
    man["entries"][key] = new_files
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp, path)  # the commit point: files become visible


def stream_ann_append(spark: SparkSession, source_dir: str, index_dir: str,
                      checkpoint_dir: str, pq: bool = True,
                      continuous: bool = False, schema: str = EMB_SCHEMA):
    """Drain (availableNow) or run (continuous) a parquet file-stream of
    embedding batches into the ANN index at ``index_dir``. ``pq=True``
    appends to the composed IVFADC index (raw cells + codes), False to
    a plain IVF index. Returns the StreamingQuery."""
    stream = (spark.readStream.schema(schema).parquet(source_dir)
              .writeStream.foreachBatch(
                  lambda b, bid: _apply_append_batch(b, bid, index_dir, pq))
              .option("checkpointLocation", checkpoint_dir))
    if continuous:
        return stream.start()
    q = stream.trigger(availableNow=True).start()
    q.awaitTermination()
    return q
