"""Stateful streaming exact-dedup gate: first occurrence of each content
hash passes, every later duplicate is dropped — across micro-batches,
with the seen-set held in Spark's keyed state store.

Why a CUSTOM stateful operator (applyInPandasWithState) and not
dropDuplicates: the built-in streaming dropDuplicates keeps state per
full row and offers no per-key policy; this gate (a) keys on a DERIVED
content hash, (b) picks a deterministic winner WITHIN a batch
(lexicographic min (repo, path) — independent of partitioning), and
(c) exposes the duplicate count per key as queryable state. It is the
streaming twin of functions/dedup.exact_dup_groups: a batch corpus
dedups with one hash aggregate; an UNBOUNDED arrival stream cannot
re-aggregate history, so history lives in the state store.

Scale shape (100 TB ingest): state is one small row (hash, count) per
DISTINCT document content, hash-partitioned across executors by the
groupBy key — the same horizontal layout as any streaming aggregate;
no executor ever holds the full seen-set. State never expires by
default (a duplicate of a year-old doc is still a duplicate); pass a
processing-time TTL only when the dedup contract is windowed.

Reference note: DANS-KNAW/easy-solr4files-index re-indexes a bag's
files idempotently (UpdateServlet.scala:59-63) but has no cross-bag
content dedup; this operator comes from the training-data-pipeline
brief (streaming half of the exact-dedup family).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.docs_source import DOCS_SCHEMA

if TYPE_CHECKING:  # pragma: no cover - typing only
    import pandas as pd

# output = input docs shape + the dedup key (handy downstream: the batch
# exact_dup_groups oracle groups on the same md5)
GATE_OUTPUT_SCHEMA = DOCS_SCHEMA + ", content_md5 string"
# per-key state: how many rows with this hash have arrived so far
GATE_STATE_SCHEMA = "seen long"


def _gate_fn(key: tuple, pdfs: "Iterator[pd.DataFrame]", state) \
        -> "Iterator[pd.DataFrame]":
    import pandas as pd

    chunks = list(pdfs)
    if not chunks:  # timeout-only invocation (not used with NoTimeout)
        return
    batch = pd.concat(chunks, ignore_index=True)
    n = len(batch)
    already = int(state.get[0]) if state.exists else 0
    state.update((already + n,))
    if already == 0 and n:
        # deterministic winner within the batch: lexicographic min
        # (repo, path) — stable under any partitioning / arrival order
        yield (batch.sort_values(["repo", "path"], kind="mergesort")
               .head(1).reset_index(drop=True))
    else:
        yield batch.iloc[0:0]


def dedup_gate(docs_stream: DataFrame, text_col: str = "content") -> DataFrame:
    """Transform a streaming docs DataFrame into its first-seen-only
    stream. Appends ``content_md5`` (the state key) to the output."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = docs_stream.withColumn(
        "content_md5", F.md5(F.coalesce(F.col(text_col), F.lit(""))))
    return keyed.groupBy("content_md5").applyInPandasWithState(
        _gate_fn, GATE_OUTPUT_SCHEMA, GATE_STATE_SCHEMA,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout)


def stream_dedup_gate(spark: SparkSession, source_dir: str, sink_dir: str,
                      checkpoint_dir: str, schema: str = DOCS_SCHEMA,
                      text_col: str = "content"):
    """File-source → dedup gate → parquet sink, availableNow (drain and
    stop — the same batch-incremental trigger as streaming.ingest).
    Re-running with the same checkpoint resumes the seen-set: duplicates
    of anything passed in ANY earlier run stay dropped."""
    gated = dedup_gate(
        spark.readStream.schema(schema).parquet(source_dir), text_col)
    q = (gated.writeStream.format("parquet")
         .option("path", sink_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q
