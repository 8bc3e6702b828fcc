"""Streaming corpus curation: the batch `curate` pipeline's gates run on
an unbounded docs stream.

Composition (order matters):

  1. quality / length / repetition / language gates — STATELESS map-only
     predicates (functions/curation.gate_predicate), identical semantics
     on a stream and on a bounded corpus; a row the batch pipeline would
     drop never even reaches the state store;
  2. first-seen-wins exact dedup — the STATEFUL gate
     (streaming/dedup_gate.py, applyInPandasWithState): the seen-set is
     one (hash, count) row per distinct content, hash-partitioned across
     executors, resumed from the checkpoint on restart.

Divergence from batch `curate`, documented: the batch winner per
duplicate group is the min-doc_id row over the WHOLE corpus; a stream
cannot see the whole corpus, so the winner is the first ARRIVAL
(deterministic lexicographic (repo, path) within a micro-batch). Same
keep-set cardinality, possibly different representatives — the standard
batch-vs-streaming dedup trade.

Benchmark decontamination is intentionally NOT streamed here: the bench
n-gram set is bounded, so screening is a stateless broadcast anti-join
the caller can append (`contamination`-hit doc keys are computable per
micro-batch with the same `contamination_pairs` logic via foreachBatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.curation import CurationConfig, gate_predicate
from ..sources.docs_source import DOCS_SCHEMA
from .dedup_gate import dedup_gate


def curate_gate(docs_stream: DataFrame,
                cfg: CurationConfig = CurationConfig(),
                text_col: str = "content") -> DataFrame:
    """Gated + deduped stream (appends ``content_md5`` when
    cfg.exact_dedup, matching dedup_gate's output schema)."""
    gated = docs_stream.filter(gate_predicate(cfg, text_col))
    if cfg.exact_dedup:
        return dedup_gate(gated, text_col=text_col)
    return gated


def stream_curate_gate(spark: SparkSession, source_dir: str, sink_dir: str,
                       checkpoint_dir: str,
                       cfg: CurationConfig = CurationConfig(),
                       schema: str = DOCS_SCHEMA,
                       text_col: str = "content"):
    """File-source → curation gates → dedup gate → parquet sink,
    availableNow (drain and stop). Re-running with the same checkpoint
    resumes the seen-set: duplicates of anything that PASSED the gates in
    any earlier run stay dropped; gate-rejected rows never occupy state
    (a low-quality early copy cannot shadow a later arrival)."""
    gated = curate_gate(
        spark.readStream.schema(schema).parquet(source_dir), cfg, text_col)
    q = (gated.writeStream.format("parquet")
         .option("path", sink_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q
