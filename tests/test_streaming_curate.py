"""Streaming curation gate (streaming/curate_gate.py): stateless gates
compose BEFORE the stateful dedup gate — gate-rejected rows never claim
the seen-set, duplicates drop across micro-batches and checkpoint
resumes, and the gate semantics equal the batch gate_predicate."""

from __future__ import annotations

from pyspark.sql import functions as F

from easy_solr4files_index_spark.functions.curation import (CurationConfig,
                                                            gate_predicate)
from easy_solr4files_index_spark.sources.docs_source import synth_code_docs
from easy_solr4files_index_spark.streaming.curate_gate import stream_curate_gate

CFG = CurationConfig(min_tokens=5)


def _passed(spark, sink):
    try:
        return sorted((r["repo"], r["path"]) for r in
                      spark.read.parquet(sink).collect())
    except Exception:
        return []


def test_streaming_curate_gates_then_dedups(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    corpus = synth_code_docs(spark, n_docs=30, seed=11).persist()
    n_pass_gate = corpus.filter(gate_predicate(CFG, "content")).count()
    assert 0 < n_pass_gate  # the gate is live on this corpus

    # batch 1: corpus + a too-short doc + an in-batch duplicate
    shorty = spark.createDataFrame(
        [("r/short", "p/short.txt", "c" * 40, "en", "one two")],
        "repo string, path string, commit string, lang string, content string")
    dup = (corpus.orderBy("repo", "path").limit(1)
           .withColumn("repo", F.lit("zz/dup")))
    corpus.unionByName(shorty).unionByName(dup).write.mode("append").parquet(src)
    stream_curate_gate(spark, src, sink, ckpt, CFG)

    out1 = _passed(spark, sink)
    assert ("r/short", "p/short.txt") not in out1        # gate dropped
    assert all(repo != "zz/dup" for repo, _ in out1)     # dedup dropped
    n_distinct_passing = (corpus.filter(gate_predicate(CFG, "content"))
                          .select(F.md5("content")).distinct().count())
    assert len(out1) == n_distinct_passing

    # batch 2: a cross-batch duplicate (dropped via checkpointed state)
    # and the SAME short text under a new path (still gate-dropped —
    # rejected rows never seeded the seen-set, and stay rejected)
    dup2 = (corpus.orderBy("repo", "path").limit(1)
            .withColumn("repo", F.lit("aa/late-dup")))
    shorty2 = spark.createDataFrame(
        [("r/short2", "p/short2.txt", "d" * 40, "en", "one two")],
        "repo string, path string, commit string, lang string, content string")
    dup2.unionByName(shorty2).write.mode("append").parquet(src)
    stream_curate_gate(spark, src, sink, ckpt, CFG)

    out2 = _passed(spark, sink)
    assert out2 == out1  # nothing new passed
    corpus.unpersist()
