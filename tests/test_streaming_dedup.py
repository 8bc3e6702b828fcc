"""Stateful streaming exact-dedup gate (streaming/dedup_gate.py):
first-seen-wins across micro-batches via applyInPandasWithState."""

from __future__ import annotations

from pyspark.sql import functions as F

from easy_solr4files_index_spark.sources.docs_source import synth_code_docs
from easy_solr4files_index_spark.streaming.dedup_gate import stream_dedup_gate


def _passed(spark, sink):
    try:
        return sorted(
            (r["repo"], r["path"], r["content_md5"])
            for r in spark.read.parquet(sink).collect())
    except Exception:  # sink not created yet (no rows passed)
        return []


def test_dedup_gate_first_seen_wins_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    corpus = synth_code_docs(spark, n_docs=40, seed=7).persist()

    # batch 1: originals + in-batch duplicates of 5 docs under other paths
    dups1 = (corpus.orderBy("repo", "path").limit(5)
             .withColumn("repo", F.lit("zz/dup-in-batch"))
             .withColumn("path", F.concat(F.lit("dup/"), F.col("path"))))
    corpus.unionByName(dups1).write.mode("append").parquet(src)
    stream_dedup_gate(spark, src, sink, ckpt)

    out1 = _passed(spark, sink)
    n_distinct = corpus.select(
        F.md5(F.coalesce("content", F.lit("")))).distinct().count()
    assert len(out1) == n_distinct
    # winners are the lexicographic min (repo, path) per hash — the
    # originals sort before the "zz/dup-in-batch" copies
    assert all(repo != "zz/dup-in-batch" for repo, _, _ in out1)

    # batch 2: cross-batch duplicates of 3 docs + 2 genuinely new docs;
    # a NEW query resumes the seen-set from the checkpointed state store
    dups2 = (corpus.orderBy("repo", "path").limit(3)
             .withColumn("repo", F.lit("aa/dup-late")))
    new = (synth_code_docs(spark, n_docs=44, seed=7)
           .orderBy("repo", "path", "commit").offset(40).limit(2)
           .withColumn("content", F.concat("content", F.lit(" fresh r4 "),
                                           F.col("path"))))
    dups2.unionByName(new).write.mode("append").parquet(src)
    stream_dedup_gate(spark, src, sink, ckpt)

    out2 = _passed(spark, sink)
    assert len(out2) == n_distinct + 2
    assert all(repo != "aa/dup-late" for repo, _, _ in out2)
    passed_hashes = [h for _, _, h in out2]
    assert len(set(passed_hashes)) == len(passed_hashes)  # one per hash
    corpus.unpersist()


def test_dedup_gate_batch_equivalence(spark, tmp_path):
    """The stream's pass-set equals the batch exact_dup_groups keepers
    when everything arrives in one batch (same md5 key)."""
    from easy_solr4files_index_spark.functions.dedup import exact_dup_groups

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    corpus = synth_code_docs(spark, n_docs=60, seed=13)
    salted = corpus.unionByName(
        corpus.orderBy("repo", "path").limit(10)
        .withColumn("repo", F.concat(F.lit("zz-"), F.col("repo"))))
    salted.write.mode("append").parquet(src)
    stream_dedup_gate(spark, src, sink, ckpt)

    stream_hashes = {h for _, _, h in _passed(spark, sink)}
    batch_groups = exact_dup_groups(
        salted.withColumnRenamed("content", "text")
        .withColumn("doc_id", F.xxhash64("repo", "path")))
    batch_hashes = {r["content_md5"] for r in
                    batch_groups.select("content_md5").collect()}
    assert stream_hashes == batch_hashes
