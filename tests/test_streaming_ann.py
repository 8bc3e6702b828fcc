"""Transactional streaming ANN ingest (streaming/ann_ingest.py):
streamed appends equal a rebuild over the union; redelivered batch_ids
are skipped; orphan files from a crashed (uncommitted) append are
invisible to every reader until compact re-snapshots."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from easy_solr4files_index_spark.functions import ivf as ivfm
from easy_solr4files_index_spark.functions import ivfpq as ipqm
from easy_solr4files_index_spark.functions.similarity import cosine_topk
from easy_solr4files_index_spark.streaming.ann_ingest import (
    _apply_append_batch, stream_ann_append)

SF_DIR = "/root/testdata/sf0.01"
QIDS = [0, 3, 9]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _res(df):
    return sorted((r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
                  for r in df.collect())


def test_streamed_appends_equal_union_and_replay_is_noop(spark, emb,
                                                         tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    d = str(tmp_path / "ivfpq")
    idx = ipqm.ivfpq_build(spark, emb.filter(F.col("vec_id") < 250), d,
                           n_centroids=8, m=4, ksub=16)

    # two source batches (separate files; one availableNow drain applies
    # them through the transactional sink)
    emb.filter((F.col("vec_id") >= 250) & (F.col("vec_id") < 350)) \
       .write.mode("append").parquet(src)
    emb.filter(F.col("vec_id") >= 350).write.mode("append").parquet(src)
    stream_ann_append(spark, src, d, ckpt, pq=True)

    n = emb.count()
    q = ivfm.queries_from_emb(emb, QIDS)
    want = _res(cosine_topk(emb, QIDS, k=5))
    assert _res(ipqm.ivfpq_search(ipqm.ivfpq_open(spark, d), emb, QIDS,
                                  k=5, nprobe=8, shortlist=n)) == want

    # at-least-once redelivery: re-apply the batch_ids the stream
    # actually committed — the manifest skips them, results unchanged
    import json, os
    with open(os.path.join(d, "manifest.json")) as fh:
        committed = [int(k.split("_")[1])
                     for k in json.load(fh)["entries"] if k != "_base"]
    assert committed  # the drain committed at least one batch
    replay = emb.filter(F.col("vec_id") >= 350)
    for bid in committed:
        _apply_append_batch(replay, bid, d, pq=True)
    assert _res(ipqm.ivfpq_search(ipqm.ivfpq_open(spark, d), emb, QIDS,
                                  k=5, nprobe=8, shortlist=n)) == want


def test_orphan_files_invisible_until_compact_resnapshot(spark, emb,
                                                         tmp_path):
    """A crash between data write and manifest swap leaves orphan
    parquet files — readers must not see them (no double counting, no
    phantom vectors)."""
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    d = str(tmp_path / "ivfpq2")
    base = emb.filter(F.col("vec_id") < 300)
    idx = ipqm.ivfpq_build(spark, base, d, n_centroids=8, m=4, ksub=16)
    emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400)) \
       .write.mode("append").parquet(src)
    stream_ann_append(spark, src, d, ckpt, pq=True)

    live = emb.filter(F.col("vec_id") < 400)
    n = emb.count()
    want = _res(cosine_topk(live, QIDS, k=5))
    idx = ipqm.ivfpq_open(spark, d)
    assert _res(ipqm.ivfpq_search(idx, emb, QIDS, k=5, nprobe=8,
                                  shortlist=n)) == want

    # simulate the crash window: a raw append WITHOUT a manifest commit
    ipqm.ivfpq_append(idx, emb.filter(F.col("vec_id") >= 400))
    assert _res(ipqm.ivfpq_search(idx, emb, QIDS, k=5, nprobe=8,
                                  shortlist=n)) == want  # orphans hidden

    # compact re-snapshots the manifest: the orphan bytes become part of
    # the visible layout (operationally: a deliberate repair/adopt)
    ipqm.ivfpq_compact(ipqm.ivfpq_delete(idx, [999999]))
    assert _res(ipqm.ivfpq_search(ipqm.ivfpq_open(spark, d), emb, QIDS,
                                  k=5, nprobe=8, shortlist=n)) == \
        _res(cosine_topk(emb, QIDS, k=5))
