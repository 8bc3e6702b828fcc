"""Physical incremental maintenance (operators/maintenance.py):
delete/append/upsert must reproduce a fresh build of the same corpus
(scores + keysets), touch only the affected repo's data, and compact
back to a delta-free index — the reference's delete-one-bag +
reindex-one-bag cycle (EasySolr4filesIndexApp.scala:48-51) made
physical and O(bag)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from easy_solr4files_index_spark.operators.maintenance import (
    append_docs_physical, compact_index, delete_repo_physical,
    upsert_repos_physical)
from easy_solr4files_index_spark.operators.postings import open_index, write_index
from easy_solr4files_index_spark.operators.wand import search_blockmax
from easy_solr4files_index_spark.sources.docs_source import synth_code_docs

QUERY = "parse index license"


def _listing(idx, text=QUERY, prune=True):
    rows = (search_blockmax(idx, text, k=10 ** 6, prune=prune)
            .select("repo", "path", "score").collect())
    return sorted((r["repo"], r["path"], r["score"]) for r in rows)


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_code_docs(spark, n_docs=240, seed=11).persist()


def test_delete_matches_fresh_build(spark, corpus, tmp_path_factory):
    d_inc = str(tmp_path_factory.mktemp("inc"))
    write_index(spark, corpus, d_inc, lineage_groups=1)
    repo = "org2/proj1"
    idx = delete_repo_physical(spark, d_inc, repo)
    assert idx.tombstones, "delete must record a tombstone range"

    d_fresh = str(tmp_path_factory.mktemp("fresh"))
    write_index(spark, corpus.filter(F.col("repo") != repo), d_fresh,
                lineage_groups=1)
    fresh = open_index(spark, d_fresh)

    assert _listing(idx) == _listing(fresh)
    # pruned and exhaustive agree on the tombstoned index too
    assert _listing(idx, prune=True) == _listing(idx, prune=False)
    # deleted repo is gone from the store view and from match-all
    assert idx.docs_store.filter(F.col("repo") == repo).count() == 0


def test_upsert_matches_fresh_build(spark, corpus, tmp_path_factory):
    d_inc = str(tmp_path_factory.mktemp("inc2"))
    write_index(spark, corpus, d_inc, lineage_groups=1)
    repo = "org1/proj0"
    mod = (corpus.filter(F.col("repo") == repo)
           .withColumn("content", F.concat("content", F.lit(" refreshedToken"))))
    before = {os.path.basename(p): os.path.getsize(p)
              for p in glob.glob(os.path.join(d_inc, "postings", "*", "*.parquet"))}
    idx = upsert_repos_physical(spark, d_inc, mod)
    after = {os.path.basename(p): os.path.getsize(p)
             for p in glob.glob(os.path.join(d_inc, "postings", "*", "*.parquet"))}

    # O(bag) evidence: every pre-existing postings file is untouched —
    # the upsert only APPENDED new segment files (plus tombstone/delta
    # sidecars); nothing was rewritten
    for name, size in before.items():
        assert name in after and after[name] == size
    assert len(after) > len(before)

    d_fresh = str(tmp_path_factory.mktemp("fresh2"))
    merged = corpus.filter(F.col("repo") != repo).unionByName(mod)
    write_index(spark, merged, d_fresh, lineage_groups=1)
    fresh = open_index(spark, d_fresh)

    assert _listing(idx) == _listing(fresh)
    assert _listing(idx, "refreshedToken") == _listing(fresh, "refreshedToken")
    assert idx.n_docs == fresh.n_docs
    assert abs(idx.avgdl - fresh.avgdl) < 1e-9


def test_append_new_repo_and_compact(spark, corpus, tmp_path_factory):
    d_inc = str(tmp_path_factory.mktemp("inc3"))
    old = corpus.filter(F.col("repo") != "org5/proj2")
    write_index(spark, old, d_inc, lineage_groups=1)
    new = (corpus.filter(F.col("repo") == "org5/proj2")
           .withColumn("repo", F.lit("zzz/newrepo")))
    idx = append_docs_physical(spark, d_inc, new)
    listing_before = _listing(idx)
    assert any(r == "zzz/newrepo" for r, _, _ in listing_before)

    d_fresh = str(tmp_path_factory.mktemp("fresh3"))
    write_index(spark, old.unionByName(new), d_fresh, lineage_groups=1)
    assert listing_before == _listing(open_index(spark, d_fresh))

    # compact folds deltas/tombstones; results identical, sidecars gone
    delete_repo_physical(spark, d_inc, "org0/proj0")
    idx2 = open_index(spark, d_inc)
    listing_del = _listing(idx2)
    compacted = compact_index(spark, d_inc)
    assert not compacted.tombstones
    assert not os.path.exists(os.path.join(d_inc, "_termstats_delta"))
    assert _listing(compacted) == listing_del
    assert _listing(compacted, prune=True) == _listing(compacted, prune=False)


def test_delete_then_delete_is_idempotent_safe(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("inc4"))
    write_index(spark, corpus, d, lineage_groups=1)
    delete_repo_physical(spark, d, "org3/proj0")
    idx = delete_repo_physical(spark, d, "org3/proj0")  # no live docs left
    assert idx.docs_store.filter(F.col("repo") == "org3/proj0").count() == 0
