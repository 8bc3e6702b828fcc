"""Deterministic sampling invariants: partition-invariance (the property
DataFrame.sample lacks), salt independence, quota semantics."""

import pytest
from pyspark.sql import functions as F

from easy_solr4files_index_spark.functions import sampling as S

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_sample_partition_invariant(spark, docs):
    a = {r["doc_id"] for r in S.hash_sample(docs, 0.3).select("doc_id").collect()}
    b = {r["doc_id"] for r in
         S.hash_sample(docs.repartition(17), 0.3).select("doc_id").collect()}
    assert a == b and 0 < len(a) < docs.count()


def test_hash_sample_rate_monotone_nested(spark, docs):
    """A lower-rate sample is a SUBSET of a higher-rate one (same salt) —
    the property that makes hash windows usable as stable splits."""
    s10 = {r["doc_id"] for r in S.hash_sample(docs, 0.1).select("doc_id").collect()}
    s40 = {r["doc_id"] for r in S.hash_sample(docs, 0.4).select("doc_id").collect()}
    assert s10 <= s40


def test_hash_sample_salts_differ(spark, docs):
    a = {r["doc_id"] for r in
         S.hash_sample(docs, 0.3, salt="train").select("doc_id").collect()}
    b = {r["doc_id"] for r in
         S.hash_sample(docs, 0.3, salt="valid").select("doc_id").collect()}
    assert a != b  # independent decisions per salt


def test_cap_per_key_quota_and_determinism(spark, docs):
    capped = S.cap_per_key(docs, key="source", n=5)
    per = {r["source"]: r["c"] for r in
           capped.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert max(per.values()) <= 5
    assert set(per) == {r["source"] for r in docs.select("source").distinct().collect()}
    again = S.cap_per_key(docs.repartition(13), key="source", n=5)
    assert ({r["doc_id"] for r in capped.collect()}
            == {r["doc_id"] for r in again.collect()})


def test_cap_per_key_preserves_small_groups(spark):
    rows = [(i, "only") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    assert S.cap_per_key(docs, key="source", n=10).count() == 3
