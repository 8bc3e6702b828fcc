"""positions_rows (map-side numpy kernel) must be row-identical to the
declarative posexplode + collect_list aggregate it replaced — tf,
position order, duplicate terms, None/empty token lists, and unicode
terms all included. The kernel is the build's zero-shuffle path for the
positions dataset (postings.py), so equivalence here IS the phrase-query
correctness guarantee for the physical index."""

from __future__ import annotations

from pyspark.sql import functions as F

from easy_solr4files_index_spark.operators.postings import positions_rows


def _reference(enriched):
    return (enriched.select("doc_id", "dl",
                            F.posexplode("tokens").alias("pos", "term"))
            .groupBy("term", "doc_id", "dl")
            .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
            .withColumn("tf", F.size("positions").cast("long")))


def _rows(df):
    return sorted(
        (r["term"], r["doc_id"], r["dl"], r["tf"], list(r["positions"]))
        for r in df.select("term", "doc_id", "dl", "tf", "positions").collect())


def test_kernel_matches_posexplode_aggregate(spark):
    data = [
        (0, 5, ["a", "b", "a", "c", "a"]),
        (1, 0, []),
        (2, 0, None),
        (3, 3, ["b", "b", "b"]),
        (4, 2, ["über", "café"]),
        (5, 1, ["a"]),
    ]
    enriched = spark.createDataFrame(
        data, "doc_id long, dl long, tokens array<string>")
    got = _rows(positions_rows(enriched, term_buckets=4))
    want = _rows(_reference(enriched))
    assert got == want
    # tbucket rides along and matches the JVM-side hash used by postings
    tb = positions_rows(enriched, term_buckets=4).select("term", "tbucket")
    jvm = enriched.select(F.explode("tokens").alias("term")).distinct() \
        .withColumn("tb2", F.pmod(F.xxhash64("term"), F.lit(4)).cast("int"))
    joined = tb.distinct().join(jvm, "term")
    assert joined.filter(F.col("tbucket") != F.col("tb2")).count() == 0


def test_kernel_random_docs_roundtrip(spark):
    # a larger deterministic corpus: values a pure function of doc id
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.expr("transform(sequence(0, cast(id % 17 as int)), "
               "i -> concat('t', cast((id * 31 + i * 7) % 13 as string)))"
               ).alias("tokens"))
    enriched = docs.withColumn("dl", F.size("tokens").cast("long"))
    got = _rows(positions_rows(enriched, term_buckets=8))
    want = _rows(_reference(enriched))
    assert got == want
