"""Per-stage wall-time profile of dedup_apply at scale-corpus size.

Usage: python tools/prof_dedup.py [n_docs]

Splits the composed operator into its stages (MinHash-LSH candidates,
Jaccard verify, label propagation) and times each with a forcing count,
so regressions/optimizations can be attributed to one stage. Uses the
same salted corpus as ``bench.py --pipeline``.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from easy_solr4files_index_spark.functions import dedup  # noqa: E402
from easy_solr4files_index_spark.session import get_spark  # noqa: E402
from easy_solr4files_index_spark.sources.scale_corpus import (  # noqa: E402
    materialize_scale_corpus)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("prof-dedup", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(materialize_scale_corpus(
        spark, n_docs, f"/tmp/fts_scale_corpus_v2_{n_docs}"))
    dupes = (corpus.orderBy("path").limit(max(1, n_docs // 50))
             .withColumn("repo", F.concat(F.lit("dup-"), F.col("repo")))
             .withColumn("path", F.concat(F.lit("dup/"), F.col("path"))))
    docs = (corpus.unionByName(dupes)
            .withColumn("doc_id", F.xxhash64("repo", "path"))
            .select("doc_id", F.col("content").alias("text"))).persist()
    docs.count()

    out: dict = {"n_docs": n_docs}

    t0 = time.perf_counter()
    cand = dedup.minhash_band_candidates(docs).persist()
    out["n_candidates"] = cand.count()
    out["candidates_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    sh = dedup._shingles(docs)
    in_cand = (cand.select(F.col("a").alias("doc_id"))
               .union(cand.select(F.col("b").alias("doc_id"))).distinct())
    shc = sh.join(in_cand, "doc_id", "left_semi").persist()
    sizes = shc.groupBy("doc_id").agg(F.count("*").alias("n"))
    shx = shc.select(F.col("doc_id").alias("a"), "sh")
    shy = shc.select(F.col("doc_id").alias("b"), "sh")
    inter = (cand.join(shx, "a").join(shy, ["b", "sh"])
             .groupBy("a", "b").agg(F.count("*").alias("inter")))
    ver = (inter
           .join(sizes.withColumnRenamed("doc_id", "a")
                 .withColumnRenamed("n", "na"), "a")
           .join(sizes.withColumnRenamed("doc_id", "b")
                 .withColumnRenamed("n", "nb"), "b")
           .filter(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
                   >= 0.6)
           .select("a", "b").persist())
    out["n_verified"] = ver.count()
    out["verify_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    full = dedup.dedup_apply(docs, threshold=0.6)
    out["n_total"] = full.count()
    out["full_sec"] = round(time.perf_counter() - t0, 2)
    out["labelprop_sec_approx"] = round(
        out["full_sec"] - out["candidates_sec"] - out["verify_sec"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
