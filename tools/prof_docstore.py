"""Micro-profile: tokenize+sha256+write WITHOUT docID assignment/cache,
straight off the parquet corpus — isolates whether the docs_store stage's
non-scaling is the persisted-cache read or the tokenize/write itself."""
import sys
import tempfile
import shutil
import time

from pyspark.sql import functions as F

from easy_solr4files_index_spark.session import get_spark
from easy_solr4files_index_spark.operators.index_build import enrich_docs, IndexConfig

cpus = int(sys.argv[1])
n = int(sys.argv[2]) if len(sys.argv) > 2 else 200000
corpus = f"/tmp/fts_scale_corpus_v2_{n}"

spark = get_spark("prof-ds", cpus=cpus, shuffle_partitions=cpus * 4)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(corpus).withColumn("doc_id", F.lit(0).cast("long"))

out = tempfile.mkdtemp(prefix="fts_prof_ds_")
# warm
enrich_docs(docs.limit(2000), IndexConfig()).write.mode("overwrite").parquet(out)
t0 = time.perf_counter()
enrich_docs(docs, IndexConfig()).write.mode("overwrite").parquet(out)
print(f"enrich+write: {time.perf_counter() - t0:.2f}s cpus={cpus}")
shutil.rmtree(out, ignore_errors=True)
spark.stop()
