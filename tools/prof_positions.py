"""Isolate the positions stage: kernel-only scan vs full partitioned write.
Builds docs_store once into /tmp (reused across invocations)."""
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

from easy_solr4files_index_spark.session import get_spark
from easy_solr4files_index_spark.operators.index_build import enrich_docs, IndexConfig
from easy_solr4files_index_spark.operators.docids import assign_doc_ids
from easy_solr4files_index_spark.operators.postings import positions_rows

cpus = int(sys.argv[1])
n = int(sys.argv[2]) if len(sys.argv) > 2 else 200000
corpus = f"/tmp/fts_scale_corpus_v2_{n}"
store = f"/tmp/fts_prof_store_{n}"

spark = get_spark("prof-pos", cpus=cpus, shuffle_partitions=cpus * 4)
spark.sparkContext.setLogLevel("ERROR")

if not os.path.exists(os.path.join(store, "_SUCCESS")):
    docs = spark.read.parquet(corpus)
    enrich_docs(assign_doc_ids(docs), IndexConfig()).write.mode("overwrite").parquet(store)
    print("store built", flush=True)

tok = spark.read.parquet(store).select("doc_id", "dl", "tokens")
cfg = IndexConfig()

# warm
positions_rows(tok.limit(2000), cfg.term_buckets).write.mode("overwrite").parquet("/tmp/fts_prof_pos_warm")
shutil.rmtree("/tmp/fts_prof_pos_warm", ignore_errors=True)

t0 = time.perf_counter()
cnt = positions_rows(tok, cfg.term_buckets).count()
t_scan = time.perf_counter() - t0
print(f"kernel-only count: {t_scan:.2f}s rows={cnt} cpus={cpus}", flush=True)

out = f"/tmp/fts_prof_pos_{cpus}"
shutil.rmtree(out, ignore_errors=True)
t0 = time.perf_counter()
(positions_rows(tok, cfg.term_buckets)
 .write.mode("overwrite").partitionBy("tbucket").parquet(out))
t_write = time.perf_counter() - t0
nfiles = sum(len(fs) for _, _, fs in os.walk(out))
print(f"full write: {t_write:.2f}s files={nfiles} cpus={cpus}", flush=True)
shutil.rmtree(out, ignore_errors=True)
spark.stop()
