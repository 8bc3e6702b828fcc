"""Benchmark harness (driver contract + scaling evidence).

Default mode — one JSON line for the driver:

    python bench.py
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1, ...}

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32):

  * index-build throughput (files/sec): full physical index build
    (tokenize -> tf agg -> termstats -> varbyte/delta block postings
    with block-max metadata, term-bucket partitioned) via
    operators.postings.write_index — the north_star build path.
  * query latency per reference query (sec) + p95 over all timed
    executions, via the block-max WAND path (operators.wand) against
    the on-disk index — the north_star query path.

Scaling mode — the north_rule's two-cluster-size criterion, evidenced
in-sandbox by two parallelism levels on the SAME input (task brief):

    python bench.py --scaling            # runs N=8 and 4N=32 in
                                         # subprocesses, prints both
                                         # throughputs + efficiency and
                                         # rewrites BENCH/BASELINE.md

Reference baseline: the reference indexes strictly sequentially (one
file per HTTP round-trip chain, EasySolr4filesIndexApp.scala:86,99,113)
and publishes no numbers (BASELINE.md); our measured numbers stand as
the baseline going forward.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
QUERY_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

# the reference query set (mirrors __spark_entry__._SEARCHES: single /
# multi / hot-term / filtered / paginated / match-all — SearchServlet
# semantics, SURVEY.md §2.6/2.9)
BENCH_QUERIES: dict[str, tuple[str | None, int, int, dict | None]] = {
    "q1_single": ("dup", 10, 0, None),
    "q2_multi": ("spark join merge", 10, 0, None),
    "q3_hot": ("join", 15, 0, None),
    "q4_filtered": ("table scan", 10, 0, {"lang": ["en"]}),
    "q5_filters2": ("query window", 10, 0,
                    {"lang": ["de", "fr"],
                     "repo": ["src0", "src1", "src2", "src3", "src4", "src5"]}),
    "q6_page": ("spark", 5, 3, None),
    "q7_matchall": (None, 10, 5, {"lang": ["de"]}),
}


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_suite(sf_dir: str, cpus: int) -> dict:
    from easy_solr4files_index_spark.session import get_spark
    from easy_solr4files_index_spark.sources.docs_source import load_docs
    from easy_solr4files_index_spark.operators.postings import write_index, open_index
    from easy_solr4files_index_spark.operators.wand import search_blockmax

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_docs(spark, sf_dir)
    n_files = docs.count()  # warms the parquet read; excluded from build time

    index_dir = tempfile.mkdtemp(prefix="fts_bench_idx_")
    try:
        t0 = time.perf_counter()
        write_index(spark, docs, index_dir, lineage_groups=1)
        build_s = time.perf_counter() - t0
        files_per_sec = n_files / build_s if build_s > 0 else float("inf")

        idx = open_index(spark, index_dir)
        # warm-up: JVM/codegen/Arrow paths, not measured
        search_blockmax(idx, "spark", k=5).collect()

        per_query: dict[str, float] = {}
        all_times: list[float] = []
        for name, (text, k, skip, filters) in BENCH_QUERIES.items():
            times = []
            for _ in range(QUERY_REPS):
                t0 = time.perf_counter()
                search_blockmax(idx, text, k=k, skip=skip, filters=filters).collect()
                times.append(time.perf_counter() - t0)
            per_query[name] = round(statistics.median(times), 4)
            all_times += times
        all_times.sort()
        p95 = all_times[min(len(all_times) - 1, int(0.95 * len(all_times)))]

        return {
            "metric": ("index-build throughput (files/sec) + query p95 latency, "
                       "block-max WAND BM25 over term-partitioned varbyte postings"),
            "value": round(build_s + sum(per_query.values()), 3),
            "unit": "sec",
            "queries": per_query,
            "sf": _sf_of(sf_dir),
            "n_files": n_files,
            "build_sec": round(build_s, 3),
            "files_per_sec": round(files_per_sec, 1),
            "query_p95_sec": round(p95, 4),
            "cpus": cpus,
        }
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()


SCALE_N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "200000"))
SCALE_CORPUS = f"/tmp/fts_scale_corpus_{SCALE_N_DOCS}"

# query set for the synthetic scale corpus (Zipf vocab of scale_corpus.py:
# 'def' ~hottest keyword, parseBuild ~hot identifier, long-tail pairs)
SCALE_QUERIES: dict[str, tuple[str | None, int, int, dict | None]] = {
    "s1_hot_kw": ("def", 10, 0, None),
    "s2_hot_ident": ("parseBuild", 10, 0, None),
    "s3_multi": ("merge block scan", 10, 0, None),
    "s4_tail": ("swapRing allocHeap", 10, 0, None),
    "s5_filtered": ("token score", 10, 0, {"lang": ["python", "go"]}),
}


def run_scale_worker(corpus_path: str, cpus: int) -> dict:
    """Timed build + query suite over an already-materialized docs-shaped
    parquet corpus (generation is NOT part of the measured job)."""
    from easy_solr4files_index_spark.session import get_spark
    from easy_solr4files_index_spark.operators.postings import write_index, open_index
    from easy_solr4files_index_spark.operators.wand import search_blockmax

    spark = get_spark("bench-scale", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus_path)
    n_files = docs.count()

    index_dir = tempfile.mkdtemp(prefix="fts_scale_idx_")
    try:
        t0 = time.perf_counter()
        write_index(spark, docs, index_dir, lineage_groups=1)
        build_s = time.perf_counter() - t0

        idx = open_index(spark, index_dir)
        search_blockmax(idx, "def", k=5).collect()  # warm-up, unmeasured
        per_query, all_times = {}, []
        for name, (text, k, skip, filters) in SCALE_QUERIES.items():
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                search_blockmax(idx, text, k=k, skip=skip, filters=filters).collect()
                times.append(time.perf_counter() - t0)
            per_query[name] = round(min(times), 3)
            all_times += times
        all_times.sort()
        p95 = all_times[min(len(all_times) - 1, int(0.95 * len(all_times)))]
        return {
            "cpus": cpus, "n_files": n_files,
            "build_sec": round(build_s, 2),
            "files_per_sec": round(n_files / build_s, 1),
            "queries": per_query, "query_p95_sec": round(p95, 3),
        }
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()


def run_scaling(sf_dir: str, n_low: int = 8, n_high: int = 32) -> dict:
    """Same job at N and 4N cores in fresh subprocesses (clean JVMs).

    Uses the deterministic scale corpus (200k docs by default): at the
    driver testdata's 5k docs the build is fixed-overhead-bound and a
    core-count comparison measures the scheduler, not the engine.
    """
    from easy_solr4files_index_spark.session import get_spark
    from easy_solr4files_index_spark.sources.scale_corpus import materialize_scale_corpus

    spark = get_spark("bench-gen", cpus=n_high)
    spark.sparkContext.setLogLevel("ERROR")
    materialize_scale_corpus(spark, SCALE_N_DOCS, SCALE_CORPUS)
    spark.stop()

    results = {}
    for cpus in (n_low, n_high):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_scale-worker",
             SCALE_CORPUS, str(cpus)],
            capture_output=True, text=True, check=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)

    tp_low = results[n_low]["files_per_sec"]
    tp_high = results[n_high]["files_per_sec"]
    build_eff = tp_high / (tp_low * (n_high / n_low))
    q_low = results[n_low]["query_p95_sec"]
    q_high = results[n_high]["query_p95_sec"]
    return {
        "sf": _sf_of(sf_dir),
        "n_low": n_low, "n_high": n_high,
        "build_files_per_sec": {str(n_low): tp_low, str(n_high): tp_high},
        "build_speedup": round(tp_high / tp_low, 3),
        "build_scaling_efficiency": round(build_eff, 3),
        "query_p95_sec": {str(n_low): q_low, str(n_high): q_high},
        "results": results,
    }


def write_scaling_report(s: dict, path: str = "BENCH/BASELINE.md") -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lo, hi = str(s["n_low"]), str(s["n_high"])
    with open(path, "w") as fh:
        fh.write(f"""# BENCH baseline — measured (two-parallelism scaling evidence)

North-rule criterion: throughput scaling efficiency >= 0.8 between N and
4N executors. No real cluster exists in this sandbox, so per the task
brief this is evidenced by the SAME job (full physical index build +
query set, `bench.py --scaling`) on the SAME input at two parallelism
levels: `local[{lo}]` vs `local[{hi}]`.

Input: {s['results'][s['n_low']]['n_files']} files of the deterministic
code-like corpus (sources/scale_corpus.py — Zipf vocabulary, values a
pure function of doc id, byte-identical at any parallelism), generated
once to parquet OUTSIDE the timed build. The driver testdata (5k docs,
~1.5 MB text) is too small for a meaningful core-count comparison —
fixed per-job overhead dominates there.

| parallelism | build files/sec | query p95 (s) |
|---|---|---|
| local[{lo}] (N) | {s['build_files_per_sec'][lo]} | {s['query_p95_sec'][lo]} |
| local[{hi}] (4N) | {s['build_files_per_sec'][hi]} | {s['query_p95_sec'][hi]} |

* build speedup 4N/N: **{s['build_speedup']}x**
* build scaling efficiency tp(4N)/(4*tp(N)): **{s['build_scaling_efficiency']}**

Caveats: a single-JVM local[N] run shares one driver, one shuffle
service and one Python fork pool across all cores, and at this SF the
fixed per-job costs (Spark job scheduling, Arrow batch setup, parquet
footer reads) dominate — true multi-executor scaling at 10^12 files
depends on the term-bucket/doc-bucket partitioning, which is
parallelism-independent by construction (postings.py: bucket = doc_id
range, tbucket = hash(term)); no stage in the build collects more than
P integers to the driver.

Raw per-level JSON: see `bench_scaling.json`.
""")
    with open("bench_scaling.json", "w") as fh:
        json.dump(s, fh, indent=2, default=str)


if __name__ == "__main__":
    if "--_scale-worker" in sys.argv:
        i = sys.argv.index("--_scale-worker")
        print(json.dumps(run_scale_worker(sys.argv[i + 1], int(sys.argv[i + 2]))))
    elif "--scaling" in sys.argv:
        s = run_scaling(SF_DIR)
        write_scaling_report(s)
        print(json.dumps({k: v for k, v in s.items() if k != "results"}))
    else:
        print(json.dumps(run_suite(SF_DIR, CPUS)))
