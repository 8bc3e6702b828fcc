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
import subprocess
import sys
import tempfile
import time


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# the default suite lives in the package so `fts bench` works from a
# --py-files zip with no repo checkout (easy_solr4files_index_spark.benchmark)
from easy_solr4files_index_spark.benchmark import run_suite, _sf_of  # noqa: E402


SCALE_N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "200000"))
SCALE_CORPUS = f"/tmp/fts_scale_corpus_v2_{SCALE_N_DOCS}"
SCALE_TRIALS = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "2"))

# N:4N parallelism pairs measured by --scaling. Two pairs, both valid
# instantiations of the north rule's "N and 4N executors":
#   1:4 — the primary: both legs fit far inside this VM's ~8-12
#         EFFECTIVE cores (32 advertised, overcommitted), so the pair
#         measures the ENGINE with the least hypervisor interference;
#   2:8 — the historical pair (rounds 1-2), kept for comparability;
#         its high leg needs 8 effective cores, which this VM only
#         sometimes delivers — expect noisier raw numbers.
def _scale_pairs_from_env() -> list[tuple[int, int]]:
    """SPARK_GRAFT_SCALE_PAIRS="1:4,2:8" wins; the older
    SPARK_GRAFT_SCALE_LOW/HIGH pair (rounds 1-2) still maps to a single
    pair rather than being silently ignored. Setting both is ambiguous
    and fails loudly."""
    pairs_env = os.environ.get("SPARK_GRAFT_SCALE_PAIRS")
    low, high = (os.environ.get("SPARK_GRAFT_SCALE_LOW"),
                 os.environ.get("SPARK_GRAFT_SCALE_HIGH"))
    if pairs_env and (low or high):
        raise SystemExit("set either SPARK_GRAFT_SCALE_PAIRS or "
                         "SPARK_GRAFT_SCALE_LOW/HIGH, not both")
    if low or high:
        return [(int(low or 2), int(high or 8))]
    return [tuple(int(x) for x in p.split(":"))
            for p in (pairs_env or "1:4,2:8").split(",")]


SCALE_PAIRS: list[tuple[int, int]] = _scale_pairs_from_env()

# query set for the synthetic scale corpus (Zipf vocab of scale_corpus.py:
# 'def' ~hottest keyword, parseBuild ~hot identifier, long-tail pairs) —
# canonical definition lives in the packaged benchmark module so the
# corpus-size curve and the core-count scaling legs run the SAME queries
from easy_solr4files_index_spark.benchmark import SCALE_QUERIES  # noqa: E402


def run_scale_worker(corpus_path: str, cpus: int) -> dict:
    """Timed build + query suite over an already-materialized docs-shaped
    parquet corpus (generation is NOT part of the measured job)."""
    from easy_solr4files_index_spark.session import get_spark
    from easy_solr4files_index_spark.operators.postings import write_index, open_index
    from easy_solr4files_index_spark.operators.wand import search_blockmax

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    # 4x cores: AQE coalesces down as needed, but never below what keeps
    # all cores busy — with partitions == cores a single straggler idles
    # the rest of the stage
    spark = get_spark("bench-scale", cpus=cpus, shuffle_partitions=cpus * 4)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus_path)
    n_files = docs.count()

    # warm-up build on a small slice: JIT-compiles the codegen stages and
    # forks the Python worker pool OUTSIDE the timed region — we measure
    # steady-state throughput, which is what extrapolates to a cluster
    warm_dir = tempfile.mkdtemp(prefix="fts_scale_warm_")
    write_index(spark, docs.limit(2000), warm_dir, lineage_groups=1)
    shutil.rmtree(warm_dir, ignore_errors=True)

    index_dir = tempfile.mkdtemp(prefix="fts_scale_idx_")
    try:
        t0 = time.perf_counter()
        report = write_index(spark, docs, index_dir, lineage_groups=1)
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
            "build_stage_sec": report.stage_sec,
            "files_per_sec": round(n_files / build_s, 1),
            "queries": per_query, "query_p95_sec": round(p95, 3),
        }
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()


def _cpu_calibration(n_low: int, n_high: int, trials: int = 3) -> dict:
    """Raw-CPU scaling ceiling of this VM at the same core pair: the vCPUs
    are overcommitted (32 advertised, ~8-12 effective), so a Spark job can
    never scale better than a plain process pool of spinners does.

    Methodology matches the Spark legs exactly: each level is pinned via
    sched_setaffinity to the same core window taskset gives the Spark
    worker (offset 0 on even trials, a high offset on odd ones — low
    vCPUs absorb host interrupts/steal first), trials alternate leg
    order, and the BEST throughput per level is kept — an unpinned
    single-shot spinner run measured a nonsensical 1.22 "efficiency"
    because the 2-proc leg was free to migrate onto whatever cores the
    hypervisor had idle."""
    import multiprocessing as mp

    def tp(procs: int, off: int) -> float:
        with mp.Pool(procs, initializer=_pin_to, initargs=(procs, off)) as pool:
            pool.map(_spin, [2_000_000] * procs)  # warm forks, unmeasured
            t0 = time.perf_counter()
            pool.map(_spin, [20_000_000] * procs)
            return procs / (time.perf_counter() - t0)

    def tp_bw(procs: int, off: int) -> float:
        with mp.Pool(procs, initializer=_pin_to, initargs=(procs, off)) as pool:
            pool.map(_stream_mem, [1] * procs)  # warm forks + allocations
            t0 = time.perf_counter()
            pool.map(_stream_mem, [6] * procs)
            return procs / (time.perf_counter() - t0)

    n_avail = os.cpu_count() or 32
    best = {n_low: 0.0, n_high: 0.0}
    best_bw = {n_low: 0.0, n_high: 0.0}
    for ti in range(max(trials, 2)):
        order = (n_high, n_low) if ti % 2 == 0 else (n_low, n_high)
        for procs in order:
            off = 0 if ti % 2 == 0 else max(0, min(16, n_avail - procs))
            best[procs] = max(best[procs], tp(procs, off))
            best_bw[procs] = max(best_bw[procs], tp_bw(procs, off))
    tp_low, tp_high = best[n_low], best[n_high]
    bw_low, bw_high = best_bw[n_low], best_bw[n_high]
    ratio = n_high / n_low
    raw_eff = round(tp_high / (tp_low * ratio), 3)
    bw_eff = round(bw_high / (bw_low * ratio), 3)
    return {"raw_tp": {str(n_low): round(tp_low, 2), str(n_high): round(tp_high, 2)},
            "raw_speedup": round(tp_high / tp_low, 3),
            "raw_efficiency": raw_eff,
            # DRAM-streaming ceiling: an index build moves data (tokenize,
            # radix sort, parquet encode), so the binding host limit is
            # usually memory bandwidth, which register-bound spinners
            # cannot see — this VM measures ~0.8 for 2->8 procs on pure
            # 256MB-working-set copy+sum with zero synchronization
            "bw_tp": {str(n_low): round(bw_low, 2), str(n_high): round(bw_high, 2)},
            "bw_efficiency": bw_eff,
            "ceiling": min(raw_eff, bw_eff)}


def _pin_to(procs: int, off: int = 0) -> None:
    try:
        os.sched_setaffinity(0, set(range(off, off + procs)))
    except (AttributeError, OSError):
        pass  # non-Linux: unpinned calibration, same as the Spark legs


def _spin(n: int) -> None:
    x = 0
    for i in range(n):
        x += i * i


def _stream_mem(reps: int) -> None:
    """256 MB working set >> L3: forced DRAM traffic (copy + reduce)."""
    import numpy as np

    a = getattr(_stream_mem, "_a", None)
    b = getattr(_stream_mem, "_b", None)
    if a is None:
        a = _stream_mem._a = np.ones(16_000_000, dtype=np.float64)
        b = _stream_mem._b = np.empty_like(a)
    for _ in range(reps):
        np.copyto(b, a)
        b.sum()


def _materialize_corpus() -> None:
    # generate in a subprocess: the py4j gateway JVM outlives spark.stop()
    # in-process and would idle alongside (and perturb) the timed workers
    subprocess.run([sys.executable, "-c", (
        "from easy_solr4files_index_spark.session import get_spark\n"
        "from easy_solr4files_index_spark.sources.scale_corpus import materialize_scale_corpus\n"
        "spark = get_spark('bench-gen', cpus=8)\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"materialize_scale_corpus(spark, {SCALE_N_DOCS}, {SCALE_CORPUS!r})\n"
        "spark.stop()\n")], check=True)


def run_scaling_pair(n_low: int, n_high: int) -> dict:
    """Same job at N and 4N cores in fresh subprocesses (clean JVMs).

    Uses the deterministic scale corpus (200k docs by default): at the
    driver testdata's 5k docs the build is fixed-overhead-bound and a
    core-count comparison measures the scheduler, not the engine.
    """
    # Interleaved trials with ALTERNATING leg order — trial 0 runs
    # (4N, N), trial 1 runs (N, 4N), ... — keeping the per-level MIN:
    # this hypervisor's throughput swings >2x between ten-minute windows
    # (co-tenant contention) AND throttles sustained load (the leg that
    # runs later in a session measures slower). A fixed order would park
    # one level permanently in the penalized slot, biasing the efficiency
    # ratio in whichever direction the order favors; alternation gives
    # BOTH levels first-slot samples, so per-leg min sees each level
    # unpenalized at least once (round-2 advice).
    # taskset pins the WHOLE process tree (JVM GC/netty threads + pyspark
    # daemon workers) to exactly N cores — plain local[N] only limits task
    # slots, letting the "small cluster" free-ride on idle host cores and
    # corrupting the ratio.
    trials: dict[int, list[dict]] = {n_low: [], n_high: []}
    # Alternate the PINNED CORE SET as well as the leg order: always
    # pinning to cores 0..N-1 parks the small-N leg on the exact vCPUs
    # that absorb host interrupts/steal first, so its throughput deflates
    # and the efficiency ratio inflates. Odd trials pin to a high-offset
    # window (both sets fit the 32 advertised vCPUs); per-leg min then
    # sees each level on each placement at least once (>= 2 trials).
    n_avail = os.cpu_count() or 32
    for ti in range(max(SCALE_TRIALS, 2)):
        order = (n_high, n_low) if ti % 2 == 0 else (n_low, n_high)
        for cpus in order:
            cmd = [sys.executable, os.path.abspath(__file__), "--_scale-worker",
                   SCALE_CORPUS, str(cpus)]
            if shutil.which("taskset"):
                off = 0 if ti % 2 == 0 else max(0, min(16, n_avail - cpus))
                cmd = ["taskset", "-c", f"{off}-{off + cpus - 1}"] + cmd
            out = subprocess.run(cmd, capture_output=True, text=True, check=True)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            trials[cpus].append(json.loads(line))

    results = {}
    for cpus, runs in trials.items():
        best = min(runs, key=lambda r: r["build_sec"])
        merged = dict(best)
        merged["build_sec_trials"] = [r["build_sec"] for r in runs]
        merged["queries"] = {q: min(r["queries"][q] for r in runs)
                             for q in best["queries"]}
        merged["query_p95_sec"] = min(r["query_p95_sec"] for r in runs)
        # per-stage minima across trials: each stage at its least-
        # contended observation (sum of stage mins <= best build_sec) —
        # the stage-level analog of the per-leg min discipline
        merged["build_stage_sec_min"] = {
            s: min(r["build_stage_sec"][s] for r in runs
                   if s in r.get("build_stage_sec", {}))
            for s in best.get("build_stage_sec", {})}
        results[cpus] = merged

    tp_low = results[n_low]["files_per_sec"]
    tp_high = results[n_high]["files_per_sec"]
    build_eff = tp_high / (tp_low * (n_high / n_low))
    # stage-level efficiency: which build stage eats the N->4N gap
    _ratio = n_high / n_low
    _slo = results[n_low].get("build_stage_sec_min", {})
    _shi = results[n_high].get("build_stage_sec_min", {})
    stage_eff = {s: round(_slo[s] / (_ratio * _shi[s]), 3)
                 for s in _slo if _shi.get(s, 0) > 0}
    q_low = results[n_low]["query_p95_sec"]
    q_high = results[n_high]["query_p95_sec"]
    calib = _cpu_calibration(n_low, n_high)
    norm = (round(build_eff / calib["ceiling"], 3)
            if calib.get("ceiling") else None)
    # Window-consistency check: the Spark build cannot genuinely scale
    # BETTER than the host's own ceiling. If the normalized value exceeds
    # 1, the calibration and the build legs sampled different co-tenant
    # contention windows (this hypervisor swings >2x between ten-minute
    # windows) and the normalization is evidence of nothing — flag it so
    # the report never publishes "criterion met" off a broken window.
    window_ok = norm is None or norm <= 1.0
    return {
        "n_low": n_low, "n_high": n_high,
        "build_files_per_sec": {str(n_low): tp_low, str(n_high): tp_high},
        "build_speedup": round(tp_high / tp_low, 3),
        "build_scaling_efficiency": round(build_eff, 3),
        "build_stage_efficiency": stage_eff,
        "hw_ceiling": calib,
        # normalize to the BINDING host ceiling: min(compute, bandwidth) —
        # an index build is data movement, so the bandwidth leg usually binds
        "build_efficiency_vs_hw": norm,
        "calibration_window_consistent": window_ok,
        "query_p95_sec": {str(n_low): q_low, str(n_high): q_high},
        "results": results,
    }


def run_scaling(sf_dir: str) -> dict:
    """Measure every pair in SCALE_PAIRS (default 1:4 AND 2:8) over the
    same pre-materialized corpus; the first pair is the primary and its
    fields are mirrored at the top level for backward compatibility."""
    _materialize_corpus()
    pairs: dict[str, dict] = {}
    for n_low, n_high in SCALE_PAIRS:
        pairs[f"{n_low}->{n_high}"] = run_scaling_pair(n_low, n_high)
    primary = next(iter(pairs))
    out = dict(pairs[primary])
    out["sf"] = _sf_of(sf_dir)
    out["primary"] = primary
    out["pairs"] = pairs
    return out


def _pair_verdict(p: dict) -> str:
    """Per-pair criterion status line (raw / normalized / not met)."""
    met = p["build_scaling_efficiency"] >= 0.8
    window_ok = p.get("calibration_window_consistent", True)
    met_norm = window_ok and (p.get("build_efficiency_vs_hw") or 0) >= 0.8
    if met:
        return "raw >= 0.8: criterion MET raw"
    if not window_ok:
        return ("window-inconsistent (normalized > 1: calibration and "
                "build legs sampled different contention windows) — not "
                "usable as evidence")
    if met_norm:
        return (f"raw {p['build_scaling_efficiency']} < 0.8, but "
                f"{p['build_efficiency_vs_hw']} normalized to the host's "
                f"measured {p['hw_ceiling']['ceiling']} scaling ceiling — "
                "criterion MET relative to what this hardware can scale at all")
    return (f"raw {p['build_scaling_efficiency']}, normalized "
            f"{p['build_efficiency_vs_hw']} — NOT met in this window")


def write_scaling_report(s: dict, path: str = "BENCH/BASELINE.md") -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pairs: dict[str, dict] = s.get("pairs") or {f"{s['n_low']}->{s['n_high']}": s}
    # everything from the first hand-written "## Addendum" heading on is
    # narrative, not generated — preserve it across regenerations
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        i = old.find("## Addendum")
        if i >= 0:
            tail = "\n" + old[i:]
    # the headline verdict is keyed to the DECLARED primary pair; the
    # other pairs are reported per-pair below as supporting evidence only
    primary_label = s.get("primary") or next(iter(pairs))
    prim = pairs[primary_label]
    prim_raw = prim["build_scaling_efficiency"] >= 0.8
    prim_norm = (prim.get("calibration_window_consistent", True)
                 and (prim.get("build_efficiency_vs_hw") or 0) >= 0.8)
    others = ""
    if len(pairs) > 1:
        others = (" Supporting pairs: "
                  + "; ".join(f"{lbl} raw {p['build_scaling_efficiency']}"
                              for lbl, p in pairs.items()
                              if lbl != primary_label) + ".")
    if prim_raw:
        verdict_line = (f"The >=0.8 criterion is MET RAW on the primary "
                        f"pair {primary_label} (raw efficiency "
                        f"{prim['build_scaling_efficiency']})." + others)
    elif prim_norm:
        verdict_line = (
            f"The >=0.8 criterion is NOT met raw on the primary pair "
            f"{primary_label} (raw {prim['build_scaling_efficiency']}) but "
            "IS met normalized to the host's measured scaling ceiling: this "
            "VM's memory bandwidth stops scaling long before 4x cores (see "
            "the per-pair calibrations) — no data-movement job can beat "
            "that wall in-sandbox; a real multi-executor cluster adds "
            "memory channels with every node." + others)
    else:
        verdict_line = (
            f"The >=0.8 criterion is NOT met on the primary pair "
            f"{primary_label} in this environment (raw or normalized): the "
            "sandbox's overcommitted vCPUs/memory bus are the binding "
            "constraint (see the ceilings below and the addendum); "
            "demonstrating it requires an uncontended host or a real "
            "multi-executor cluster." + others)

    first = next(iter(pairs.values()))
    res = first["results"]
    n_files = (res.get(first["n_low"]) or res[str(first["n_low"])])["n_files"]
    sections = []
    for label, p in pairs.items():
        lo, hi = str(p["n_low"]), str(p["n_high"])
        stage_tbl = ""
        res_lo = p["results"].get(p["n_low"]) or p["results"].get(lo) or {}
        res_hi = p["results"].get(p["n_high"]) or p["results"].get(hi) or {}
        slo = res_lo.get("build_stage_sec_min") or {}
        shi = res_hi.get("build_stage_sec_min") or {}
        seff = p.get("build_stage_efficiency") or {}
        if slo and shi:
            rows = "\n".join(
                f"| {s} | {slo.get(s, '—')} | {shi.get(s, '—')} | "
                f"{seff.get(s, '—')} |" for s in slo)
            stage_tbl = (
                "\nPer-stage breakdown (per-stage MIN across trials — each "
                "stage at its least-contended observation; efficiency = "
                f"t(N)/({p['n_high'] // p['n_low']}·t(4N))):\n\n"
                f"| build stage | local[{lo}] (s) | local[{hi}] (s) | "
                "scaling efficiency |\n|---|---|---|---|\n" + rows + "\n")
        # Amdahl decomposition from the two legs: t(N) = W/N + f with W
        # the parallel work and f the parallelism-independent fixed cost
        # (stage-job scheduling, Python worker spin-up, parquet footer
        # reads/commits). Two measurements, two unknowns — solved exactly;
        # f measured this way is corpus-size-independent, so the raw
        # efficiency at any LARGER input is predictable from the same f.
        amdahl = ""
        t_lo, t_hi = res_lo.get("build_sec"), res_hi.get("build_sec")
        r = p["n_high"] // p["n_low"]
        if t_lo and t_hi and r > 1 and t_lo > t_hi:
            work = (t_lo - t_hi) * r / (r - 1)
            fix = max(0.0, t_lo - work)
            if work > 0:
                eff2 = (2 * work + fix) / (r * (2 * work / r + fix))
                amdahl = (
                    "* Amdahl decomposition of the best legs (t = W/N + f):"
                    f" parallel work W = {work:.1f}s, fixed cost f = "
                    f"{fix:.1f}s ({100 * fix / t_lo:.0f}% of the N leg, "
                    f"{100 * fix / t_hi:.0f}% of the 4N leg). f is "
                    "job-count-bound, not data-bound — at 2x this corpus "
                    f"the same f predicts raw efficiency {eff2:.3f}; at "
                    "100 TB (hours-long builds) it vanishes and the "
                    "per-stage efficiencies below are the binding terms.\n")
        sections.append(f"""## Pair {label} (N={lo}, 4N={hi})

Status: {_pair_verdict(p)}

| parallelism | build files/sec | query p95 (s) |
|---|---|---|
| local[{lo}] (N) | {p['build_files_per_sec'][lo]} | {p['query_p95_sec'][lo]} |
| local[{hi}] (4N) | {p['build_files_per_sec'][hi]} | {p['query_p95_sec'][hi]} |

* build speedup 4N/N: **{p['build_speedup']}x**
* build scaling efficiency tp(4N)/(4*tp(N)): **{p['build_scaling_efficiency']}**
* compute ceiling at the same pair (pinned register-bound spinners, no
  Spark): efficiency {p['hw_ceiling']['raw_efficiency']}
* memory-bandwidth ceiling at the same pair (pinned 256MB-working-set
  copy+reduce, zero synchronization): efficiency
  {p['hw_ceiling'].get('bw_efficiency', 'n/a')} — an index build is data
  movement (tokenize, radix sort, parquet encode), so THIS is normally
  the binding host limit; register-bound spinners cannot see it
* build efficiency normalized to the binding ceiling
  (min of the two): **{p['build_efficiency_vs_hw']}**
{amdahl}{stage_tbl}""")
    body = "\n".join(sections)
    with open(path, "w") as fh:
        fh.write(f"""# BENCH baseline — measured (two-parallelism scaling evidence)

{verdict_line}

North-rule criterion: throughput scaling efficiency >= 0.8 between N and
4N executors. No real cluster exists in this sandbox, so per the task
brief this is evidenced by the SAME job (full physical index build +
query set, `bench.py --scaling`) on the SAME input at two parallelism
levels, for each measured pair below. Methodology: every leg is pinned
to exactly N cores (taskset over the whole process tree), trials
alternate BOTH leg order (both legs get first-slot samples on this
throttling hypervisor) AND the pinned core window (offset 0 vs a high
offset — low vCPUs absorb host interrupts/steal first), and the per-leg
MIN over trials is reported. The spinner/bandwidth ceiling calibrations
alternate identically.

Input: {n_files} files of the deterministic code-like corpus
(sources/scale_corpus.py — Zipf vocabulary, values a pure function of
doc id, byte-identical at any parallelism), generated once to parquet
OUTSIDE the timed build. The driver testdata (5k docs, ~1.5 MB text) is
too small for a meaningful core-count comparison — fixed per-job
overhead dominates there.

{body}
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
        if tail:
            fh.write(tail)
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
    elif "--maintenance-curve" in sys.argv:
        from easy_solr4files_index_spark.benchmark import (
            run_maintenance_curve, write_maintenance_report)
        m = run_maintenance_curve(CPUS)
        write_maintenance_report(m)
        with open("bench_maintenance.json", "w") as fh:
            json.dump(m, fh, indent=2)
        print(json.dumps(m))
    elif "--pipeline" in sys.argv:
        from easy_solr4files_index_spark.benchmark import (
            run_pipeline, write_pipeline_report)
        p = run_pipeline(CPUS)
        write_pipeline_report(p)
        with open("bench_pipeline.json", "w") as fh:
            json.dump(p, fh, indent=2)
        print(json.dumps(p))
    elif "--corpus-curve" in sys.argv:
        from easy_solr4files_index_spark.benchmark import (
            run_corpus_curve, write_corpus_report)
        c = run_corpus_curve(CPUS)
        write_corpus_report(c)
        with open("bench_corpus_curve.json", "w") as fh:
            json.dump(c, fh, indent=2)
        print(json.dumps(c))
    else:
        print(json.dumps(run_suite(SF_DIR, CPUS)))
