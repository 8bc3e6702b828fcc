"""Merge two or more `bench.py --scaling` JSON runs by per-leg best and
regenerate BENCH/BASELINE.md + bench_scaling.json.

    python tools/merge_scaling_runs.py run1.json run2.json ...

Why: this VM's throughput swings >2x between ten-minute windows
(co-tenant contention). Within one harness run the legs already
alternate order and placement and keep the per-leg min-of-trials;
merging N independent runs is the SAME discipline with more trials —
each leg's best (least-contended) sample across every run and placement.
The hardware ceilings merge the same way (per-level max spinner/stream
throughput), and the normalized-efficiency window-consistency check
(normalized <= 1) still guards against combining calibration and build
samples that no shared window could have produced.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _merge_level(a: dict, b: dict) -> dict:
    """Per-leg merge of run_scale_worker results: best build throughput,
    per-query min, concatenated trial lists."""
    best = a if a["files_per_sec"] >= b["files_per_sec"] else b
    out = dict(best)
    out["build_sec_trials"] = (a.get("build_sec_trials", [a["build_sec"]])
                               + b.get("build_sec_trials", [b["build_sec"]]))
    # query sets may drift between rounds (e.g. s6_phrase added in r4):
    # min where both runs measured a query, passthrough where only one did
    out["queries"] = {
        q: round(min(t for t in (a["queries"].get(q), b["queries"].get(q))
                     if t is not None), 3)
        for q in {**a["queries"], **b["queries"]}}
    out["query_p95_sec"] = round(min(a["query_p95_sec"], b["query_p95_sec"]), 3)
    # per-stage minima (round-4 field): min where both runs carry the
    # stage, passthrough where only one does (older runs have none)
    sa, sb = a.get("build_stage_sec_min") or {}, b.get("build_stage_sec_min") or {}
    if sa or sb:
        out["build_stage_sec_min"] = {
            s: round(min(t for t in (sa.get(s), sb.get(s)) if t is not None), 3)
            for s in {**sa, **sb}}
    return out


def _merge_ceiling(a: dict, b: dict, n_low: int, n_high: int) -> dict:
    lo, hi = str(n_low), str(n_high)
    ratio = n_high / n_low
    out = {}
    for key, eff_key, spd in (("raw_tp", "raw_efficiency", "raw_speedup"),
                              ("bw_tp", "bw_efficiency", None)):
        # older-format runs (rounds 1-2) carry no bw_tp leg: the ceiling
        # then degrades to the spinner leg alone instead of a KeyError
        if key not in a or key not in b:
            continue
        tl = max(a[key][lo], b[key][lo])
        th = max(a[key][hi], b[key][hi])
        out[key] = {lo: round(tl, 2), hi: round(th, 2)}
        out[eff_key] = round(th / (tl * ratio), 3)
        if spd:
            out[spd] = round(th / tl, 3)
    effs = [out[k] for k in ("raw_efficiency", "bw_efficiency") if k in out]
    out["ceiling"] = min(effs) if effs else None
    return out


def _merge_pair(a: dict, b: dict) -> dict:
    n_low, n_high = a["n_low"], a["n_high"]
    if (b["n_low"], b["n_high"]) != (n_low, n_high):
        raise SystemExit(
            f"cannot merge pair {n_low}->{n_high} with {b['n_low']}->"
            f"{b['n_high']}: runs under one label must share core levels")
    # per-leg-best across runs is only meaningful over the SAME input:
    # mixing corpus sizes (SPARK_GRAFT_SCALE_DOCS) would ratio legs of
    # different jobs
    na = a["results"][str(n_low)].get("n_files")
    nb = b["results"][str(n_low)].get("n_files")
    if na is not None and nb is not None and na != nb:
        raise SystemExit(
            f"cannot merge runs over different corpus sizes "
            f"({na} vs {nb} files): rerun with matching "
            f"SPARK_GRAFT_SCALE_DOCS")
    lo, hi = str(n_low), str(n_high)
    results = {lvl: _merge_level(a["results"][lvl], b["results"][lvl])
               for lvl in (lo, hi)}
    tp_low = results[lo]["files_per_sec"]
    tp_high = results[hi]["files_per_sec"]
    eff = tp_high / (tp_low * (n_high / n_low))
    calib = _merge_ceiling(a["hw_ceiling"], b["hw_ceiling"], n_low, n_high)
    norm = round(eff / calib["ceiling"], 3) if calib.get("ceiling") else None
    ratio = n_high / n_low
    slo = results[lo].get("build_stage_sec_min") or {}
    shi = results[hi].get("build_stage_sec_min") or {}
    stage_eff = {s: round(slo[s] / (ratio * shi[s]), 3)
                 for s in slo if shi.get(s, 0) > 0}
    return {
        "n_low": n_low, "n_high": n_high,
        "build_files_per_sec": {lo: tp_low, hi: tp_high},
        "build_speedup": round(tp_high / tp_low, 3),
        "build_scaling_efficiency": round(eff, 3),
        "build_stage_efficiency": stage_eff,
        "hw_ceiling": calib,
        "build_efficiency_vs_hw": norm,
        "calibration_window_consistent": norm is None or norm <= 1.0,
        "query_p95_sec": {lo: results[lo]["query_p95_sec"],
                          hi: results[hi]["query_p95_sec"]},
        "results": results,
    }


def main(paths: list[str]) -> None:
    runs = [json.load(open(p)) for p in paths]
    pairs: dict[str, dict] = {}
    for r in runs:
        for label, p in (r.get("pairs")
                         or {f"{r['n_low']}->{r['n_high']}": r}).items():
            pairs[label] = _merge_pair(pairs[label], p) if label in pairs else p
    primary = runs[0].get("primary") or next(iter(pairs))
    merged = dict(pairs[primary])
    merged["sf"] = runs[0].get("sf")
    merged["primary"] = primary
    merged["pairs"] = pairs
    merged["merged_from_runs"] = len(runs)

    from bench import write_scaling_report
    write_scaling_report(merged)
    for label, p in pairs.items():
        print(label, "eff:", p["build_scaling_efficiency"],
              "norm:", p["build_efficiency_vs_hw"],
              "window_ok:", p["calibration_window_consistent"])


if __name__ == "__main__":
    main(sys.argv[1:])
