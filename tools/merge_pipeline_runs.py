"""Merge bench_pipeline.json runs per-best (VM timings are 2-10x noisy;
min-of-runs per timing key, derived throughputs recomputed).

    python tools/merge_pipeline_runs.py run1.json run2.json [...]
    # rewrites bench_pipeline.json + BENCH/PIPELINE.md

Invariants: every run must describe the same workload (n_docs, dim,
n_queries); count/recall keys must agree — a mismatch means the runs are
not comparable and the merge refuses.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WORKLOAD = ("n_docs", "n_vecs", "dim", "n_queries")
# counts must be identical across runs; recalls may differ only because a
# *different-dial* run slipped in — treat a mismatch as an error too
_EXACT = ("dedup_docs", "dedup_dropped", "contamination_hits", "curate_kept",
          "ivf_search_rows", "ivfpq_search_rows", "pq_batch_rerank_rows",
          "ivfpq_batch_rows", "ivfpq_res_search_rows", "ivfpq_res_batch_rows",
          "spans_docs_flagged")


def merge(runs: list[dict]) -> dict:
    base = runs[0]
    for r in runs[1:]:
        for k in _WORKLOAD:
            if r.get(k) != base.get(k):
                raise SystemExit(f"refusing to merge: {k} differs "
                                 f"({base.get(k)} vs {r.get(k)})")
    # exact-count keys must agree across ALL runs that carry them — a
    # pairwise-vs-base check would let two later runs conflict silently
    # when the base predates the key (ADVICE r4)
    for k in _EXACT:
        vals = {r[k] for r in runs if k in r}
        if len(vals) > 1:
            raise SystemExit(f"refusing to merge: result {k} differs {vals}")
    out = dict(base)
    for r in runs[1:]:
        for k, v in r.items():
            if k.endswith("_sec") and isinstance(v, (int, float)):
                out[k] = min(v, out[k]) if k in out else v
            elif k not in out:
                out[k] = v
    n_docs, n_q = out["dedup_docs"], out["n_queries"]
    out["dedup_docs_per_sec"] = round(n_docs / out["dedup_apply_sec"], 1)
    for base_k, qps_k in [("ivf_search", "ivf_search_qps"),
                          ("ivfpq_search", "ivfpq_search_qps"),
                          ("ivfpq_hq_search", "ivfpq_hq_qps"),
                          ("pq_batch_rerank", "pq_batch_qps"),
                          ("ivfpq_batch", "ivfpq_batch_qps"),
                          ("ivfpq_res_search", "ivfpq_res_qps"),
                          ("ivfpq_res_batch", "ivfpq_res_batch_qps"),
                          ("ivfpq_res_hq", "ivfpq_res_hq_qps")]:
        sk = base_k + "_sec"
        if sk in out:
            out[qps_k] = round(n_q / out[sk], 1)
    for base_k, dps_k in [("contamination", "contamination_docs_per_sec"),
                          ("repetition", "repetition_docs_per_sec"),
                          ("profile", "profile_docs_per_sec"),
                          ("curate", "curate_docs_per_sec"),
                          ("spans", "spans_docs_per_sec"),
                          ("spans_xx64", "spans_xx64_docs_per_sec")]:
        sk = base_k + "_sec"
        if sk in out:
            out[dps_k] = round(n_docs / out[sk], 1)
    if "ivfpq_append_10k_sec" in out:
        out["ivfpq_append_vs_build"] = round(
            out["ivfpq_append_10k_sec"] / out["ivfpq_build_sec"], 3)
    return out


def main(paths: list[str]) -> None:
    runs = [json.load(open(p)) for p in paths]
    merged = merge(runs)
    with open("bench_pipeline.json", "w") as fh:
        json.dump(merged, fh, indent=2)
    from easy_solr4files_index_spark.benchmark import write_pipeline_report
    write_pipeline_report(merged)
    print(json.dumps({k: merged[k] for k in sorted(merged)
                      if k.endswith("_sec")}))


if __name__ == "__main__":
    main(sys.argv[1:])
