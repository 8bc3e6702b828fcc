"""Merge two or more `bench.py --corpus-curve` JSON runs by per-cell
best and regenerate BENCH/CORPUS.md + bench_corpus_curve.json.

    python tools/merge_corpus_runs.py run1.json run2.json ...

Same discipline as the scaling/maintenance merges (see the memory note
in BENCH/BASELINE.md): this VM swings >2x between contention windows, so
each cell keeps its least-contended observation — min build_sec (and the
files_per_sec recomputed from it), per-query min, trial lists
concatenated. index_bytes/bytes_per_doc are deterministic (byte-identical
builds) and just sanity-checked for agreement.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _merge_cell(n: int, a: dict, b: dict) -> dict:
    out = dict(a if a["build_sec"] <= b["build_sec"] else b)
    out["build_sec_trials"] = (a.get("build_sec_trials", [a["build_sec"]])
                               + b.get("build_sec_trials", [b["build_sec"]]))
    out["build_sec"] = min(a["build_sec"], b["build_sec"])
    out["files_per_sec"] = round(n / out["build_sec"], 1)
    # query sets may drift between rounds (s6_phrase added in r4):
    # min where both runs measured a query, passthrough where only one did
    out["queries"] = {
        q: round(min(t for t in (a["queries"].get(q), b["queries"].get(q))
                     if t is not None), 3)
        for q in {**a["queries"], **b["queries"]}}
    out["query_worst_sec"] = max(out["queries"].values())
    if a.get("index_bytes") != b.get("index_bytes"):
        print(f"WARNING: index_bytes disagree at n={n}: "
              f"{a.get('index_bytes')} vs {b.get('index_bytes')} "
              "(builds should be byte-deterministic)", file=sys.stderr)
    return out


def main(paths: list[str]) -> None:
    runs = [json.load(open(p)) for p in paths]
    merged = dict(runs[0])
    merged["sizes"] = {int(k): v for k, v in runs[0]["sizes"].items()}
    for r in runs[1:]:
        for k, cell in r["sizes"].items():
            n = int(k)
            merged["sizes"][n] = (_merge_cell(n, merged["sizes"][n], cell)
                                  if n in merged["sizes"] else cell)
    merged["merged_from_runs"] = len(runs)

    from easy_solr4files_index_spark.benchmark import write_corpus_report
    write_corpus_report(merged)
    with open("bench_corpus_curve.json", "w") as fh:
        json.dump(merged, fh, indent=2)
    for n in sorted(merged["sizes"]):
        e = merged["sizes"][n]
        print(n, "build", e["build_sec"], "f/s", e["files_per_sec"],
              "worst-q", e["query_worst_sec"])


if __name__ == "__main__":
    main(sys.argv[1:])
