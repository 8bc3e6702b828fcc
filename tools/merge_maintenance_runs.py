"""Merge two or more `bench.py --maintenance-curve` JSON runs by per-cell
minimum and regenerate BENCH/MAINTENANCE.md.

    python tools/merge_maintenance_runs.py run1.json run2.json ...

Why: this VM's throughput swings >2x between windows (see the memory
note in BENCH/BASELINE.md); a single-shot curve can show a 50k-doc
corpus "slower" than a 200k one purely because its leg ran in a bad
window. Min over independent full runs is the same discipline the
scaling bench uses (min-of-interleaved-trials).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIMES = ("build_sec", "upsert_sec", "delete_sec", "compact_sec")


def _min_into(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict):
            _min_into(dst.setdefault(k, {}), v)
        elif k in TIMES:
            dst[k] = round(min(dst.get(k, v), v), 3)
        else:
            dst.setdefault(k, v)


def main() -> None:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    if len(runs) < 2:
        raise SystemExit("need >= 2 run JSONs to merge")
    merged: dict = {}
    for r in runs:
        _min_into(merged, r)
    merged["trials"] = len(runs)
    # JSON round-trip stringifies the int keys write_maintenance_report
    # sorts on — restore them (lexicographic would put 50000 after 200000)
    merged["sizes"] = {int(k): v for k, v in merged["sizes"].items()}
    for e in merged["sizes"].values():
        if "bags" in e:
            e["bags"] = {int(k): v for k, v in e["bags"].items()}
    # derived ratios recomputed from the merged minima
    for n, e in merged["sizes"].items():
        fps = int(n) / e["build_sec"]
        e["files_per_sec"] = round(fps, 1)
        for b in list(e.get("bags", {}).values()) + [e["fixed_bag"]]:
            b["upsert_vs_full_build"] = round(b["upsert_sec"] / e["build_sec"], 3)

    from easy_solr4files_index_spark.benchmark import write_maintenance_report
    write_maintenance_report(merged)
    with open("bench_maintenance.json", "w") as fh:
        json.dump(merged, fh, indent=2)
    print(json.dumps(merged))


if __name__ == "__main__":
    main()
