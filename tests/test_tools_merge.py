"""Merge-tool invariants (tools/merge_scaling_runs.py) — pure-JSON, no
Spark: per-leg-best merging is only sound over the same input."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import merge_scaling_runs as msr  # noqa: E402


def _leg(n_files, fps, build_sec, stages=None, queries=None):
    return {"n_files": n_files, "files_per_sec": fps, "build_sec": build_sec,
            "queries": queries or {"q": 1.0}, "query_p95_sec": 1.0,
            "build_stage_sec_min": stages or {}}


def _pair(n_files, tp_lo=100.0, tp_hi=300.0):
    return {
        "n_low": 1, "n_high": 4,
        "results": {"1": _leg(n_files, tp_lo, 10.0),
                    "4": _leg(n_files, tp_hi, 4.0)},
        "hw_ceiling": {"raw_tp": {"1": 1.0, "4": 3.9},
                       "raw_efficiency": 0.975, "ceiling": 0.9},
    }


def test_merge_refuses_mixed_corpus_sizes():
    with pytest.raises(SystemExit, match="different corpus sizes"):
        msr._merge_pair(_pair(200000), _pair(400000))


def test_merge_refuses_mixed_levels():
    b = _pair(200000)
    b["n_low"], b["n_high"] = 2, 8
    with pytest.raises(SystemExit, match="share core levels"):
        msr._merge_pair(_pair(200000), b)


def test_merge_level_keeps_best_leg_and_stage_minima():
    a = _leg(200000, 120.0, 9.0, stages={"docs_store": 5.0, "postings": 3.0},
             queries={"q": 0.8})
    b = _leg(200000, 100.0, 11.0, stages={"docs_store": 4.0},
             queries={"q": 0.9, "q2": 0.5})
    out = msr._merge_level(a, b)
    assert out["files_per_sec"] == 120.0            # best throughput leg
    assert out["build_sec_trials"] == [9.0, 11.0]   # trials concatenated
    assert out["queries"] == {"q": 0.8, "q2": 0.5}  # min + passthrough
    assert out["build_stage_sec_min"] == {"docs_store": 4.0, "postings": 3.0}
