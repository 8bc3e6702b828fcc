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


# ------------------------------------------------- pipeline-run merging

from tools import merge_pipeline_runs as mpr  # noqa: E402


def _prun(**over):
    base = {"cpus": 32, "n_docs": 200000, "n_vecs": 200000, "dim": 32,
            "n_queries": 100, "search_reps": 2,
            "dedup_apply_sec": 50.0, "dedup_docs": 204000,
            "dedup_dropped": 4000, "dedup_docs_per_sec": 4080.0,
            "contamination_sec": 24.0, "contamination_hits": 225,
            "repetition_sec": 11.6, "curate_sec": 43.2,
            "curate_kept": 197184,
            "ivf_build_sec": 18.0, "ivf_search_sec": 2.4,
            "ivf_search_rows": 1000, "ivf_search_qps": 41.7,
            "ivfpq_build_sec": 27.0, "ivfpq_search_sec": 2.1,
            "ivfpq_search_rows": 1000,
            "pq_batch_rerank_sec": 1.3, "pq_batch_rerank_rows": 1000,
            "ivfpq_batch_sec": 1.5, "ivfpq_batch_rows": 1000,
            "ivfpq_append_10k_sec": 10.7}
    base.update(over)
    return base


def test_pipeline_merge_takes_min_sec_and_recomputes_derived():
    out = mpr.merge([_prun(), _prun(dedup_apply_sec=75.2, curate_sec=39.0,
                                    ivf_search_sec=2.0)])
    assert out["dedup_apply_sec"] == 50.0
    assert out["curate_sec"] == 39.0
    assert out["ivf_search_sec"] == 2.0
    assert out["ivf_search_qps"] == round(100 / 2.0, 1)
    assert out["dedup_docs_per_sec"] == round(204000 / 50.0, 1)
    assert out["curate_docs_per_sec"] == round(204000 / 39.0, 1)
    assert out["ivfpq_append_vs_build"] == round(10.7 / 27.0, 3)


def test_pipeline_merge_refuses_different_workload():
    with pytest.raises(SystemExit, match="n_docs differs"):
        mpr.merge([_prun(), _prun(n_docs=400000)])


def test_pipeline_merge_refuses_result_mismatch():
    with pytest.raises(SystemExit, match="curate_kept"):
        mpr.merge([_prun(), _prun(curate_kept=1)])


def test_pipeline_merge_passes_through_new_keys():
    old = _prun()
    del old["curate_sec"], old["curate_kept"]
    out = mpr.merge([old, _prun()])
    assert out["curate_sec"] == 43.2  # newer run contributes the new row
