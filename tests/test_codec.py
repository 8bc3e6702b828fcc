"""varbyte + delta codec roundtrips (SURVEY.md §5.2.1), incl. hypothesis."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from easy_solr4files_index_spark.functions.codec import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_known_values():
    v = np.array([0, 1, 127, 128, 300, 2**21, 2**63 + 5], dtype=np.uint64)
    buf = varbyte_encode(v)
    assert varbyte_decode(buf).tolist() == v.tolist()
    # 0..127 take 1 byte, 128..16383 take 2
    assert len(varbyte_encode(np.array([127], dtype=np.uint64))) == 1
    assert len(varbyte_encode(np.array([128], dtype=np.uint64))) == 2


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0
    assert delta_encode(np.array([], dtype=np.uint64)).size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63), max_size=500))
def test_varbyte_roundtrip(xs):
    v = np.array(xs, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(v)).tolist() == v.tolist()


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_delta_roundtrip(xs):
    v = np.array(sorted(xs), dtype=np.uint64)
    assert delta_decode(delta_encode(v)).tolist() == v.tolist()


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200))
def test_postings_roundtrip_unsorted_input(ids):
    rng = np.random.default_rng(1)
    ids_arr = np.array(list(ids), dtype=np.uint64)
    rng.shuffle(ids_arr)
    tfs = rng.integers(1, 50, ids_arr.size).astype(np.uint64)
    dls = rng.integers(1, 500, ids_arr.size).astype(np.uint64)
    b_ids, b_tfs, b_dls = encode_postings(ids_arr, tfs, dls)
    d_ids, d_tfs, d_dls = decode_postings(b_ids, b_tfs, b_dls, ids_arr.size)
    order = np.argsort(ids_arr, kind="stable")
    assert d_ids.tolist() == sorted(ids)
    assert d_tfs.tolist() == tfs[order].tolist()
    assert d_dls.tolist() == dls[order].tolist()
