"""Property-based kernels tests (SURVEY.md §5.2.4) — no Spark session:
codec roundtrips over adversarial integer distributions, tokenizer spec
agreement between the pure-Python reference chain and the DuckDB oracle
chain (the two independent implementations the correctness gate leans
on), and XXH64 known-answer vectors.
"""

import duckdb
import numpy as np
from hypothesis import given, settings, strategies as st

from easy_solr4files_index_spark.functions.codec import (
    decode_postings, delta_decode, delta_encode, encode_postings,
    varbyte_decode, varbyte_encode)
from easy_solr4files_index_spark.functions.tokenizer import (
    LUCENE_STOPWORDS, stopword_not_in_sql, tokenize_duckdb_sql, tokenize_py)
from easy_solr4files_index_spark.functions.xxhash import xxhash64


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr), len(vals)), arr)


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_sorted(vals):
    arr = np.sort(np.array(vals, dtype=np.uint64))
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**12),   # doc_id
              st.integers(min_value=1, max_value=10**4),    # tf
              st.integers(min_value=0, max_value=10**6)),   # dl
    min_size=1, max_size=200, unique_by=lambda t: t[0]))
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip_unsorted_input(triples):
    ids = np.array([t[0] for t in triples], dtype=np.uint64)
    tfs = np.array([t[1] for t in triples], dtype=np.uint64)
    dls = np.array([t[2] for t in triples], dtype=np.uint64)
    bi, bt, bd = encode_postings(ids, tfs, dls)
    out_ids, out_tfs, out_dls = decode_postings(bi, bt, bd, len(triples))
    order = np.argsort(ids, kind="stable")
    assert np.array_equal(out_ids, ids[order])       # docID-sorted invariant
    assert np.array_equal(out_tfs, tfs[order])
    assert np.array_equal(out_dls, dls[order])
    assert np.all(np.diff(out_ids.astype(np.int64)) > 0)


# Spec input domain: printable ASCII + Latin-1 letters. Excluded above
# U+00FF: characters with multi-char or locale-ish lowercase mappings
# (e.g. U+0130 İ) lower() differently across Python/DuckDB/JVM; the
# tokenizer spec treats non-[a-z0-9] as delimiters, so only chars whose
# lowercase lands in ASCII alnum can affect tokens, and those agree.
_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0xFF,
                           blacklist_categories=("Cs", "Cc")),
    max_size=200)


@given(_text)
@settings(max_examples=150, deadline=None)
def test_tokenizer_python_vs_duckdb(s):
    con = duckdb.connect()
    expr = tokenize_duckdb_sql("?")
    rows = con.execute(
        f"SELECT term FROM (SELECT unnest({expr}) AS term) "
        f"WHERE {stopword_not_in_sql(LUCENE_STOPWORDS)}", [s]).fetchall()
    assert [r[0] for r in rows] == tokenize_py(s)


def test_xxhash64_known_vectors():
    # canonical XXH64 vectors (public reference implementation, seed 0)
    assert xxhash64(b"", seed=0) == _signed(0xEF46DB3751D8E999)
    assert xxhash64(b"xxhash", seed=0) == _signed(0x32DD38952C4BC720)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def test_dense_expected_matches_bruteforce():
    """Closed forms behind the docID-density tripwire (postings.py):
    sum(i % M) and xor(i) over the dense series 0..n-1, including the
    M-boundary crossings where the quotient/remainder split matters."""
    from easy_solr4files_index_spark.operators.postings import (
        _DENSITY_MOD as M, _dense_expected)
    for n in [0, 1, 2, 5, 1000, M - 1, M, M + 3, 2 * M + 7]:
        summod = sum(i % M for i in range(n))
        xor = 0
        for i in range(n):
            xor ^= i
        assert _dense_expected(n) == (summod, xor), n


def test_dense_expected_fits_int64_at_design_scale():
    """The tripwire must not itself overflow at the module's stated
    10^12-doc design scale (the exact sum n(n-1)/2 it replaced overflows
    int64 past ~4.3e9 docs — ANSI mode would throw mid-write)."""
    from easy_solr4files_index_spark.operators.postings import _dense_expected
    summod, xor = _dense_expected(10**12)
    assert 0 <= summod < 2**63 and 0 <= xor < 2**63


@given(st.lists(st.tuples(*[st.text(alphabet=st.characters(
    blacklist_characters="\x00\x01"), max_size=6)] * 3),
    min_size=2, max_size=30))
@settings(max_examples=300, deadline=None)
def test_sep_joined_key_order_equals_tuple_order(keys):
    """The Arrow searchsorted fallback in docids._bucket_expr compares
    separator-joined concatenated keys while the within-bucket sort
    compares component tuples — the two orders must agree for every key
    set the fallback accepts (components with code points <= the
    separator are rejected at runtime; see _BELOW_SEP), including
    prefix-adversarial components."""
    from easy_solr4files_index_spark.operators.docids import _SEP
    by_tuple = sorted(keys)
    by_concat = sorted(keys, key=lambda t: _SEP.join(t))
    assert by_tuple == by_concat


def test_pandas_scalar_concat_strips_nul():
    """Documents WHY docids._SEP cannot be NUL on this stack: numpy's
    unicode scalar conversion NUL-terminates, so pandas broadcast concat
    silently drops "\\x00" — an order guarantee built on a NUL separator
    would break invisibly. If this ever starts preserving NUL, the
    separator can move to \\x00 and the _BELOW_SEP guard can relax."""
    import pandas as pd
    assert (pd.Series(["a"]) + "\x00" + pd.Series(["b"])).iloc[0] == "ab"


# ------------------------- repetition fold (textstats/curation _max_run)

def test_max_run_fold_equals_counter_max(spark):
    """The sorted-array longest-equal-run fold == the most frequent
    element's count, over 300 seeded-random duplicate structures
    (incl. empty and all-equal) evaluated in ONE Spark job."""
    import random
    from collections import Counter

    from pyspark.sql import functions as F

    from easy_solr4files_index_spark.functions.curation import _max_run

    rng = random.Random(42)
    cases = [[]] + [["x"] * 7] + [
        [rng.choice("abcd") for _ in range(rng.randrange(0, 40))]
        for _ in range(300)]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, arr array<string>")
    got = {r["i"]: r["m"] for r in
           df.select("i", _max_run(F.col("arr")).alias("m")).collect()}
    for i, c in enumerate(cases):
        want = max(Counter(c).values()) if c else 0
        assert got[i] == want, (i, c)
