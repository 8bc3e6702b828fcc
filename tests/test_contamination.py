"""Benchmark-contamination detector + repetition quality signals.

The driver-gated entries (pipe_contamination, ts_repetition) cover the
hash-exact oracle parity at sf0.01; these tests pin the SEMANTICS on
adversarial inline corpora: containment direction, self-exclusion,
short/empty docs, decontaminate anti-join, and the sorted-run
top-bigram fold against a brute-force Python count.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from easy_solr4files_index_spark.functions import contamination as C
from easy_solr4files_index_spark.functions import textstats
from easy_solr4files_index_spark.functions.tokenizer import tokenize_py


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BENCH_ITEM = "alpha bravo charlie delta echo"


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(spark, [
        # contains the full bench item verbatim inside a larger doc
        (0, "intro words alpha bravo charlie delta echo closing words"),
        # contains most of it (2 of 3 trigrams)
        (1, "alpha bravo charlie delta foxtrot"),
        # unrelated
        (2, "golf hotel india juliet kilo lima"),
        # too short for any trigram
        (3, "alpha bravo"),
        # empty / null-ish
        (4, ""),
    ])


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame([(100, BENCH_ITEM)], "bench_id long, text string")


def test_containment_direction(spark, corpus, bench):
    """A tiny eval item fully inside a huge doc scores 1.0 (containment,
    not Jaccard — Jaccard of doc 0 vs the item is 3/8)."""
    rows = {r["doc_id"]: r for r in
            C.contamination_pairs(corpus, bench, n=3, threshold=0.0).collect()}
    assert rows[0]["overlap"] == 1.0 and rows[0]["bench_total"] == 3
    assert rows[1]["matched"] == 2
    assert rows[1]["overlap"] == round(2 / 3, 6)  # column is round(·, 6)
    assert 2 not in rows and 3 not in rows and 4 not in rows


def test_threshold_cut(spark, corpus, bench):
    hits = C.contamination_pairs(corpus, bench, n=3, threshold=0.9).collect()
    assert [r["doc_id"] for r in hits] == [0]


def test_exclude_self(spark, corpus):
    """Carve-out benches (same id namespace) drop the identity pair but
    keep true cross-doc leaks."""
    carve = corpus.filter(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("bench_id"), "text")
    with_self = C.contamination_pairs(corpus, carve, n=3, threshold=0.0,
                                      exclude_self=False).collect()
    no_self = C.contamination_pairs(corpus, carve, n=3, threshold=0.0,
                                    exclude_self=True).collect()
    assert 0 in {r["doc_id"] for r in with_self}
    assert 0 not in {r["doc_id"] for r in no_self}
    # doc 1 shares trigrams with doc 0's text either way
    assert 1 in {r["doc_id"] for r in no_self}


def test_decontaminate(spark, corpus, bench):
    kept = sorted(r["doc_id"] for r in
                  C.decontaminate(corpus, bench, n=3, threshold=0.5).collect())
    assert kept == [1, 2, 3, 4] or kept == [2, 3, 4]
    # at threshold 0.5 doc 1 (overlap 2/3) is contaminated too
    assert kept == [2, 3, 4]


def test_snippet_bench_roundtrip(spark, corpus):
    """Snippet text re-tokenizes to exactly the first k tokens."""
    b = C.snippet_bench(corpus, modulus=1, k_tokens=3).collect()
    by_id = {r["bench_id"]: r["text"] for r in b}
    assert by_id[0] == "intro words alpha"
    assert tokenize_py(by_id[0], ()) == ["intro", "words", "alpha"]
    assert by_id[4] == ""


def test_repetition_against_bruteforce(spark):
    docs = _docs(spark, [
        (0, "a b a b a b c"),          # heavy bigram repetition
        (1, "x y z x y z x y z"),      # templated trigrams
        (2, "one two three four"),     # no repeats
        (3, "solo"),                   # no bigrams
        (4, ""),                       # empty
    ])
    got = {r["doc_id"]: r for r in
           textstats.repetition_scores(docs).collect()}
    for row in docs.collect():
        toks = tokenize_py(row["text"] or "", ())
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        tgs = [f"{a} {b} {c}" for a, b, c in zip(toks, toks[1:], toks[2:])]
        r = got[row["doc_id"]]
        assert r["n_bigrams"] == len(bgs)
        top = max(Counter(bgs).values()) / len(bgs) if bgs else 0.0
        dup = 1 - len(set(tgs)) / len(tgs) if tgs else 0.0
        assert abs(r["top_bigram_frac"] - round(top, 6)) < 1e-9, row
        assert abs(r["dup_trigram_frac"] - round(dup, 6)) < 1e-9, row
