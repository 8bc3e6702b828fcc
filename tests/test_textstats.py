"""Golden cases for the BPE-ish token counter (the training-data token
budget estimator) — semantics plus Java-regex/RE2 agreement on the
exact strings that exercise each branch of the pattern."""

from __future__ import annotations

import duckdb

from easy_solr4files_index_spark.functions import textstats as ts

# (text, expected BPE-ish piece count)
CASES = [
    ("hello world", 2),          # two letter runs, space absorbed
    ("don't stop", 3),           # don | 't | _stop
    ("I'll go", 3),              # I | 'll | _go
    ("a1b2", 4),                 # letter/digit alternation splits
    ("3.14 costs $5!", 7),       # 3 | . | 14 | _costs | _$ | 5 | !
    ("café über", 2),            # \p{L} covers non-ASCII letters
    ("", 0),
    ("   ", 0),                  # whitespace never counts
]


def test_bpe_golden(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "doc_id long, text string")
    got = {r["doc_id"]: r["n_bpe"]
           for r in ts.token_counts(df).collect()}
    for i, (t, want) in enumerate(CASES):
        assert got[i] == want, f"{t!r}: got {got[i]}, want {want}"


def test_bpe_engines_agree():
    con = duckdb.connect()
    for t, want in CASES:
        pat = ts._BPE_RE.replace("'", "''")
        lit = t.replace("'", "''")
        n = con.execute(
            f"SELECT len(regexp_extract_all('{lit}', '{pat}'))").fetchone()[0]
        assert n == want, f"duckdb {t!r}: got {n}, want {want}"


def test_text_profile_matches_individual_ops(spark):
    """The fused one-pass profile is column-identical to the four
    standalone operators, including empty/short docs."""
    from easy_solr4files_index_spark.functions.textstats import (
        lang_id, quality_scores, repetition_scores, text_profile, token_counts)

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, "der die das und ist the spark join"),
         (1, "a b a b a b"), (2, ""), (3, None), (4, "solo")],
        "doc_id long, text string").withColumn("lang", F.lit("xx"))
    prof = {r["doc_id"]: r.asDict() for r in text_profile(docs).collect()}
    for op, cols in [(token_counts, ("n_tokens", "n_ws", "n_bpe")),
                     (quality_scores, ("n_chars", "alpha_ratio",
                                       "stop_ratio", "quality")),
                     (repetition_scores, ("n_bigrams", "top_bigram_frac",
                                          "dup_trigram_frac")),
                     (lang_id, ("lang_pred",))]:
        for r in op(docs).collect():
            for c in cols:
                assert prof[r["doc_id"]][c] == r[c], (r["doc_id"], c)
