"""curate() must equal the literal composition of the standalone
oracle-gated operators — the inlined single-pass gate expressions cannot
drift from quality_scores / repetition_scores / lang_id / token_counts /
exact_dup_groups / decontaminate.
"""

import pytest
from pyspark.sql import functions as F

from easy_solr4files_index_spark.functions import contamination as C
from easy_solr4files_index_spark.functions import textstats
from easy_solr4files_index_spark.functions.curation import (CurationConfig,
                                                            curate)
from easy_solr4files_index_spark.functions.dedup import exact_dup_groups

SF = "/root/testdata/sf0.01"

CFG = CurationConfig(min_quality=0.7, min_tokens=15, max_top_bigram=0.08,
                     max_dup_trigram=0.5, langs=("en",))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _composed_ids(docs, cfg, bench):
    """The same pipeline built naively from the public per-signal ops."""
    q = textstats.quality_scores(docs).filter(
        F.col("quality") >= cfg.min_quality).select("doc_id")
    t = textstats.token_counts(docs).filter(
        F.col("n_tokens") >= cfg.min_tokens).select("doc_id")
    r = textstats.repetition_scores(docs).filter(
        (F.col("top_bigram_frac") <= cfg.max_top_bigram)
        & (F.col("dup_trigram_frac") <= cfg.max_dup_trigram)).select("doc_id")
    lang = textstats.lang_id(docs).filter(
        F.col("lang_pred").isin(*cfg.langs)).select("doc_id")
    gated = (docs.join(q, "doc_id").join(t, "doc_id")
             .join(r, "doc_id").join(lang, "doc_id"))
    winners = exact_dup_groups(gated).select(
        F.col("keep_doc_id").alias("doc_id"))
    deduped = gated.join(winners, "doc_id")
    # curate screens with exclude_self=False (bench ids are their own
    # namespace), so compose with the same flag
    bt = C.contamination_pairs(deduped, bench, n=cfg.contamination_n,
                               threshold=cfg.contamination_threshold,
                               exclude_self=False).select("doc_id").distinct()
    final = deduped.join(bt, "doc_id", "left_anti")
    return {r["doc_id"] for r in final.select("doc_id").collect()}


def test_curate_equals_composition(spark, docs):
    bench = C.snippet_bench(docs, modulus=83, k_tokens=15)
    got = {r["doc_id"] for r in
           curate(docs, CFG, bench=bench).select("doc_id").collect()}
    want = _composed_ids(docs, CFG, bench)
    assert got == want and len(got) > 0
    # the gates + screen really drop something at sf0.01
    assert len(got) < docs.count()


def test_curate_dedup_winner_deterministic(spark):
    rows = [(10, "same same text here ok"), (3, "same same text here ok"),
            (7, "unique words entirely different")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  curate(docs, CurationConfig()).collect())
    assert kept == [3, 7]  # min doc_id wins per content group


def test_curate_no_gates_keeps_all_distinct(spark):
    rows = [(1, "alpha beta"), (2, "gamma delta"), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert curate(docs, CurationConfig()).count() == 3


def test_curate_schema_preserved(spark, docs):
    out = curate(docs, CurationConfig(min_tokens=1))
    assert out.columns == docs.columns


def test_curate_span_gate_composes_and_matches_oracle(spark):
    """Opt-in substring-span gate (max_dup_span_fraction): curate drops
    gate-surviving docs whose corpus-relative duplicated-span fraction
    exceeds the cap; equals the manual composition AND the DuckDB twin
    of the whole pipeline."""
    import duckdb
    from pyspark.sql import functions as F

    from easy_solr4files_index_spark.functions import spans
    from easy_solr4files_index_spark.functions.curation import (
        CurationConfig, curate)

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    cfg = CurationConfig(min_tokens=10, max_dup_span_fraction=0.5,
                         span_w=8)
    got = curate(docs, cfg)

    # manual composition: gates-only curate, then anti-join the flagged
    base = curate(docs, CurationConfig(min_tokens=10))
    flagged = (spans.dup_span_stats(docs, w=8)
               .filter(F.col("dup_fraction") > 0.5).select("doc_id"))
    # span anti-join runs BEFORE dedup in curate; with exact_dedup the
    # winner per content hash can differ if a flagged doc was a winner —
    # compare without dedup to pin the gate itself
    cfg_nd = CurationConfig(min_tokens=10, max_dup_span_fraction=0.5,
                            span_w=8, exact_dedup=False)
    got_nd = {r["doc_id"] for r in curate(docs, cfg_nd).select("doc_id").collect()}
    want_nd = {r["doc_id"] for r in
               curate(docs, CurationConfig(min_tokens=10, exact_dedup=False))
               .join(flagged, "doc_id", "left_anti").select("doc_id").collect()}
    assert got_nd == want_nd
    assert len(got_nd) < docs.count()

    # full-pipeline SQL twin (per-repo counts), span CTE included
    from easy_solr4files_index_spark.functions.curation import (
        curate_kept_by_repo_sql)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    bench_where = "doc_id % 83 = 0"
    from easy_solr4files_index_spark.functions.contamination import (
        snippet_bench)
    bench = snippet_bench(docs, modulus=83, k_tokens=15)
    kept = curate(docs, cfg, bench=bench)
    got_counts = sorted((r["repo"], r["kept"]) for r in
                        kept.groupBy(F.col("source").alias("repo"))
                        .agg(F.count("*").alias("kept")).collect())
    exp_counts = sorted(map(tuple, con.execute(
        curate_kept_by_repo_sql(cfg, bench_where=bench_where,
                                snippet_tokens=15)).fetchall()))
    assert got_counts == exp_counts
