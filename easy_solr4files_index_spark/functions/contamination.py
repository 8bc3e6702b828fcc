"""Benchmark-contamination detection for training-data pipelines.

A 100 TB training corpus must be screened against evaluation benchmarks
before training: any document sharing a large fraction of a benchmark
item's word n-grams leaks the eval set (the standard n-gram-overlap
decontamination rule used by public LLM data pipelines — e.g. the
13-gram rule described in the GPT-3 paper, Brown et al. 2020, and the
n-gram screens in The Pile / Gopher appendices).

Scale shape (the whole point of the operator):
  * the benchmark side is SMALL (thousands of items) versus the corpus
    (billions of docs) — its distinct-shingle table is broadcast, so the
    corpus-side shingle stream joins map-side with NO corpus shuffle;
  * the only exchange is the partial-aggregated (doc_id, bench_id)
    match-count aggregate, bounded by docs-that-share-a-shingle, not by
    corpus size;
  * the corpus shingle explode pipelines inside the scan (Catalyst
    `transform`/`explode` over the token array — no Python).

Extends the reference's per-file document model (FileItem.scala:21-39)
with corpus-hygiene operators its Solr pipeline never needed; oracle
twins follow the module-wide DuckDB convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .tokenizer import tokenize_duckdb_sql, tokenize_expr


def _ngram_expr(n: int) -> F.Column:
    """DISTINCT word n-grams over the raw (unfiltered) analyzer tokens of
    column ``t`` — whole-stage-codegen array expression, no Python."""
    parts = ", ".join(f"t[i + {j}]" for j in range(n))
    return F.expr(
        f"CASE WHEN size(t) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size(t) - {n}), "
        f"i -> concat_ws(' ', {parts}))) "
        f"ELSE cast(array() as array<string>) END")


def _ngrams(docs: DataFrame, n: int, id_col: str,
            text_col: str = "text") -> DataFrame:
    toks = tokenize_expr(F.coalesce(F.col(text_col), F.lit("")), stopwords=())
    return (docs.select(F.col(id_col), toks.alias("t"))
            .select(id_col, F.explode(_ngram_expr(n)).alias("sh")))


def contamination_pairs(docs: DataFrame, bench: DataFrame, n: int = 3,
                        threshold: float = 0.5, text_col: str = "text",
                        exclude_self: bool = True) -> DataFrame:
    """(doc_id, bench_id, matched, bench_total, overlap) for every corpus
    doc covering ≥ ``threshold`` of a benchmark item's distinct n-grams.

    ``bench`` carries (bench_id, <text_col>). Both n-gram sets are
    DISTINCT, so ``overlap`` is containment of the benchmark item in the
    document: matched / |bench item's n-grams| — the decontamination
    direction (a tiny eval item fully contained in a huge doc must score
    1.0, which Jaccard would miss). ``exclude_self`` drops
    doc_id == bench_id pairs for the carve-out case where the benchmark
    is a subset of the corpus keyed by the same ids; leave it False when
    bench ids are their own namespace (e.g. eval items known to be
    snippets of specific docs)."""
    d_sh = _ngrams(docs, n, "doc_id", text_col)
    b_sh = _ngrams(bench, n, "bench_id", text_col)
    b_tot = b_sh.groupBy("bench_id").agg(F.count("*").alias("bench_total"))
    matched = d_sh.join(F.broadcast(b_sh), "sh")
    if exclude_self:
        matched = matched.filter(F.col("doc_id") != F.col("bench_id"))
    matched = (matched.groupBy("doc_id", "bench_id")
               .agg(F.count("*").alias("matched")))
    ov = F.col("matched") / F.col("bench_total")
    return (matched.join(F.broadcast(b_tot), "bench_id")
            .filter(ov >= threshold)
            .select("doc_id", "bench_id", "matched", "bench_total",
                    F.round(ov, 6).alias("overlap")))


def snippet_bench(docs: DataFrame, modulus: int = 83, k_tokens: int = 15,
                  text_col: str = "text") -> DataFrame:
    """Deterministic in-repo eval-set stand-in: every ``modulus``-th doc
    contributes its first ``k_tokens`` analyzer tokens as one benchmark
    item (the verbatim-snippet leak shape — eval items quoting web text).
    bench_id = source doc_id, so the detector must recover the source at
    overlap 1.0; no external data."""
    toks = tokenize_expr(F.coalesce(F.col(text_col), F.lit("")), stopwords=())
    return (docs.filter(F.col("doc_id") % modulus == 0)
            .select(F.col("doc_id").alias("bench_id"),
                    F.concat_ws(" ", F.slice(toks, 1, k_tokens)).alias("text")))


def decontaminate(docs: DataFrame, bench: DataFrame, n: int = 3,
                  threshold: float = 0.5, text_col: str = "text",
                  exclude_self: bool = True) -> DataFrame:
    """The corpus minus every contaminated document (left_anti against
    the detector's doc_id set) — the shippable training corpus.
    ``exclude_self`` as in contamination_pairs (False when bench ids are
    their own namespace)."""
    hits = (contamination_pairs(docs, bench, n=n, threshold=threshold,
                                text_col=text_col, exclude_self=exclude_self)
            .select("doc_id").distinct())
    return docs.join(hits, "doc_id", "left_anti")


def _ngrams_sql(n: int, source: str, id_expr: str, where: str = "TRUE") -> str:
    parts = " || ' ' || ".join(f"l[i + {j}]" for j in range(n))
    tok = tokenize_duckdb_sql("text")
    return (f"(SELECT {id_expr} AS id, "
            f"unnest(list_distinct(list_transform(range(1, len(l) - {n - 2}), "
            f"i -> {parts}))) AS sh "
            f"FROM (SELECT doc_id, list_filter({tok}, t -> t <> '') AS l "
            f"      FROM {source} WHERE {where}) "
            f"WHERE len(l) >= {n})")


def bench_sh_sql(n: int = 3, bench_where: str = "doc_id % 97 = 0",
                 snippet_tokens: int | None = None) -> str:
    """The benchmark-side distinct-shingle subquery (bench_id, sh), the
    bench carved from ``documents`` by ``bench_where``. With
    ``snippet_tokens`` the bench item is the doc's first-k-token snippet
    (the verbatim eval-leak shape); tokens roundtrip through the analyzer
    (emitted tokens contain no delimiter chars), so shingling the
    truncated token list equals re-tokenizing the joined snippet."""
    tok = tokenize_duckdb_sql("text")
    bench_l = f"l[1:{snippet_tokens}]" if snippet_tokens is not None else "l"
    parts = " || ' ' || ".join(f"bl[i + {j}]" for j in range(n))
    return f"""(
  SELECT doc_id AS bench_id,
         unnest(list_distinct(list_transform(range(1, len(bl) - {n - 2}),
                i -> {parts}))) AS sh
  FROM (SELECT doc_id, {bench_l} AS bl
        FROM (SELECT doc_id, list_filter({tok}, t -> t <> '') AS l
              FROM documents WHERE {bench_where}))
  WHERE len(bl) >= {n})"""


def contamination_pairs_sql(n: int = 3, threshold: float = 0.5,
                            bench_where: str = "doc_id % 97 = 0",
                            snippet_tokens: int | None = None,
                            exclude_self: bool = True) -> str:
    """DuckDB twin of contamination_pairs over the deterministic in-repo
    bench carve-out (see bench_sh_sql)."""
    self_where = "d.doc_id <> b.bench_id" if exclude_self else "TRUE"
    return f"""
WITH d_sh AS (SELECT id AS doc_id, sh FROM {_ngrams_sql(n, 'documents', 'doc_id')}),
b_sh AS (SELECT * FROM {bench_sh_sql(n, bench_where, snippet_tokens)}),
b_tot AS (SELECT bench_id, count(*) AS bench_total FROM b_sh GROUP BY 1),
m AS (
  SELECT d.doc_id, b.bench_id, count(*) AS matched
  FROM d_sh d JOIN b_sh b USING (sh)
  WHERE {self_where}
  GROUP BY 1, 2
)
SELECT doc_id, bench_id, matched, bench_total,
       round(matched * 1.0 / bench_total, 6) AS overlap
FROM m JOIN b_tot USING (bench_id)
WHERE matched * 1.0 / bench_total >= {threshold}
"""
