"""Substring-level (repeated-span) deduplication — the training-data
operator doc-level exact/MinHash dedup cannot express (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better": remove long
token spans that occur more than once in the corpus, e.g. cross-document
boilerplate, licenses, navigation chrome).

Semantics: a *duplicate w-gram* is a w-token window whose token string
occurs ≥ ``min_count`` times corpus-wide (Lee et al.'s rule; with
``cross_doc=True`` the bar is "in ≥ 2 distinct documents" instead, which
ignores within-doc repetition). A *duplicate span* of a document is a
maximal token interval covered by overlapping/adjacent duplicate
w-grams — exactly the union of their [pos, pos+w) coverages.

Spark shape (bucketed — NEVER all-pairs, no corpus-scale collect):
  1. gram stream: one Catalyst pass per doc emits (doc_id, pos, gh)
     where gh is the 56-bit md5 hash of the w-gram string (the same
     MD5INT used by sampling/textstats, so the DuckDB oracle reproduces
     it bit-for-bit). `transform` + `explode` — whole-stage codegen, no
     Python; the CASE guard keeps the token array single-evaluated
     (Project-over-Project, the safe shape for the filter-pushdown
     multi-eval pitfall documented in functions/curation.py).
  2. duplicate-gram keys: ONE partial-aggregated groupBy(gh) — for the
     cross-doc rule df≥2 is decided by min(doc_id) ≠ max(doc_id) (a
     map-side-combinable pair of aggregates, NOT a countDistinct).
  3. anchor positions: left_semi join of the gram stream against the
     duplicate keys — hash equi-join on gh; a pathological hot gram
     (global boilerplate) skews like a hot term and is handled by AQE
     skew-join splitting, same as the text index's hot-term story.
  4. interval merge: one window per doc ordered by pos (shuffle keyed
     doc_id, skew bounded by document length): a new span starts when
     pos > prev_pos + w; span_id = running sum of the flag; spans are
     the (min pos, max pos + w) per (doc_id, span_id) group.

The corpus is scanned twice (once for the gram aggregate, once for the
anchor join) — the standard two-pass trade against collect_list-per-gram
skew; at 100 TB the gram stream would be persisted between the passes.

Reference note: DANS-KNAW/easy-solr4files-index has no dedup surface at
all; this operator comes from the training-data-pipeline brief (like the
rest of functions/dedup.py, whose doc-level operators it complements at
sub-document granularity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .textstats import MD5INT_DUCK, MD5INT_SPARK
from .tokenizer import tokenize_duckdb_sql, tokenize_expr


def _grams_with_pos(docs: DataFrame, w: int, text_col: str = "text",
                    id_col: str = "doc_id",
                    hasher: str = "md5") -> DataFrame:
    """(doc_id, pos, gh): every w-gram start position (0-based token
    index) with the gram string's hash. One codegen pass.

    ``hasher``: "md5" (default) is the 56-bit md5 int the DuckDB oracle
    reproduces bit-for-bit — the correctness-gated mode; "xx64" swaps in
    Spark's native 64-bit xxhash64 (the pure-Spark production dial —
    semantics are hash-invariant modulo collisions, and the 64-bit space
    makes a collision at any realistic gram count negligible). Measured
    ~10% end-to-end at 204k docs (BENCH/PIPELINE.md): the gram-string
    concat + explode + the two exchanges dominate, not the hash."""
    toks = tokenize_expr(F.coalesce(F.col(text_col), F.lit("")),
                         stopwords=())
    grams = F.expr(
        f"CASE WHEN size(t) >= {w} THEN "
        f"transform(sequence(0, size(t) - {w}), "
        f"i -> struct(i AS pos, concat_ws(' ', slice(t, i + 1, {w})) AS g)) "
        f"ELSE CAST(array() AS array<struct<pos:int,g:string>>) END")
    gh = (F.expr(MD5INT_SPARK.format(x="x.g")) if hasher == "md5"
          else F.xxhash64(F.col("x.g")))
    return (docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
            .select("doc_id", F.explode(grams).alias("x"))
            .select("doc_id", F.col("x.pos").alias("pos"),
                    gh.alias("gh")))


def dup_span_intervals(docs: DataFrame, w: int = 15, min_count: int = 2,
                       cross_doc: bool = False, text_col: str = "text",
                       id_col: str = "doc_id",
                       hasher: str = "md5") -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens): maximal duplicated
    token intervals per document (span_end exclusive). See module
    docstring for the rule and the at-scale plan shape."""
    grams = _grams_with_pos(docs, w, text_col, id_col, hasher)
    agg = grams.groupBy("gh").agg(F.count("*").alias("cnt"),
                                  F.min("doc_id").alias("mn"),
                                  F.max("doc_id").alias("mx"))
    dup = agg.filter((F.col("mn") != F.col("mx")) if cross_doc
                     else (F.col("cnt") >= min_count)).select("gh")
    anchors = grams.join(dup, "gh", "left_semi")

    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    new_span = F.coalesce(
        (F.col("pos") > F.lag("pos").over(w_ord) + w).cast("int"), F.lit(1))
    sid = F.sum(new_span).over(w_ord)
    return (anchors.withColumn("sid", sid)
            .groupBy("doc_id", "sid")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + w).alias("span_end"))
            .select("doc_id",
                    F.col("span_start").cast("long"),
                    F.col("span_end").cast("long"),
                    (F.col("span_end") - F.col("span_start"))
                    .cast("long").alias("span_tokens")))


def dup_span_stats(docs: DataFrame, w: int = 15, min_count: int = 2,
                   cross_doc: bool = False, text_col: str = "text",
                   id_col: str = "doc_id", hasher: str = "md5") -> DataFrame:
    """Per-document summary (doc_id, total_tokens, n_spans, dup_tokens,
    dup_fraction) — every doc appears (0 spans for clean docs); the
    curation gate composes on dup_fraction."""
    spans = dup_span_intervals(docs, w, min_count, cross_doc,
                               text_col, id_col, hasher)
    per = (spans.groupBy("doc_id")
           .agg(F.count("*").alias("n_spans"),
                F.sum("span_tokens").alias("dup_tokens")))
    toks = tokenize_expr(F.coalesce(F.col(text_col), F.lit("")),
                         stopwords=())
    totals = docs.select(F.col(id_col).alias("doc_id"),
                         F.size(toks).cast("long").alias("total_tokens"))
    return (totals.join(per, "doc_id", "left")
            .select("doc_id", "total_tokens",
                    F.coalesce("n_spans", F.lit(0)).cast("long")
                    .alias("n_spans"),
                    F.coalesce("dup_tokens", F.lit(0)).cast("long")
                    .alias("dup_tokens"),
                    F.round(F.coalesce("dup_tokens", F.lit(0))
                            / F.greatest("total_tokens", F.lit(1)), 6)
                    .alias("dup_fraction")))


def strip_dup_spans(docs: DataFrame, w: int = 15, min_count: int = 2,
                    cross_doc: bool = False, text_col: str = "text",
                    id_col: str = "doc_id", hasher: str = "md5") -> DataFrame:
    """(doc_id, clean_text): the document's analyzer tokens minus every
    duplicated span, re-joined with single spaces.

    Policy note: this is the aggressive drop-EVERY-occurrence mode (the
    right default for boilerplate/license chrome); Lee et al.'s
    keep-one-canonical-copy policy is a composition — run doc-level
    exact dedup first, or gate on dup_span_stats.dup_fraction instead
    of stripping. Detokenization is token-join (the operator works on
    the analyzed stream, like every dedup op here)."""
    spans = (dup_span_intervals(docs, w, min_count, cross_doc,
                                text_col, id_col, hasher)
             .groupBy("doc_id")
             .agg(F.collect_list(F.struct("span_start", "span_end"))
                  .alias("spans")))
    toks = tokenize_expr(F.coalesce(F.col(text_col), F.lit("")),
                         stopwords=())
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    kept = F.expr(
        "CASE WHEN spans IS NULL THEN concat_ws(' ', t) ELSE concat_ws(' ', "
        "transform(filter(sequence(0, size(t) - 1), "
        "p -> NOT exists(spans, s -> p >= s.span_start AND p < s.span_end)), "
        "p -> t[p])) END")
    return (base.join(spans, "doc_id", "left")
            .select("doc_id", kept.alias("clean_text")))


# ------------------------------------------------------------- oracles

def _grams_sql(w: int, source: str = "documents",
               where: str = "TRUE") -> str:
    tok = tokenize_duckdb_sql("text")
    parts = " || ' ' || ".join(f"l[i + {j}]" for j in range(w))
    gh = MD5INT_DUCK.format(x=f"({parts})")
    return f"""(
  SELECT doc_id, i - 1 AS pos, {gh} AS gh
  FROM (SELECT doc_id, l, unnest(range(1, len(l) - {w - 2})) AS i
        FROM (SELECT doc_id, list_filter({tok}, t -> t <> '') AS l
              FROM {source} WHERE {where})
        WHERE len(l) >= {w}))"""


def _spans_cte(w: int, min_count: int, cross_doc: bool,
               source: str = "documents") -> str:
    rule = ("min(doc_id) <> max(doc_id)" if cross_doc
            else f"count(*) >= {min_count}")
    return f"""
g AS (SELECT * FROM {_grams_sql(w, source)}),
dup AS (SELECT gh FROM g GROUP BY gh HAVING {rule}),
dp AS (SELECT doc_id, pos FROM g WHERE gh IN (SELECT gh FROM dup)),
fl AS (SELECT doc_id, pos,
              CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                        IS NULL
                        OR pos > lag(pos) OVER (PARTITION BY doc_id
                                                ORDER BY pos) + {w}
                   THEN 1 ELSE 0 END AS f
       FROM dp),
sid AS (SELECT doc_id, pos,
               sum(f) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
        FROM fl),
spans AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
                 CAST(max(pos) + {w} AS BIGINT) AS span_end
          FROM sid GROUP BY doc_id, sid)"""


def dup_span_intervals_sql(w: int = 15, min_count: int = 2,
                           cross_doc: bool = False,
                           source: str = "documents") -> str:
    """DuckDB twin of dup_span_intervals."""
    return f"""
WITH {_spans_cte(w, min_count, cross_doc, source)}
SELECT doc_id, span_start, span_end,
       span_end - span_start AS span_tokens
FROM spans"""


def dup_span_stats_sql(w: int = 15, min_count: int = 2,
                       cross_doc: bool = False,
                       source: str = "documents") -> str:
    """DuckDB twin of dup_span_stats."""
    tok = tokenize_duckdb_sql("text")
    return f"""
WITH {_spans_cte(w, min_count, cross_doc, source)},
per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(span_end - span_start) AS BIGINT) AS dup_tokens
        FROM spans GROUP BY doc_id),
tot AS (SELECT doc_id,
               CAST(len(list_filter({tok}, t -> t <> '')) AS BIGINT)
               AS total_tokens
        FROM {source})
SELECT t.doc_id, t.total_tokens,
       coalesce(p.n_spans, 0) AS n_spans,
       coalesce(p.dup_tokens, 0) AS dup_tokens,
       round(coalesce(p.dup_tokens, 0) * 1.0
             / greatest(t.total_tokens, 1), 6) AS dup_fraction
FROM tot t LEFT JOIN per p USING (doc_id)"""
