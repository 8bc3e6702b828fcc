"""Query-side: dismax-style free-text BM25 top-k + filter queries +
pagination + match-all — the semantics of ``GET /filesearch``
(reference: SearchServlet.scala:74-104) executed Spark-native.

Semantics preserved from the reference:
  * free text is analyzed with the SAME chain as indexing and the terms
    are OR-combined with no field boosts (dismax over the single
    catch-all field — SearchServlet.scala:79-88, solrconfig.xml:966-970),
    so score = Σ over matched query terms of BM25(term, doc).
  * absent text ⇒ match-all ``*:*`` (SearchServlet.scala:80): no
    scoring, constant score 1.0, deterministic docID order.
  * filters: within one key, values are OR-ed; across keys, AND-ed
    (SearchServlet.scala:123-139, api.yml:134-136). Non-scoring, like fq.
  * pagination start/rows = skip/limit (SearchServlet.scala:76-77,95-96);
    defaults 0/10.
  * tie-break: score desc, then doc_id asc (Lucene's internal-docID
    tie-break; our doc_id is the deterministic (repo,path,commit) rank).

BM25 (Lucene ≥6 defaults, k1=1.2 b=0.75 — solrconfig.xml:39, no
<similarity> override in schema.xml:1218-1227):
    idf(t)  = ln(1 + (N - df + 0.5)/(df + 0.5))
    score   = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import tokenize_py
from .index_build import FtsIndex

RESULT_COLS = ["repo", "path", "lang", "score"]


class QueryParseError(ValueError):
    """Typed query-surface error (Q8): the reference maps Solr
    *ParseException to HTTP 400 (Solr.scala:116-125, SearchServlet.scala:45).
    Raised for malformed filter trees and undefined filter fields;
    invalid limit/skip still silently default, matching
    SearchServlet.scala:76-77."""


def _idf_expr(n_docs: int) -> F.Column:
    return F.log(1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))


# fq predicate forms accepted by every query entrypoint:
#   dict {key: [values]}          — OR within a key, AND across keys
#                                   (user filters, SearchServlet.scala:131-139)
#   ["and"|"or", p1, p2, ...]     — boolean combinators; "or" across
#                                   DIFFERENT keys is what the reference's
#                                   access filters need (SearchServlet.scala:112-118)
#   ["in", key, [values]]         — set membership
#   ["=", key, value]             — equality
#   ["<=date", key, "YYYY-MM-DD"] — timestamp upper bound ([* TO NOW] analog)
#   ["startswith", key, prefix]   — P14 prefix predicate
def _filters_expr(filters):
    """fq semantics as a Catalyst boolean expression (pushdown-friendly)."""
    if not filters:
        return F.lit(True)
    if isinstance(filters, dict):
        cond = F.lit(True)
        for key, values in filters.items():
            vals = values if isinstance(values, (list, tuple)) else [values]
            cond = cond & F.col(key).isin(list(vals))
        return cond
    op = filters[0]
    if op == "and":
        cond = F.lit(True)
        for sub in filters[1:]:
            cond = cond & _filters_expr(sub)
        return cond
    if op == "or":
        cond = F.lit(False)
        for sub in filters[1:]:
            cond = cond | _filters_expr(sub)
        return cond
    if op == "in":
        return F.col(filters[1]).isin(list(filters[2]))
    if op == "=":
        return F.col(filters[1]) == F.lit(filters[2])
    if op == "<=date":
        return F.col(filters[1]) <= F.lit(filters[2]).cast("timestamp")
    if op == "startswith":
        return F.col(filters[1]).startswith(filters[2])
    raise QueryParseError(f"unknown filter op: {op!r}")


def _filter_keys(filters) -> set[str]:
    if not filters:
        return set()
    if isinstance(filters, dict):
        return set(filters)
    op = filters[0]
    if op in ("and", "or"):
        out: set[str] = set()
        for sub in filters[1:]:
            out |= _filter_keys(sub)
        return out
    if op in ("in", "=", "<=date", "startswith"):
        return {filters[1]}
    raise QueryParseError(f"unknown filter op: {op!r}")


def validate_filters(filters, columns) -> None:
    """Undefined field in an fq -> typed error before any Spark job (the
    Solr undefined-field 400 analog), instead of an AnalysisException
    mid-plan."""
    unknown = _filter_keys(filters) - set(columns)
    if unknown:
        raise QueryParseError(f"undefined filter field(s): {sorted(unknown)}")


def access_filter(user: str | None = None, now: str | None = None):
    """The reference's access-control fq (SearchServlet.scala:106-121):

    anonymous — `easy_file_accessible_to:ANONYMOUS` AND
    `easy_dataset_date_available:[* TO NOW]` (:106-111); authed —
    `(ANONYMOUS OR KNOWN OR depositor:<user>)` AND
    `(available<=NOW OR depositor:<user>)` (:112-118). NOW is pinned
    (sources.docs_source.ACCESS_NOW) for deterministic results."""
    if now is None:
        from ..sources.docs_source import ACCESS_NOW
        now = ACCESS_NOW
    if user is None:
        return ["and",
                ["in", "accessible_to", ["ANONYMOUS"]],
                ["<=date", "date_available", now]]
    return ["and",
            ["or", ["in", "accessible_to", ["ANONYMOUS", "KNOWN"]],
                   ["=", "depositor", user]],
            ["or", ["<=date", "date_available", now],
                   ["=", "depositor", user]]]


def score_terms(index: FtsIndex, terms: list[str],
                fq_ids: DataFrame | None = None) -> DataFrame:
    """(doc_id, score) for every doc matching ≥1 query term — exact BM25.

    Plan shape (scale notes): the term filter prunes the tf scan
    (predicate pushdown on the physical index's term-bucket partitioning
    — see postings.py); termstats for ≤ a handful of query terms is tiny
    ⇒ broadcast join; groupBy(doc_id) is a partial+final hash agg whose
    keys are near-unique ⇒ no skew. ``fq_ids`` (doc_id-only) pushes the
    filter-query semijoin BELOW the aggregate: with a selective fq the
    sum never runs for excluded docs, and the semijoin shuffles on the
    aggregate's own key so the exchange is reused.
    """
    k1, b = index.config.k1, index.config.b
    uniq = sorted(set(terms))
    ts = index.termstats.filter(F.col("term").isin(uniq)).withColumn("idf", _idf_expr(index.n_docs))
    cand = index.tf.filter(F.col("term").isin(uniq)).join(F.broadcast(ts), "term")
    if fq_ids is not None:
        cand = cand.join(fq_ids, "doc_id", "left_semi")
    avgdl = index.avgdl if index.avgdl > 0 else 1.0
    contrib = (
        F.col("idf")
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    )
    return cand.groupBy("doc_id").agg(F.sum(contrib).alias("score"))


def expand_synonyms(terms: list[str],
                    synonyms: dict[str, list[str]] | None,
                    stopwords=None) -> list[str]:
    """Query-side synonym expansion (X5, SynonymGraphFilter on the query
    analyzer only — schema.xml:520-525). The reference ships an empty
    synonyms.txt, so the default (None/{}) is the identity; a populated
    map ORs each term's synonyms into the dismax disjunction.

    Multi-word entries (SynonymGraphFilter's ``a => b c`` form) are run
    through the SAME analyzer chain as the query text — each synonym
    string tokenizes to 1..n terms and ALL of them join the disjunction
    (exact phrase positions don't matter here: the reference's handler
    is a boost-less pure-OR dismax, SearchServlet.scala:79-88)."""
    if not synonyms:
        return terms
    out = list(terms)
    for t in terms:
        for s in synonyms.get(t, ()):
            toks = (tokenize_py(s, stopwords) if stopwords is not None
                    else tokenize_py(s))
            out.extend(toks)
    return out


def search(index: FtsIndex, text: str | None = None, k: int = 10, skip: int = 0,
           filters: dict[str, list[str]] | None = None,
           round_score: int | None = 4,
           synonyms: dict[str, list[str]] | None = None) -> DataFrame:
    """Top-k result page as a DataFrame of RESULT_COLS (+ doc_id)."""
    # param validation mirrors SearchServlet.scala:76-77 (invalid -> defaults)
    k = k if isinstance(k, int) and k >= 1 else 10
    skip = skip if isinstance(skip, int) and skip >= 0 else 0

    validate_filters(filters, index.docs_store.columns)
    fexpr = _filters_expr(filters)
    store = index.docs_store.filter(fexpr)

    if text is None:
        # match-all *:* (SearchServlet.scala:80): constant score, docID order
        page = (
            store.orderBy(F.col("doc_id").asc())
            .offset(skip).limit(k)
            .withColumn("score", F.lit(1.0))
        )
        return page.select("doc_id", *RESULT_COLS)

    terms = expand_synonyms(tokenize_py(text, index.config.stopwords),
                            synonyms, index.config.stopwords)
    if not terms:
        # all tokens stopworded out ⇒ empty result (dismax with no clauses)
        return (index.docs_store.withColumn("score", F.lit(0.0))
                .select("doc_id", *RESULT_COLS).limit(0))

    # fq semantics = semijoin on ids BELOW the scoring aggregate
    # (non-scoring filters, like Solr fq — see score_terms); the cut runs
    # on the narrow (doc_id, score) stream (TakeOrderedAndProject — no
    # full-store shuffle), and only the k winners are joined back for
    # stored fields (tiny side broadcast).
    scores = score_terms(index, terms,
                         fq_ids=store.select("doc_id") if filters else None)
    score_col = F.round(F.col("score"), round_score) if round_score is not None else F.col("score")
    page = F.broadcast(
        scores.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .offset(skip).limit(k)
        .select("doc_id", score_col.alias("score")))
    return (
        page.join(index.docs_store.select("doc_id", "repo", "path", "lang"), "doc_id")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .select("doc_id", "repo", "path", "lang", "score")
    )


def num_found(index: FtsIndex, text: str | None = None,
              filters: dict[str, list[str]] | None = None) -> int:
    """Exact total hit count (Solr numFound, Solr.scala:92-99)."""
    store = index.docs_store.filter(_filters_expr(filters))
    if text is None:
        return store.count()
    terms = tokenize_py(text, index.config.stopwords)
    if not terms:
        return 0
    matched = index.tf.filter(F.col("term").isin(sorted(set(terms)))).select("doc_id").distinct()
    return matched.join(store, "doc_id").count()


def search_envelope(index: FtsIndex, text: str | None = None, k: int = 10, skip: int = 0,
                    filters: dict[str, list[str]] | None = None) -> str:
    """JSON envelope shaped like the reference response
    (Solr.scala:91-103,173-181; docs/api/api.yml:172-256).

    Single scoring pass (round 2 ran search + num_found as two): the
    narrow (doc_id, score) stream is persisted once; the page is a
    TakeOrdered over it and ``found`` is its count — exactly how Solr
    returns the page and numFound from one query execution."""
    k = k if isinstance(k, int) and k >= 1 else 10
    skip = skip if isinstance(skip, int) and skip >= 0 else 0
    validate_filters(filters, index.docs_store.columns)
    store = index.docs_store.filter(_filters_expr(filters))

    if text is None:
        found = store.count()
        rows = (store.orderBy(F.col("doc_id").asc()).offset(skip).limit(k)
                .select("repo", "path", "lang").collect())
    else:
        terms = expand_synonyms(tokenize_py(text, index.config.stopwords),
                                None, index.config.stopwords)
        if not terms:
            rows, found = [], 0
        else:
            scores = score_terms(
                index, terms,
                fq_ids=store.select("doc_id") if filters else None).persist()
            try:
                found = scores.count()
                page = F.broadcast(
                    scores.orderBy(F.col("score").desc(), F.col("doc_id").asc())
                    .offset(skip).limit(k)
                    .select("doc_id", F.round("score", 4).alias("score")))
                rows = (page.join(index.docs_store
                                  .select("doc_id", "repo", "path", "lang"),
                                  "doc_id")
                        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
                        .collect())
            finally:
                scores.unpersist()
    items = [
        {"repo": r["repo"], "path": r["path"], "lang": r["lang"],
         "score": r["score"] if text is not None else 1.0}
        for r in rows
    ]
    return json.dumps({
        "summary": {
            "text": text if text is not None else "*",
            "skip": skip, "limit": k,
            "time_allowed": 5000,  # echoed like Solr.scala:97 (pinned)
            "found": found, "returned": len(items),
        },
        "fileitems": items,
    })
