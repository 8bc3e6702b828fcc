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


def _tfnorm(tf_col: F.Column, dl_col: F.Column, k1: float, b: float,
            avgdl: float) -> F.Column:
    avgdl = avgdl if avgdl > 0 else 1.0
    return (tf_col * (k1 + 1.0)
            / (tf_col + k1 * (1.0 - b + b * dl_col / F.lit(avgdl))))


# --- SQL-string twins of the hot query-plan builders -----------------------
# Building a Column tree call-by-call costs one Py4J socket round-trip per
# node (~0.2-1 ms each); on the latency-sensitive query path that adds up
# to >100 ms of pure driver-side plan construction per query. These
# helpers emit ONE SQL string parsed JVM-side by a single F.expr call —
# the parsed plan is the same tree, so scores stay bit-identical (the
# expression structure mirrors the Column builders above exactly).

def _dlit(v: float) -> str:
    """Exact double literal for Spark SQL. A bare float literal parses as
    DECIMAL there; casting the repr (shortest round-trip decimal) through
    Double.parseDouble reproduces the identical IEEE double."""
    return f"CAST('{v!r}' AS DOUBLE)"


def _sstr(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _tfnorm_sql(tf: str, dl: str, k1: float, b: float, avgdl: float) -> str:
    """SQL twin of _tfnorm — same association order, same constants."""
    avgdl = avgdl if avgdl > 0 else 1.0
    return (f"({tf} * {_dlit(k1 + 1.0)} / ({tf} + {_dlit(k1)} * "
            f"({_dlit(1.0 - b)} + {_dlit(b)} * {dl} / {_dlit(avgdl)})))")


def _phrase_tf_sql(pmap: str, phrase: tuple[str, ...]) -> str:
    """SQL twin of _phrase_tf (same higher-order filter expression)."""
    def arr(t: str) -> str:
        return (f"coalesce(element_at({pmap}, {_sstr(t)}), "
                f"CAST(array() AS array<int>))")
    conds = " AND ".join(
        f"array_contains({arr(t)}, x + {i})"
        for i, t in enumerate(phrase[1:], start=1)) or "true"
    return f"size(filter({arr(phrase[0])}, x -> {conds}))"


def _term_case_sql(mapping: dict[str, str], else_sql: str) -> str:
    """CASE term WHEN ... END over a query-sized term map — one parsed
    expression instead of a per-term F.when chain."""
    if not mapping:
        return else_sql
    whens = " ".join(f"WHEN {_sstr(t)} THEN {sql}"
                     for t, sql in mapping.items())
    return f"CASE term {whens} ELSE {else_sql} END"


def _phrase_tf(pmap: F.Column, phrase: tuple[str, ...]) -> F.Column:
    """Exact phrase frequency from per-term position arrays: the count of
    start positions x (of the first term) such that term_i sits at x+i
    for every following i — Lucene's ExactPhraseMatcher, as one Catalyst
    array expression (no Python)."""
    def ok(x):
        cond = F.lit(True)
        for i, t in enumerate(phrase[1:], start=1):
            cond = cond & F.array_contains(
                F.coalesce(F.element_at(pmap, F.lit(t)), F.array().cast("array<int>")),
                x + i)
        return cond
    first = F.coalesce(F.element_at(pmap, F.lit(phrase[0])),
                       F.array().cast("array<int>"))
    return F.size(F.filter(first, ok))


def score_phrase(positions: DataFrame, termstats_idf: DataFrame,
                 phrase: tuple[str, ...], k1: float, b: float,
                 avgdl: float, phidf: float | None = None) -> DataFrame:
    """(doc_id, contrib) for docs containing the exact phrase.

    Scoring is Lucene's PhraseQuery under BM25Similarity: tf = phrase
    frequency; idf = Σ over the phrase's term SEQUENCE of idf(term)
    (BM25Similarity.idfExplain over the termStats array — duplicates in
    the phrase count twice).

    Plan shape: the positions scan is pruned to the phrase's unique
    terms (term-bucket partition pruning on the physical layout); one
    groupBy(doc_id) assembles the per-doc term→positions map, the
    candidate cut ``n_terms == |unique|`` runs before the (Catalyst-only)
    position-intersection, and the summed idf joins in as a broadcast
    1-row aggregate — no driver round-trip."""
    from collections import Counter

    uniq = sorted(set(phrase))
    mult = Counter(phrase)
    # one parsed expression per plan node (see the _tfnorm_sql comment):
    # the SQL strings mirror the Column builders exactly
    per_doc = (
        positions.filter(F.col("term").isin(uniq))
        .groupBy("doc_id", "dl")
        .agg(F.expr("map_from_entries(collect_list(struct(term, positions)))"
                    ).alias("pmap"),
             F.expr("count(*)").alias("nt"))
        .filter(f"nt = {len(uniq)}")
        .withColumn("ptf", F.expr(_phrase_tf_sql("pmap", phrase)))
        .filter("ptf > 0")
    )
    if phidf is not None:
        # caller already resolved Σ idf(term) driver-side (the physical
        # path collects the pruned per-term idf rows once per query) —
        # a literal multiply, no aggregate + broadcast-exchange stages
        contrib = (f"{_dlit(float(phidf))} * "
                   + _tfnorm_sql("ptf", "dl", k1, b, avgdl))
        return per_doc.selectExpr("doc_id", f"{contrib} AS contrib")
    mult_expr = F.lit(None).cast("double")
    for t, c in mult.items():
        mult_expr = F.when(F.col("term") == t, float(c)).otherwise(mult_expr)
    phidf_df = (termstats_idf.filter(F.col("term").isin(uniq))
                .agg(F.sum(F.col("idf") * mult_expr).alias("phidf")))
    return (per_doc.crossJoin(F.broadcast(phidf_df))
            .select("doc_id",
                    (F.col("phidf") * _tfnorm(F.col("ptf"), F.col("dl"),
                                              k1, b, avgdl)).alias("contrib")))


def score_boolean(index: FtsIndex, clauses, fq_ids: DataFrame | None = None,
                  ) -> DataFrame:
    """(doc_id, score) for a dismax boolean query (operators/dismax.py):
    SHOULD / MUST (+) / MUST_NOT (-) clauses, term or phrase.

    Lucene BooleanQuery semantics: a doc matches iff it satisfies every
    MUST clause, matches no MUST_NOT clause, and — when there is no MUST
    clause — matches at least one SHOULD clause. Score = Σ BM25
    contributions of the matched MUST+SHOULD clauses.

    Plan shape: ONE union of per-clause (doc_id, cid, kind, contrib)
    streams feeding ONE hash aggregate on doc_id that computes the score
    and the match predicate together (conditional aggregates) — clause
    count never multiplies the shuffle count. A pure-negative query
    returns empty (Lucene's MatchNoDocsQuery)."""
    from .dismax import MUST, MUST_NOT, SHOULD  # noqa: F401 (kind literals)

    k1, b = index.config.k1, index.config.b
    avgdl = index.avgdl if index.avgdl > 0 else 1.0
    n_must = sum(1 for c in clauses if c.occur == "must")
    n_should = sum(1 for c in clauses if c.occur == "should")
    if n_should + n_must == 0:
        return (index.docs_store.select("doc_id")
                .withColumn("score", F.lit(0.0)).limit(0))

    term_clauses = [(i, c) for i, c in enumerate(clauses) if not c.is_phrase]
    phrase_clauses = [(i, c) for i, c in enumerate(clauses) if c.is_phrase]
    all_terms = sorted({t for _, c in term_clauses for t in c.terms}
                       | {t for _, c in phrase_clauses for t in c.terms})
    ts = (index.termstats.filter(F.col("term").isin(all_terms))
          .withColumn("idf", _idf_expr(index.n_docs)))

    parts: list[DataFrame] = []
    if term_clauses:
        cmap = index.spark.createDataFrame(
            [(c.terms[0], i, c.occur) for i, c in term_clauses],
            "term string, cid int, kind string")
        cand = (index.tf
                .filter(F.col("term").isin(sorted({c.terms[0] for _, c in term_clauses})))
                .join(F.broadcast(ts.select("term", "idf")), "term")
                .join(F.broadcast(cmap), "term"))
        parts.append(cand.select(
            "doc_id", "cid", "kind",
            (F.col("idf") * _tfnorm(F.col("tf"), F.col("dl"), k1, b, avgdl)
             ).alias("contrib")))
    for i, c in phrase_clauses:
        ph = score_phrase(index.positions, ts, c.terms, k1, b, avgdl)
        parts.append(ph.select("doc_id", F.lit(i).alias("cid"),
                               F.lit(c.occur).alias("kind"), "contrib"))

    return combine_clause_rows(parts, n_must, fq_ids)


def combine_clause_rows(parts: list[DataFrame], n_must: int,
                        fq_ids: DataFrame | None = None) -> DataFrame:
    """Union per-clause (doc_id, cid, kind, contrib) streams and apply the
    Lucene BooleanQuery match predicate + score in ONE hash aggregate —
    shared by the logical (score_boolean) and physical
    (wand.search path) executions."""
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    if fq_ids is not None:
        u = u.join(fq_ids, "doc_id", "left_semi")

    # (doc_id, cid) is unique across the union by construction — a term
    # clause yields one posting row per doc and a phrase clause one
    # grouped row per doc, and every clause (synonym expansions included)
    # gets its own cid — so a plain count replaces count_distinct, which
    # would plan as a SECOND aggregate exchange (partial-distinct pass)
    agg = u.groupBy("doc_id").agg(
        F.expr("sum(CASE WHEN kind != 'must_not' THEN contrib "
               "ELSE CAST(0.0 AS DOUBLE) END)").alias("score"),
        F.expr("count(CASE WHEN kind = 'must' THEN cid END)").alias("musts_hit"),
        F.expr("max(CASE WHEN kind = 'should' THEN 1 ELSE 0 END)").alias("has_should"),
        F.expr("max(CASE WHEN kind = 'must_not' THEN 1 ELSE 0 END)").alias("prohibited"),
    )
    matched = agg.filter(
        f"prohibited = 0 AND musts_hit = {n_must} AND "
        f"({'true' if n_must > 0 else 'false'} OR has_should = 1)")
    return matched.select("doc_id", "score")


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


def _expand_clause_synonyms(clauses, synonyms, stopwords):
    """Synonym expansion in boolean mode: each single-term SHOULD clause
    ORs its synonyms in as extra SHOULD clauses (same analyzer chain,
    X5). MUST/MUST_NOT/phrase clauses are never expanded — widening a
    required or prohibited clause would change its boolean meaning."""
    from .dismax import SHOULD, Clause
    if not synonyms:
        return clauses
    out = list(clauses)
    seen = {(c.terms, c.occur) for c in clauses}
    for c in clauses:
        if c.occur != SHOULD or c.is_phrase:
            continue
        for s in synonyms.get(c.terms[0], ()):
            for t in tokenize_py(s, stopwords):
                key = ((t,), SHOULD)
                if key not in seen:
                    seen.add(key)
                    out.append(Clause((t,), SHOULD))
    return out


def _scores_for(index: FtsIndex, text: str, synonyms,
                fq_ids: DataFrame | None) -> DataFrame | None:
    """Route a text query to the right scorer: the round-1/2 OR fast
    path for a plain bag of terms (identical plan to before), the
    boolean/phrase scorer otherwise. None = provably empty (no positive
    clause survives analysis)."""
    from .dismax import is_plain_or, parse_dismax, plain_terms

    clauses = parse_dismax(text, index.config.stopwords)
    if is_plain_or(clauses):
        terms = expand_synonyms([c.terms[0] for c in clauses],
                                synonyms, index.config.stopwords)
        if not terms:
            return None
        return score_terms(index, terms, fq_ids=fq_ids)
    clauses = _expand_clause_synonyms(clauses, synonyms, index.config.stopwords)
    if not any(c.occur in ("should", "must") for c in clauses):
        return None  # pure-negative query: MatchNoDocsQuery
    return score_boolean(index, clauses, fq_ids=fq_ids)


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

    # fq semantics = semijoin on ids BELOW the scoring aggregate
    # (non-scoring filters, like Solr fq — see score_terms); the cut runs
    # on the narrow (doc_id, score) stream (TakeOrderedAndProject — no
    # full-store shuffle), and only the k winners are joined back for
    # stored fields (tiny side broadcast).
    scores = _scores_for(index, text, synonyms,
                         fq_ids=store.select("doc_id") if filters else None)
    if scores is None:
        # no positive clause survives analysis ⇒ empty (dismax no-clause)
        return (index.docs_store.withColumn("score", F.lit(0.0))
                .select("doc_id", *RESULT_COLS).limit(0))
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
              filters: dict[str, list[str]] | None = None,
              synonyms: dict[str, list[str]] | None = None) -> int:
    """Exact total hit count (Solr numFound, Solr.scala:92-99).

    Takes the SAME synonyms map as search: Solr's numFound is the count
    of the very query that produced the page, so a synonym-expanded
    search paired with a synonym-blind count could report
    found < len(returned)."""
    from .dismax import is_plain_or, parse_dismax

    store = index.docs_store.filter(_filters_expr(filters))
    if text is None:
        return store.count()
    clauses = parse_dismax(text, index.config.stopwords)
    if is_plain_or(clauses):
        terms = expand_synonyms([c.terms[0] for c in clauses],
                                synonyms, index.config.stopwords)
        if not terms:
            return 0
        matched = (index.tf.filter(F.col("term").isin(sorted(set(terms))))
                   .select("doc_id").distinct())
        return matched.join(store, "doc_id").count()
    scores = _scores_for(index, text, synonyms,
                         fq_ids=store.select("doc_id") if filters else None)
    return scores.count() if scores is not None else 0


def search_envelope(index: FtsIndex, text: str | None = None, k: int = 10, skip: int = 0,
                    filters: dict[str, list[str]] | None = None,
                    synonyms: dict[str, list[str]] | None = None) -> str:
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
        scores = _scores_for(index, text, synonyms,
                             fq_ids=store.select("doc_id") if filters else None)
        if scores is None:
            rows, found = [], 0
        else:
            scores = scores.persist()
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
