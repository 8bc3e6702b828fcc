"""Inverted-index build: the Spark-native replacement for what the
reference delegates to Solr/Lucene (postings, df, doc lengths — implied
by schema.xml:213,510-526 + BM25 default solrconfig.xml:39).

Logical index tables (all derivable, all Catalyst-optimized):

  docs_store(doc_id, repo, path, commit, lang, sha256, dl)
      — stored fields + per-row content invariant (input_hint: sha256
        equality vs source) + exact doc length (Lucene quantizes dl to
        1 byte; we keep it exact, SURVEY.md §2.9 Q4).
  tf(term, doc_id, tf, dl)
      — one row per posting. groupBy(term, doc_id) is a partial+final
        hash aggregate: map-side combine absorbs per-doc repetition, and
        doc_id spreads hot terms across reducers (no skew at this stage).
  termstats(term, df)
      — document frequency per term.
  scalars N (doc count incl. empty docs) and avgdl (mean dl incl. 0).

The searchable token stream is tokenize(content) ++ tokenize(path) — the
reference copies the file path into the catch-all ``text`` field
(schema.xml:310) while dataset metadata stays filter-only (schema.xml:308);
our metadata columns likewise stay plain filterable columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark import StorageLevel

from ..functions.tokenizer import (LUCENE_STOPWORDS, make_tokenize_udf,
                                   tokenize_expr, tokenize_expr_catenate)
from .docids import assign_doc_ids


@dataclass(frozen=True)
class IndexConfig:
    k1: float = 1.2                    # Lucene BM25 defaults (solrconfig.xml:39)
    b: float = 0.75
    stopwords: tuple[str, ...] = LUCENE_STOPWORDS
    include_path_tokens: bool = True   # schema.xml:310 copyField path -> text
    use_arrow_tokenizer: bool = False  # pandas-UDF chain instead of codegen exprs
    catenate_words: bool = False       # WordDelimiterGraph catenateWords=1
                                       # (schema.xml:592): multi-part identifiers
                                       # additionally index their catenated form
                                       # ("getHTTPResponse" -> parts +
                                       # "gethttpresponse"); index-side only —
                                       # query text keeps the split chain, and a
                                       # single-token query matches the
                                       # catenated term directly
    bucket_span: int = 4096            # doc_ids per posting block bucket (physical index)
    term_buckets: int = 32             # hash-partition count of the physical index
    index_positions: bool = True       # write the positions/ dataset (phrase
                                       # queries); Lucene always indexes
                                       # positions for text fields — disable
                                       # only for term-only workloads


@dataclass
class FtsIndex:
    spark: SparkSession
    config: IndexConfig
    docs_store: DataFrame
    tf: DataFrame
    termstats: DataFrame
    n_docs: int
    avgdl: float
    postings: DataFrame | None = None  # physical encoded blocks (see postings.py)
    cached: DataFrame | None = None    # the persisted enriched docs (tokens+dl)
    positions: DataFrame | None = None  # (term, doc_id, dl, positions) — lazy
                                        # plan, executed only by phrase queries

    def unpersist(self) -> None:
        for df in (self.docs_store, self.tf, self.cached):
            if df is None:
                continue
            try:
                df.unpersist()
            except Exception:
                pass


def _searchable_text(config: IndexConfig):
    if config.include_path_tokens:
        return F.concat_ws(" ", F.col("content"), F.col("path"))
    return F.col("content")


def _tokenize_col(config: IndexConfig):
    """The configured analyzer chain as a Column over the searchable text."""
    if config.use_arrow_tokenizer:
        return make_tokenize_udf(config.stopwords,
                                 catenate=config.catenate_words)(
            _searchable_text(config))
    if config.catenate_words:
        return tokenize_expr_catenate(_searchable_text(config), config.stopwords)
    return tokenize_expr(_searchable_text(config), config.stopwords)


def tokens_df(docs_with_ids: DataFrame, config: IndexConfig) -> DataFrame:
    """(doc_id, tokens array<string>, dl int)"""
    tok = _tokenize_col(config)
    return docs_with_ids.select(
        "doc_id", tok.alias("tokens")
    ).withColumn("dl", F.size("tokens").cast("long"))


def enrich_docs(docs_with_ids: DataFrame, config: IndexConfig) -> DataFrame:
    """One pass over content: sha256 invariant + tokens + dl in a single
    projection (whole-stage codegen) — tokenization runs exactly once and
    ``dl`` needs no join back (content is never read again downstream).

    Any extra metadata columns on the source (e.g. the access-control
    columns accessible_to/date_available/depositor — SURVEY.md P6/P9/P10)
    ride through into docs_store as plain filterable columns."""
    tok = _tokenize_col(config)
    core = ["doc_id", "repo", "path", "commit", "lang"]
    extras = [c for c in docs_with_ids.columns if c not in core + ["content"]]
    return docs_with_ids.select(
        *core, *extras,
        F.sha2(F.col("content"), 256).alias("sha256"),
        tok.alias("tokens"),
        # E2 graceful degradation (reference Solr.scala:65-68,
        # package.scala:110-118: extraction failure -> metadata-only doc
        # + a counted feedback line): a doc whose CONTENT contributes no
        # searchable text (null/whitespace-only — the post-extraction
        # shape of a broken file) still indexes its metadata and path
        # tokens, and is flagged here so the build can COUNT it
        # (degraded_docs in BuildReport/globals.json) and users can
        # filter on it like any metadata column.
        (F.coalesce(F.trim(F.col("content")), F.lit("")) == "").alias("meta_only"),
    ).withColumn("dl", F.size("tokens").cast("long"))


def build_index(spark: SparkSession, docs: DataFrame, config: IndexConfig | None = None,
                persist: bool = True) -> FtsIndex:
    config = config or IndexConfig()
    with_ids = assign_doc_ids(docs)

    enriched = enrich_docs(with_ids, config)
    if persist:
        # single cache holds tokens; docs_store/tf are cheap projections off it
        enriched = enriched.persist(StorageLevel.MEMORY_AND_DISK)

    docs_store = enriched.drop("tokens")
    tf = (
        enriched.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id", "dl")            # dl functionally dep. on doc_id — free key
        .agg(F.count("*").alias("tf"))
    )
    if persist:
        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)

    termstats = tf.groupBy("term").agg(F.count("*").alias("df"))

    # positional postings for phrase queries (operators/dismax.py) — a
    # pure plan over the same enriched cache, so it costs nothing unless
    # a phrase clause actually runs. Positions index the stopword-
    # filtered stream (see dismax.py parity notes). sort_array: the
    # collect_list order after a shuffle is not contractual.
    positions = (
        enriched.select("doc_id", "dl", F.posexplode("tokens").alias("pos", "term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
    )

    g = docs_store.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs = g["n"] or 0
    avgdl = float(g["avgdl"] or 0.0)
    return FtsIndex(spark=spark, config=config, docs_store=docs_store, tf=tf,
                    termstats=termstats, n_docs=n_docs, avgdl=avgdl,
                    cached=enriched if persist else None, positions=positions)
