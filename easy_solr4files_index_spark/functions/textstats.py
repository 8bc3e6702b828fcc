"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

These extend the reference's per-file document model (a Solr doc per
file, FileItem.scala:21-39) with the derived per-document features a
100 TB corpus pipeline needs. Every op is a pure Catalyst expression
(JVM codegen, no Python on the hot path) with a DuckDB-SQL twin for the
correctness gate. They operate on the raw ``documents`` table
(doc_id, text, lang, ...).

Specs (shared Spark/DuckDB):
  * token_count      — analyzer tokens (stopword-filtered) + whitespace words
  * quality_score    — 0.4·alpha_ratio + 0.3·(1−stop_ratio) + 0.3·min(n_tok/100, 1)
  * lang-ID          — marker-stopword hit counts per language, argmax with
                       deterministic tie-break (de > fr require a strict win
                       over en; default en)
  * fingerprint      — order-insensitive content hash:
                       bit_xor over tokens of md5int(term ':' tf)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .tokenizer import LUCENE_STOPWORDS, stopword_not_in_sql, tokenize_duckdb_sql, tokenize_expr

LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
}

# md5-derived 56-bit int — identical in Spark (conv) and DuckDB (hex cast)
MD5INT_SPARK = "cast(conv(substr(md5({x}), 1, 14), 16, 10) as bigint)"
MD5INT_DUCK = "CAST(('0x' || substr(md5({x}), 1, 14)) AS BIGINT)"


def _raw_tokens(col) -> Column:
    """Unfiltered analyzer tokens (no stopword removal) — dedup/stat ops
    stay faithful to content."""
    return tokenize_expr(col, stopwords=())


# BPE-ish pre-tokenizer (the public GPT-2 pattern, Radford et al. 2019,
# minus its `\s+(?!\S)` lookahead — RE2 has no lookahead, and this chain
# must run identically under Java regex (Spark) and RE2 (DuckDB)):
# contractions, letter runs, digit runs, punctuation runs, each
# optionally absorbing one leading space. Whitespace itself never counts
# as a token, which is what an LLM token-budget estimate wants anyway.
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_ws, n_bpe): analyzer tokens, whitespace
    words, and a BPE-ish pre-tokenizer count (the training-data token
    budget estimator — counts GPT-2-style pre-merge pieces; actual BPE
    merges only ever reduce it, so it upper-bounds the LLM token cost)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_tokens = F.size(tokenize_expr(t))
    n_ws = F.when(F.trim(t) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+")))
    n_bpe = F.size(F.regexp_extract_all(t, F.lit(_BPE_RE), 0))
    return docs.select("doc_id", n_tokens.alias("n_tokens"),
                       n_ws.alias("n_ws"), n_bpe.alias("n_bpe"))


def token_counts_sql() -> str:
    tok = tokenize_duckdb_sql("text")
    stop = ", ".join(f"'{w}'" for w in LUCENE_STOPWORDS)
    bpe = _BPE_RE.replace("'", "''")
    return f"""
SELECT doc_id,
       len(list_filter({tok}, t -> t <> '' AND t NOT IN ({stop}))) AS n_tokens,
       CASE WHEN trim(coalesce(text, '')) = '' THEN 0
            ELSE len(string_split_regex(trim(coalesce(text, '')), '\\s+')) END AS n_ws,
       len(regexp_extract_all(coalesce(text, ''), '{bpe}')) AS n_bpe
FROM documents
"""


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t)
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", "")) / F.greatest(n_chars, F.lit(1))
    stop_arr = F.array(*[F.lit(w) for w in LUCENE_STOPWORDS])

    # token array lambda-bound once per row (see text_profile): inlining
    # _raw_tokens per reference re-runs the tokenizer regex 2-3×
    def mk(toks):
        raw_n = F.size(toks)
        filt_n = F.size(F.filter(toks, lambda x: ~F.array_contains(stop_arr, x)))
        stop_ratio = (raw_n - filt_n) / F.greatest(raw_n, F.lit(1))
        quality = (0.4 * alpha + 0.3 * (1.0 - stop_ratio)
                   + 0.3 * F.least(filt_n / F.lit(100.0), F.lit(1.0)))
        return F.struct(F.round(stop_ratio, 6).alias("stop_ratio"),
                        F.round(quality, 6).alias("quality"))

    p = F.element_at(F.transform(F.array(_raw_tokens(t)), mk), 1)
    return docs.select(
        "doc_id", n_chars.alias("n_chars"),
        F.round(alpha, 6).alias("alpha_ratio"), p.alias("_p"),
    ).select("doc_id", "n_chars", "alpha_ratio", "_p.stop_ratio", "_p.quality")


def quality_scores_sql() -> str:
    tok = tokenize_duckdb_sql("text")
    stop = ", ".join(f"'{w}'" for w in LUCENE_STOPWORDS)
    return f"""
WITH b AS (
  SELECT doc_id,
         length(coalesce(text, '')) AS n_chars,
         length(regexp_replace(coalesce(text, ''), '[^a-zA-Z]', '', 'g'))
           * 1.0 / greatest(length(coalesce(text, '')), 1) AS alpha,
         len(list_filter({tok}, t -> t <> '')) AS raw_n,
         len(list_filter({tok}, t -> t <> '' AND t NOT IN ({stop}))) AS filt_n
  FROM documents
)
SELECT doc_id, n_chars,
       round(alpha, 6) AS alpha_ratio,
       round((raw_n - filt_n) * 1.0 / greatest(raw_n, 1), 6) AS stop_ratio,
       round(0.4 * alpha + 0.3 * (1.0 - (raw_n - filt_n) * 1.0 / greatest(raw_n, 1))
             + 0.3 * least(filt_n / 100.0, 1.0), 6) AS quality
FROM b
"""


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.coalesce(F.col(text_col), F.lit(""))

    # token array lambda-bound once per row: the marker counts reference
    # the token array 8× across the CASE arms, and inlining _raw_tokens
    # per reference re-ran the tokenizer regex 8× (measured in-plan)
    def mk(toks):
        counts = {}
        for lang, markers in LANG_MARKERS.items():
            arr = F.array(*[F.lit(m) for m in markers])
            counts[lang] = F.size(
                F.filter(toks, lambda x: F.array_contains(arr, x)))
        return (
            F.when((counts["de"] > counts["en"])
                   & (counts["de"] >= counts["fr"]), "de")
            .when((counts["fr"] > counts["en"])
                  & (counts["fr"] > counts["de"]), "fr")
            .otherwise("en"))

    pred = F.element_at(F.transform(F.array(_raw_tokens(t)), mk), 1)
    return docs.select("doc_id", "lang", pred.alias("lang_pred"))


def lang_id_sql() -> str:
    tok = tokenize_duckdb_sql("text")
    def inlist(lang):
        return ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"""
WITH c AS (
  SELECT doc_id, lang,
         len(list_filter({tok}, t -> t IN ({inlist('en')}))) AS c_en,
         len(list_filter({tok}, t -> t IN ({inlist('de')}))) AS c_de,
         len(list_filter({tok}, t -> t IN ({inlist('fr')}))) AS c_fr
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN c_de > c_en AND c_de >= c_fr THEN 'de'
            WHEN c_fr > c_en AND c_fr > c_de THEN 'fr'
            ELSE 'en' END AS lang_pred
FROM c
"""


# max duplicate-run length over a SORTED string array — equal grams are
# adjacent after array_sort, so the most frequent gram's count is the
# longest equal-run: one fold, no explode, no shuffle
_MAX_RUN = (
    "aggregate(array_sort({arr}), "
    "named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L), "
    "(a, x) -> named_struct('prev', x, "
    "'run', IF(x <=> a.prev, a.run + 1L, 1L), "
    "'best', greatest(a.best, IF(x <=> a.prev, a.run + 1L, 1L))), "
    "a -> a.best)")


def repetition_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1),
    token-window form: (doc_id, n_bigrams, top_bigram_frac,
    dup_trigram_frac).

      top_bigram_frac  — occurrences of the most frequent word 2-gram /
                         total 2-gram occurrences (boilerplate headers,
                         keyword stuffing);
      dup_trigram_frac — fraction of 3-gram occurrences that are repeats
                         (1 − distinct/total; templated spans).

    Entirely per-row Catalyst array expressions — the most-frequent-gram
    count folds over the SORTED gram array (equal grams are adjacent, so
    top frequency == longest equal-run), so the op is map-only: at 100 TB
    it pipelines inside the scan with NO exchange at all, unlike the
    explode+groupBy formulation whose shuffle carries one row per
    (doc, gram)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    # inner select so tokenization runs once per row
    base = docs.select("doc_id", _raw_tokens(t).alias("t")).select(
        "doc_id",
        F.expr("CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2), "
               "i -> concat(t[i], ' ', t[i+1])) "
               "ELSE cast(array() as array<string>) END").alias("bgs"),
        F.expr("CASE WHEN size(t) >= 3 THEN transform(sequence(0, size(t) - 3), "
               "i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])) "
               "ELSE cast(array() as array<string>) END").alias("tgs"),
    ).select(
        "doc_id",
        F.size("bgs").alias("n_bigrams"),
        F.expr(_MAX_RUN.format(arr="bgs")).alias("max_bg"),
        F.size("tgs").alias("n_trigrams"),
        F.size(F.array_distinct("tgs")).alias("d_tgs"),
    )
    top_bg = F.when(F.col("n_bigrams") > 0,
                    F.col("max_bg") / F.col("n_bigrams")).otherwise(F.lit(0.0))
    dup_tg = F.when(F.col("n_trigrams") > 0,
                    1.0 - F.col("d_tgs") / F.col("n_trigrams")).otherwise(F.lit(0.0))
    return base.select("doc_id",
                       F.col("n_bigrams").cast("long").alias("n_bigrams"),
                       F.round(top_bg, 6).alias("top_bigram_frac"),
                       F.round(dup_tg, 6).alias("dup_trigram_frac"))


def repetition_scores_sql() -> str:
    """DuckDB twin — same numbers via unnest+GROUP BY (the oracle mirrors
    results, not the plan shape)."""
    tok = tokenize_duckdb_sql("text")
    return f"""
WITH tk AS (
  SELECT doc_id, list_filter({tok}, t -> t <> '') AS l FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(l) >= 2 THEN list_transform(range(1, len(l)),
              i -> l[i] || ' ' || l[i + 1]) ELSE [] END AS bgs,
         CASE WHEN len(l) >= 3 THEN list_transform(range(1, len(l) - 1),
              i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2]) ELSE [] END AS tgs
  FROM tk
),
bg AS (SELECT doc_id, unnest(bgs) AS b FROM g),
bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
bm AS (SELECT doc_id, max(c) AS max_bg FROM bc GROUP BY 1)
SELECT g.doc_id,
       CAST(len(bgs) AS BIGINT) AS n_bigrams,
       round(CASE WHEN len(bgs) > 0
                  THEN coalesce(bm.max_bg, 0) * 1.0 / len(bgs)
                  ELSE 0.0 END, 6) AS top_bigram_frac,
       round(CASE WHEN len(tgs) > 0
                  THEN 1.0 - len(list_distinct(tgs)) * 1.0 / len(tgs)
                  ELSE 0.0 END, 6) AS dup_trigram_frac
FROM g LEFT JOIN bm USING (doc_id)
"""


def text_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """ALL per-document text signals in ONE map-only pass — the shape a
    real feature-extraction job runs (tokenize once, emit every column),
    instead of N operators × N tokenizations:

      (doc_id, n_tokens, n_ws, n_bpe, n_chars, alpha_ratio, stop_ratio,
       quality, n_bigrams, top_bigram_frac, dup_trigram_frac, lang_pred)

    Column-for-column identical to token_counts / quality_scores /
    repetition_scores / lang_id (pinned by tests/test_textstats.py).
    The raw token array binds ONCE PER ROW through a higher-order lambda
    (`transform(array(tokenize), toks -> struct(...))[0]`) — the same
    optimizer-proofing as curation.curate: a plain projected column gets
    inlined into every downstream reference by CollapseProject/
    replaceAlias, re-running the tokenizer regex ~10×."""
    from .curation import _max_run, _ngram_arr  # Column-form helpers

    t = F.coalesce(F.col(text_col), F.lit(""))
    stop_arr = F.array(*[F.lit(w) for w in LUCENE_STOPWORDS])
    n_ws = F.when(F.trim(t) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+")))
    n_bpe = F.size(F.regexp_extract_all(t, F.lit(_BPE_RE), 0))
    n_chars = F.length(t)
    alpha = (F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
             / F.greatest(n_chars, F.lit(1)))

    # LAYERED projections, not one fused lambda: stage 1 holds every
    # regex (tokenizer, BPE, alpha) and stays inside whole-stage codegen
    # — a single expression containing the run-length fold would drag the
    # regexes into interpreted eval (HOFs have no codegen). Stage 2+
    # reference the materialized `_toks` attribute many times, which is
    # SAFE here: Project-over-Project collapse refuses multi-reference
    # non-cheap merges (it is specifically FILTER pushdown that inlines
    # unconditionally — the curate-gate pitfall, SURVEY §10.3).
    s1 = docs.select(
        "doc_id", _raw_tokens(t).alias("_toks"),
        n_ws.alias("n_ws"), n_bpe.alias("n_bpe"), n_chars.alias("n_chars"),
        alpha.alias("_alpha"))
    toks = F.col("_toks")
    counts = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        counts[lang] = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
    s2 = s1.select(
        "doc_id", "n_ws", "n_bpe", "n_chars", "_alpha",
        F.size(toks).alias("_raw_n"),
        F.size(F.filter(toks, lambda x: ~F.array_contains(stop_arr, x))
               ).alias("n_tokens"),
        _ngram_arr(toks, 2).alias("_bgs"),
        _ngram_arr(toks, 3).alias("_tgs"),
        (F.when((counts["de"] > counts["en"])
                & (counts["de"] >= counts["fr"]), "de")
         .when((counts["fr"] > counts["en"])
               & (counts["fr"] > counts["de"]), "fr")
         .otherwise("en")).alias("lang_pred"))
    stop_ratio = ((F.col("_raw_n") - F.col("n_tokens"))
                  / F.greatest(F.col("_raw_n"), F.lit(1)))
    quality = (0.4 * F.col("_alpha") + 0.3 * (1.0 - stop_ratio)
               + 0.3 * F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)))
    n_bg, n_tg = F.size(F.col("_bgs")), F.size(F.col("_tgs"))
    top_bg = F.when(n_bg > 0, _max_run(F.col("_bgs")) / n_bg
                    ).otherwise(F.lit(0.0))
    dup_tg = F.when(n_tg > 0,
                    1.0 - F.size(F.array_distinct(F.col("_tgs"))) / n_tg
                    ).otherwise(F.lit(0.0))
    return s2.select(
        "doc_id", "n_tokens", "n_ws", "n_bpe", "n_chars",
        F.round(F.col("_alpha"), 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
        n_bg.cast("long").alias("n_bigrams"),
        F.round(top_bg, 6).alias("top_bigram_frac"),
        F.round(dup_tg, 6).alias("dup_trigram_frac"),
        "lang_pred")


def text_profile_sql() -> str:
    """DuckDB twin: the individual operators' own SQL twins joined on
    doc_id (results, not plan shape)."""
    return f"""
SELECT t.doc_id, t.n_tokens, t.n_ws, t.n_bpe,
       q.n_chars, q.alpha_ratio, q.stop_ratio, q.quality,
       r.n_bigrams, r.top_bigram_frac, r.dup_trigram_frac, l.lang_pred
FROM ({token_counts_sql()}) t
JOIN ({quality_scores_sql()}) q USING (doc_id)
JOIN ({repetition_scores_sql()}) r USING (doc_id)
JOIN ({lang_id_sql()}) l ON t.doc_id = l.doc_id
"""


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive 56-bit content fingerprint per doc."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = docs.select("doc_id", F.explode_outer(_raw_tokens(t)).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    h = F.expr(MD5INT_SPARK.format(x="concat(term, ':', cast(tf as string))"))
    return (tf.withColumn("h", F.when(F.col("term").isNull(), F.lit(0)).otherwise(h))
            .groupBy("doc_id").agg(F.expr("bit_xor(h)").alias("fp")))


def fingerprints_sql() -> str:
    tok = tokenize_duckdb_sql("text")
    md5i = MD5INT_DUCK.format(x="term || ':' || CAST(tf AS VARCHAR)")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter({tok}, t -> t <> '')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
h AS (SELECT doc_id, {md5i} AS h FROM tf)
SELECT d.doc_id, coalesce(x.fp, 0) AS fp
FROM documents d LEFT JOIN (SELECT doc_id, bit_xor(h) AS fp FROM h GROUP BY 1) x
USING (doc_id)
"""
