"""End-to-end training-corpus curation: the composed pipeline a 100 TB
pretraining-data job runs over raw documents —

    quality / repetition / language gates   (ONE map-only pass)
 -> exact dedup, keep deterministic winner  (ONE min_by hash aggregate)
 -> benchmark decontamination               (broadcast anti-join)

Each individual signal exists as a standalone oracle-gated operator
(textstats.quality_scores / repetition_scores / lang_id,
dedup.exact_dup_groups, contamination.decontaminate); ``curate``
composes them with the right SCALE SHAPE instead of naively joining
their outputs:

  * all gate columns derive from one shared token-array projection —
    the corpus is tokenized once and never shuffled for the gates;
  * the keep-one-winner dedup is a single ``min_by(struct(*), doc_id)``
    hash aggregate on the content hash (map-side combinable) — not the
    groupBy-then-self-join formulation, which shuffles the corpus twice;
  * decontamination broadcasts the (small) benchmark n-gram set and
    anti-joins on the contaminated-doc ids.

tests/test_curation.py pins ``curate`` against the literal composition
of the public per-signal operators, so the inlined gate expressions
cannot drift from their oracle-gated twins.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from .contamination import contamination_pairs
from .textstats import LANG_MARKERS
from .tokenizer import LUCENE_STOPWORDS, tokenize_expr


@dataclass(frozen=True)
class CurationConfig:
    """Gate thresholds; None disables a gate. Defaults keep everything
    (each dial opted into explicitly — curation policy is corpus-specific)."""
    min_quality: float | None = None       # textstats.quality_scores formula
    min_tokens: int | None = None          # stopword-filtered analyzer tokens
    max_top_bigram: float | None = None    # repetition_scores.top_bigram_frac
    max_dup_trigram: float | None = None   # repetition_scores.dup_trigram_frac
    langs: tuple[str, ...] | None = None   # predicted (content-based) language
    exact_dedup: bool = True
    contamination_n: int = 3
    contamination_threshold: float = 0.5
    # substring-level span gate (functions/spans.py; Lee et al. 2022):
    # drop docs whose duplicated-span token fraction exceeds the cap —
    # the cross-document boilerplate signal the per-doc gates above
    # cannot see. Corpus-relative (one bucketed spans pass + an
    # anti-join), unlike the map-only gates.
    max_dup_span_fraction: float | None = None
    span_w: int = 15


def _ngram_arr(toks: Column, n: int) -> Column:
    """Word n-grams of a token-array Column (the repetition_scores
    construction, lambda-variable-safe — no column-name SQL strings)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.concat_ws(
                        " ", *[F.get(toks, i + j) for j in range(n)]))
    ).otherwise(F.array().cast("array<string>"))


def _max_run(arr: Column) -> Column:
    """Longest equal-run over the sorted array == the most frequent
    element's count (textstats._MAX_RUN, Column form)."""
    def merge(a, x):
        run = F.when(x.eqNullSafe(a["prev"]),
                     a["run"] + F.lit(1).cast("long")
                     ).otherwise(F.lit(1).cast("long"))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(a["best"], run).alias("best"))
    init = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).cast("long").alias("run"),
                    F.lit(0).cast("long").alias("best"))
    return F.aggregate(F.array_sort(arr), init, merge, lambda a: a["best"])


def _gate_condition(cfg: CurationConfig, text: Column, toks: Column) -> Column:
    """The map-only keep-predicate over (text, token-array) — every term
    mirrors a standalone textstats expression (pinned by test_curation).
    ``toks`` is a LAMBDA VARIABLE (bound once per row by curate's
    transform()), so the many references here are cheap attribute reads,
    not re-evaluations of the tokenizer chain."""
    stop_arr = F.array(*[F.lit(w) for w in LUCENE_STOPWORDS])
    raw_n = F.size(toks)
    filt_n = F.size(F.filter(toks, lambda x: ~F.array_contains(stop_arr, x)))
    cond = F.lit(True)
    if cfg.min_tokens is not None:
        cond &= filt_n >= cfg.min_tokens
    if cfg.min_quality is not None:
        n_chars = F.length(text)
        alpha = (F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
                 / F.greatest(n_chars, F.lit(1)))
        stop_ratio = (raw_n - filt_n) / F.greatest(raw_n, F.lit(1))
        quality = (0.4 * alpha + 0.3 * (1.0 - stop_ratio)
                   + 0.3 * F.least(filt_n / F.lit(100.0), F.lit(1.0)))
        # gate on the ROUNDED score — the published quality_scores column
        cond &= F.round(quality, 6) >= cfg.min_quality
    if cfg.max_top_bigram is not None:
        bgs = _ngram_arr(toks, 2)
        n_bg = F.size(bgs)
        top = F.when(n_bg > 0, _max_run(bgs) / n_bg).otherwise(F.lit(0.0))
        cond &= F.round(top, 6) <= cfg.max_top_bigram
    if cfg.max_dup_trigram is not None:
        tgs = _ngram_arr(toks, 3)
        n_tg = F.size(tgs)
        dup = F.when(n_tg > 0,
                     1.0 - F.size(F.array_distinct(tgs)) / n_tg
                     ).otherwise(F.lit(0.0))
        cond &= F.round(dup, 6) <= cfg.max_dup_trigram
    if cfg.langs is not None:
        counts = {}
        for lang, markers in LANG_MARKERS.items():
            arr = F.array(*[F.lit(m) for m in markers])
            counts[lang] = F.size(
                F.filter(toks, lambda x: F.array_contains(arr, x)))
        pred = (F.when((counts["de"] > counts["en"])
                       & (counts["de"] >= counts["fr"]), "de")
                .when((counts["fr"] > counts["en"])
                      & (counts["fr"] > counts["de"]), "fr")
                .otherwise("en"))
        cond &= pred.isin(*cfg.langs)
    return cond


def gate_predicate(cfg: CurationConfig, text_col: str = "text") -> Column:
    """The keep-predicate as a standalone Column — STATELESS and
    map-only, so it runs identically on a bounded corpus or an unbounded
    stream (streaming/curate_gate.py). Token array lambda-bound once per
    row (see curate below)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    return F.element_at(
        F.transform(F.array(tokenize_expr(text, stopwords=())),
                    lambda toks: _gate_condition(cfg, text, toks)), 1)


def curate(docs: DataFrame, cfg: CurationConfig = CurationConfig(),
           bench: DataFrame | None = None,
           text_col: str = "text") -> DataFrame:
    """The curated corpus (original schema). Deterministic: the dedup
    winner is the min-doc_id row per distinct content (the
    ``exact_dup_groups`` keep rule); gates use the published rounded
    scores, so curate(docs) == the composed standalone operators."""
    cols = docs.columns
    # Bind the token array ONCE PER ROW through a higher-order lambda
    # (gate_predicate): a plain `withColumn("_toks", ...)` + filter gets
    # rewritten by Catalyst's filter-through-project pushdown
    # (replaceAlias), which INLINES the full tokenizer chain into every
    # one of the predicate's ~10 token-array references — measured 20×+
    # regex blow-up at 200k docs (interpreted eval: the fold forces
    # codegen fallback, so no subexpression elimination rescues it).
    # Inside transform() the lambda variable is a cheap attribute; the
    # tokenizer runs once.
    kept = docs.filter(gate_predicate(cfg, text_col))
    if cfg.max_dup_span_fraction is not None:
        from .spans import dup_span_stats
        # span stats are computed over the FULL input corpus (duplicate
        # grams are corpus-relative), then applied as an anti-join
        flagged = (dup_span_stats(docs, w=cfg.span_w, text_col=text_col)
                   .filter(F.col("dup_fraction")
                           > cfg.max_dup_span_fraction)
                   .select("doc_id"))
        kept = kept.join(flagged, "doc_id", "left_anti")
    if cfg.exact_dedup:
        kept = (kept.groupBy(F.md5(F.coalesce(F.col(text_col), F.lit("")))
                     .alias("_h"))
                .agg(F.min_by(F.struct(*cols), F.col("doc_id")).alias("_s"))
                .select("_s.*"))
    if bench is not None:
        hits = (contamination_pairs(kept, bench, n=cfg.contamination_n,
                                    threshold=cfg.contamination_threshold,
                                    text_col=text_col, exclude_self=False)
                .select("doc_id").distinct())
        kept = kept.join(hits, "doc_id", "left_anti")
    return kept


def curate_kept_by_repo_sql(cfg: CurationConfig,
                            bench_where: str = "doc_id % 83 = 0",
                            snippet_tokens: int = 15) -> str:
    """DuckDB twin of the WHOLE pipeline over ``documents`` (per-repo
    survivor counts): composes the standalone operators' own SQL twins
    (quality / repetition / lang-ID / token-count / n-gram containment)
    as nested CTE subqueries, dedups with row_number-over-content-hash
    (== the min_by winner), and screens against the snippet bench."""
    from .contamination import _ngrams_sql, bench_sh_sql
    from .textstats import (lang_id_sql, quality_scores_sql,
                            repetition_scores_sql, token_counts_sql)

    gates = []
    if cfg.min_tokens is not None:
        gates.append(f"tx.n_tokens >= {cfg.min_tokens}")
    if cfg.min_quality is not None:
        gates.append(f"qx.quality >= {cfg.min_quality}")
    if cfg.max_top_bigram is not None:
        gates.append(f"rx.top_bigram_frac <= {cfg.max_top_bigram}")
    if cfg.max_dup_trigram is not None:
        gates.append(f"rx.dup_trigram_frac <= {cfg.max_dup_trigram}")
    if cfg.langs is not None:
        langs = ", ".join(f"'{x}'" for x in cfg.langs)
        gates.append(f"lx.lang_pred IN ({langs})")
    span_cte = ""
    if cfg.max_dup_span_fraction is not None:
        from .spans import dup_span_stats_sql
        span_cte = (
            f"spanflag AS (SELECT doc_id FROM ({dup_span_stats_sql(w=cfg.span_w)}) "
            f"WHERE dup_fraction > {cfg.max_dup_span_fraction}),\n")
        gates.append("d.doc_id NOT IN (SELECT doc_id FROM spanflag)")
    where = " AND ".join(gates) or "TRUE"
    n = cfg.contamination_n
    return f"""
WITH {span_cte}qx AS (SELECT * FROM ({quality_scores_sql()})),
rx AS (SELECT * FROM ({repetition_scores_sql()})),
lx AS (SELECT * FROM ({lang_id_sql()})),
tx AS (SELECT * FROM ({token_counts_sql()})),
gated AS (
  SELECT d.* FROM documents d
  JOIN qx USING (doc_id) JOIN rx USING (doc_id)
  JOIN lx ON d.doc_id = lx.doc_id JOIN tx USING (doc_id)
  WHERE {where}
),
dd AS (SELECT *, row_number() OVER (
         PARTITION BY md5(coalesce(text, '')) ORDER BY doc_id) AS rn
       FROM gated),
kept AS (SELECT * EXCLUDE (rn) FROM dd WHERE rn = 1),
k_sh AS (SELECT id AS doc_id, sh FROM {_ngrams_sql(n, 'kept', 'doc_id')}),
b_sh AS (SELECT * FROM {bench_sh_sql(n, bench_where, snippet_tokens)}),
b_tot AS (SELECT bench_id, count(*) AS bench_total FROM b_sh GROUP BY 1),
hits AS (
  SELECT DISTINCT m.doc_id
  FROM (SELECT k.doc_id, b.bench_id, count(*) AS matched
        FROM k_sh k JOIN b_sh b USING (sh) GROUP BY 1, 2) m
  JOIN b_tot USING (bench_id)
  WHERE m.matched * 1.0 / b_tot.bench_total >= {cfg.contamination_threshold}
)
SELECT source AS repo, count(*) AS kept
FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM hits)
GROUP BY 1
"""
