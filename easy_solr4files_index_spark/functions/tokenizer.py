"""Analyzer chain for the catch-all searchable field.

Mirrors the reference's index-side analyzer for ``text_general``
(reference: schema.xml:510-526 — StandardTokenizer → StopFilter →
LowerCaseFilter) plus the WordDelimiterGraph-style identifier splitting
the reference configures for ``text_en_splitting`` (schema.xml:580-610,
splitOnCaseChange=1) — our corpus is source code, so camelCase splitting
is first-class (BASELINE.json north_star: "code-aware tokenizer").

THE SPEC (shared by the Spark expression, the vectorized pandas UDF, the
pure-Python oracle tokenizer, and the DuckDB oracle SQL — all four must
agree token-for-token):

  1. camelCase boundaries become spaces:
       ([a-z0-9])([A-Z])      -> "\\1 \\2"     (fooBar -> foo Bar)
       ([A-Z]+)([A-Z][a-z])   -> "\\1 \\2"     (HTTPServer -> HTTP Server)
  2. lowercase everything
  3. split on runs of [^a-z0-9]+ (this is the StandardTokenizer +
     snake/kebab/path splitting in one step: '_', '-', '/', '.', etc.
     are all delimiters)
  4. drop empty tokens
  5. drop stopwords (Lucene's classic English default set — the
     reference ships an *empty* stopwords.txt (schema.xml:507) but wires
     a StopFilter (schema.xml:513); we ship Lucene's default list as the
     engine default, configurable to empty)

There is deliberately NO stemming: the reference's catch-all ``text``
field is text_general, not text_en (schema.xml:213; Porter stemmer only
exists on unused *_en fields, schema.xml:533-569).
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd
from pyspark.sql import Column, functions as F

# Lucene ENGLISH_STOP_WORDS_SET (the StopFilter default the reference's
# analyzer chain references; schema.xml:513).
LUCENE_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)

# regex pieces — identical semantics in Spark (Java regex), Python `re`,
# and DuckDB (RE2): character classes and backrefs only.
_CAMEL_1 = r"([a-z0-9])([A-Z])"
_CAMEL_2 = r"([A-Z]+)([A-Z][a-z])"
_SPLIT = r"[^a-z0-9]+"

_CAMEL_1_RE = re.compile(_CAMEL_1)
_CAMEL_2_RE = re.compile(_CAMEL_2)
_SPLIT_RE = re.compile(_SPLIT)


def tokenize_py(text: str | None, stopwords: Iterable[str] = LUCENE_STOPWORDS) -> list[str]:
    """Pure-Python reference tokenizer (the oracle shares this spec)."""
    if not text:
        return []
    stop = set(stopwords)
    s = _CAMEL_1_RE.sub(r"\1 \2", text)
    s = _CAMEL_2_RE.sub(r"\1 \2", s)
    return [t for t in _SPLIT_RE.split(s.lower()) if t and t not in stop]


def tokenize_expr(col: Column | str, stopwords: Iterable[str] = LUCENE_STOPWORDS) -> Column:
    """JVM-side tokenizer as a Catalyst expression (whole-stage codegen).

    This is the default hot path: built-in functions stay inside codegen
    and avoid any Python/Arrow boundary. The pandas UDF variant below is
    behavior-identical (tested) and exists for the code-aware extensions
    that regexes alone cannot express (catenation).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    s = F.regexp_replace(c, _CAMEL_1, r"$1 $2")
    s = F.regexp_replace(s, _CAMEL_2, r"$1 $2")
    arr = F.split(F.lower(s), _SPLIT)
    stop_arr = F.array(*[F.lit(w) for w in stopwords])
    return F.filter(
        arr,
        lambda t: (F.length(t) > 0) & ~F.array_contains(stop_arr, t),
    )


def make_tokenize_udf(stopwords: Iterable[str] = LUCENE_STOPWORDS, catenate: bool = False):
    """Arrow-vectorized tokenizer (north_star: "vectorized Arrow/pandas
    UDFs ... no per-row Python" — vectorized pandas str ops, one Arrow
    batch at a time).

    With ``catenate=True`` it additionally emits the catenated form of
    each multi-part identifier (WordDelimiterGraph catenateWords=1,
    reference schema.xml:592): ``getHTTPResponse`` -> parts + ``gethttpresponse``.
    """
    stop = set(stopwords)

    @F.pandas_udf("array<string>")
    def tokenize(col: pd.Series) -> pd.Series:
        s = col.fillna("")
        s = s.str.replace(_CAMEL_1_RE, r"\1 \2", regex=True)
        s = s.str.replace(_CAMEL_2_RE, r"\1 \2", regex=True)
        parts = s.str.lower().str.split(_SPLIT_RE)
        if not catenate:
            return parts.map(lambda ts: [t for t in ts if t and t not in stop])

        # catenation needs the original whitespace-delimited words
        orig_words = col.fillna("").str.split(r"\s+", regex=True)

        def cat_row(ts: list[str], words: list[str]) -> list[str]:
            out = [t for t in ts if t and t not in stop]
            for w in words:
                lowered = [p for p in _SPLIT_RE.split(
                    _CAMEL_2_RE.sub(r"\1 \2", _CAMEL_1_RE.sub(r"\1 \2", w)).lower()) if p]
                joined = "".join(lowered)
                if len(lowered) > 1 and joined not in stop:
                    out.append(joined)
            return out

        return pd.Series([cat_row(ts, ws) for ts, ws in zip(parts, orig_words)])

    return tokenize


def tokenize_duckdb_sql(col_expr: str, stopwords: Iterable[str] = LUCENE_STOPWORDS) -> str:
    """The identical chain as a DuckDB scalar returning a list — used to
    assemble oracle SQL. Returns an expression string (list<varchar>);
    callers unnest it and filter with `t <> ''` + the stopword NOT IN.
    """
    return (
        "string_split_regex(lower(regexp_replace(regexp_replace("
        f"coalesce({col_expr}, ''), "
        r"'([a-z0-9])([A-Z])', '\1 \2', 'g'), "
        r"'([A-Z]+)([A-Z][a-z])', '\1 \2', 'g')), '[^a-z0-9]+')"
    )


def stopword_not_in_sql(stopwords: Iterable[str] = LUCENE_STOPWORDS) -> str:
    quoted = ", ".join(f"'{w}'" for w in stopwords)
    return f"term <> '' AND term NOT IN ({quoted})"
