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


def tokenize_py_catenate(text: str | None,
                         stopwords: Iterable[str] = LUCENE_STOPWORDS) -> list[str]:
    """Pure-Python catenate-chain reference: base tokens (same spec as
    tokenize_py) followed by the catenated form of every multi-part
    whitespace word (WordDelimiterGraph catenateWords=1,
    schema.xml:592): ``getHTTPResponse`` -> get http response +
    ``gethttpresponse``. Catenation is equivalent to deleting the
    delimiters from the normalized word, which is how every vectorized
    twin computes it (one regex substitution, no join loop)."""
    if not text:
        return []
    stop = set(stopwords)
    out: list[str] = []
    cats: list[str] = []
    for w in text.split():
        s = _CAMEL_2_RE.sub(r"\1 \2", _CAMEL_1_RE.sub(r"\1 \2", w)).lower()
        parts = [p for p in _SPLIT_RE.split(s) if p]
        out.extend(p for p in parts if p not in stop)
        if len(parts) > 1:
            joined = "".join(parts)
            if joined not in stop:
                cats.append(joined)
    return out + cats


def tokenize_expr_catenate(col: Column | str,
                           stopwords: Iterable[str] = LUCENE_STOPWORDS) -> Column:
    """Catalyst catenate chain (IndexConfig.catenate_words): per
    whitespace word, emit the split parts; multi-part words additionally
    emit the delimiter-deleted catenated form, appended after the base
    stream (token ORDER only matters for positions, and the py/pandas
    twins append identically). Still pure codegen — no Python."""
    stop_list = list(stopwords)

    def not_stop(t):
        if not stop_list:
            return F.lit(True)
        return ~F.array_contains(F.array(*[F.lit(w) for w in stop_list]), t)

    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    words = F.split(c, r"\s+")

    def norm(w):
        s = F.regexp_replace(w, _CAMEL_1, r"$1 $2")
        return F.lower(F.regexp_replace(s, _CAMEL_2, r"$1 $2"))

    parts_ll = F.transform(
        words,
        lambda w: F.filter(F.split(norm(w), _SPLIT), lambda p: F.length(p) > 0))
    base = F.filter(F.flatten(parts_ll), lambda t: not_stop(t))
    cats = F.filter(
        F.zip_with(parts_ll, words,
                   lambda ps, w: F.when(F.size(ps) >= 2,
                                        F.regexp_replace(norm(w), _SPLIT, ""))),
        lambda x: x.isNotNull() & not_stop(x))
    return F.concat(base, cats)


def _filter_list_arrow(la, stop_list: list[str]):
    """Drop empty tokens + stopwords from an Arrow list<string> column
    without touching Python per row: flatten, one C-side mask
    (not_equal + is_in), and rebuild the list offsets with a cumsum."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    flat = pc.list_flatten(la)
    counts = pc.list_value_length(la).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(flat, "")
    if stop_list:
        keep = pc.and_(keep, pc.invert(
            pc.is_in(flat, value_set=pa.array(stop_list, pa.string()))))
    keep_np = keep.fill_null(False).to_numpy(zero_copy_only=False)
    cum = np.concatenate(([0], np.cumsum(keep_np.astype(np.int64))))
    new_offsets = cum[np.concatenate(([0], np.cumsum(counts)))]
    return pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()),
                                    pc.filter(flat, keep))


def make_tokenize_udf(stopwords: Iterable[str] = LUCENE_STOPWORDS, catenate: bool = False):
    """Arrow-vectorized tokenizer (north_star: "vectorized Arrow/pandas
    UDFs ... no per-row Python"): pandas str ops for the regex chain,
    pyarrow C kernels for every list-level step (flatten, masks, offset
    rebuild) — including the catenate path, which round 3 still ran with
    a per-row Python loop.

    With ``catenate=True`` it additionally emits the catenated form of
    each multi-part identifier (WordDelimiterGraph catenateWords=1,
    reference schema.xml:592): ``getHTTPResponse`` -> parts +
    ``gethttpresponse`` — behavior-identical to tokenize_py_catenate and
    tokenize_expr_catenate (4-way parity in tests/test_tokenizer.py).
    """
    stop_list = list(stopwords)
    stop = set(stop_list)

    @F.pandas_udf("array<string>")
    def tokenize(col: pd.Series) -> pd.Series:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        s = col.fillna("")
        if not catenate:
            s = s.str.replace(_CAMEL_1_RE, r"\1 \2", regex=True)
            s = s.str.replace(_CAMEL_2_RE, r"\1 \2", regex=True)
            parts = s.str.lower().str.split(_SPLIT_RE)
            return _filter_list_arrow(
                pa.array(parts.to_list(), type=pa.list_(pa.string())),
                stop_list).to_pandas()

        # catenate: per-WORD processing, still fully vectorized — the
        # words of every row are flattened into one flat Series, the
        # regex chain runs once over it, and rows are reassembled from
        # offsets (numpy cumsums + one stable lexsort).
        words = s.str.split(r"\s+", regex=True)
        wl = pa.array(words.to_list(), type=pa.list_(pa.string()))
        words_per_row = pc.list_value_length(wl).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_rows = len(words_per_row)
        flat_words = pc.list_flatten(wl).to_pandas()
        word_row = np.repeat(np.arange(n_rows, dtype=np.int64), words_per_row)
        norm = (flat_words.str.replace(_CAMEL_1_RE, r"\1 \2", regex=True)
                .str.replace(_CAMEL_2_RE, r"\1 \2", regex=True).str.lower())
        parts_pw = pa.array(norm.str.split(_SPLIT_RE).to_list(),
                            type=pa.list_(pa.string()))
        flat_parts = pc.list_flatten(parts_pw)
        ppw = pc.list_value_length(parts_pw).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        part_row = np.repeat(word_row, ppw)
        # base-token mask: non-empty + not stopword (C kernels)
        keep = pc.not_equal(flat_parts, "")
        nonempty = keep.fill_null(False).to_numpy(zero_copy_only=False)
        if stop_list:
            keep = pc.and_(keep, pc.invert(pc.is_in(
                flat_parts, value_set=pa.array(stop_list, pa.string()))))
        keep_np = keep.fill_null(False).to_numpy(zero_copy_only=False)
        base_vals = pc.filter(flat_parts, keep).to_numpy(zero_copy_only=False)
        base_rows = part_row[keep_np]
        # catenated form per word = delimiters deleted from the
        # normalized word; multipart = >= 2 NON-EMPTY parts
        cum_ne = np.concatenate(([0], np.cumsum(nonempty.astype(np.int64))))
        word_bounds = np.concatenate(([0], np.cumsum(ppw)))
        ne_per_word = cum_ne[word_bounds[1:]] - cum_ne[word_bounds[:-1]]
        cat_series = norm.str.replace(_SPLIT_RE, "", regex=True)
        cat_np = cat_series.to_numpy()
        multi = ne_per_word >= 2
        if stop and multi.any():
            multi &= ~pc.is_in(pa.array(cat_np, pa.string()),
                               value_set=pa.array(stop_list, pa.string())
                               ).fill_null(False).to_numpy(zero_copy_only=False)
        cat_vals = cat_np[multi]
        cat_rows = word_row[multi]
        # assemble per row: base tokens first, then catenations (stable
        # lexsort preserves in-class order)
        vals = np.concatenate([base_vals, cat_vals])
        rows = np.concatenate([base_rows, cat_rows])
        cls = np.concatenate([np.zeros(len(base_vals), np.int8),
                              np.ones(len(cat_vals), np.int8)])
        order = np.lexsort((cls, rows))
        per_row = np.bincount(rows, minlength=n_rows).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(per_row)))
        out = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(vals[order], pa.string()))
        return out.to_pandas()

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


def tokenize_catenate_duckdb_sql(col_expr: str) -> str:
    """The catenate chain as a DuckDB list expression: per whitespace
    word the split parts, then the delimiter-deleted catenated form of
    every multi-part word. Stopword/empty filtering happens downstream
    (same stop_where the base chain uses), matching the engine where
    catenations pass through the same stop filter."""
    norm = ("lower(regexp_replace(regexp_replace(w, "
            r"'([a-z0-9])([A-Z])', '\1 \2', 'g'), "
            r"'([A-Z]+)([A-Z][a-z])', '\1 \2', 'g'))")
    parts = (f"list_filter(string_split_regex({norm}, '[^a-z0-9]+'), "
             "p -> p <> '')")
    joined = f"regexp_replace({norm}, '[^a-z0-9]+', '', 'g')"
    words = rf"string_split_regex(coalesce({col_expr}, ''), '\s+')"
    return (
        "list_concat("
        f"flatten(list_transform({words}, w -> {parts})), "
        f"list_filter(list_transform({words}, "
        f"w -> CASE WHEN len({parts}) >= 2 THEN {joined} END), "
        "x -> x IS NOT NULL))"
    )


def stopword_not_in_sql(stopwords: Iterable[str] = LUCENE_STOPWORDS) -> str:
    quoted = ", ".join(f"'{w}'" for w in stopwords)
    return f"term <> '' AND term NOT IN ({quoted})"
