"""Deterministic at-scale synthetic corpus for throughput/scaling runs.

The driver testdata tops out at 5,000 docs (~1.5 MB of text) — at that
size Spark's fixed per-job costs dominate and a parallelism comparison
measures scheduler overhead, not the engine. The north_rule's
two-cluster-size criterion needs a compute-bound build, so this module
synthesizes an arbitrarily large ``docs(repo, path, commit, lang,
content)`` table (the BASELINE.json input_hint shape):

* content is code-like: Zipf-distributed draws from a ~20k-identifier
  vocabulary (camelCase / snake_case / kebab-case over stem pairs), the
  natural shape of source code (hot terms like ``license``/``return``
  have millions-long posting lists — the skew the index build must
  handle);
* every value is a pure function of (doc id, seed) — independent of
  partitioning and parallelism, so runs at local[8] and local[32] index
  byte-identical input (generation happens once, to parquet, OUTSIDE the
  timed build);
* generation itself is distributed (mapInPandas over spark.range — numpy
  vectorized, no per-row Python).
"""

from __future__ import annotations

import itertools
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_STEMS = [
    "parse", "build", "index", "query", "token", "score", "merge", "block",
    "read", "write", "fetch", "cache", "hash", "split", "filter", "count",
    "map", "reduce", "sort", "join", "scan", "load", "store", "flush",
    "encode", "decode", "pack", "slice", "batch", "chunk", "group", "rank",
    "node", "edge", "tree", "list", "heap", "stack", "queue", "ring",
    "open", "close", "init", "free", "alloc", "copy", "move", "swap",
]
_KEYWORDS = ["def", "class", "return", "import", "public", "static", "void",
             "func", "val", "match", "struct", "range", "license", "apache"]
_LANGS = ["java", "python", "scala", "go", "text"]


def _vocabulary() -> list[str]:
    """~20k deterministic identifiers: all stem pairs in three casings."""
    vocab = list(_KEYWORDS)
    for a, b in itertools.product(_STEMS, _STEMS):
        vocab.append(a + b.capitalize())   # camelCase
        vocab.append(f"{a}_{b}")           # snake_case
        vocab.append(f"{a}-{b}")           # kebab-case
    return vocab


def _zipf_cdf(n: int, s: float = 1.07) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return np.cumsum(w / w.sum())


_MUL = np.uint64(6364136223846793005)
_INC = np.uint64(1442695040888963407)


def _hash64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style mix — vectorized, partition-independent."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) * _MUL
    x ^= x >> np.uint64(29)
    x *= _INC
    x ^= x >> np.uint64(32)
    return x


def generate_scale_corpus(spark: SparkSession, n_docs: int, seed: int = 42,
                          words_min: int = 100, words_max: int = 300) -> DataFrame:
    vocab = np.array(_vocabulary(), dtype=object)
    cdf = _zipf_cdf(len(vocab))
    seed64 = np.uint64(seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.uint64)
            n = ids.size
            if n == 0:
                continue
            nw = (words_min
                  + (_hash64(ids ^ seed64) % np.uint64(words_max - words_min))
                  ).astype(np.int64)
            total = int(nw.sum())
            # one flat (doc, word-slot) space, fully vectorized
            doc_idx = np.repeat(np.arange(n, dtype=np.uint64), nw)
            slot = np.concatenate([np.arange(c, dtype=np.uint64) for c in nw])
            u = _hash64(ids[doc_idx.astype(np.int64)] * np.uint64(131071)
                        + slot + seed64)
            uniform = (u >> np.uint64(11)).astype(np.float64) / float(1 << 53)
            word_ix = np.searchsorted(cdf, uniform)
            words = vocab[np.minimum(word_ix, len(vocab) - 1)]
            bounds = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(nw, out=bounds[1:])
            content = [" ".join(words[bounds[i]:bounds[i + 1]]) for i in range(n)]

            sids = ids.astype(np.int64)
            yield pd.DataFrame({
                "repo": [f"repo{int(i) % 64:02d}" for i in sids],
                "path": [f"src/mod{int(i) % 97}/File{int(i):09d}.py" for i in sids],
                "commit": [f"{int(h):016x}{int(h2):016x}00000000"
                           for h, h2 in zip(_hash64(ids + np.uint64(1)),
                                            _hash64(ids + np.uint64(2)))],
                "lang": [_LANGS[int(i) % len(_LANGS)] for i in sids],
                "content": content,
            })
            del words, content

    parallelism = spark.sparkContext.defaultParallelism
    return spark.range(0, n_docs, 1, max(parallelism * 2, 8)).mapInPandas(
        gen, "repo string, path string, commit string, lang string, content string")


def materialize_scale_corpus(spark: SparkSession, n_docs: int, out_path: str,
                             seed: int = 42) -> str:
    """Write the corpus to parquet (idempotent per path); returns out_path."""
    import os
    if not os.path.exists(os.path.join(out_path, "_DONE")):
        generate_scale_corpus(spark, n_docs, seed).write.mode("overwrite").parquet(out_path)
        with open(os.path.join(out_path, "_DONE"), "w") as fh:
            fh.write(str(n_docs))
    return out_path
