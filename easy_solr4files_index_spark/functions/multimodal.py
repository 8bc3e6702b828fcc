"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched kernels (mapInPandas).

The decode/feature-extract step is STUBBED (no image/audio libs in this
container — clearly marked below); everything Spark-side is real and
tested: binary column handling, Arrow batch shapes, UDF signatures,
deterministic fake features so the pipeline is end-to-end verifiable
against a DuckDB oracle on byte lengths and derived metadata.

This mirrors how the reference treats file bytes as an opaque stream
handed to an extraction sidecar (Tika via Solr Cell, Solr.scala:133-143,
solrconfig.xml:990-1002) with size/mime gating (Solr.scala:59-61): we
gate on byte length and "decode" behind the same kind of boundary.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MAX_DECODE_BYTES = 64 * 1024 * 1024  # reference: 64 MiB extraction cap
                                     # (application.properties:24, ApplicationWiring.scala:61)

# the reference's extraction mime allowlist (application.properties:25-31);
# the gate is size AND mime (Solr.scala:59-61)
MIME_ALLOWLIST = (
    "text/plain", "text/xml", "text/html", "application/pdf",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
)

# deterministic per-doc mime (pure function of doc_id, replicated in SQL);
# index 5 (image/png) falls outside the allowlist
_MIMES = MIME_ALLOWLIST + ("image/png",)


def _mime_of(doc_id: int) -> str:
    return _MIMES[doc_id % len(_MIMES)]


def real_image_decode(payload: bytes) -> dict:
    """REAL decode would go here (PIL/ffmpeg). Not available in this
    environment — stubbed on purpose; the Spark plumbing around it is
    real and tested with the deterministic fake below."""
    raise NotImplementedError("image/audio decode libs not available in this container")


def _fake_meta(n_bytes: int) -> tuple[int, int]:
    # deterministic fake "decoded" dimensions — replicable in SQL
    return n_bytes % 640, (n_bytes * 7) % 480


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents -> (doc_id, mime, payload binary) — UTF-8 bytes stand in
    for an opaque media blob; mime is typed metadata riding alongside."""
    mimes = F.array(*[F.lit(m) for m in _MIMES])
    return docs.select(
        "doc_id",
        F.element_at(mimes, (F.col("doc_id") % len(_MIMES) + 1).cast("int")).alias("mime"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8").alias("payload"))


def decode_features(with_payload: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """(doc_id, mime, byte_len, width, height, gated) via an Arrow-batched
    mapInPandas kernel over the binary column — the real 100 TB shape:
    one Python worker per partition, one pandas batch per Arrow batch,
    no per-row Python calls outside the vectorized ops.

    ``gated`` mirrors the reference's FULL extraction gate — size under
    the 64 MiB cap AND mime in the allowlist (Solr.scala:59-61); gated
    docs skip decode and would fall back to metadata-only indexing
    (Solr.scala:65-73 / S10)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)  # bytes objects
            if use_real_decoder:
                # would dispatch to real_image_decode per payload
                raise NotImplementedError("real decoder unavailable; see real_image_decode")
            width = n % 640
            height = (n * 7) % 480
            mime_ok = pdf["mime"].isin(MIME_ALLOWLIST)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "byte_len": n.astype("int64"),
                "width": width.astype("int64"),
                "height": height.astype("int64"),
                "gated": (n > MAX_DECODE_BYTES) | ~mime_ok,
            })

    return with_payload.mapInPandas(
        kernel,
        "doc_id long, mime string, byte_len long, width long, height long, gated boolean")


def decode_features_sql() -> str:
    mimes = ", ".join(f"'{m}'" for m in _MIMES)
    allow = ", ".join(f"'{m}'" for m in MIME_ALLOWLIST)
    return f"""
WITH m AS (
  SELECT doc_id,
         ([{mimes}])[CAST(doc_id % {len(_MIMES)} AS INT) + 1] AS mime,
         octet_length(encode(coalesce(text, ''))) AS byte_len
  FROM documents
)
SELECT doc_id, mime, byte_len,
       byte_len % 640 AS width,
       (byte_len * 7) % 480 AS height,
       byte_len > {MAX_DECODE_BYTES} OR mime NOT IN ({allow}) AS gated
FROM m
"""
