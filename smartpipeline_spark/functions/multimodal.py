"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the bytes live in a
``binary`` column (or out-of-line object-store keys), metadata is
typed columns, and decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes cross into Python once per batch, not per
row. Media codecs are not in this container, so the decode kernel is
a clearly-marked deterministic fake behind the real Spark plumbing
(schema, batching, partitioning are all real and tested).

The test corpus has no binary table, so we synthesize the binary
column from documents.text (utf-8 encode) — byte-level metadata is
then DuckDB-oracled end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from smartpipeline_spark import sources
from smartpipeline_spark.functions import ext_query


def binary_documents(spark, sf_dir) -> DataFrame:
    """documents with an opaque payload column, as a media table would
    look: (doc_id, payload binary, n_bytes)."""
    d = sources.table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
    )


@ext_query(
    "ext_multimodal_meta",
    """SELECT doc_id,
              octet_length(encode(text)) AS n_bytes,
              substring(hex(encode(text)), 1, 16) AS header_hex
       FROM documents""",
)
def ext_multimodal_meta(spark, sf_dir):
    """Typed metadata extraction from the binary payload — stays fully
    JVM-side (no decode needed for filtering/routing at scale)."""
    b = binary_documents(spark, sf_dir)
    return b.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.hex(F.expr("substring(payload, 1, 8)")).alias("header_hex"),
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB: stands in for an image/audio decoder (PIL/ffmpeg not in
    this container). Deterministic function of the bytes so tests are
    stable. A real deployment replaces ONLY this function; the Spark
    plumbing around it is production-shaped."""
    if payload is None:
        raise NotImplementedError("real media decode requires codec libs")
    n = len(payload)
    return {
        "width": (payload[0] if n > 0 else 0) + 1,
        "height": (payload[1] if n > 1 else 0) + 1,
        "n_frames": 1 + n % 7,
    }


@ext_query("ext_multimodal_decode")  # decode stub: rows-only check
def ext_multimodal_decode(spark, sf_dir):
    """Decode / feature-extract via mapInPandas: bytes cross the Arrow
    boundary in columnar batches; output schema is declared statically.
    This is the template for resize / frame-sample / embed kernels."""
    b = binary_documents(spark, sf_dir)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "n_frames": [m["n_frames"] for m in meta],
                }
            )

    return b.mapInPandas(
        decode_batches, schema="doc_id bigint, width int, height int, n_frames int"
    )
