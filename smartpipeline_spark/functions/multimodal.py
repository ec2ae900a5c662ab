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
    look: (doc_id, payload binary)."""
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


def _fake_resize(payload: bytes, target_w: int, target_h: int) -> bytes:
    """STUB resize kernel: deterministic re-encoding standing in for a
    real image resize (PIL absent). Output length scales with the
    target area so batch-size/memory behavior is realistic."""
    if payload is None:
        raise NotImplementedError("real resize requires codec libs")
    out_len = max(1, (target_w * target_h) // 4)
    reps = (out_len // max(len(payload), 1)) + 1
    return (payload * reps)[:out_len]


def _fake_frames(payload: bytes, every_n: int) -> list[bytes]:
    """STUB frame sampler: deterministic chunking standing in for video
    frame extraction (ffmpeg absent)."""
    if payload is None:
        raise NotImplementedError("real frame sampling requires ffmpeg")
    size = max(16, len(payload) // 10)
    frames = [payload[i : i + size] for i in range(0, len(payload), size)]
    return frames[::every_n]


@ext_query("ext_multimodal_resize")  # stubbed kernel: rows-only check
def ext_multimodal_resize(spark, sf_dir):
    """Resize kernel over mapInPandas: binary in -> binary out with
    typed target metadata. Batch shape and schema are production-real;
    only _fake_resize swaps for a codec-backed kernel."""
    b = binary_documents(spark, sf_dir)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_fake_resize(p, 64, 64) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": 64,
                    "height": 64,
                    "payload": resized,
                    "n_bytes_out": [len(r) for r in resized],
                }
            )

    return b.mapInPandas(
        resize_batches,
        schema="doc_id bigint, width int, height int, payload binary, n_bytes_out int",
    ).select("doc_id", "width", "height", "n_bytes_out")


@ext_query("ext_multimodal_frames")  # stubbed kernel: rows-only check
def ext_multimodal_frames(spark, sf_dir):
    """Frame sampling: 1 media row -> N frame rows (flatMap shape).
    The row-count expansion happens inside mapInPandas so downstream
    operators see ordinary rows; at scale the expansion factor drives
    partition sizing (explode-aware maxRecordsPerBatch)."""
    b = binary_documents(spark, sf_dir)

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, frame in enumerate(_fake_frames(payload, every_n=3)):
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(frame))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_bytes": sizes})

    return b.mapInPandas(
        frame_batches, schema="doc_id bigint, frame_idx int, frame_bytes int"
    )


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
