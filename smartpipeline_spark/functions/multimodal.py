"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the bytes live in a
``binary`` column (or out-of-line object-store keys), metadata is
typed columns, and decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes cross into Python once per batch, not per
row.

The decode path is REAL: pure-stdlib (struct + zlib) encoders write
valid PNG / BMP / WAV files, and :func:`decode_media` parses the
actual container formats (PNG IHDR, BMP DIB header, RIFF/WAVE chunk
walk, GIF logical screen, JPEG SOF marker scan) — no codec libraries
needed for header-level metadata. The test corpus has no binary
table, so :func:`synth_media` derives a deterministic media binary
per documents row (format and dimensions are functions of doc_id),
which makes the encode→binary-column→decode round trip exactly
DuckDB-oracle-checkable. Pixel-level ops (full decode of arbitrary
JPEGs, video frames) would need real codec libs; those kernels are
the clearly-marked fakes further down, kept behind the same
production-shaped Spark plumbing.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from smartpipeline_spark import sources
from smartpipeline_spark.functions import ext_query

# ---------------------------------------------------------------------------
# real, dependency-free media encoders (stdlib only) — used to synthesize
# the binary test corpus; any real PNG/BMP/WAV from elsewhere parses too
# ---------------------------------------------------------------------------


def png_bytes(width: int, height: int) -> bytes:
    """A valid 8-bit RGB PNG (deterministic pixels, filter type 0)."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((x + 3 * y) % 256 for x in range(width * 3))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def bmp_bytes(width: int, height: int) -> bytes:
    """A valid bottom-up 24-bit BMP (BITMAPINFOHEADER)."""
    row = ((width * 3 + 3) // 4) * 4  # rows pad to 4 bytes
    img = b"".join(bytes((x + y) % 256 for x in range(row)) for y in range(height))
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(img), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(img), 2835, 2835, 0, 0)
        + img
    )


def wav_bytes(n_samples: int, sample_rate: int = 8000) -> bytes:
    """A valid 16-bit mono PCM WAV (deterministic samples)."""
    data = struct.pack(
        "<%dh" % n_samples, *((i * 37) % 32768 - 16384 for i in range(n_samples))
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# ---------------------------------------------------------------------------
# real, dependency-free media parser
# ---------------------------------------------------------------------------


def decode_media(payload: Optional[bytes]) -> dict:
    """Parse real container headers: kind + width/height (images) or
    duration/channels/sample-rate (audio). Pure stdlib; handles PNG,
    BMP, GIF, JPEG (SOF marker scan), and RIFF/WAVE (chunk walk)."""
    out: dict = {
        "kind": "unknown",
        "width": None,
        "height": None,
        "duration_ms": None,
        "sample_rate": None,
        "channels": None,
    }
    b = payload
    if not b:
        return out
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        out["kind"] = "png"
        out["width"], out["height"] = struct.unpack(">II", b[16:24])
    elif b[:2] == b"BM" and len(b) >= 26:
        out["kind"] = "bmp"
        w, h = struct.unpack("<ii", b[18:26])
        out["width"], out["height"] = w, abs(h)  # negative h = top-down rows
    elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        out["kind"] = "gif"
        out["width"], out["height"] = struct.unpack("<HH", b[6:10])
    elif b[:2] == b"\xff\xd8":
        out["kind"] = "jpeg"
        o = 2  # scan segment markers for a start-of-frame
        while o + 9 <= len(b) and b[o] == 0xFF:
            marker = b[o + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
                out["height"], out["width"] = struct.unpack(">HH", b[o + 5 : o + 9])
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                o += 2  # bare markers carry no length
                continue
            o += 2 + struct.unpack(">H", b[o + 2 : o + 4])[0]
    elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        out["kind"] = "wav"
        o, byte_rate, data_size = 12, None, None
        while o + 8 <= len(b):
            tag, size = b[o : o + 4], struct.unpack("<I", b[o + 4 : o + 8])[0]
            if tag == b"fmt " and o + 24 <= len(b):
                (_, channels, rate, brate, _, _) = struct.unpack(
                    "<HHIIHH", b[o + 8 : o + 24]
                )
                out["channels"], out["sample_rate"], byte_rate = channels, rate, brate
            elif tag == b"data":
                data_size = size
            o += 8 + size + (size & 1)  # RIFF chunks pad to even offsets
        if byte_rate and data_size is not None:
            out["duration_ms"] = data_size * 1000 // byte_rate
    return out


def binary_documents(spark, sf_dir) -> DataFrame:
    """documents with an opaque payload column, as a media table would
    look: (doc_id, payload binary)."""
    d = sources.table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
    )


def synth_media(spark, sf_dir) -> DataFrame:
    """(doc_id, payload) with REAL media binaries: format and
    dimensions are deterministic functions of doc_id (kind cycles
    png/bmp/wav; images are (4+id%29)×(4+id%17); wav carries
    400+(id%50)·80 samples at 8 kHz), so an oracle can recompute the
    expected decoded metadata from doc_id alone while the engine
    actually encodes and re-parses container bytes."""
    d = sources.table(spark, "documents", sf_dir).select("doc_id")

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                k = i % 3
                if k == 0:
                    payloads.append(png_bytes(4 + i % 29, 4 + i % 17))
                elif k == 1:
                    payloads.append(bmp_bytes(4 + i % 29, 4 + i % 17))
                else:
                    payloads.append(wav_bytes(400 + (i % 50) * 80, 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return d.mapInPandas(encode_batches, schema="doc_id bigint, payload binary")


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


# ---------------------------------------------------------------------------
# real pixel-level ops: PNG/BMP decode-to-pixels, nearest-neighbor resize,
# WAV frame windowing — still pure stdlib
# ---------------------------------------------------------------------------


def _png_pixels(b: bytes) -> tuple[int, int, int, list[bytearray]]:
    """Full PNG scanline decode for 8-bit RGB/RGBA: walks chunks,
    inflates IDAT, reverses all five filter types (None/Sub/Up/
    Average/Paeth). Returns (width, height, bytes-per-pixel, rows)."""
    w, h = struct.unpack(">II", b[16:24])
    depth, color = b[24], b[25]
    if depth != 8 or color not in (2, 6):
        raise ValueError(f"unsupported PNG (depth={depth}, color={color})")
    bpp = 3 if color == 2 else 4
    idat, o = bytearray(), 8
    while o + 8 <= len(b):
        ln = struct.unpack(">I", b[o : o + 4])[0]
        tag = b[o + 4 : o + 8]
        if tag == b"IDAT":
            idat += b[o + 8 : o + 8 + ln]
        o += 12 + ln  # len + tag + data + crc
    raw = zlib.decompress(bytes(idat))
    stride = w * bpp
    rows: list[bytearray] = []
    prev = bytearray(stride)
    for y in range(h):
        base = y * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                p = a + prev[i] - c
                pa, pb, pc = abs(p - a), abs(p - prev[i]), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (prev[i] if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        rows.append(line)
        prev = line
    return w, h, bpp, rows


def _png_from_pixels(w: int, h: int, bpp: int, rows: list[bytearray]) -> bytes:
    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    color = 2 if bpp == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _bmp_pixels(b: bytes) -> tuple[int, int, int, list[bytearray]]:
    """24-bit BMP rows, unpadded, top-down order."""
    off = struct.unpack("<I", b[10:14])[0]
    w, h = struct.unpack("<ii", b[18:26])
    stride = ((w * 3 + 3) // 4) * 4
    rows = [
        bytearray(b[off + y * stride : off + y * stride + w * 3]) for y in range(abs(h))
    ]
    if h > 0:  # bottom-up storage -> top-down pixels
        rows.reverse()
    return w, abs(h), 3, rows


def _bmp_from_pixels(w: int, h: int, rows: list[bytearray]) -> bytes:
    stride = ((w * 3 + 3) // 4) * 4
    pad = bytes(stride - w * 3)
    img = b"".join(bytes(r) + pad for r in reversed(rows))
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(img), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0)
        + img
    )


def resize_image(payload: bytes, target_w: int, target_h: int) -> bytes:
    """REAL nearest-neighbor resize for PNG (8-bit RGB/RGBA, any
    filter) and 24-bit BMP, round-tripping through the same container
    format. Raises NotImplementedError for formats that need codec
    libs (JPEG entropy decode)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, bpp, rows = _png_pixels(payload)
        out = _nn_sample(rows, w, h, bpp, target_w, target_h)
        return _png_from_pixels(target_w, target_h, bpp, out)
    if payload[:2] == b"BM":
        w, h, bpp, rows = _bmp_pixels(payload)
        out = _nn_sample(rows, w, h, bpp, target_w, target_h)
        return _bmp_from_pixels(target_w, target_h, out)
    raise NotImplementedError("resize needs codec libs for this format")


def _nn_sample(rows, w, h, bpp, tw, th) -> list[bytearray]:
    xs = [min(w - 1, (x * w) // tw) * bpp for x in range(tw)]
    out = []
    for y in range(th):
        src = rows[min(h - 1, (y * h) // th)]
        line = bytearray(tw * bpp)
        for xi, sx in enumerate(xs):
            line[xi * bpp : (xi + 1) * bpp] = src[sx : sx + bpp]
        out.append(line)
    return out


def wav_frames(payload: bytes, frame_ms: int = 50) -> list[bytes]:
    """REAL audio frame sampler: fixed windows over the PCM data chunk
    (frame = frame_ms worth of samples at the file's own rate)."""
    meta = decode_media(payload)
    if meta["kind"] != "wav" or not meta["sample_rate"]:
        raise NotImplementedError("frame sampling implemented for WAV only")
    o, data = 12, b""
    while o + 8 <= len(payload):
        tag, size = payload[o : o + 4], struct.unpack("<I", payload[o + 4 : o + 8])[0]
        if tag == b"data":
            data = payload[o + 8 : o + 8 + size]
            break
        o += 8 + size + (size & 1)
    frame_bytes = meta["sample_rate"] * 2 * meta["channels"] * frame_ms // 1000
    return [data[i : i + frame_bytes] for i in range(0, len(data), frame_bytes)]


# Pinned resized-PNG byte sizes per (doc_id%29, doc_id%17) residue
# class: synth_media's pixels are pure functions of (x, y), so the
# 16x12 nearest-neighbor resample + PNG re-encode of a (4+a, 4+b)
# source depends ONLY on the residue pair — 493 classes cover every
# possible payload at any sf. Pinned STATICALLY (not computed at
# import) so a kernel regression diverges from the pins and reddens
# the driver row; test_resize_oracle_pins_match_kernel re-derives all
# 493 via resize_image on every suite run so the pins cannot rot.
_RESIZE_PNG_PINS = "(0,0,115),(0,1,124),(0,2,127),(0,3,132),(0,4,136),(0,5,138),(0,6,142),(0,7,150),(0,8,152),(0,9,152),(0,10,160),(0,11,164),(0,12,169),(0,13,170),(0,14,172),(0,15,173),(0,16,178),(1,0,125),(1,1,136),(1,2,139),(1,3,145),(1,4,147),(1,5,155),(1,6,165),(1,7,169),(1,8,170),(1,9,170),(1,10,177),(1,11,181),(1,12,187),(1,13,189),(1,14,188),(1,15,193),(1,16,197),(2,0,139),(2,1,146),(2,2,153),(2,3,159),(2,4,170),(2,5,179),(2,6,180),(2,7,183),(2,8,185),(2,9,185),(2,10,192),(2,11,201),(2,12,201),(2,13,204),(2,14,205),(2,15,210),(2,16,216),(3,0,139),(3,1,149),(3,2,154),(3,3,163),(3,4,173),(3,5,179),(3,6,184),(3,7,189),(3,8,186),(3,9,186),(3,10,198),(3,11,201),(3,12,205),(3,13,206),(3,14,207),(3,15,209),(3,16,219),(4,0,130),(4,1,135),(4,2,141),(4,3,145),(4,4,149),(4,5,156),(4,6,162),(4,7,165),(4,8,166),(4,9,166),(4,10,167),(4,11,169),(4,12,175),(4,13,179),(4,14,180),(4,15,188),(4,16,190),(5,0,141),(5,1,153),(5,2,164),(5,3,171),(5,4,178),(5,5,187),(5,6,185),(5,7,196),(5,8,196),(5,9,196),(5,10,202),(5,11,211),(5,12,209),(5,13,218),(5,14,220),(5,15,225),(5,16,231),(6,0,155),(6,1,171),(6,2,184),(6,3,191),(6,4,195),(6,5,203),(6,6,211),(6,7,223),(6,8,223),(6,9,223),(6,10,227),(6,11,227),(6,12,231),(6,13,241),(6,14,246),(6,15,242),(6,16,248),(7,0,150),(7,1,161),(7,2,171),(7,3,177),(7,4,183),(7,5,187),(7,6,191),(7,7,187),(7,8,196),(7,9,196),(7,10,200),(7,11,207),(7,12,209),(7,13,216),(7,14,219),(7,15,225),(7,16,228),(8,0,158),(8,1,174),(8,2,184),(8,3,190),(8,4,191),(8,5,193),(8,6,205),(8,7,211),(8,8,213),(8,9,213),(8,10,221),(8,11,224),(8,12,228),(8,13,231),(8,14,218),(8,15,228),(8,16,251),(9,0,159),(9,1,174),(9,2,181),(9,3,186),(9,4,193),(9,5,196),(9,6,197),(9,7,200),(9,8,200),(9,9,200),(9,10,212),(9,11,220),(9,12,213),(9,13,222),(9,14,235),(9,15,241),(9,16,252),(10,0,152),(10,1,169),(10,2,177),(10,3,185),(10,4,194),(10,5,200),(10,6,204),(10,7,209),(10,8,210),(10,9,210),(10,10,215),(10,11,221),(10,12,224),(10,13,225),(10,14,231),(10,15,245),(10,16,246),(11,0,145),(11,1,155),(11,2,164),(11,3,170),(11,4,177),(11,5,184),(11,6,183),(11,7,187),(11,8,188),(11,9,188),(11,10,192),(11,11,197),(11,12,197),(11,13,203),(11,14,205),(11,15,206),(11,16,214),(12,0,141),(12,1,148),(12,2,156),(12,3,160),(12,4,165),(12,5,170),(12,6,174),(12,7,179),(12,8,181),(12,9,181),(12,10,184),(12,11,187),(12,12,190),(12,13,194),(12,14,192),(12,15,196),(12,16,198),(13,0,141),(13,1,148),(13,2,156),(13,3,160),(13,4,165),(13,5,170),(13,6,174),(13,7,179),(13,8,181),(13,9,181),(13,10,184),(13,11,187),(13,12,190),(13,13,194),(13,14,192),(13,15,196),(13,16,198),(14,0,155),(14,1,167),(14,2,178),(14,3,187),(14,4,195),(14,5,200),(14,6,205),(14,7,207),(14,8,206),(14,9,206),(14,10,212),(14,11,218),(14,12,221),(14,13,224),(14,14,226),(14,15,234),(14,16,247),(15,0,168),(15,1,184),(15,2,195),(15,3,204),(15,4,209),(15,5,214),(15,6,217),(15,7,225),(15,8,232),(15,9,232),(15,10,244),(15,11,237),(15,12,251),(15,13,258),(15,14,249),(15,15,267),(15,16,277),(16,0,180),(16,1,196),(16,2,203),(16,3,206),(16,4,209),(16,5,218),(16,6,219),(16,7,220),(16,8,228),(16,9,228),(16,10,240),(16,11,232),(16,12,255),(16,13,263),(16,14,271),(16,15,265),(16,16,250),(17,0,194),(17,1,205),(17,2,209),(17,3,213),(17,4,220),(17,5,227),(17,6,230),(17,7,240),(17,8,248),(17,9,248),(17,10,262),(17,11,270),(17,12,257),(17,13,278),(17,14,284),(17,15,292),(17,16,299),(18,0,201),(18,1,214),(18,2,220),(18,3,232),(18,4,241),(18,5,252),(18,6,270),(18,7,275),(18,8,289),(18,9,289),(18,10,291),(18,11,295),(18,12,293),(18,13,297),(18,14,308),(18,15,311),(18,16,313),(19,0,197),(19,1,215),(19,2,220),(19,3,225),(19,4,234),(19,5,242),(19,6,262),(19,7,274),(19,8,279),(19,9,279),(19,10,290),(19,11,293),(19,12,299),(19,13,293),(19,14,284),(19,15,289),(19,16,300),(20,0,198),(20,1,205),(20,2,207),(20,3,214),(20,4,223),(20,5,224),(20,6,232),(20,7,234),(20,8,245),(20,9,245),(20,10,256),(20,11,259),(20,12,264),(20,13,267),(20,14,241),(20,15,260),(20,16,277),(21,0,204),(21,1,217),(21,2,226),(21,3,236),(21,4,243),(21,5,254),(21,6,269),(21,7,278),(21,8,285),(21,9,285),(21,10,294),(21,11,298),(21,12,305),(21,13,301),(21,14,284),(21,15,293),(21,16,309),(22,0,212),(22,1,229),(22,2,240),(22,3,251),(22,4,271),(22,5,285),(22,6,297),(22,7,305),(22,8,308),(22,9,308),(22,10,310),(22,11,312),(22,12,313),(22,13,323),(22,14,327),(22,15,326),(22,16,320),(23,0,205),(23,1,224),(23,2,238),(23,3,249),(23,4,258),(23,5,264),(23,6,269),(23,7,271),(23,8,274),(23,9,274),(23,10,287),(23,11,275),(23,12,293),(23,13,301),(23,14,309),(23,15,307),(23,16,272),(24,0,207),(24,1,223),(24,2,233),(24,3,254),(24,4,269),(24,5,277),(24,6,284),(24,7,289),(24,8,295),(24,9,295),(24,10,294),(24,11,307),(24,12,313),(24,13,302),(24,14,321),(24,15,326),(24,16,322),(25,0,202),(25,1,215),(25,2,227),(25,3,241),(25,4,258),(25,5,267),(25,6,274),(25,7,279),(25,8,283),(25,9,283),(25,10,290),(25,11,300),(25,12,301),(25,13,312),(25,14,295),(25,15,313),(25,16,322),(26,0,194),(26,1,208),(26,2,217),(26,3,229),(26,4,241),(26,5,255),(26,6,264),(26,7,267),(26,8,272),(26,9,272),(26,10,282),(26,11,287),(26,12,294),(26,13,298),(26,14,300),(26,15,301),(26,16,301),(27,0,187),(27,1,197),(27,2,206),(27,3,212),(27,4,219),(27,5,224),(27,6,234),(27,7,241),(27,8,247),(27,9,247),(27,10,250),(27,11,253),(27,12,256),(27,13,259),(27,14,262),(27,15,262),(27,16,265),(28,0,184),(28,1,192),(28,2,199),(28,3,204),(28,4,209),(28,5,213),(28,6,219),(28,7,224),(28,8,228),(28,9,228),(28,10,231),(28,11,234),(28,12,237),(28,13,240),(28,14,243),(28,15,242),(28,16,246)"


def _resize_oracle() -> str:
    """DuckDB oracle for ext_multimodal_resize via the fixture-closed-
    form recipe (the compression-ratio recipe applied to pixels): on
    the synthesized corpus every output column is a closed form of
    doc_id — kind cycles with doc_id%3; images re-parse to 16x12; BMP
    output size is the exact container arithmetic 54 + 12*48 = 630;
    WAV passes through at 44 + 2*(400 + (doc_id%50)*80) bytes; and the
    one non-arithmetic piece, the zlib-compressed PNG re-encode size,
    rides as the 493 pinned residue-class values. The oracle therefore
    hash-grades the full distributed chain — synth encoding, Arrow
    batching, PNG unfilter + resample + re-encode, container re-parse
    — end-to-end at every ladder sf."""
    return f"""WITH pngpins(wr, hr, nb) AS (VALUES {_RESIZE_PNG_PINS})
SELECT d.doc_id,
       CASE d.doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'wav' END AS kind,
       CASE WHEN d.doc_id % 3 < 2 THEN 16 END AS width,
       CASE WHEN d.doc_id % 3 < 2 THEN 12 END AS height,
       CASE d.doc_id % 3
         WHEN 0 THEN p.nb
         WHEN 1 THEN 630
         ELSE 44 + (400 + (d.doc_id % 50) * 80) * 2
       END AS n_bytes_out
FROM documents d
LEFT JOIN pngpins p ON p.wr = d.doc_id % 29 AND p.hr = d.doc_id % 17"""


@ext_query("ext_multimodal_resize", _resize_oracle())  # + pixel pytest

def ext_multimodal_resize(spark, sf_dir):
    """REAL resize over mapInPandas: PNG/BMP payloads are pixel-decoded
    (full PNG unfilter), nearest-neighbor resampled to 16×12, and
    re-encoded in the same container; the output dims come from
    RE-PARSING the resized bytes, not from trusting the kernel. WAV
    rows pass through untouched (resize is an image op). Binary in ->
    binary out with typed metadata — the production shape for a
    codec-backed kernel. Oracled as of r10 via the residue-class pins
    in :func:`_resize_oracle`; the planted-pixel pytest remains."""
    b = synth_media(spark, sf_dir)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, ws, hs, sizes = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                try:
                    out = resize_image(p, 16, 12)
                except NotImplementedError:
                    out = p  # non-image media passes through
                meta = decode_media(out)
                ids.append(doc_id)
                kinds.append(meta["kind"])
                ws.append(meta["width"])
                hs.append(meta["height"])
                sizes.append(len(out))
            yield pd.DataFrame(
                {"doc_id": ids, "kind": kinds, "width": ws, "height": hs, "n_bytes_out": sizes}
            )

    return b.mapInPandas(
        resize_batches,
        schema="doc_id bigint, kind string, width bigint, height bigint, n_bytes_out bigint",
    )


# Source-PNG byte sizes per residue class (the ORIGINAL container,
# not the resized one — images pass through frame sampling whole), the
# sibling of _RESIZE_PNG_PINS with the same honesty contract
# (test_frames_oracle_pins_match_kernel re-derives all 493 each run).
_SOURCE_PNG_PINS = "(0,0,95),(0,1,101),(0,2,106),(0,3,112),(0,4,116),(0,5,119),(0,6,121),(0,7,127),(0,8,130),(0,9,132),(0,10,140),(0,11,146),(0,12,153),(0,13,157),(0,14,154),(0,15,165),(0,16,168),(1,0,98),(1,1,104),(1,2,110),(1,3,116),(1,4,119),(1,5,121),(1,6,127),(1,7,131),(1,8,133),(1,9,141),(1,10,147),(1,11,153),(1,12,158),(1,13,162),(1,14,166),(1,15,169),(1,16,173),(2,0,101),(2,1,107),(2,2,113),(2,3,119),(2,4,120),(2,5,126),(2,6,129),(2,7,131),(2,8,139),(2,9,146),(2,10,151),(2,11,156),(2,12,161),(2,13,165),(2,14,168),(2,15,172),(2,16,175),(3,0,105),(3,1,111),(3,2,117),(3,3,123),(3,4,126),(3,5,129),(3,6,132),(3,7,140),(3,8,146),(3,9,151),(3,10,157),(3,11,162),(3,12,166),(3,13,169),(3,14,174),(3,15,176),(3,16,179),(4,0,108),(4,1,114),(4,2,120),(4,3,126),(4,4,129),(4,5,131),(4,6,140),(4,7,146),(4,8,151),(4,9,157),(4,10,163),(4,11,168),(4,12,170),(4,13,174),(4,14,177),(4,15,180),(4,16,184),(5,0,111),(5,1,117),(5,2,123),(5,3,127),(5,4,130),(5,5,138),(5,6,145),(5,7,150),(5,8,155),(5,9,161),(5,10,166),(5,11,171),(5,12,173),(5,13,176),(5,14,179),(5,15,183),(5,16,191),(6,0,114),(6,1,120),(6,2,126),(6,3,128),(6,4,134),(6,5,141),(6,6,148),(6,7,154),(6,8,160),(6,9,165),(6,10,170),(6,11,175),(6,12,174),(6,13,177),(6,14,182),(6,15,191),(6,16,195),(7,0,117),(7,1,123),(7,2,127),(7,3,133),(7,4,140),(7,5,146),(7,6,153),(7,7,158),(7,8,163),(7,9,168),(7,10,173),(7,11,177),(7,12,176),(7,13,180),(7,14,189),(7,15,194),(7,16,198),(8,0,120),(8,1,127),(8,2,132),(8,3,139),(8,4,145),(8,5,152),(8,6,158),(8,7,163),(8,8,168),(8,9,173),(8,10,177),(8,11,183),(8,12,186),(8,13,190),(8,14,194),(8,15,199),(8,16,201),(9,0,124),(9,1,130),(9,2,137),(9,3,141),(9,4,149),(9,5,156),(9,6,162),(9,7,168),(9,8,173),(9,9,177),(9,10,183),(9,11,186),(9,12,190),(9,13,195),(9,14,199),(9,15,201),(9,16,203),(10,0,127),(10,1,133),(10,2,139),(10,3,146),(10,4,152),(10,5,159),(10,6,165),(10,7,171),(10,8,176),(10,9,181),(10,10,184),(10,11,188),(10,12,193),(10,13,197),(10,14,199),(10,15,202),(10,16,212),(11,0,130),(11,1,136),(11,2,143),(11,3,149),(11,4,155),(11,5,162),(11,6,168),(11,7,174),(11,8,180),(11,9,182),(11,10,186),(11,11,191),(11,12,196),(11,13,198),(11,14,200),(11,15,210),(11,16,218),(12,0,133),(12,1,139),(12,2,146),(12,3,152),(12,4,158),(12,5,165),(12,6,171),(12,7,177),(12,8,181),(12,9,185),(12,10,189),(12,11,194),(12,12,196),(12,13,198),(12,14,208),(12,15,216),(12,16,222),(13,0,136),(13,1,142),(13,2,149),(13,3,155),(13,4,161),(13,5,168),(13,6,174),(13,7,179),(13,8,183),(13,9,188),(13,10,192),(13,11,194),(13,12,196),(13,13,207),(13,14,215),(13,15,220),(13,16,228),(14,0,139),(14,1,145),(14,2,152),(14,3,158),(14,4,164),(14,5,171),(14,6,177),(14,7,181),(14,8,186),(14,9,190),(14,10,192),(14,11,195),(14,12,205),(14,13,213),(14,14,218),(14,15,226),(14,16,232),(15,0,142),(15,1,148),(15,2,155),(15,3,161),(15,4,167),(15,5,174),(15,6,179),(15,7,184),(15,8,189),(15,9,191),(15,10,193),(15,11,203),(15,12,211),(15,13,211),(15,14,224),(15,15,231),(15,16,238),(16,0,145),(16,1,151),(16,2,158),(16,3,164),(16,4,170),(16,5,177),(16,6,182),(16,7,187),(16,8,189),(16,9,191),(16,10,201),(16,11,204),(16,12,209),(16,13,219),(16,14,229),(16,15,236),(16,16,241),(17,0,148),(17,1,154),(17,2,161),(17,3,167),(17,4,173),(17,5,180),(17,6,185),(17,7,187),(17,8,189),(17,9,200),(17,10,203),(17,11,207),(17,12,217),(17,13,224),(17,14,234),(17,15,239),(17,16,245),(18,0,151),(18,1,157),(18,2,164),(18,3,170),(18,4,176),(18,5,183),(18,6,185),(18,7,188),(18,8,198),(18,9,201),(18,10,205),(18,11,215),(18,12,222),(18,13,229),(18,14,238),(18,15,243),(18,16,247),(19,0,154),(19,1,161),(19,2,167),(19,3,174),(19,4,180),(19,5,187),(19,6,187),(19,7,197),(19,8,200),(19,9,205),(19,10,216),(19,11,223),(19,12,229),(19,13,239),(19,14,244),(19,15,248),(19,16,255),(20,0,158),(20,1,164),(20,2,171),(20,3,177),(20,4,184),(20,5,191),(20,6,197),(20,7,200),(20,8,204),(20,9,215),(20,10,215),(20,11,223),(20,12,235),(20,13,240),(20,14,248),(20,15,255),(20,16,261),(21,0,161),(21,1,167),(21,2,174),(21,3,180),(21,4,187),(21,5,194),(21,6,197),(21,7,202),(21,8,213),(21,9,212),(21,10,221),(21,11,229),(21,12,238),(21,13,247),(21,14,253),(21,15,259),(21,16,264),(22,0,164),(22,1,170),(22,2,177),(22,3,183),(22,4,190),(22,5,195),(22,6,200),(22,7,208),(22,8,210),(22,9,218),(22,10,227),(22,11,236),(22,12,243),(22,13,250),(22,14,256),(22,15,262),(22,16,270),(23,0,167),(23,1,173),(23,2,180),(23,3,186),(23,4,193),(23,5,198),(23,6,206),(23,7,208),(23,8,216),(23,9,225),(23,10,232),(23,11,239),(23,12,246),(23,13,253),(23,14,259),(23,15,266),(23,16,273),(24,0,170),(24,1,176),(24,2,183),(24,3,189),(24,4,196),(24,5,203),(24,6,206),(24,7,214),(24,8,222),(24,9,229),(24,10,236),(24,11,242),(24,12,249),(24,13,256),(24,14,262),(24,15,269),(24,16,276),(25,0,173),(25,1,179),(25,2,186),(25,3,192),(25,4,199),(25,5,203),(25,6,212),(25,7,219),(25,8,226),(25,9,232),(25,10,239),(25,11,245),(25,12,252),(25,13,259),(25,14,265),(25,15,272),(25,16,279),(26,0,176),(26,1,182),(26,2,189),(26,3,195),(26,4,201),(26,5,209),(26,6,215),(26,7,222),(26,8,229),(26,9,235),(26,10,242),(26,11,248),(26,12,255),(26,13,262),(26,14,268),(26,15,275),(26,16,282),(27,0,179),(27,1,185),(27,2,192),(27,3,198),(27,4,205),(27,5,210),(27,6,218),(27,7,225),(27,8,232),(27,9,238),(27,10,245),(27,11,251),(27,12,258),(27,13,265),(27,14,271),(27,15,278),(27,16,285),(28,0,182),(28,1,188),(28,2,195),(28,3,201),(28,4,208),(28,5,215),(28,6,221),(28,7,228),(28,8,235),(28,9,241),(28,10,248),(28,11,254),(28,12,261),(28,13,268),(28,14,275),(28,15,282),(28,16,289)"


def _frames_oracle() -> str:
    """DuckDB oracle for ext_multimodal_frames, fully closed-form over
    doc_id: WAV rows window into ceil(data_len/800) frames of 800
    bytes (50 ms at 8 kHz 16-bit mono) with the remainder in the last
    frame, where data_len = 2*(400 + (doc_id%50)*80); BMP rows pass
    through whole at the exact container arithmetic
    54 + h*((w*3+3)//4*4); PNG rows pass through whole at the pinned
    source size for their (doc_id%29, doc_id%17) residue class. The
    frame expansion itself is a LATERAL generate_series, so the oracle
    grades the flatMap row multiplication, indices AND byte counts."""
    return f"""WITH pngpins(wr, hr, nb) AS (VALUES {_SOURCE_PNG_PINS}),
 base AS (
   SELECT d.doc_id, d.doc_id % 3 AS k,
          2 * (400 + (d.doc_id % 50) * 80) AS data_len,
          54 + (4 + d.doc_id % 17) * (((4 + d.doc_id % 29) * 3 + 3) // 4 * 4) AS bmp_len,
          p.nb AS png_len
   FROM documents d
   LEFT JOIN pngpins p ON p.wr = d.doc_id % 29 AND p.hr = d.doc_id % 17)
SELECT doc_id,
       CASE WHEN k = 2 THEN CAST(g.i AS INT) ELSE 0 END AS frame_idx,
       CAST(CASE WHEN k = 0 THEN png_len
                 WHEN k = 1 THEN bmp_len
                 WHEN g.i < (data_len - 1) // 800 THEN 800
                 ELSE data_len - 800 * ((data_len - 1) // 800)
            END AS INT) AS frame_bytes
FROM base, LATERAL (
  SELECT unnest(generate_series(0,
           CASE WHEN k = 2 THEN (data_len - 1) // 800 ELSE 0 END)) AS i) g"""


@ext_query("ext_multimodal_frames", _frames_oracle())  # + pytest

def ext_multimodal_frames(spark, sf_dir):
    """REAL frame sampling: WAV payloads are windowed into 50 ms PCM
    frames (1 media row -> N frame rows, flatMap shape); images count
    as a single frame. The row-count expansion happens inside
    mapInPandas so downstream operators see ordinary rows; at scale
    the expansion factor drives partition sizing (explode-aware
    maxRecordsPerBatch). Oracled as of r10: every output column is a
    closed form of doc_id (see :func:`_frames_oracle`); the
    deterministic-windowing pytest remains."""
    b = synth_media(spark, sf_dir)

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                try:
                    frames = wav_frames(p, frame_ms=50)
                except NotImplementedError:
                    frames = [p]
                for i, frame in enumerate(frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(frame))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_bytes": sizes})

    return b.mapInPandas(
        frame_batches, schema="doc_id bigint, frame_idx int, frame_bytes int"
    )


# ---------------------------------------------------------------------------
# perceptual fingerprints: image aHash + audio energy-envelope hash — the
# bridge between the multimodal column stack and the dedup stack
# ---------------------------------------------------------------------------


def _to_signed64(bits: int) -> int:
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def ahash64(payload: bytes) -> Optional[int]:
    """64-bit average hash (aHash, the classic perceptual image hash):
    decode pixels (PNG/BMP, stdlib decoders above), grayscale, average-
    pool onto an 8×8 grid, threshold each cell against the grid mean.
    Scale/container invariant by construction — a nearest-neighbor
    resize or a lossless re-encode pools to (nearly) the same grid, so
    copies land within a few Hamming bits while distinct images
    scatter. Returns a SIGNED 64-bit int (Spark LongType); None for
    non-image payloads."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, bpp, rows = _png_pixels(payload)
    elif payload[:2] == b"BM":
        w, h, bpp, rows = _bmp_pixels(payload)
    else:
        return None
    grid = []
    for gy in range(8):
        y0, y1 = gy * h // 8, max(gy * h // 8 + 1, (gy + 1) * h // 8)
        for gx in range(8):
            x0, x1 = gx * w // 8, max(gx * w // 8 + 1, (gx + 1) * w // 8)
            tot = cnt = 0
            for y in range(y0, min(y1, h)):
                row = rows[y]
                for x in range(x0, min(x1, w)):
                    p = row[x * bpp : x * bpp + 3]
                    tot += p[0] + p[1] + p[2]
                    cnt += 3
            grid.append(tot / cnt if cnt else 0.0)
    mean = sum(grid) / 64.0
    bits = 0
    for i, v in enumerate(grid):
        if v > mean:
            bits |= 1 << i
    return _to_signed64(bits)


def wav_fp64(payload: bytes) -> Optional[int]:
    """64-bit audio fingerprint: the PCM data chunk is split into 65
    equal windows; bit ``i`` is the sign of the energy DIFFERENCE
    between consecutive windows (the energy-envelope analogue of
    dHash, the sign-of-spectral-delta idea behind classic audio
    fingerprinting). Amplitude-invariant: uniform gain scales every
    window energy by the same factor and flips no sign. None for
    non-WAV payloads."""
    meta = decode_media(payload)
    if meta["kind"] != "wav":
        return None
    o, data = 12, b""
    while o + 8 <= len(payload):
        tag = payload[o : o + 4]
        size = struct.unpack("<I", payload[o + 4 : o + 8])[0]
        if tag == b"data":
            data = payload[o + 8 : o + 8 + size]
            break
        o += 8 + size + (size & 1)
    n = len(data) // 2
    if n < 65:
        return None
    samples = struct.unpack("<%dh" % n, data[: n * 2])
    energies = []
    for j in range(65):
        s0, s1 = j * n // 65, max(j * n // 65 + 1, (j + 1) * n // 65)
        win = samples[s0:s1]
        energies.append(sum(s * s for s in win) / len(win))
    bits = 0
    for i in range(64):
        if energies[i + 1] > energies[i]:
            bits |= 1 << i
    return _to_signed64(bits)


def reencode_image(payload: bytes) -> bytes:
    """Lossless container swap (PNG pixels → BMP container and vice
    versa) — the planted 're-encoded copy' a perceptual dedup must
    catch. RGB only (BMP has no alpha)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, bpp, rows = _png_pixels(payload)
        if bpp != 3:
            raise NotImplementedError("BMP container is RGB-only")
        return _bmp_from_pixels(w, h, rows)
    if payload[:2] == b"BM":
        w, h, bpp, rows = _bmp_pixels(payload)
        return _png_from_pixels(w, h, bpp, rows)
    raise NotImplementedError("re-encode implemented for PNG/BMP")


def media_phash(media: DataFrame) -> DataFrame:
    """(doc_id, payload) → (doc_id, media_class, phash): one Arrow
    crossing computes the class-appropriate perceptual hash (aHash for
    images, energy-envelope hash for WAV). Rows whose payload neither
    hash understands are dropped (no fingerprint, nothing to pair)."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, classes, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                h = ahash64(p)
                cls = "image"
                if h is None:
                    h = wav_fp64(p)
                    cls = "audio"
                if h is None:
                    continue
                ids.append(doc_id)
                classes.append(cls)
                hashes.append(h)
            yield pd.DataFrame(
                {"doc_id": ids, "media_class": classes, "phash": hashes}
            )

    return media.mapInPandas(
        hash_batches, schema="doc_id bigint, media_class string, phash bigint"
    )


# Pinned perceptual hashes per residue class: synth pixels/samples are
# pure functions of position, so the image aHash depends only on
# (doc_id%29, doc_id%17) x container and the WAV envelope hash only on
# doc_id%50. h0 = base hash (container swaps hash IDENTICALLY — same
# pixels — verified for all 986 image classes when generating these
# pins), h2x = the 2x-resized variant's hash.
# test_phash_oracle_pins_match_kernel re-derives every pin each run.
_PHASH_PNG_PINS = "(0,0,-217033765204000768,-217033765204000768),(0,1,-847788950683648,-847788145377280),(0,2,-3311675637760,-3311675637760),(0,3,-3364033134592,-3363215245312),(0,4,-3364033134592,-3364033134592),(0,5,-3364033134592,-13153337344),(0,6,-13958643712,-13958643712),(0,7,-65498251264,-13153337344),(0,8,-13958643712,-13958643712),(0,9,-13958643712,-13958643712),(0,10,-13958643712,-13958643712),(0,11,-13958643712,-13958643712),(0,12,-13958643712,-13958643712),(0,13,-13958643712,-13958643712),(0,14,-13958643712,-13958643712),(0,15,-13958643712,-13958643712),(0,16,-13958643712,-13958643712),(1,0,-217033764664999808,-217024934212239232),(1,1,-847788411682688,-847788411682688),(1,2,-860982557540352,-847754058235904),(1,3,-3363487875072,-3363487875072),(1,4,-3363487875072,-3329128136704),(1,5,-3363487875072,-3329128136704),(1,6,-13413384192,-30593253376),(1,7,-64952991744,-30593253376),(1,8,-64961380352,-13413384192),(1,9,-13421772800,-13421772800),(1,10,-13421772800,-13421772800),(1,11,-13421772800,-13421772800),(1,12,-13421772800,-13421772800),(1,13,-13421772800,-13421772800),(1,14,-13421772800,-13421772800),(1,15,-13421772800,-13421772800),(1,16,-15032385536,-15032385536),(2,0,-217024933942738752,-217024933942738752),(2,1,-218150869017788288,-74035680134528896),(2,2,-852151832117120,-852151832117120),(2,3,-3328855474048,-289236238434304),(2,4,-3328855474176,-3328855474176),(2,5,-3328855474176,-3328859701248),(2,6,-3328859701248,-1130104881152),(2,7,-3328859701248,-3328859701248),(2,8,-3329665007616,-1130104881152),(2,9,-31130124288,-30593253376),(2,10,-30324817920,-30601641984),(2,11,-31138512896,-30601641984),(2,12,-31138512896,-30601641984),(2,13,-31138512896,-30601641984),(2,14,-13958643712,-31138512896),(2,15,-31138512896,-30601641984),(2,16,-31138512896,-31138512896),(3,0,-506390040723537728,-217024934212222784),(3,1,-218150868478803776,-218150868478803776),(3,2,-852151830003520,-72909746138464128),(3,3,-852186460290944,-852186460290944),(3,4,-852186460291072,-284804100620288),(3,5,-852186460291072,-284804100620288),(3,6,-3329123909632,-3329123909632),(3,7,-3363483680768,-3329123942400),(3,8,-3329123942400,-3329123942400),(3,9,-3329128136704,-1130104881152),(3,10,-3329128136704,-1130104881152),(3,11,-30593253376,-1130104881152),(3,12,-30593253376,-30593253376),(3,13,-30593253376,-30601641984),(3,14,-30601641984,-30601641984),(3,15,-30601641984,-30601641984),(3,16,-30601641984,-31138512896),(4,0,-506390040723537728,-506390040723537728),(4,1,-218150868478803776,-218150868210368320),(4,2,-72909745867931456,-72909745867931456),(4,3,-72909780498218880,-72909780227669888),(4,4,-72909780498219008,-72909780498219008),(4,5,-852186460291072,-284803832184832),(4,6,-284804100620288,-284804100620288),(4,7,-284838460391424,-3328855474176),(4,8,-3329123942400,-3329123942400),(4,9,-3329128136704,-1130100686848),(4,10,-3329128136704,-1130104881152),(4,11,-1130104881152,-1130104881152),(4,12,-1130104881152,-1130104881152),(4,13,-1130104881152,-1130104881152),(4,14,-1130113269760,-1130104881152),(4,15,-1130113269760,-1130113269760),(4,16,-30601641984,-30601641984),(5,0,-506390040723537728,-506381210001284896),(5,1,-218150868478803776,-218150868210368320),(5,2,-72909745867931456,-218150833850629952),(5,3,-72909780498218880,-72909780227669888),(5,4,-72909780498218880,-72909745867931520),(5,5,-852186460290944,-852151832117120),(5,6,-284804100620288,-284804100620288),(5,7,-284838460358656,-284803832184832),(5,8,-3329123909632,-3329123909632),(5,9,-3329128136704,-3329123942400),(5,10,-3329128136704,-3329128136704),(5,11,-1130104881152,-3329128136704),(5,12,-1130104881152,-1130104881152),(5,13,-1130104881152,-1130104881152),(5,14,-1130104881152,-1130104881152),(5,15,-1130104881152,-1130104881152),(5,16,-30593253376,-1130104881152),(6,0,-506390040454045472,-506390040454045472),(6,1,-218150868209311520,-218150868210360096),(6,2,-218150833850629952,-218150868210360128),(6,3,-72909780227669824,-72909780227669824),(6,4,-72909780227669888,-72909780227669888),(6,5,-72909780227669888,-72909780227669888),(6,6,-852151832117120,-72342432496173056),(6,7,-289236238434304,-289236238434304),(6,8,-284803832184832,-284804100620288),(6,9,-284804100620288,-284804100620288),(6,10,-3328855506944,-284804100653056),(6,11,-3329128136704,-3329123942400),(6,12,-3329128136704,-3329123942400),(6,13,-3329128136704,-1130104881152),(6,14,-1130104881152,-1130104881152),(6,15,-1130104881152,-1130104881152),(6,16,-1130104881152,-1130104881152),(7,0,-506390040723529504,-506381210001284896),(7,1,-218150868478795552,-218150868210360096),(7,2,-218150833850629952,-218150833850629952),(7,3,-217024968571961152,-217024968303525696),(7,4,-217024968571961216,-72909745867931456),(7,5,-72909780496105344,-72909745867931520),(7,6,-72909746138464128,-72909746138464128),(7,7,-852186460290944,-289201878679424),(7,8,-284804100620288,-284804100620288),(7,9,-284804100620288,-284804100620288),(7,10,-284804100620288,-284804100620288),(7,11,-3329123942400,-284804100620288),(7,12,-3329123942400,-3329123942400),(7,13,-3329123942400,-3329123942400),(7,14,-3329128136704,-3329123942400),(7,15,-3329128136704,-3329128136704),(7,16,-1130104881152,-1130104881152),(8,0,-506390040454045472,-506390040454045472),(8,1,-506381244630507296,-218150868209311520),(8,2,-218159664303390528,-218150868210360128),(8,3,-217024968303525696,-217024968303525696),(8,4,-217024968303525696,-217024968303525696),(8,5,-72909780227669824,-72909780227669824),(8,6,-72909745867931520,-72909780227669888),(8,7,-72909780227669888,-72909780227669888),(8,8,-72909780498219008,-72909780498219008),(8,9,-284804100620288,-284803832184832),(8,10,-284803832184832,-284804100620288),(8,11,-284804100620288,-284803832184832),(8,12,-284804100620288,-284804100620288),(8,13,-284804100620288,-3329123942400),(8,14,-3329123942400,-3329123942400),(8,15,-3329123942400,-3329123942400),(8,16,-3329128136704,-3329123942400),(9,0,-506390040454045472,-506390040454045472),(9,1,-506381244361023264,-506381244361023264),(9,2,-218159664303382304,-218150868210360096),(9,3,-218150868210368320,-218150868210360128),(9,4,-218150868210368320,-217024968303517504),(9,5,-218150868210368320,-217024968303525696),(9,6,-72909780227669888,-72909780227669888),(9,7,-72909780227669888,-72909780227669888),(9,8,-72909780227669888,-72909745867931520),(9,9,-852186460290944,-847753783508864),(9,10,-289236238434304,-284804100620288),(9,11,-284838460358656,-284803832184832),(9,12,-284838460358656,-284804100620288),(9,13,-284838460358656,-284804100620288),(9,14,-284804100620288,-3329123909632),(9,15,-3363483680768,-3329123942400),(9,16,-3329123942400,-3329123942400),(10,0,-506390040454045472,-506390040454045472),(10,1,-506381244361023264,-506381244361023264),(10,2,-218150833850621728,-506381244362071840),(10,3,-218150868210368320,-218150868210360128),(10,4,-218150868210368320,-218150868210360128),(10,5,-218150868210368320,-218150868210368320),(10,6,-217024933943787328,-217024968303525760),(10,7,-72909780227669888,-72909780227669888),(10,8,-72909745867931520,-72909780227669888),(10,9,-72909746138464128,-72909780227669888),(10,10,-852151832117120,-852151832117120),(10,11,-284804100620288,-289236238434304),(10,12,-284804100620288,-284804100620288),(10,13,-284804100620288,-284804100620288),(10,14,-284804100620288,-284804100620288),(10,15,-284804100620288,-284804100620288),(10,16,-3329123909632,-3329123942400),(11,0,-506390040454045472,-506390040454045472),(11,1,-506381244361023264,-506381244361023264),(11,2,-506390040455094048,-506381244362071840),(11,3,-218150868210360096,-218150868210360128),(11,4,-218150868210360128,-218150868210360128),(11,5,-218150868210360128,-218150868210368320),(11,6,-218150868210368320,-217024968303525696),(11,7,-217024968303525696,-72909780227669888),(11,8,-72909780227669888,-72909745867931520),(11,9,-72909780496105344,-72909745867931520),(11,10,-72909780227669888,-72909746138464128),(11,11,-852186460290944,-852151832117120),(11,12,-852186460291072,-284804100620288),(11,13,-852186460291072,-284804100620288),(11,14,-284804100620288,-284804100620288),(11,15,-284838460358656,-284804100620288),(11,16,-284804100620288,-284804100620288),(12,0,-506390040454045472,-506390040454045472),(12,1,-506381244361023264,-506381244361023264),(12,2,-506390040455094048,-506381244362071840),(12,3,-218150868210360096,-218150868210360096),(12,4,-218150868210360128,-218150868210360128),(12,5,-218150868210360128,-218150868210360128),(12,6,-218150868210368320,-217024968303525696),(12,7,-217024968303525696,-217024968303525696),(12,8,-72909780227669888,-72909780227669888),(12,9,-72909780496105344,-72909780227669888),(12,10,-72909780227669888,-72909780227669888),(12,11,-72909780498218880,-72909780227669888),(12,12,-72909780498219008,-72909780498219008),(12,13,-852186460291072,-284804100620288),(12,14,-284804100620288,-284804100620288),(12,15,-284838460358656,-284804100620288),(12,16,-284804100620288,-284804100620288),(13,0,-506390040454045472,-506390040454045472),(13,1,-506381244361023264,-506381244361023264),(13,2,-506390040455094048,-506381244362071840),(13,3,-218150868210360096,-506381244362071840),(13,4,-218150868210360128,-218150868210360128),(13,5,-218150868210360128,-218150868210360128),(13,6,-218150868210368320,-218150868210360128),(13,7,-217024968303525696,-217024968303525696),(13,8,-72909780227669888,-217024968303525696),(13,9,-72909780496105344,-72909780227669888),(13,10,-72909780227669888,-72909780227669888),(13,11,-72909780498218880,-72909780227669888),(13,12,-72909780498218880,-72909780227669888),(13,13,-852186460290944,-852151832117120),(13,14,-284804100620288,-284803832184832),(13,15,-284838460358656,-284803832184832),(13,16,-284804100620288,-284804100620288),(14,0,-506390040454045472,-506390040454045472),(14,1,-506381244361023264,-506381244361023264),(14,2,-506390040454045472,-506390040455094048),(14,3,-506381244362071840,-506381244362071840),(14,4,-506381244362071872,-218150868210360128),(14,5,-218150868210360128,-218150868210360128),(14,6,-218150868210360128,-218150868210360128),(14,7,-218150868210368320,-217024968303525696),(14,8,-217024968303525696,-217024968303525696),(14,9,-72909780227669888,-72909780227669824),(14,10,-72909780227669888,-72909780227669888),(14,11,-72909780227669888,-72909780227669888),(14,12,-72909780227669888,-72909780227669888),(14,13,-72909780227669888,-72909745867931520),(14,14,-852151832117120,-72342432496173056),(14,15,-289236238434304,-284803832184832),(14,16,-284803832184832,-284804100620288),(15,0,-506390040454045472,-506390040454045472),(15,1,-506381244361023264,-506381244361023264),(15,2,-506390040455094048,-506381244362071840),(15,3,-506381244362071840,-506381244362071840),(15,4,-506381244362071872,-506381244362071872),(15,5,-218150868210360128,-218150868210360128),(15,6,-218150868210360128,-218150868210360128),(15,7,-218150868210368320,-218150868210368320),(15,8,-217024968303525696,-217024968303525696),(15,9,-217024968571961152,-217024968303525696),(15,10,-72909780227669888,-72909780227669888),(15,11,-72909780496105344,-72909780227669888),(15,12,-72909780496105344,-72909780227669888),(15,13,-72909780496105344,-72909745867931520),(15,14,-72909746138464128,-72909745867931520),(15,15,-852186460290944,-852151832117120),(15,16,-284804100620288,-284804100620288),(16,0,-506390040454045472,-506390040454045472),(16,1,-508641840267730720,-508641840267730720),(16,2,-506390040455094048,-506390040455094048),(16,3,-506381244362071840,-506390040455094048),(16,4,-506381244362071840,-506381244362071840),(16,5,-218150868210360096,-218150868210360128),(16,6,-218150868210360128,-218150868210360128),(16,7,-218150868210360128,-218150868210360128),(16,8,-218150868210368320,-217024968303525696),(16,9,-217024968303525696,-217024968303525696),(16,10,-72909780227669824,-217024968303525696),(16,11,-72909780227669888,-72909780227669888),(16,12,-72909780227669888,-72909780227669888),(16,13,-72909780227669888,-72909780227669888),(16,14,-72909745867931520,-72909780227669888),(16,15,-72909780227669888,-72909780227669888),(16,16,-72909780498219008,-284803830071168),(17,0,-1085102592571154208,-506390040454045472),(17,1,-508641840267730720,-508641840267730720),(17,2,-506390040454045472,-506390040454045472),(17,3,-506390040455094048,-506390040454045472),(17,4,-506390040455094048,-506381244362071840),(17,5,-506390040455094048,-506381244362071840),(17,6,-218150868210360128,-218150868210360128),(17,7,-218150868210360128,-218150868210360128),(17,8,-218150868210360128,-218150868210360128),(17,9,-218150868210368320,-218150868210368320),(17,10,-217024968303525696,-217024968303525696),(17,11,-72909780227669888,-72909780227669888),(17,12,-72909780227669888,-72909780227669888),(17,13,-72909780227669888,-72909780227669888),(17,14,-72909780227669888,-72909780227669888),(17,15,-72909780227669888,-72909780227669888),(17,16,-72909780227669888,-72909780227669888),(18,0,-506390040454045472,-506390040454045472),(18,1,-506381244361023264,-508641840267730720),(18,2,-506390040454045472,-506390040454045472),(18,3,-506381244362071840,-506390040454045472),(18,4,-506381244362071840,-506381244362071840),(18,5,-506381244362071840,-506381244362071840),(18,6,-218150868210360128,-218150868210360128),(18,7,-218150868210360128,-218150868210360128),(18,8,-218150868210360128,-218150868210360128),(18,9,-218150868210368320,-218150868210368320),(18,10,-217024968303525696,-217024968303525696),(18,11,-217024968303525696,-217024968303525696),(18,12,-217024968303525760,-72909780227669888),(18,13,-72909780227669888,-72909780227669888),(18,14,-72909745867931520,-72909780227669888),(18,15,-72909780227669888,-72909780227669888),(18,16,-72909745867931520,-72909780227669888),(19,0,-1085102592571154208,-506390040454045472),(19,1,-508641840267730720,-508641840267730720),(19,2,-506390040454045472,-506390040454045472),(19,3,-506390040455094048,-506390040454045472),(19,4,-506390040455094048,-506381244362071840),(19,5,-506390040455094048,-506381244362071840),(19,6,-506381244362071840,-506381244362071872),(19,7,-218150868210360128,-218150868210360128),(19,8,-218150868210360128,-218150868210360128),(19,9,-218150868210360128,-218150868210360128),(19,10,-218150868210368320,-218150868210368320),(19,11,-217024968303525696,-217024968303525696),(19,12,-217024968303525696,-217024968303525696),(19,13,-217024968303525696,-72909780227669888),(19,14,-72909780227669888,-72909780227669888),(19,15,-72909780227669888,-72909780227669888),(19,16,-72909780227669888,-72909780227669888),(20,0,-1085102592571154208,-1085102592571154208),(20,1,-508641840267730720,-508641840267730720),(20,2,-506390040454045472,-506390040454045472),(20,3,-506390040455094048,-506390040454045472),(20,4,-506390040455094048,-506390040455094048),(20,5,-506390040455094048,-506381244362071840),(20,6,-506381244362071840,-506381244362071840),(20,7,-218150868210360128,-218150868210360128),(20,8,-218150868210360128,-218150868210360128),(20,9,-218150868210360128,-218150868210360128),(20,10,-218150868210368320,-218150868210360128),(20,11,-217024968303525696,-217024968303525696),(20,12,-217024968303525696,-217024968303525696),(20,13,-217024968303525696,-217024968303525696),(20,14,-72909780227669888,-72909780227669888),(20,15,-72909780227669888,-72909780227669888),(20,16,-72909780227669888,-72909780227669888),(21,0,-1085102592571154208,-1085102592571150096),(21,1,-508641840267730720,-508641840267730720),(21,2,-506390040454045472,-506390040454045472),(21,3,-506390040455094048,-506390040454045472),(21,4,-506390040455094048,-506390040454045472),(21,5,-506390040455094048,-506381244362071840),(21,6,-506381244362071840,-506381244362071840),(21,7,-218150868210360128,-218150868210360128),(21,8,-218150868210360128,-218150868210360128),(21,9,-218150868210360128,-218150868210360128),(21,10,-218150868210368320,-218150868210360128),(21,11,-217024968303525696,-218150868210368320),(21,12,-217024968303525696,-217024968303525696),(21,13,-217024968303525696,-217024968303525696),(21,14,-72909780227669888,-72909780227669888),(21,15,-72909780227669888,-72909780227669888),(21,16,-72909780227669888,-72909780227669888),(22,0,-1085102592571150096,-1085102592571150096),(22,1,-508641840267726608,-508641840267730720),(22,2,-506390040454045472,-508641840267730720),(22,3,-506390040454045472,-506390040454045472),(22,4,-506390040454045472,-506390040454045472),(22,5,-506390040454045472,-506381244362071840),(22,6,-506381244362071840,-506381244362071840),(22,7,-506381244362071840,-506381244362071840),(22,8,-218150868210360128,-218150868210360128),(22,9,-218150868210360128,-218150868210360128),(22,10,-218150868210360128,-218150868210360128),(22,11,-218150868210368320,-218150868210360128),(22,12,-218150868210368320,-217024968303525696),(22,13,-218150868210368320,-217024968303525696),(22,14,-217024968303525696,-217024968303525696),(22,15,-72909780227669888,-72909780227669888),(22,16,-72909780227669888,-72909780227669888),(23,0,-1085102592571154208,-1085102592571150096),(23,1,-508641840267730720,-508641840267730720),(23,2,-506390040454045472,-506390040454045472),(23,3,-506390040455094048,-506390040454045472),(23,4,-506390040455094048,-506390040454045472),(23,5,-506390040455094048,-506381244362071840),(23,6,-506381244362071840,-506381244362071840),(23,7,-506381244362071840,-506381244362071840),(23,8,-218150868210360128,-218150868210360128),(23,9,-218150868210360128,-218150868210360128),(23,10,-218150868210360128,-218150868210360128),(23,11,-218150868210368320,-218150868210360128),(23,12,-218150868210368320,-218150868210368320),(23,13,-218150868210368320,-217024968303525696),(23,14,-217024968303525696,-217024968303525696),(23,15,-217024968303525696,-217024968303525696),(23,16,-72909780227669888,-72909780227669888),(24,0,-1085102592571150096,-1085102592571150096),(24,1,-508641840267730720,-508641840267730720),(24,2,-508641840267730720,-508641840267730720),(24,3,-506390040454045472,-506390040454045472),(24,4,-506390040454045472,-506390040454045472),(24,5,-506390040454045472,-506390040455094048),(24,6,-506381244362071840,-506381244362071840),(24,7,-506381244362071840,-506381244362071840),(24,8,-506381244362071872,-506381244362071840),(24,9,-218150868210360128,-218150868210360128),(24,10,-218150868210360128,-218150868210360128),(24,11,-218150868210360128,-218150868210360128),(24,12,-218150868210360128,-218150868210360128),(24,13,-218150868210360128,-218150868210368320),(24,14,-217024968303525696,-217024968303525696),(24,15,-217024968303525696,-217024968303525696),(24,16,-217024968303525760,-217024968303525696),(25,0,-1085102592571150096,-1085102592571150096),(25,1,-508641840267726608,-508641840267726608),(25,2,-508641840267730720,-508641840267726624),(25,3,-506390040454045472,-506390040454045472),(25,4,-506390040454045472,-506390040454045472),(25,5,-506390040454045472,-506390040454045472),(25,6,-506390040455094048,-506381244361023264),(25,7,-506390040455094048,-506381244362071840),(25,8,-506381244362071840,-506381244362071840),(25,9,-218150868210360128,-218150868210360128),(25,10,-218150868210360128,-218150868210360128),(25,11,-218150868210360128,-218150868210360128),(25,12,-218150868210360128,-218150868210360128),(25,13,-218150868210360128,-218150868210360128),(25,14,-218150868210368320,-217024968303525696),(25,15,-217024968303525696,-217024968303525696),(25,16,-217024968303525696,-217024968303525696),(26,0,-1085102592571150096,-1085102592571150096),(26,1,-508641840267726608,-508641840267726608),(26,2,-506390040454045472,-508641840267726624),(26,3,-506390040454045472,-506390040454045472),(26,4,-506390040454045472,-506390040454045472),(26,5,-506390040454045472,-506390040454045472),(26,6,-506381244362071840,-506381244361023264),(26,7,-506381244362071840,-506390040455094048),(26,8,-506381244362071840,-506381244362071840),(26,9,-218150868210360128,-218150868210360096),(26,10,-218150868210360128,-218150868210360128),(26,11,-218150868210360128,-218150868210360128),(26,12,-218150868210360128,-218150868210360128),(26,13,-218150868210360128,-218150868210360128),(26,14,-218150868210368320,-218150868210360128),(26,15,-217024968303525696,-217024968303525696),(26,16,-217024968303525696,-217024968303525696),(27,0,-1085102592571150096,-1085102592571150096),(27,1,-508641840267726608,-508641840267726608),(27,2,-508641840267730720,-508641840267726624),(27,3,-506390040454045472,-506390040454045472),(27,4,-506390040454045472,-506390040454045472),(27,5,-506390040454045472,-506390040454045472),(27,6,-506390040455094048,-506381244361023264),(27,7,-506390040455094048,-506381244362071840),(27,8,-506381244362071840,-506381244362071840),(27,9,-506381244362071840,-506381244362071840),(27,10,-218150868210360128,-218150868210360128),(27,11,-218150868210360128,-218150868210360128),(27,12,-218150868210360128,-218150868210360128),(27,13,-218150868210360128,-218150868210360128),(27,14,-218150868210360128,-218150868210360128),(27,15,-218150868210368320,-217024968303525696),(27,16,-217024968303525696,-217024968303525696),(28,0,-1085102592571150096,-1085102592571150096),(28,1,-508641840267726608,-508641840267726608),(28,2,-508641840267730720,-508641840267726624),(28,3,-506390040454045472,-506390040454045472),(28,4,-506390040454045472,-506390040454045472),(28,5,-506390040454045472,-506390040454045472),(28,6,-506390040455094048,-506390040454045472),(28,7,-506390040455094048,-506390040455094048),(28,8,-506381244362071840,-506381244362071840),(28,9,-506381244362071840,-506381244362071840),(28,10,-218150868210360128,-218150868210360128),(28,11,-218150868210360128,-218150868210360128),(28,12,-218150868210360128,-218150868210360128),(28,13,-218150868210360128,-218150868210360128),(28,14,-218150868210360128,-218150868210360128),(28,15,-218150868210368320,-218150868210368320),(28,16,-217024968303525696,-217024968303525696)"
_PHASH_BMP_PINS = "(0,0,-4557377905273802512,-4557377905273802512),(0,1,-4543867106391687940,-4543867106391687940),(0,2,-4557377905273799428,-4557377905273799428),(0,3,-4557377905273012996,-4557377905273799428),(0,4,-4557430681831932676,-4557430681831932676),(0,5,-4557377905273012996,-4557430681831146244),(0,6,-4557430681831146244,-4557430681831146244),(0,7,54255336596241663,54255336596241663),(0,8,54255336596241663,54255336596241663),(0,9,54255336596241663,54255336596241663),(0,10,54255336596242431,54255336596241663),(0,11,212141067796479,212141067796479),(0,12,212141067796479,212141067796479),(0,13,212141067796479,212141067796479),(0,14,212141067796479,212141067796479),(0,15,212141067796479,212141067796479),(0,16,212141067796479,212141067796479),(1,0,-2242527696805367568,-2242527696805365512),(1,1,-2242545288991411984,-2242545288991409928),(1,2,-2242545357710888720,-2242545357710362376),(1,3,-2242545288991408900,-2242545288990885636),(1,4,-2242545288991408900,-2242545288990884612),(1,5,-9160074316632490756,-9160074385351443204),(1,6,-9160074385351967492,-9160074385351443204),(1,7,-9160074316632490756,-9160074385351443204),(1,8,-9187095983116190468,-9187095983115666180),(1,9,-9187095983115404033,-9187095983115404033),(1,10,-9187095983115404033,-9187095983115404033),(1,11,36276053739371775,36276053739371775),(1,12,36276053739371775,36276053873589503),(1,13,36276053739371775,36276053873589503),(1,14,36276053739372543,36276053873590271),(1,15,36276053739372543,36276053873590271),(1,16,36170500623106047,36170500757323775),(2,0,-1085102592571148040,-1085102592571148040),(2,1,-4543867106391688968,-2238024097177995016),(2,2,-4543867106391164680,-2238024097177470728),(2,3,-4557377905273276168,-2242527696804841224),(2,4,-4557377905273276168,-4548370706018535176),(2,5,-4557377905273276168,-4548370706018535176),(2,6,-4557377905273276164,-4548388298204579588),(2,7,-4557377905273276164,-4557377905273276164),(2,8,-9169116700258797316,-9169081515886708484),(2,9,-9169116700124578564,-9169081515886707460),(2,10,-9169116700258796292,-9169081515886707458),(2,11,-9169116700124578564,-9169081515886707458),(2,12,-9169116700124578561,-9187095914396189442),(2,13,-9169116700124578561,-9187095914396189441),(2,14,-9187131098634060545,-9187131098634060545),(2,15,36240938220715263,36240938086498047),(2,16,36240938220715263,36240938220715775),(3,0,-2242527696805367568,-2242527696805365512),(3,1,-2242545288991411984,-2242545288991409928),(3,2,-2242527696805365512,-2242545357710362376),(3,3,-2242545288991409928,-2242545288990885640),(3,4,-2242545288991409928,-2242545288990885640),(3,5,-2242545288991409928,-4548388366924056328),(3,6,-4548388298204579592,-4548388366924056324),(3,7,-4548388298204579592,-4548388366924056324),(3,8,-4548388298204579588,-4557395566178797316),(3,9,-4548388298204579588,-4557395566178796292),(3,10,-4557395497459320580,-4557395566178796292),(3,11,-4557395497459319556,-9169081584606184196),(3,12,-4557395497459319556,-9169081584471966466),(3,13,-9169081515886707460,-9169081584471966466),(3,14,-9169081584606184196,-9169081584471966466),(3,15,-9169081515886707457,-9169081584471966466),(3,16,-9169081584606184193,-9169116768844055297),(4,0,-2242527696805367568,-2242527696805367568),(4,1,-2238024097177995016,-2238024097177995016),(4,2,-2242527696805365512,-2242527696805365512),(4,3,-2242527696804841224,-2242527696805365512),(4,4,-2242545288991409928,-2242545288991409928),(4,5,-2242527696804841224,-2242545288990885640),(4,6,-2242545288990885640,-2242545288990885640),(4,7,-4548388298204579588,-4548388298204579588),(4,8,-4548388298204579588,-4548388298204579588),(4,9,-4548388298204579588,-4548388298204579588),(4,10,-4548388298204578564,-4548388298204579588),(4,11,-4557395497459319556,-4557395497459319556),(4,12,-4557395497459319556,-4557395497459319556),(4,13,-4557395497459319556,-4557395497459319556),(4,14,-9169081515886707458,-9169081515886707458),(4,15,-9169081515886707458,-9169081515886707458),(4,16,-9169081515886707458,-9169081515886707458),(5,0,-2242527696805367568,-1085102592571148040),(5,1,-2238024097177995016,-2238024097177995016),(5,2,-2242527696805365512,-2238024097177995016),(5,3,-2242545288991409928,-2242527696805365512),(5,4,-2242545288991409928,-2242527696804841224),(5,5,-2242545288991409928,-2242527696804841224),(5,6,-4548388298204579592,-2242527696804841224),(5,7,-4548388298204579592,-2242527696804841224),(5,8,-4548388298204579588,-4548388298204579592),(5,9,-4548388298204579588,-4548388298204579588),(5,10,-4557395497459320580,-4548388298204579588),(5,11,-4557395497459319556,-4548388298204579588),(5,12,-4557395497459319556,-4548388298204579588),(5,13,-9169081515886707460,-4557395497459320580),(5,14,-9169081584606184196,-4557395497459319556),(5,15,-9169081515886707458,-9169081515886707460),(5,16,-9169081515886707458,-9169081515886707458),(6,0,-1085102592571150096,-1085102592571150096),(6,1,-1085102592571150096,-2238024097177997072),(6,2,-2238024097177995016,-2238024097177997064),(6,3,-2238024097177995016,-2242527696805365512),(6,4,-2238024097177995016,-2242527696805365512),(6,5,-2238024097177995016,-2242527696805365512),(6,6,-2242527696804841224,-2242545288991409928),(6,7,-2242527696804841224,-2242527696804841224),(6,8,-2242527696804841224,-2242545288990885640),(6,9,-4548370706018535176,-2242545288990885640),(6,10,-4548370706018535176,-4548388298204579588),(6,11,-4548388298204579588,-4548388298204579588),(6,12,-4548388298204579588,-4548388298204579588),(6,13,-4548388298204579588,-4548388298204579588),(6,14,-4548388298204579588,-4548388298204579588),(6,15,-4557395497459320580,-4557395497459319556),(6,16,-9169081515886708484,-4557395497459319556),(7,0,-2242527696805367568,-1085102592571148040),(7,1,-2238024097177995016,-2238024097177995016),(7,2,-2242527696805365512,-2238024097177995016),(7,3,-2242545288991409928,-2242527696805365512),(7,4,-2242545288991409928,-2242527696804841224),(7,5,-2242545288991409928,-2242527696804841224),(7,6,-2242545288990885640,-2242527696804841224),(7,7,-2242545288990885640,-2242527696804841224),(7,8,-2242545288990885640,-2242545288990885640),(7,9,-4548388298204579592,-4548388298204579592),(7,10,-4548388298204579592,-4548388298204579592),(7,11,-4548388298204579588,-4548388298204579588),(7,12,-4548388298204579588,-4548388298204579588),(7,13,-4548388298204579588,-4548388298204579588),(7,14,-4548388366924056324,-4557395497459320580),(7,15,-4557395497459320580,-4557395497459320580),(7,16,-4557395497459319556,-4557395497459320580),(8,0,-1085102592571150096,-1085102592571150096),(8,1,-2238024097177997072,-1085102592571150096),(8,2,-2238024097177997072,-2238024097177997072),(8,3,-2242527696805365512,-2238024097177997064),(8,4,-2242527696805365512,-2242527696805367560),(8,5,-2242527696805365512,-2242527696805365512),(8,6,-2242527696805365512,-2242527696805365512),(8,7,-2242527696805365512,-2242527696805365512),(8,8,-2242545288991409928,-2242527696805365512),(8,9,-2242545288990885640,-2242545288991409928),(8,10,-2242545288990885640,-2242545288990885640),(8,11,-4548388298204579592,-4548388298204579592),(8,12,-4548388298204579588,-4548388298204579588),(8,13,-4548388298204579588,-4548388298204579588),(8,14,-4548388298204579588,-4548388298204579588),(8,15,-4548388298204579588,-4548388298204579588),(8,16,-4548388298204579588,-4548388298204579588),(9,0,-1085102592571150096,-1085102592571150096),(9,1,-1085102592571150096,-1085102592571150096),(9,2,-1085102592571150096,-2238024097177997072),(9,3,-2238024097177997072,-2238024097177997064),(9,4,-2238024097177997064,-2238024097177995016),(9,5,-2238024097177997064,-2242527696805365512),(9,6,-2242527696805367560,-2242527696805365512),(9,7,-2242527696805365512,-2242527696805365512),(9,8,-2242527696805365512,-2242527696805365512),(9,9,-2242527696805365512,-2242527696804841224),(9,10,-2242527696805365512,-2242545288990885640),(9,11,-2242545288991409928,-2242545288990885640),(9,12,-2242545288991409928,-2242545288990885640),(9,13,-4548388298205103880,-2242545288990885640),(9,14,-4548388298204579592,-4548388298204579588),(9,15,-4548388298204579588,-4548388298204579588),(9,16,-4548388298204579588,-4548388298204579588),(10,0,-1085102592571150096,-1085102592571150096),(10,1,-1085102592571150096,-1085102592571150096),(10,2,-2238024097177995016,-1085102592571150096),(10,3,-2238024097177995016,-2238024097177997064),(10,4,-2238024097177995016,-2238024097177997064),(10,5,-2238024097177995016,-2238024097177995016),(10,6,-2242527696804841224,-2242527696805365512),(10,7,-2242527696804841224,-2242527696805365512),(10,8,-2242527696804841224,-2242527696805365512),(10,9,-2242527696804841224,-2242527696805365512),(10,10,-2242527696804841224,-2242527696804841224),(10,11,-2242545288990885640,-2242527696804841224),(10,12,-2242545288990885640,-2242545288990885640),(10,13,-4548388298204579592,-2242545288990885640),(10,14,-4548388298204579592,-2242545288990885640),(10,15,-4548388298204579588,-4548388298204579588),(10,16,-4548388298204579588,-4548388298204579588),(11,0,-1085102592571150096,-1085102592571150096),(11,1,-1085102592571150096,-1085102592571150096),(11,2,-1085102592571150096,-2238024097177997072),(11,3,-2238024097177997072,-2238024097177997064),(11,4,-2238024097177997064,-2238024097177995016),(11,5,-2238024097177997064,-2242527696805365512),(11,6,-2242527696805367560,-2242527696805365512),(11,7,-2242527696805365512,-2242527696805365512),(11,8,-2242527696805365512,-2242527696805365512),(11,9,-2242527696805365512,-2242527696804841224),(11,10,-2242527696805365512,-2242545288990885640),(11,11,-2242545288991409928,-2242545288990885640),(11,12,-2242545288991409928,-2242545288990885640),(11,13,-2242545288991409928,-2242545288990885640),(11,14,-2242545288990885640,-2242545288990885640),(11,15,-2242545288990885640,-4548388298204579592),(11,16,-2242545288990885640,-4548388298204579588),(12,0,-1085102592571150096,-1085102592571150096),(12,1,-1085102592571150096,-1085102592571150096),(12,2,-1085102592571150096,-1085102592571150096),(12,3,-2238024097177997072,-2238024097177997072),(12,4,-2238024097177997064,-2238024097177997064),(12,5,-2238024097177997064,-2238024097177997064),(12,6,-2238024097177995016,-2242527696805365512),(12,7,-2242527696805365512,-2242527696805365512),(12,8,-2242527696805365512,-2242527696805365512),(12,9,-2242527696805365512,-2242527696805365512),(12,10,-2242527696805365512,-2242527696805365512),(12,11,-2242527696804841224,-2242527696805365512),(12,12,-2242545288991409928,-2242545288991409928),(12,13,-2242527696804841224,-2242545288990885640),(12,14,-2242545288990885640,-2242545288990885640),(12,15,-2242545288990885640,-2242545288990885640),(12,16,-2242545288990885640,-2242545288990885640),(13,0,-1085102592571150096,-1085102592571150096),(13,1,-1085102592571150096,-1085102592571150096),(13,2,-1085102592571150096,-1085102592571150096),(13,3,-2238024097177997072,-1085102592571150096),(13,4,-2238024097177997064,-1085102592571150088),(13,5,-2238024097177997064,-2238024097177997064),(13,6,-2242527696805367560,-2238024097177995016),(13,7,-2242527696805365512,-2238024097177995016),(13,8,-2242527696805365512,-2242527696805365512),(13,9,-2242527696805365512,-2242527696805365512),(13,10,-2242527696805365512,-2242527696805365512),(13,11,-2242545288991409928,-2242527696805365512),(13,12,-2242545288991409928,-2242527696805365512),(13,13,-2242545288991409928,-2242527696804841224),(13,14,-2242545288990885640,-2242527696804841224),(13,15,-2242545288990885640,-2242527696804841224),(13,16,-2242545288990885640,-2242545288990885640),(14,0,-1085102592571150096,-1085102592571150096),(14,1,-1085102592571150096,-1085102592571150096),(14,2,-1085102592571150096,-1085102592571150096),(14,3,-1085102592571150096,-1085102592571150096),(14,4,-1085102592571150088,-2238024097177997072),(14,5,-1085102592571150088,-2238024097177997064),(14,6,-2238024097177997064,-2238024097177997064),(14,7,-2238024097177995016,-2242527696805367560),(14,8,-2238024097177995016,-2242527696805365512),(14,9,-2238024097177995016,-2242527696805365512),(14,10,-2242527696805365512,-2242527696805365512),(14,11,-2242527696805365512,-2242527696805365512),(14,12,-2242527696805365512,-2242527696805365512),(14,13,-2242527696805365512,-2242527696805365512),(14,14,-2242527696804841224,-2242545288991409928),(14,15,-2242527696804841224,-2242545288990885640),(14,16,-2242527696804841224,-2242545288990885640),(15,0,-1085102592571150096,-1085102592571150096),(15,1,-1085102592571150096,-1085102592571150096),(15,2,-1085102592571150096,-1085102592571150096),(15,3,-2238024097177997072,-1085102592571150096),(15,4,-2238024097177997064,-1085102592571150088),(15,5,-2238024097177997064,-2238024097177997064),(15,6,-2242527696805367560,-2238024097177995016),(15,7,-2242527696805365512,-2238024097177995016),(15,8,-2242527696805365512,-2242527696805365512),(15,9,-2242527696805365512,-2242527696805365512),(15,10,-2242527696805365512,-2242527696805365512),(15,11,-2242545288991409928,-2242527696805365512),(15,12,-2242545288991409928,-2242527696805365512),(15,13,-2242545288991409928,-2242527696804841224),(15,14,-2242545288990885640,-2242527696804841224),(15,15,-2242545288990885640,-2242527696804841224),(15,16,-2242545288990885640,-2242545288990885640),(16,0,-1085102592571150096,-1085102592571150096),(16,1,-1085102592571150096,-1085102592571150096),(16,2,-1085102592571150096,-1085102592571150096),(16,3,-1085102592571150096,-1085102592571150096),(16,4,-1085102592571150096,-1085102592571150096),(16,5,-2238024097177997072,-1085102592571150096),(16,6,-2238024097177997064,-2238024097177997064),(16,7,-2238024097177997064,-2238024097177997064),(16,8,-2242527696805367560,-2238024097177997064),(16,9,-2242527696805365512,-2238024097177995016),(16,10,-2242527696805365512,-2242527696805365512),(16,11,-2242527696805365512,-2242527696805365512),(16,12,-2242527696805365512,-2242527696805365512),(16,13,-2242527696805365512,-2242527696805365512),(16,14,-2242527696805365512,-2242527696805365512),(16,15,-2242527696805365512,-2242527696805365512),(16,16,-2242545288991409928,-2242527696805365512),(17,0,-1085102592571150096,-1085102592571150096),(17,1,-1085102592571150096,-1085102592571150096),(17,2,-1085102592571150096,-1085102592571150096),(17,3,-1085102592571150096,-1085102592571150096),(17,4,-1085102592571150096,-1085102592571150096),(17,5,-1085102592571150096,-1085102592571150096),(17,6,-2238024097177997072,-2238024097177997064),(17,7,-2238024097177997072,-2238024097177997064),(17,8,-2238024097177997064,-2238024097177997064),(17,9,-2238024097177997064,-2238024097177995016),(17,10,-2242527696805367560,-2242527696805365512),(17,11,-2242527696805365512,-2242527696805365512),(17,12,-2242527696805365512,-2242527696805365512),(17,13,-2242527696805365512,-2242527696805365512),(17,14,-2242527696805365512,-2242527696805365512),(17,15,-2242527696805365512,-2242527696805365512),(17,16,-2242527696805365512,-2242527696805365512),(18,0,-1085102592571150096,-1085102592571150096),(18,1,-1085102592571150096,-1085102592571150096),(18,2,-1085102592571150096,-1085102592571150096),(18,3,-1085102592571150096,-1085102592571150096),(18,4,-1085102592571150088,-1085102592571150096),(18,5,-1085102592571150088,-1085102592571150096),(18,6,-2238024097177997064,-2238024097177997064),(18,7,-2238024097177995016,-2238024097177997064),(18,8,-2238024097177995016,-2238024097177997064),(18,9,-2238024097177995016,-2238024097177995016),(18,10,-2242527696805365512,-2242527696805365512),(18,11,-2242527696805365512,-2242527696805365512),(18,12,-2242527696805365512,-2242527696805365512),(18,13,-2242527696805365512,-2242527696805365512),(18,14,-2242527696804841224,-2242527696805365512),(18,15,-2242527696804841224,-2242527696805365512),(18,16,-2242527696804841224,-2242527696805365512),(19,0,-1085102592571150096,-1085102592571150096),(19,1,-1085102592571150096,-1085102592571150096),(19,2,-1085102592571150096,-1085102592571150096),(19,3,-1085102592571150096,-1085102592571150096),(19,4,-1085102592571150096,-1085102592571150096),(19,5,-1085102592571150096,-1085102592571150096),(19,6,-2238024097177997072,-2238024097177997064),(19,7,-2238024097177997072,-2238024097177997064),(19,8,-2238024097177997064,-2238024097177997064),(19,9,-2238024097177997064,-2238024097177995016),(19,10,-2242527696805367560,-2242527696805365512),(19,11,-2242527696805365512,-2242527696805365512),(19,12,-2242527696805365512,-2242527696805365512),(19,13,-2242527696805365512,-2242527696805365512),(19,14,-2242527696805365512,-2242527696805365512),(19,15,-2242527696805365512,-2242527696805365512),(19,16,-2242527696805365512,-2242527696805365512),(20,0,-1085102592571150096,-1085102592571150096),(20,1,-1085102592571150096,-1085102592571150096),(20,2,-1085102592571150096,-1085102592571150096),(20,3,-1085102592571150096,-1085102592571150096),(20,4,-1085102592571150096,-1085102592571150096),(20,5,-1085102592571150096,-1085102592571150096),(20,6,-1085102592571150096,-1085102592571150096),(20,7,-2238024097177997064,-2238024097177997064),(20,8,-2238024097177997064,-2238024097177997064),(20,9,-2238024097177997064,-2238024097177997064),(20,10,-2238024097177995016,-2238024097177997064),(20,11,-2242527696805365512,-2242527696805365512),(20,12,-2242527696805365512,-2242527696805365512),(20,13,-2242527696805365512,-2242527696805365512),(20,14,-2242527696805365512,-2242527696805365512),(20,15,-2242527696805365512,-2242527696805365512),(20,16,-2242527696805365512,-2242527696805365512),(21,0,-1085102592571150096,-1085102592571150096),(21,1,-1085102592571150096,-1085102592571150096),(21,2,-1085102592571150096,-1085102592571150096),(21,3,-1085102592571150096,-1085102592571150096),(21,4,-1085102592571150096,-1085102592571150096),(21,5,-1085102592571150096,-1085102592571150096),(21,6,-2238024097177997072,-1085102592571150096),(21,7,-2238024097177997072,-1085102592571150088),(21,8,-2238024097177997064,-2238024097177997064),(21,9,-2238024097177997064,-2238024097177997064),(21,10,-2242527696805367560,-2238024097177997064),(21,11,-2242527696805365512,-2238024097177995016),(21,12,-2242527696805365512,-2238024097177995016),(21,13,-2242527696805365512,-2242527696805365512),(21,14,-2242527696805365512,-2242527696805365512),(21,15,-2242527696805365512,-2242527696805365512),(21,16,-2242527696805365512,-2242527696805365512),(22,0,-1085102592571150096,-1085102592571150096),(22,1,-1085102592571150096,-1085102592571150096),(22,2,-1085102592571150096,-1085102592571150096),(22,3,-1085102592571150096,-1085102592571150096),(22,4,-1085102592571150096,-1085102592571150096),(22,5,-1085102592571150096,-1085102592571150096),(22,6,-1085102592571150096,-1085102592571150096),(22,7,-1085102592571150096,-1085102592571150096),(22,8,-1085102592571150088,-2238024097177997064),(22,9,-2238024097177997064,-2238024097177997064),(22,10,-2238024097177997064,-2238024097177997064),(22,11,-2238024097177995016,-2238024097177997064),(22,12,-2238024097177995016,-2242527696805365512),(22,13,-2238024097177995016,-2242527696805365512),(22,14,-2238024097177995016,-2242527696805365512),(22,15,-2242527696805365512,-2242527696805365512),(22,16,-2242527696805365512,-2242527696805365512),(23,0,-1085102592571150096,-1085102592571150096),(23,1,-1085102592571150096,-1085102592571150096),(23,2,-1085102592571150096,-1085102592571150096),(23,3,-1085102592571150096,-1085102592571150096),(23,4,-1085102592571150096,-1085102592571150096),(23,5,-1085102592571150096,-1085102592571150096),(23,6,-2238024097177997072,-1085102592571150096),(23,7,-2238024097177997072,-1085102592571150088),(23,8,-2238024097177997064,-2238024097177997064),(23,9,-2238024097177997064,-2238024097177997064),(23,10,-2242527696805367560,-2238024097177997064),(23,11,-2242527696805365512,-2238024097177995016),(23,12,-2242527696805365512,-2238024097177995016),(23,13,-2242527696805365512,-2242527696805365512),(23,14,-2242527696805365512,-2242527696805365512),(23,15,-2242527696805365512,-2242527696805365512),(23,16,-2242527696805365512,-2242527696805365512),(24,0,-1085102592571150096,-1085102592571150096),(24,1,-1085102592571150096,-1085102592571150096),(24,2,-1085102592571150096,-1085102592571150096),(24,3,-1085102592571150096,-1085102592571150096),(24,4,-1085102592571150096,-1085102592571150096),(24,5,-1085102592571150096,-1085102592571150096),(24,6,-1085102592571150096,-1085102592571150096),(24,7,-1085102592571150096,-1085102592571150096),(24,8,-2238024097177997072,-1085102592571150096),(24,9,-2238024097177997064,-2238024097177997064),(24,10,-2238024097177997064,-2238024097177997064),(24,11,-2238024097177997064,-2238024097177997064),(24,12,-2238024097177997064,-2238024097177997064),(24,13,-2238024097177997064,-2238024097177997064),(24,14,-2242527696805365512,-2242527696805365512),(24,15,-2242527696805365512,-2242527696805365512),(24,16,-2242527696805365512,-2242527696805365512),(25,0,-1085102592571150096,-1085102592571150096),(25,1,-1085102592571150096,-1085102592571150096),(25,2,-1085102592571150096,-1085102592571150096),(25,3,-1085102592571150096,-1085102592571150096),(25,4,-1085102592571150096,-1085102592571150096),(25,5,-1085102592571150096,-1085102592571150096),(25,6,-1085102592571150096,-1085102592571150096),(25,7,-1085102592571150096,-1085102592571150096),(25,8,-1085102592571150096,-1085102592571150096),(25,9,-2238024097177997072,-1085102592571150088),(25,10,-2238024097177997072,-2238024097177997064),(25,11,-2238024097177997064,-2238024097177997064),(25,12,-2238024097177997064,-2238024097177997064),(25,13,-2238024097177997064,-2238024097177997064),(25,14,-2238024097177997064,-2238024097177995016),(25,15,-2242527696805367560,-2242527696805365512),(25,16,-2242527696805365512,-2242527696805365512),(26,0,-1085102592571150096,-1085102592571150096),(26,1,-1085102592571150096,-1085102592571150096),(26,2,-1085102592571150096,-1085102592571150096),(26,3,-1085102592571150096,-1085102592571150096),(26,4,-1085102592571150096,-1085102592571150096),(26,5,-1085102592571150096,-1085102592571150096),(26,6,-1085102592571150096,-1085102592571150096),(26,7,-1085102592571150096,-1085102592571150096),(26,8,-1085102592571150088,-1085102592571150096),(26,9,-2238024097177997064,-1085102592571150096),(26,10,-2238024097177997064,-2238024097177997064),(26,11,-2238024097177995016,-2238024097177997064),(26,12,-2238024097177995016,-2238024097177997064),(26,13,-2238024097177995016,-2238024097177997064),(26,14,-2238024097177995016,-2238024097177997064),(26,15,-2242527696805365512,-2242527696805365512),(26,16,-2242527696805365512,-2242527696805365512),(27,0,-1085102592571150096,-1085102592571150096),(27,1,-1085102592571150096,-1085102592571150096),(27,2,-1085102592571150096,-1085102592571150096),(27,3,-1085102592571150096,-1085102592571150096),(27,4,-1085102592571150096,-1085102592571150096),(27,5,-1085102592571150096,-1085102592571150096),(27,6,-1085102592571150096,-1085102592571150096),(27,7,-1085102592571150096,-1085102592571150096),(27,8,-1085102592571150096,-1085102592571150096),(27,9,-2238024097177997072,-1085102592571150088),(27,10,-2238024097177997072,-2238024097177997064),(27,11,-2238024097177997064,-2238024097177997064),(27,12,-2238024097177997064,-2238024097177997064),(27,13,-2238024097177997064,-2238024097177997064),(27,14,-2238024097177997064,-2238024097177995016),(27,15,-2242527696805367560,-2242527696805365512),(27,16,-2242527696805365512,-2242527696805365512),(28,0,-1085102592571150096,-1085102592571150096),(28,1,-1085102592571150096,-1085102592571150096),(28,2,-1085102592571150096,-1085102592571150096),(28,3,-1085102592571150096,-1085102592571150096),(28,4,-1085102592571150096,-1085102592571150096),(28,5,-1085102592571150096,-1085102592571150096),(28,6,-1085102592571150096,-1085102592571150096),(28,7,-1085102592571150096,-1085102592571150096),(28,8,-1085102592571150096,-1085102592571150096),(28,9,-1085102592571150096,-1085102592571150096),(28,10,-2238024097177997064,-2238024097177997064),(28,11,-2238024097177997064,-2238024097177997064),(28,12,-2238024097177997064,-2238024097177997064),(28,13,-2238024097177997064,-2238024097177997064),(28,14,-2238024097177997064,-2238024097177997064),(28,15,-2238024097177995016,-2238024097177995016),(28,16,-2242527696805365512,-2242527696805365512)"
_PHASH_WAV_PINS = "(0,0),(1,-1152921504606846976),(2,-2251799813685248),(3,-35184372088832),(4,-1099511627776),(5,-68719476736),(6,-4294967296),(7,1152921503533105152),(8,36028796884746240),(9,2251799780130816),(10,281474959933440),(11,35184367894528),(12,-9223367638810361856),(13,-576459652792844288),(14,-72057456599236608),(15,-18014329790267392),(16,-2251782633947136),(17,-562945658519552),(18,4611615651830661120),(19,576425569005043712),(20,144106392251252736),(21,36026598129917952),(22,9006649566027776),(23,2251524969328640),(24,-4611123205896146944),(25,-576320049158033408),(26,-288160024579016704),(27,-72040010437625856),(28,-18005606709330944),(29,9218872833128528896),(30,2303593407350569984),(31,575898351033121792),(32,287949175516560896),(33,71916993720352256),(34,35958496860306944),(35,-4602696377065800192),(36,-2301348171386585344),(37,-574213333389803776),(38,-287106666711679232),(39,-143553333355806976),(40,9187483429699124992),(41,4593741441045397376),(42,2296870720522715008),(43,571974607955853184),(44,285996100337287040),(45,142998050168651648),(46,-9151873028817141888),(47,-4575936514408570944),(48,-2287968257137696832),(49,-567523380560912448)"


def _phash_oracle() -> str:
    """DuckDB oracle for ext_multimodal_phash: a FULL SEMANTIC REPLAY
    of the pigeonhole Hamming pairing under the pinned residue-class
    hashes. The hashed table reconstructs closed-form (base + resized
    + container-swapped variants for images, envelope hashes for WAV);
    then the EXACT hamming_band_pairs algebra replays in SQL — 4x16-bit
    chunks (signed->unsigned via HUGEINT for the logical shift), the
    class-partitioned band buckets, the hot-bucket anti-join cap, the
    d1 < d2 dedup and the bit_count(xor) <= 3 verify — so the driver
    row grades the hashing kernels AND the whole dedup-stack pairing
    machinery end-to-end. All-integer math: no cross-engine float risk
    at all."""
    from smartpipeline_spark.functions.dedup import HAMMING_MAX_BUCKET

    return f"""WITH imgP(wr,hr,h0,h2x) AS (VALUES {_PHASH_PNG_PINS}),
 imgB(wr,hr,h0,h2x) AS (VALUES {_PHASH_BMP_PINS}),
 wavp(r, h) AS (VALUES {_PHASH_WAV_PINS}),
 img AS (SELECT d.doc_id,
                CASE d.doc_id % 3 WHEN 0 THEN p.h0 ELSE b.h0 END AS h0,
                CASE d.doc_id % 3 WHEN 0 THEN p.h2x ELSE b.h2x END AS h2x
         FROM documents d
         LEFT JOIN imgP p ON p.wr = d.doc_id % 29 AND p.hr = d.doc_id % 17
         LEFT JOIN imgB b ON b.wr = d.doc_id % 29 AND b.hr = d.doc_id % 17
         WHERE d.doc_id % 3 < 2),
 hashed AS (
   SELECT doc_id, 'image' AS media_class, h0 AS phash FROM img
   UNION ALL
   SELECT doc_id + 1000000, 'image', h2x FROM img
   UNION ALL
   SELECT doc_id + 2000000, 'image', h0 FROM img
   UNION ALL
   SELECT d.doc_id, 'audio', w.h FROM documents d
   JOIN wavp w ON w.r = d.doc_id % 50 WHERE d.doc_id % 3 = 2),
 chunks AS (
   SELECT doc_id, media_class, phash, j.j AS chunk_id,
          CAST(((CAST(phash AS HUGEINT)
                 + CASE WHEN phash < 0 THEN 18446744073709551616::HUGEINT
                        ELSE 0::HUGEINT END) >> (j.j * 16)) & 65535 AS BIGINT) AS chunk_val
   FROM hashed, (SELECT unnest([0,1,2,3]) AS j) j),
 hot AS (SELECT media_class, chunk_id, chunk_val
         FROM chunks GROUP BY media_class, chunk_id, chunk_val
         HAVING COUNT(*) > {HAMMING_MAX_BUCKET}),
 kept AS (SELECT c.* FROM chunks c ANTI JOIN hot h
            USING (media_class, chunk_id, chunk_val)),
 cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                 a.phash AS h1, b.phash AS h2
          FROM kept a JOIN kept b
            ON a.media_class = b.media_class AND a.chunk_id = b.chunk_id
           AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id)
SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(h1, h2)) <= 3"""


@ext_query("ext_multimodal_phash", _phash_oracle())  # + planted-copy pytest

def ext_multimodal_phash(spark, sf_dir):
    """Perceptual multimodal near-dup: the synthetic media corpus plus
    PLANTED near-duplicate variants — each image re-appears 2× upscaled
    (doc_id + 1e6, real nearest-neighbor resize) and container-swapped
    (doc_id + 2e6, PNG↔BMP, same pixels) — is perceptually hashed and
    Hamming-paired. The pairing is the pigeonhole band join from the
    dedup stack (:func:`hamming_band_pairs`): 4×16-bit chunks give
    recall-complete candidates at Hamming ≤ 3, a hot-bucket cap bounds
    degenerate fingerprints (solid-color images), the exact
    ``bit_count(xor)`` verify runs candidates-only, and image hashes
    never compare against audio hashes (class-partitioned buckets).
    Every planted variant must pair with its original — that is the
    pytest contract (tests/test_extensions.py) — making this the
    operator a multimodal training pipeline runs before anything else:
    resized / re-encoded copies of the same asset collapse to one.
    100 TB: hashes are 8 bytes/asset computed in one mapInPandas pass
    over the binary column; only (id, class, hash) shuffles, never
    pixels; the band join is bucketed + capped like every other
    self-join in the engine. Oracled as of r10: on the synth corpus
    every hash is a residue-class closed form, so the full pairing
    algebra replays in SQL (:func:`_phash_oracle` — all-integer, no
    float risk); the planted-copy recall/precision pytest remains for
    general media."""
    from smartpipeline_spark.functions.dedup import hamming_band_pairs

    base = synth_media(spark, sf_dir)

    def plant_variants(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                meta = decode_media(p)
                if meta["kind"] in ("png", "bmp"):
                    ids.append(doc_id + 1_000_000)
                    payloads.append(
                        resize_image(p, meta["width"] * 2, meta["height"] * 2)
                    )
                    ids.append(doc_id + 2_000_000)
                    payloads.append(reencode_image(p))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    variants = base.mapInPandas(
        plant_variants, schema="doc_id bigint, payload binary"
    )
    hashed = media_phash(base.unionByName(variants))
    return hamming_band_pairs(
        hashed, id_col="doc_id", hash_col="phash", class_col="media_class"
    )


@ext_query(
    "ext_multimodal_decode",
    """SELECT doc_id,
              CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'wav' END AS kind,
              CASE WHEN doc_id % 3 < 2 THEN 4 + doc_id % 29 END AS width,
              CASE WHEN doc_id % 3 < 2 THEN 4 + doc_id % 17 END AS height,
              CASE WHEN doc_id % 3 = 2 THEN (400 + (doc_id % 50) * 80) // 8 END AS duration_ms
       FROM documents""",
)
def ext_multimodal_decode(spark, sf_dir):
    """REAL decode via mapInPandas: :func:`synth_media` writes valid
    PNG/BMP/WAV binaries, :func:`decode_media` parses the actual
    container headers back out, and the oracle recomputes the expected
    metadata from doc_id — a genuine encode→binary→parse round trip
    with no codec dependencies. Bytes cross the Arrow boundary in
    columnar batches; output schema is declared statically. This is
    the template for resize / frame-sample / embed kernels."""
    b = synth_media(spark, sf_dir)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode_media(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [m["kind"] for m in meta],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "duration_ms": [m["duration_ms"] for m in meta],
                }
            )

    return b.mapInPandas(
        decode_batches,
        schema="doc_id bigint, kind string, width bigint, height bigint, duration_ms bigint",
    )
