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


@ext_query("ext_multimodal_resize")  # verified by re-parse + pixel pytest
def ext_multimodal_resize(spark, sf_dir):
    """REAL resize over mapInPandas: PNG/BMP payloads are pixel-decoded
    (full PNG unfilter), nearest-neighbor resampled to 16×12, and
    re-encoded in the same container; the output dims come from
    RE-PARSING the resized bytes, not from trusting the kernel. WAV
    rows pass through untouched (resize is an image op). Binary in ->
    binary out with typed metadata — the production shape for a
    codec-backed kernel."""
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


@ext_query("ext_multimodal_frames")  # verified by deterministic pytest
def ext_multimodal_frames(spark, sf_dir):
    """REAL frame sampling: WAV payloads are windowed into 50 ms PCM
    frames (1 media row -> N frame rows, flatMap shape); images count
    as a single frame. The row-count expansion happens inside
    mapInPandas so downstream operators see ordinary rows; at scale
    the expansion factor drives partition sizing (explode-aware
    maxRecordsPerBatch)."""
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


@ext_query("ext_multimodal_phash")  # planted-copy recall/precision pytest
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
    self-join in the engine. Declared rows-only (a perceptual hash has
    no SQL oracle); determinism pinned by the synthetic corpus."""
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
