"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with
a metadata struct (format, n_bytes, sha256).  The Spark-side plumbing —
schema, partition-preserving mapInPandas, Arrow batch shapes — is real
and tested, and so is the decode for the two hermetic formats:

- **PPM (P6)**, **BMP (24-bit uncompressed)** and **PNG (8-bit
  truecolor, non-interlaced)** are DECODED FOR REAL in the Arrow batch
  (pure-stdlib parse: netpbm header tokenizing; BMP bottom-up BGR rows
  with 4-byte padding; PNG chunk walk + ``zlib`` inflate + full
  scanline unfiltering, all five filter types), emitting (width,
  height, channels, px_mean).
- **WAV (RIFF PCM, 16-bit)** is likewise decoded for real (RIFF chunk
  walk, fmt/data parse, interleaved LE int16 samples), emitting
  (sample_rate, channels, n_frames, amp_mean) — PCM needs no codec.
- **JPEG (baseline DCT, grayscale)** is decoded for real too: marker
  walk, canonical Huffman tables from DHT, 0xFF00 byte-unstuffing, DC
  prediction, run-length AC, dequantization and a full 8×8 IDCT
  (numpy) — see :func:`decode_jpeg`.  Chroma-subsampled color and
  progressive variants raise (plug PIL in on a real cluster).
- **MP4 container metadata** is parsed hermetically too (ISO BMFF box
  walk: tkhd dims, stsd depth → channels, stsz sample count → frames;
  see :func:`decode_mp4_meta`) — container grammar needs no codec.
- **MJPEG frame decode is REAL** (:func:`decode_mp4_frames`): Motion-
  JPEG samples are self-contained JPEGs, so container slicing
  (stsz/stsc/stco) composed with :func:`decode_jpeg` decodes every
  frame hermetically.  Only inter-frame codecs (avc1/hvc1/vp09 — the
  actual compressed bitstreams) genuinely need codec libraries not
  present in this environment; they remain stubbed behind
  ``decode_media`` / ``decode_mp4_frames`` → ``NotImplementedError`` —
  plug ffmpeg into the extension point on a real cluster.

Scale notes: feature extraction is ``mapInPandas`` (Arrow-batched,
partition-local, no shuffle); binary payloads never pass through the
driver; metadata-only queries prune the binary column at the Parquet
scan (columnar projection), so a "count by format" never reads bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("thumb", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("px_mean", T.DoubleType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("amp_mean", T.DoubleType()),
])

# formats whose FRAME decode needs codec libraries absent from this
# container (container METADATA is still parsed hermetically — see
# decode_mp4_meta)
REAL_FORMATS = {"mp4"}
# hermetically decodable image formats (pure-stdlib + numpy parse below)
IMAGE_FORMATS = {"ppm", "bmp", "png", "jpeg"}
# hermetically decodable audio formats (PCM carries raw samples)
AUDIO_FORMATS = {"wav"}
# container formats: metadata hermetic (box walk), frame decode env-bound
VIDEO_FORMATS = {"mp4"}


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add an opaque ``payload: binary`` column + typed metadata struct —
    the canonical multimodal row shape (here synthesized from text so the
    plumbing is testable without media files)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("utf8-text").alias("format"),
            F.octet_length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


# --- real decoders (pure stdlib, hermetic) --------------------------------

def decode_ppm(payload: bytes) -> tuple[int, int, int, float]:
    """Binary PPM (P6, maxval ≤ 255): (width, height, channels, px_mean).

    Header is ``P6\\n<w> <h>\\n<maxval>\\n`` followed by w*h RGB triplets.
    Comments (# lines) are consumed per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # tokenize the header: magic, width, height, maxval; '#' starts a
    # comment running to end-of-line
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    # the spec mandates EXACTLY ONE whitespace byte between maxval and
    # the raster — verify before consuming so a malformed header fails
    # loudly instead of shifting every pixel by a byte
    if not payload[i : i + 1].isspace():
        raise ValueError("PPM header: expected single whitespace after maxval")
    i += 1
    body = payload[i : i + 3 * w * h]
    if len(body) != 3 * w * h:
        raise ValueError("truncated PPM body")
    return w, h, 3, sum(body) / len(body)


def decode_bmp(payload: bytes) -> tuple[int, int, int, float]:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): (width, height,
    channels, px_mean).  Pixel rows are stored bottom-up, BGR, padded to
    4 bytes — padding is excluded from the mean."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    h = abs(h)
    row = (w * 3 + 3) // 4 * 4
    total = 0
    count = 0
    for y in range(h):
        start = data_off + y * row
        px = payload[start : start + w * 3]  # strip padding
        total += sum(px)
        count += len(px)
    if count != 3 * w * h:
        raise ValueError("truncated BMP body")
    return w, h, 3, total / count


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): pick of left/up/up-left
    nearest to the linear estimate, ties resolved left → up → up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_png(raw: bytes, w: int, h: int, bpp: int = 3) -> bytes:
    """Reverse per-scanline PNG filtering (all five types: None, Sub,
    Up, Average, Paeth).  ``raw`` is the inflated IDAT stream: each
    scanline is one filter-type byte + w*bpp filtered bytes."""
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    out = bytearray()
    prev = bytes(stride)
    pos = 0
    for _ in range(h):
        ft = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out += line
        prev = bytes(line)
    return bytes(out)


def decode_png(payload: bytes) -> tuple[int, int, int, float]:
    """8-bit truecolor non-interlaced PNG: (width, height, channels,
    px_mean) — pure stdlib (``zlib`` inflate + scanline unfiltering).

    Handles multi-chunk IDAT and every scanline filter type; palette /
    alpha / 16-bit / interlaced variants raise (they need no external
    codec either, just more code than the plumbing warrants here)."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    w = h = None
    idat = bytearray()
    pos = 8
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 2:
                raise ValueError("only 8-bit truecolor (RGB) PNG supported")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    px = _unfilter_png(zlib.decompress(bytes(idat)), w, h)
    return w, h, 3, sum(px) / len(px)


def decode_wav(payload: bytes) -> tuple[int, int, int, float]:
    """RIFF PCM WAV (16-bit): (sample_rate, channels, n_frames,
    amp_mean) — pure stdlib; PCM audio carries raw samples, no codec.

    Walks the RIFF chunk list (odd-length chunks are padded to even per
    the spec), requires a PCM ``fmt `` chunk (audio format 1, 16 bits
    per sample) before ``data``.  ``amp_mean`` is the mean of the raw
    interleaved int16 samples across all channels."""
    import array
    import sys

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    sample_rate = channels = block_align = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            audio_fmt, channels, sample_rate, _byte_rate, block_align, bits = (
                struct.unpack_from("<HHIIHH", body)
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM WAV supported")
        elif cid == b"data":
            if sample_rate is None:
                raise ValueError("WAV data chunk before fmt")
            if len(body) != length:
                raise ValueError("truncated WAV data chunk")
            if length % block_align:
                raise ValueError("WAV data not frame-aligned")
            samples = array.array("h")
            samples.frombytes(body)
            if sys.byteorder == "big":  # samples are little-endian
                samples.byteswap()
            n_frames = length // block_align
            return (
                sample_rate, channels, n_frames,
                sum(samples) / len(samples),
            )
    raise ValueError("WAV missing data chunk")


# --- baseline JPEG (grayscale) decoder ------------------------------------

# zigzag scan order: position k in the entropy stream → natural
# (row-major) coefficient index (ITU T.81 figure 5)
_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


class _BitReader:
    """MSB-first bit reader over the un-stuffed entropy stream."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_table(bits: list[int], symbols: list[int]) -> dict:
    """Canonical Huffman table from a DHT segment: ``bits[i]`` codes of
    length i+1, symbols in code order → {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    """Signed-magnitude extension (T.81 F.2.2.1): the ``size`` raw bits
    encode value v if the leading bit is 1, else v - 2^size + 1."""
    if size == 0:
        return 0
    return v if v >= 1 << (size - 1) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, int, float]:
    """Baseline (SOF0) grayscale JPEG: (width, height, 1, px_mean) —
    a real general decoder, not one hardcoded to this module's synth
    payloads: marker walk (APPn/COM skipped), 8-bit DQT tables,
    canonical Huffman tables from DHT, 0xFF00 byte-unstuffing, DC
    prediction, run-length AC with ZRL/EOB, dequantization and an exact
    8×8 float64 IDCT (numpy).  Color (multi-component), progressive
    (SOF2) and restart-interval streams raise — those are the variants
    where a real cluster plugs in PIL at ``decode_image``.

    DC-only blocks round-trip bit-exactly (the IDCT of a pure-DC block
    is DC/8 + 128 with no trigonometric terms), which is what lets
    :func:`_synth_jpeg` ship payloads whose decoded pixel mean is a
    closed-form function of doc_id for the DuckDB oracle."""
    import math

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, list[int]] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    w = h = qtab_id = None
    scan_data = None
    dc_id = ac_id = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT — a segment may hold several tables
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported")
                qt[tq] = list(seg[i + 1 : i + 65])
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if ncomp != 1:
                raise NotImplementedError(
                    "only grayscale baseline JPEG is decoded hermetically; "
                    "color JPEG needs a codec library (PIL) on a real cluster"
                )
            if seg[7] != 0x11:  # component: id(1) sampling(1) tq(1)
                raise ValueError("subsampled JPEG not supported")
            qtab_id = seg[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline (SOF0) JPEG is supported")
        elif marker == 0xC4:  # DHT — may hold several tables
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                symbols = list(seg[i + 17 : i + 17 + n])
                i += 17 + n
                (dc_tables if tc == 0 else ac_tables)[th] = _huff_table(
                    bits, symbols)
        elif marker == 0xDD:
            raise NotImplementedError("JPEG restart intervals not supported")
        elif marker == 0xDA:  # SOS; entropy-coded data follows
            if seg[0] != 1:
                raise ValueError("scan component count != 1")
            dc_id, ac_id = seg[2] >> 4, seg[2] & 15
            data = bytearray()
            j = pos
            while j < len(payload):
                b = payload[j]
                if b == 0xFF:
                    nxt = payload[j + 1] if j + 1 < len(payload) else 0xD9
                    if nxt == 0x00:  # stuffed literal 0xFF
                        data.append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        raise NotImplementedError(
                            "JPEG restart markers not supported")
                    break  # EOI / next marker ends the scan
                data.append(b)
                j += 1
            scan_data = bytes(data)
            break
        # APPn / COM / other segments: skipped
    if w is None or scan_data is None or qtab_id is None:
        raise ValueError("JPEG missing SOF0/SOS")
    if qtab_id not in qt or dc_id not in dc_tables or ac_id not in ac_tables:
        raise ValueError("JPEG scan references undefined tables")

    # IDCT basis: M[u, x] = C(u)·cos((2x+1)uπ/16)/2, spatial = Mᵀ·S·M
    xs = np.arange(8)
    basis = np.cos((2 * xs[None, :] + 1) * xs[:, None] * np.pi / 16) / 2
    basis[0, :] = 1 / (2 * math.sqrt(2))
    q = np.asarray(qt[qtab_id], dtype=np.float64)
    dct, act = dc_tables[dc_id], ac_tables[ac_id]

    reader = _BitReader(scan_data)
    bx, by = (w + 7) // 8, (h + 7) // 8
    img = np.zeros((by * 8, bx * 8))
    pred = 0
    for blk in range(bx * by):
        coef = np.zeros(64)
        cat = _huff_decode(reader, dct)
        pred += _extend(reader.read_bits(cat), cat)
        coef[0] = pred * q[0]
        k = 0
        while k < 63:
            sym = _huff_decode(reader, act)
            if sym == 0x00:  # EOB — rest of the block is zero
                break
            if sym == 0xF0:  # ZRL — sixteen zeros
                k += 16
                continue
            run, size = sym >> 4, sym & 15
            k += run + 1
            if k > 63:
                raise ValueError("JPEG AC run past block end")
            coef[_ZIGZAG[k]] = _extend(reader.read_bits(size), size) * q[k]
        spatial = basis.T @ coef.reshape(8, 8) @ basis + 128
        y0, x0 = (blk // bx) * 8, (blk % bx) * 8
        img[y0 : y0 + 8, x0 : x0 + 8] = spatial
    img = np.clip(np.rint(img[:h, :w]), 0, 255)
    return w, h, 1, float(img.mean())


def decode_image(fmt: str, payload: bytes) -> tuple[int, int, int, float]:
    """Dispatch to the hermetic decoders; real-cluster extension point
    for codec-library formats (PIL/ffmpeg)."""
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "jpeg":
        return decode_jpeg(payload)
    raise NotImplementedError(
        f"decode for {fmt!r} requires media libraries not present in "
        "this container; plug in PIL/ffmpeg here on a real cluster"
    )


def decode_media(fmt: str, payload: bytes) -> bytes:
    """Thumbnail bytes for non-image payloads.

    For the synthetic ``utf8-text`` format, returns a deterministic fake
    "thumbnail" (first 16 bytes) so the Arrow batch path runs for real;
    codec-library formats raise (see module docstring)."""
    if fmt in REAL_FORMATS:
        raise NotImplementedError(
            f"decode for {fmt!r} requires media libraries not present in "
            "this container; plug in PIL/ffmpeg here on a real cluster"
        )
    return payload[:16]


# --- MP4 container metadata (ISO BMFF box walk — no codec needed) ---------

# boxes whose payload is itself a sequence of boxes
_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_boxes(payload: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each ISO BMFF box in
    payload[start:end].  Handles size==0 (box extends to end); 64-bit
    largesize boxes raise (nothing this parser needs exceeds 4 GiB)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", payload, pos)
        btype = payload[pos + 4 : pos + 8]
        if size == 1:
            raise NotImplementedError("64-bit MP4 box sizes not supported")
        if size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed MP4 box")
        yield btype, pos + 8, pos + size
        pos += size


def _mp4_find(payload: bytes, start: int, end: int, path: list[bytes]):
    """Walk the box tree along ``path`` and return the (body_start,
    body_end) of the first box matching the full path, else None."""
    head, rest = path[0], path[1:]
    for btype, b0, b1 in _mp4_boxes(payload, start, end):
        if btype != head:
            continue
        if not rest:
            return b0, b1
        found = _mp4_find(payload, b0, b1, rest)
        if found is not None:
            return found
    return None


def decode_mp4_meta(payload: bytes) -> tuple[int, int, int, int]:
    """MP4 CONTAINER metadata: (width, height, channels, n_frames) from
    a pure-stdlib ISO BMFF box walk — tkhd carries the presentation
    dims (16.16 fixed point), the stsd visual sample entry carries the
    pixel depth (channels = depth/8), and stsz carries the sample
    count.  No codec anywhere: container grammar is plain struct
    parsing, which is why video METADATA extraction is hermetic while
    frame decode (the ``decode_media`` extension point) genuinely needs
    ffmpeg.  Unknown/extra boxes are skipped per the ISO rule; a
    missing moov/trak raises."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp)")
    n = len(payload)
    tkhd = _mp4_find(payload, 0, n, [b"moov", b"trak", b"tkhd"])
    if tkhd is None:
        raise ValueError("MP4 missing moov/trak/tkhd")
    t0, _t1 = tkhd
    version = payload[t0]
    # v0: 4 flags+version, 4 ctime, 4 mtime, 4 track_id, 4 reserved,
    # 4 duration, 8 reserved, 2+2+2+2 layer/group/volume/reserved,
    # 36 matrix → width/height at offset 4+20+8+8+36 = 76 (v1: +12)
    off = t0 + (76 if version == 0 else 88)
    w_fp, h_fp = struct.unpack_from(">II", payload, off)
    width, height = w_fp >> 16, h_fp >> 16

    stsz = _mp4_find(payload, 0, n, [b"moov", b"trak", b"mdia", b"minf",
                                     b"stbl", b"stsz"])
    if stsz is None:
        raise ValueError("MP4 missing stbl/stsz")
    _flags, _sample_size, n_frames = struct.unpack_from(">III", payload, stsz[0])

    channels = None
    stsd = _mp4_find(payload, 0, n, [b"moov", b"trak", b"mdia", b"minf",
                                     b"stbl", b"stsd"])
    if stsd is not None:
        s0, s1 = stsd
        # version/flags(4) + entry_count(4), then the first sample entry;
        # a visual sample entry's depth sits 8+16+16+4+8+4+2+32 = 82
        # bytes into the entry
        entry0 = s0 + 8
        if entry0 + 84 <= s1:
            (depth,) = struct.unpack_from(">H", payload, entry0 + 82)
            if depth in (8, 16, 24, 32):
                channels = depth // 8
    return width, height, channels, n_frames


# --- pixel-level access: resize + frame-sample ----------------------------

def decode_pixels(fmt: str, payload: bytes):
    """(width, height, uint8 ndarray of shape (h, w, 3)) for the RGB
    image formats — the pixel-buffer sibling of :func:`decode_image`
    (which only returns the mean).  Used by the resize path; jpeg is
    grayscale here and mp4 needs a codec, so both route to the
    extension point."""
    import numpy as np

    if fmt == "ppm":
        w, h, _ch, _ = decode_ppm(payload)
        body = payload[len(payload) - 3 * w * h:]
        return w, h, np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "bmp":
        w, h, _ch, _ = decode_bmp(payload)
        data_off = struct.unpack_from("<I", payload, 10)[0]
        row = (w * 3 + 3) // 4 * 4
        px = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            start = data_off + y * row
            line = np.frombuffer(payload[start:start + w * 3], dtype=np.uint8)
            px[h - 1 - y] = line.reshape(w, 3)[:, ::-1]  # bottom-up BGR
        return w, h, px
    if fmt == "png":
        import zlib

        w, h, _ch, _ = decode_png(payload)
        idat = bytearray()
        pos = 8
        while pos + 12 <= len(payload):
            (length,) = struct.unpack_from(">I", payload, pos)
            ctype = payload[pos + 4:pos + 8]
            if ctype == b"IDAT":
                idat += payload[pos + 8:pos + 8 + length]
            pos += 12 + length
        raw = _unfilter_png(zlib.decompress(bytes(idat)), w, h)
        return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    raise NotImplementedError(
        f"pixel decode for {fmt!r} is not hermetic here; plug PIL/ffmpeg "
        "into this extension point on a real cluster"
    )


def resize_nearest(px, tw: int, th: int):
    """Nearest-neighbor resize of an (h, w, 3) uint8 array to
    (th, tw, 3): target (y, x) samples source (⌊y·h/th⌋, ⌊x·w/tw⌋) —
    the standard box-free decimation, exact integer index math so the
    oracle can mirror it."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return px[np.ix_(ys, xs)]


def extract_thumbnails(df: DataFrame, tw: int = 4, th: int = 4,
                       id_col: str = "doc_id") -> DataFrame:
    """REAL image resize in the Arrow batch: decode pixels
    (:func:`decode_pixels`), nearest-neighbor resize to (tw, th), emit
    FEATURE_SCHEMA rows tagged ``<fmt>@<tw>x<th>`` with the RESIZED
    buffer's size and pixel mean.  Same mapInPandas shape as
    :func:`extract_features` — partition-local, binary never passes the
    driver."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, f, p in zip(pdf[id_col], pdf["fmt"], pdf["payload"]):
                _w, _h, px = decode_pixels(f, p)
                small = resize_nearest(px, tw, th)
                rows.append({
                    "doc_id": d,
                    "format": f"{f}@{tw}x{th}",
                    "n_bytes": int(small.size),
                    "sha256": None, "thumb": None,
                    "width": tw, "height": th, "channels": 3,
                    "px_mean": float(small.mean()),
                    "sample_rate": None, "n_frames": None, "amp_mean": None,
                })
            out = pd.DataFrame(rows)
            out["n_bytes"] = out["n_bytes"].astype("int32")
            yield out

    src = df.select(
        F.col(id_col), F.col("payload"), F.col("media_meta.format").alias("fmt")
    )
    return src.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def mp4_frame_slices(payload: bytes) -> list[bytes]:
    """The raw (still-encoded) sample payloads of an MP4 video track —
    container-level frame EXTRACTION, no codec: stsz gives per-sample
    sizes, stco the chunk offsets, stsc the chunk→sample mapping;
    samples are sliced straight out of mdat.  This is the byte stream a
    real cluster would hand to the codec per sampled frame."""
    n = len(payload)
    stbl = _mp4_find(payload, 0, n, [b"moov", b"trak", b"mdia", b"minf",
                                     b"stbl"])
    if stbl is None:
        raise ValueError("MP4 missing stbl")
    s0, s1 = stbl
    boxes = {t: (a, b) for t, a, b in _mp4_boxes(payload, s0, s1)}
    for need in (b"stsz", b"stco", b"stsc"):
        if need not in boxes:
            raise ValueError(f"MP4 missing {need.decode()}")
    z0, _ = boxes[b"stsz"]
    _flags, fixed_size, n_samples = struct.unpack_from(">III", payload, z0)
    sizes = ([fixed_size] * n_samples if fixed_size else
             list(struct.unpack_from(f">{n_samples}I", payload, z0 + 12)))
    c0, _ = boxes[b"stco"]
    (n_chunks,) = struct.unpack_from(">I", payload, c0 + 4)
    offsets = struct.unpack_from(f">{n_chunks}I", payload, c0 + 8)
    sc0, _ = boxes[b"stsc"]
    (n_ent,) = struct.unpack_from(">I", payload, sc0 + 4)
    ents = [struct.unpack_from(">III", payload, sc0 + 8 + 12 * i)
            for i in range(n_ent)]  # (first_chunk, samples_per_chunk, _)
    # expand stsc: samples-per-chunk for each chunk index (1-based)
    per_chunk = []
    for i, (first, spc, _desc) in enumerate(ents):
        last = ents[i + 1][0] if i + 1 < n_ent else n_chunks + 1
        per_chunk += [spc] * (last - first)
    frames = []
    si = 0
    for ci, coff in enumerate(offsets):
        pos = coff
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= n_samples:
                break
            frames.append(payload[pos:pos + sizes[si]])
            pos += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError("MP4 sample tables inconsistent with mdat")
    return frames


def sample_frames(df: DataFrame, every: int = 2,
                  id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling over MP4 payloads in the Arrow batch: extract the
    raw sample bytes via the container tables
    (:func:`mp4_frame_slices`), keep every ``every``-th frame, and emit
    one FEATURE_SCHEMA row per doc tagged ``mp4-frames`` summarizing
    the sampled set — n_frames = sampled count, n_bytes = sampled
    bytes, amp_mean = mean byte value across sampled frames (the
    codec-free integrity stat; actual pixel decode of a sampled frame
    is the ffmpeg extension point)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, p in zip(pdf[id_col], pdf["payload"]):
                picked = mp4_frame_slices(p)[::every]
                blob = b"".join(picked)
                rows.append({
                    "doc_id": d,
                    "format": "mp4-frames",
                    "n_bytes": len(blob),
                    "sha256": None, "thumb": None,
                    "width": None, "height": None, "channels": None,
                    "px_mean": None, "sample_rate": None,
                    "n_frames": len(picked),
                    "amp_mean": (sum(blob) / len(blob)) if blob else None,
                })
            out = pd.DataFrame(rows)
            out["n_bytes"] = out["n_bytes"].astype("int32")
            yield out

    src = df.select(F.col(id_col), F.col("payload"))
    return src.mapInPandas(_batches, schema=FEATURE_SCHEMA)


# --- MJPEG frame decode: container slicing × the real JPEG decoder --------

# stsd sample-entry fourccs whose samples are self-contained JPEG images
# (Motion-JPEG); every other visual codec (avc1/hvc1/vp09/...) needs a
# bitstream decoder this container does not ship
_MJPEG_FOURCCS = {b"jpeg", b"mjpa"}


def _mp4_codec(payload: bytes) -> bytes:
    """The fourcc of the first stsd sample entry (the track's codec)."""
    stsd = _mp4_find(payload, 0, len(payload),
                     [b"moov", b"trak", b"mdia", b"minf", b"stbl", b"stsd"])
    if stsd is None:
        raise ValueError("MP4 missing stbl/stsd")
    s0, s1 = stsd
    entry0 = s0 + 8  # version/flags + entry_count
    if entry0 + 8 > s1:
        raise ValueError("MP4 stsd has no sample entry")
    return payload[entry0 + 4 : entry0 + 8]


def decode_mp4_frames(payload: bytes) -> tuple[int, int, int, int, float]:
    """REAL video frame decode for Motion-JPEG tracks: slice the sample
    payloads out of mdat via the container tables
    (:func:`mp4_frame_slices`) and run each through the real baseline
    JPEG decoder (:func:`decode_jpeg`) — MJPEG samples are
    self-contained JPEG images, so frame decode needs no bitstream
    codec.  Returns (width, height, channels, n_frames, px_mean) where
    dims/channels come from the first decoded frame and px_mean is the
    mean of the per-frame pixel means.  Inter-frame codecs (avc1, ...)
    raise: their bitstreams genuinely need ffmpeg (the ``decode_media``
    extension point)."""
    codec = _mp4_codec(payload)
    if codec not in _MJPEG_FOURCCS:
        raise NotImplementedError(
            f"frame decode for codec {codec!r} requires media libraries "
            "not present in this container; plug ffmpeg in here on a "
            "real cluster (MJPEG tracks decode hermetically)"
        )
    frames = mp4_frame_slices(payload)
    if not frames:
        raise ValueError("MJPEG track has no samples")
    decoded = [decode_jpeg(fr) for fr in frames]
    w, h, ch, _ = decoded[0]
    px_mean = sum(m for _, _, _, m in decoded) / len(decoded)
    return w, h, ch, len(decoded), px_mean


def decode_video_frames(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-doc MJPEG frame decode in the Arrow batch: one
    FEATURE_SCHEMA row per doc tagged ``mp4-mjpeg`` with the first
    frame's dims/channels, the decoded frame count, the total encoded
    byte size of the frames, and the mean of per-frame pixel means —
    the full container→codec chain (stsz/stsc/stco slicing →
    marker/Huffman/IDCT decode) running partition-local, binary never
    passing the driver."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, p in zip(pdf[id_col], pdf["payload"]):
                w, h, ch, nf, mean = decode_mp4_frames(p)
                rows.append({
                    "doc_id": d,
                    "format": "mp4-mjpeg",
                    "n_bytes": sum(len(fr) for fr in mp4_frame_slices(p)),
                    "sha256": None, "thumb": None,
                    "width": w, "height": h, "channels": ch,
                    "px_mean": mean, "sample_rate": None,
                    "n_frames": nf, "amp_mean": None,
                })
            out = pd.DataFrame(rows)
            out["n_bytes"] = out["n_bytes"].astype("int32")
            yield out

    src = df.select(F.col(id_col), F.col("payload"))
    return src.mapInPandas(_batches, schema=FEATURE_SCHEMA)


# --- deterministic synthetic image payloads -------------------------------

def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _synth_image(doc_id: int) -> tuple[bytes, str]:
    """Deterministic image payload for ``doc_id``: PPM for id%3==0, BMP
    for id%3==1, PNG for id%3==2; width = 4 + id%13, height = 3 + id%7,
    all three channels of logical pixel i carry ``(doc_id*37 + i) % 251``.
    Every field is a pure function of doc_id — including the PNG byte
    size: IDAT is deflate level 0 (stored blocks), so for raw = h*(1+3w)
    ≤ 65535 the file is exactly ``68 + raw`` bytes (8 signature + 25
    IHDR chunk + 12 IDAT framing + [2 zlib hdr + 5 stored-block hdr +
    raw + 4 adler] + 12 IEND) — an oracle recomputes dims, byte size and
    pixel mean without parsing bytes."""
    w = 4 + doc_id % 13
    h = 3 + doc_id % 7
    vals = bytes((doc_id * 37 + i) % 251 for i in range(w * h))
    if doc_id % 3 == 0:
        header = f"P6\n{w} {h}\n255\n".encode()
        body = b"".join(bytes((v, v, v)) for v in vals)
        return header + body, "ppm"
    if doc_id % 3 == 1:
        row_sz = (w * 3 + 3) // 4 * 4
        img_sz = row_sz * h
        hdr = b"BM" + struct.pack("<IHHI", 54 + img_sz, 0, 0, 54)
        hdr += struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_sz, 0, 0, 0, 0
        )
        rows = []
        for y in range(h - 1, -1, -1):  # bottom-up storage order
            rv = vals[y * w : (y + 1) * w]
            line = b"".join(bytes((v, v, v)) for v in rv)
            rows.append(line + b"\x00" * (row_sz - len(line)))
        return hdr + b"".join(rows), "bmp"
    import zlib

    raw = b"".join(
        b"\x00" + b"".join(bytes((v, v, v)) for v in vals[y * w : (y + 1) * w])
        for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 0))
        + _png_chunk(b"IEND", b"")
    )
    return payload, "png"


def _synth_wav(doc_id: int) -> bytes:
    """Deterministic PCM WAV payload for ``doc_id``: canonical 44-byte
    header + 16-bit LE samples.  n_frames = 50 + id%37, channels =
    1 + id%2, sample_rate = 8000; interleaved sample j carries
    ``(doc_id*37 + j) % 251 - 125``.  Every field — including the byte
    size ``44 + 2*n_frames*channels`` — is a pure function of doc_id, so
    an oracle recomputes rate/frames/channels/amp_mean without parsing."""
    n_frames = 50 + doc_id % 37
    channels = 1 + doc_id % 2
    sample_rate = 8000
    n_samples = n_frames * channels
    data = struct.pack(
        f"<{n_samples}h",
        *((doc_id * 37 + j) % 251 - 125 for j in range(n_samples)),
    )
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, channels, sample_rate,
            sample_rate * channels * 2, channels * 2, 16,
        )
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def _synth_jpeg(doc_id: int) -> bytes:
    """Deterministic REAL baseline-JPEG payload for ``doc_id``, built so
    every decoded field is a closed-form function of doc_id:

    - dims w = 8·(1 + id%3), h = 8·(1 + id%2) — whole 8×8 blocks;
    - every block is CONSTANT, alternating A = 40 + id%24 and A+96 in
      raster order — only the DC coefficient is nonzero, and with the
      DC quant step 8 the coded DC is exactly v−128, so the decode
      round-trips bit-exactly and px_mean = A + 96·⌊nb/2⌋/nb (an
      integer for every reachable nb ∈ {1,2,3,4,6});
    - successive DC diffs are always magnitude-category 7 (first block
      A−128 ∈ [−88,−65], then ±96), and the embedded canonical Huffman
      tables give the DC category a 3-bit code and EOB a 1-bit code, so
      every block is exactly 3+7+1 = 11 entropy bits and no bit pattern
      can form a 0xFF byte (no byte stuffing) — the total byte size is
      the closed form ``140 + ceil(11·nb/8)`` the oracle recomputes.
    """
    w = 8 * (1 + doc_id % 3)
    h = 8 * (1 + doc_id % 2)
    nb = (w // 8) * (h // 8)
    a = 40 + doc_id % 24

    dqt = b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([8] + [16] * 63)
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes((1, 0x11, 0))
    dc_bits = bytes(2) + b"\x01" + bytes(13)  # one 3-bit code
    dht_dc = b"\xff\xc4" + struct.pack(">HB", 20, 0x00) + dc_bits + bytes([7])
    ac_bits = b"\x01" + bytes(15)  # one 1-bit code
    dht_ac = b"\xff\xc4" + struct.pack(">HB", 20, 0x10) + ac_bits + bytes([0x00])
    sos = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes((1, 0x00, 0, 63, 0))

    bits = []
    pred = 0
    for b in range(nb):
        dc = (a + 96 * (b % 2)) - 128
        diff = dc - pred
        pred = dc
        mag = diff if diff > 0 else diff + 127  # category-7 raw bits
        bits.append("000" + format(mag, "07b") + "0")  # DC code+mag, EOB
    s = "".join(bits)
    s += "1" * (-len(s) % 8)  # pad final byte with 1s per T.81
    entropy = int(s, 2).to_bytes(len(s) // 8, "big")
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
            + entropy + b"\xff\xd9")


def synth_jpeg_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic real baseline-JPEG payload to each row —
    same row shape as :func:`synth_image_payloads`."""
    gen_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [_synth_jpeg(int(d)) for d in ids],
            })

    out = df.select(F.col(id_col)).mapInPandas(_gen, schema=gen_schema)
    return out.withColumn(
        "media_meta",
        F.struct(
            F.lit("jpeg").alias("format"),
            F.octet_length("payload").alias("n_bytes"),
            F.sha2(F.col("payload"), 256).alias("sha256"),
        ),
    )


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _synth_mp4(doc_id: int) -> bytes:
    """Deterministic minimal-but-grammatical MP4 for ``doc_id``: full
    ISO BMFF box tree (ftyp, moov{mvhd, trak{tkhd, mdia{mdhd, hdlr,
    minf{vmhd, dinf{dref{url}}, stbl{stsd{avc1}, stts, stsc, stsz,
    stco}}}}}, mdat) with closed-form fields:

    - width = 16·(1 + id%4), height = 16·(1 + id%3) (tkhd 16.16 fixed),
    - n_frames = 1 + id%8 (stsz sample count; one 32-byte deterministic
      "frame" per sample in mdat),
    - depth 24 → channels 3 in the avc1 visual sample entry,
    - total byte size = 587 + 36·n_frames (4 stsz bytes + 32 mdat bytes
      per frame) — the formula the DuckDB oracle recomputes.

    The avcC codec-config box is deliberately absent: this synthesizes
    CONTAINER grammar for the hermetic metadata parser, not a playable
    bitstream (frame decode is the env-bound extension point)."""
    w = 16 * (1 + doc_id % 4)
    h = 16 * (1 + doc_id % 3)
    nf = 1 + doc_id % 8
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    mvhd = _box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, 1000, nf * 1000)
                + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                + bytes(8)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                + bytes(24) + struct.pack(">I", 2))
    tkhd = _box(b"tkhd", struct.pack(">IIIIII", 7, 0, 0, 1, 0, nf * 1000)
                + bytes(8) + struct.pack(">HHHH", 0, 0, 0, 0)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                + struct.pack(">II", w << 16, h << 16))
    mdhd = _box(b"mdhd", struct.pack(">IIIIIHH", 0, 0, 0, 1000, nf * 1000,
                                     0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + b"vide" + bytes(12) + b"\x00")
    vmhd = _box(b"vmhd", struct.pack(">IHHHH", 1, 0, 0, 0, 0))
    dinf = _box(b"dinf", _box(b"dref", struct.pack(">II", 0, 1)
                              + _box(b"url ", struct.pack(">I", 1))))
    avc1 = _box(b"avc1", bytes(6) + struct.pack(">H", 1)      # SampleEntry
                + bytes(16)                                    # pre_defined/reserved
                + struct.pack(">HH", w, h)
                + struct.pack(">II", 0x00480000, 0x00480000)   # 72 dpi
                + bytes(4) + struct.pack(">H", 1)              # frame_count
                + bytes(32)                                    # compressorname
                + struct.pack(">Hh", 24, -1))                  # depth, pre_defined
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + avc1)
    stts = _box(b"stts", struct.pack(">IIII", 0, 1, nf, 1000))
    stsc = _box(b"stsc", struct.pack(">IIIII", 0, 1, 1, nf, 1))
    sizes = b"".join(struct.pack(">I", 32) for _ in range(nf))
    stsz = _box(b"stsz", struct.pack(">III", 0, 0, nf) + sizes)

    def assemble(mdat_off: int) -> bytes:
        stco = _box(b"stco", struct.pack(">III", 0, 1, mdat_off))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", vmhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    # stco must carry the REAL file offset of the first sample (the
    # mdat body) so container-level frame extraction works; the offset
    # field is fixed-width, so assembling once with a placeholder fixes
    # every box size and the second pass just fills the true value in
    moov = assemble(0)
    moov = assemble(len(ftyp) + len(moov) + 8)
    frames = b"".join(
        bytes((doc_id + f + i) % 256 for i in range(32)) for f in range(nf)
    )
    mdat = _box(b"mdat", frames)
    return ftyp + moov + mdat


def synth_mp4_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic MP4 container payload to each row — the
    video sibling of :func:`synth_image_payloads`, same row shape."""
    gen_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [_synth_mp4(int(d)) for d in ids],
            })

    out = df.select(F.col(id_col)).mapInPandas(_gen, schema=gen_schema)
    return out.withColumn(
        "media_meta",
        F.struct(
            F.lit("mp4").alias("format"),
            F.octet_length("payload").alias("n_bytes"),
            F.sha2(F.col("payload"), 256).alias("sha256"),
        ),
    )


def _synth_mjpeg_mp4(doc_id: int) -> bytes:
    """Deterministic Motion-JPEG MP4 for ``doc_id``: the same ISO BMFF
    box tree as :func:`_synth_mp4` but the stsd sample entry is
    ``jpeg`` and every mdat sample is a REAL baseline JPEG
    (frame f = ``_synth_jpeg(doc_id + f)``, so each decoded field stays
    a closed-form function of doc_id the oracle recomputes):

    - n_frames = 1 + id%4; frame f dims 8·(1+(id+f)%3) × 8·(1+(id+f)%2);
    - frame f byte size = 140 + ⌈11·nb_f/8⌉ with
      nb_f = (1+(id+f)%3)·(1+(id+f)%2);
    - frame f decoded mean = 40 + (id+f)%24 + 96·⌊nb_f/2⌋/nb_f
      (an integer for every reachable nb).

    Unlike the avc1 synth this is a PLAYABLE track: MJPEG samples are
    self-contained JPEGs, which is exactly why frame decode is
    hermetic here."""
    nf = 1 + doc_id % 4
    frames = [_synth_jpeg(doc_id + f) for f in range(nf)]
    w = 8 * (1 + doc_id % 3)
    h = 8 * (1 + doc_id % 2)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    mvhd = _box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, 1000, nf * 1000)
                + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                + bytes(8)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                + bytes(24) + struct.pack(">I", 2))
    tkhd = _box(b"tkhd", struct.pack(">IIIIII", 7, 0, 0, 1, 0, nf * 1000)
                + bytes(8) + struct.pack(">HHHH", 0, 0, 0, 0)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                + struct.pack(">II", w << 16, h << 16))
    mdhd = _box(b"mdhd", struct.pack(">IIIIIHH", 0, 0, 0, 1000, nf * 1000,
                                     0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + b"vide" + bytes(12) + b"\x00")
    vmhd = _box(b"vmhd", struct.pack(">IHHHH", 1, 0, 0, 0, 0))
    dinf = _box(b"dinf", _box(b"dref", struct.pack(">II", 0, 1)
                              + _box(b"url ", struct.pack(">I", 1))))
    entry = _box(b"jpeg", bytes(6) + struct.pack(">H", 1)    # SampleEntry
                 + bytes(16)                                  # pre_defined/reserved
                 + struct.pack(">HH", w, h)
                 + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
                 + bytes(4) + struct.pack(">H", 1)            # frame_count
                 + bytes(32)                                  # compressorname
                 + struct.pack(">Hh", 24, -1))                # depth, pre_defined
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + entry)
    stts = _box(b"stts", struct.pack(">IIII", 0, 1, nf, 1000))
    stsc = _box(b"stsc", struct.pack(">IIIII", 0, 1, 1, nf, 1))
    sizes = b"".join(struct.pack(">I", len(fr)) for fr in frames)
    stsz = _box(b"stsz", struct.pack(">III", 0, 0, nf) + sizes)

    def assemble(mdat_off: int) -> bytes:
        stco = _box(b"stco", struct.pack(">III", 0, 1, mdat_off))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", vmhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    moov = assemble(0)
    moov = assemble(len(ftyp) + len(moov) + 8)
    mdat = _box(b"mdat", b"".join(frames))
    return ftyp + moov + mdat


def synth_mjpeg_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic Motion-JPEG MP4 payload to each row —
    same row shape as :func:`synth_mp4_payloads`."""
    gen_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [_synth_mjpeg_mp4(int(d)) for d in ids],
            })

    out = df.select(F.col(id_col)).mapInPandas(_gen, schema=gen_schema)
    return out.withColumn(
        "media_meta",
        F.struct(
            F.lit("mp4").alias("format"),
            F.octet_length("payload").alias("n_bytes"),
            F.sha2(F.col("payload"), 256).alias("sha256"),
        ),
    )


def synth_audio_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic real PCM-WAV payload to each row — the
    audio sibling of :func:`synth_image_payloads`, same row shape."""
    gen_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [_synth_wav(int(d)) for d in ids],
            })

    out = df.select(F.col(id_col)).mapInPandas(_gen, schema=gen_schema)
    return out.withColumn(
        "media_meta",
        F.struct(
            F.lit("wav").alias("format"),
            F.octet_length("payload").alias("n_bytes"),
            F.sha2(F.col("payload"), 256).alias("sha256"),
        ),
    )


def synth_image_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic real-image payload (PPM/BMP/PNG cycling on
    id % 3) to each row — the hermetic stand-in for an ingest that
    carries actual media bytes.  Same row shape as :func:`attach_binary`."""
    gen_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("fmt", T.StringType()),
    ])

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            made = [_synth_image(int(d)) for d in ids]
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [m[0] for m in made],
                "fmt": [m[1] for m in made],
            })

    out = df.select(F.col(id_col)).mapInPandas(_gen, schema=gen_schema)
    return out.withColumn(
        "media_meta",
        F.struct(
            F.col("fmt").alias("format"),
            F.octet_length("payload").alias("n_bytes"),
            F.sha2(F.col("payload"), 256).alias("sha256"),
        ),
    ).drop("fmt")


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each batch is a pandas DataFrame; hashing/thumbnailing/
    media decode happen partition-locally.  Image formats (ppm/bmp/png)
    are decoded for real → (width, height, channels, px_mean); PCM WAV
    is decoded for real → (sample_rate, channels, n_frames, amp_mean);
    other formats get the thumbnail path with null media columns.
    Output schema is fixed (FEATURE_SCHEMA)."""
    import hashlib

    def _row(doc_id, fmt, payload):
        base = {
            "doc_id": doc_id,
            "format": fmt,
            "n_bytes": len(payload),
            "sha256": None,
            "thumb": None,
            "width": None,
            "height": None,
            "channels": None,
            "px_mean": None,
            "sample_rate": None,
            "n_frames": None,
            "amp_mean": None,
        }
        if fmt in IMAGE_FORMATS:
            w, h, ch, mean = decode_image(fmt, payload)
            # raw mean (exact integer-sum / count in float64); callers
            # round engine-side so both engines round identically
            base.update(width=w, height=h, channels=ch, px_mean=mean)
        elif fmt in VIDEO_FORMATS:
            # container metadata only — px_mean needs a codec (the
            # decode_media extension point); hermetic box walk
            w, h, ch, frames = decode_mp4_meta(payload)
            base.update(width=w, height=h, channels=ch, n_frames=frames)
        elif fmt in AUDIO_FORMATS:
            rate, ch, frames, mean = decode_wav(payload)
            base.update(
                sample_rate=rate, channels=ch, n_frames=frames, amp_mean=mean
            )
        else:
            base.update(
                sha256=hashlib.sha256(payload).hexdigest(),
                thumb=decode_media(fmt, payload).hex(),
            )
        return base

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                _row(d, f, p)
                for d, f, p in zip(pdf[id_col], pdf["fmt"], pdf["payload"])
            ]
            out = pd.DataFrame(rows)
            out["n_bytes"] = out["n_bytes"].astype("int32")
            yield out

    src = df.select(
        F.col(id_col), F.col("payload"), F.col("media_meta.format").alias("fmt")
    )
    return src.mapInPandas(_batches, schema=FEATURE_SCHEMA)
