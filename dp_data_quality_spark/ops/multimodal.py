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
- Formats that genuinely need codec libraries not present in this
  environment (jpeg/mp4) remain stubbed behind ``decode_media`` →
  ``NotImplementedError``; plug PIL/ffmpeg into ``decode_image`` on a
  real cluster.

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

# formats whose decode needs codec libraries absent from this container
REAL_FORMATS = {"jpeg", "mp4"}
# hermetically decodable image formats (pure-stdlib parse below)
IMAGE_FORMATS = {"ppm", "bmp", "png"}
# hermetically decodable audio formats (PCM carries raw samples)
AUDIO_FORMATS = {"wav"}


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


def decode_image(fmt: str, payload: bytes) -> tuple[int, int, int, float]:
    """Dispatch to the hermetic decoders; real-cluster extension point
    for codec-library formats (PIL/ffmpeg)."""
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "png":
        return decode_png(payload)
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
