"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side contract a 100 TB multimodal training pipeline needs:
- payloads are opaque ``binary`` columns with a typed metadata struct
  (media_type, width/height or sample_rate/duration, codec)
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  functions over ``mapInPandas``/``mapInArrow`` so bytes never cross a
  row-at-a-time Python boundary
- partitioning: payload tables bucket by content key; metadata-only
  plans must prune the binary column (column pruning keeps the 99% of
  bytes out of any scan that doesn't decode)

Codec story (round 4, extended round 5): formats the Python STDLIB can
decode are decoded for real — BMP and binary PPM via ``struct``
parsing, WAV/PCM16 via the ``wave`` module, G.711 µ-law/A-law WAVs via
the closed-form ITU-T segment expansion (format codes the ``wave``
module rejects, so the RIFF container is chunk-walked by hand), PNG
via ``zlib``
(chunk/CRC framing, inflate, all five scanline filters, all five
color types at bit depth 8), GIF via a hand-implemented LZW
(variable-width MSB..LSB-first codes, CLEAR resets, KwKwK), and
baseline TIFF (IFD walk in both byte orders, PackBits RLE, TIFF-LZW
with early-change width sync, horizontal-differencing predictor),
and baseline JPEG (marker framing, per-image optimized canonical
Huffman entropy coding, zigzag/quantization, batched 8x8 DCT/IDCT,
4:4:4/4:2:2/4:2:0 YCbCr and DRI/RSTn restart intervals — lossy in
general, but bit-exact under the documented all-ones-qtable
block-constant contract the oracle uses) — with
``generate_media_real`` / ``generate_media_g711`` /
``generate_media_png`` / ``generate_media_gif`` /
``generate_media_tiff`` / ``generate_media_jpeg`` emitting genuine
containers whose
pixel/sample values are a deterministic function of a sha256 digest,
so the DuckDB oracle can verify that the REAL container parse inverts
generation byte-exactly. Formats that genuinely need an external
codec library (MP3/H.264-class audio/video — not in this container)
keep the honest NotImplementedError gate, with ``fake=True``
selecting the deterministic test decoder for plumbing tests.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "media_type string, width int, height int, sample_rate int, "
    "duration_ms int, codec string"
)


def generate_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary media table: (media_id, payload, meta).
    Payload bytes are a pure function of (seed, media_id)."""
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads, metas = [], []
            for i in ids:
                h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                payloads.append(h * (8 + i % 8))  # 256..480 bytes
                if i % 3 == 0:
                    metas.append(("image/png", 32 + i % 64, 24 + i % 48, None, None, "png"))
                elif i % 3 == 1:
                    metas.append(("audio/wav", None, None, 16000, 1000 + i % 5000, "pcm16"))
                else:
                    metas.append(("video/mp4", 64, 48, None, 2000 + i % 9000, "h264"))
            meta_arr = pa.StructArray.from_arrays(
                [
                    pa.array([m[0] for m in metas], pa.string()),
                    pa.array([m[1] for m in metas], pa.int32()),
                    pa.array([m[2] for m in metas], pa.int32()),
                    pa.array([m[3] for m in metas], pa.int32()),
                    pa.array([m[4] for m in metas], pa.int32()),
                    pa.array([m[5] for m in metas], pa.string()),
                ],
                names=["media_type", "width", "height", "sample_rate", "duration_ms", "codec"],
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(payloads, pa.binary()),
                    meta_arr,
                ],
                ["media_id", "payload", "meta"],
            )

    return spark.range(0, n).mapInArrow(
        _gen, f"media_id long, payload binary, meta struct<{MEDIA_META_DDL}>"
    )


# --------------------------------------------------------------------------
# Real stdlib codecs: BMP / binary PPM / WAV (PCM16 mono)
# --------------------------------------------------------------------------


def encode_bmp(w: int, h: int, rgb: list[int]) -> bytes:
    """24-bit uncompressed BMP from a top-down row-major RGB list
    (len = w*h*3). Writes the on-disk convention: bottom-up rows, BGR
    channel order, rows padded to 4-byte boundaries."""
    pad = (-(w * 3)) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            i = (y * w + x) * 3
            row += bytes((rgb[i + 2], rgb[i + 1], rgb[i]))  # BGR
        row += b"\x00" * pad
        rows.append(bytes(row))
    pixel_data = b"".join(rows)
    file_size = 14 + 40 + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 0, 0, 0, 0
    )
    return header + info + pixel_data


def decode_bmp(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a 24-bit uncompressed BMP to (w, h, top-down RGB list).
    Handles both bottom-up (positive height) and top-down (negative
    height) pixel orders and per-row 4-byte padding."""
    magic, _, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, w, h_raw, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (bpp={bpp})")
    h = abs(h_raw)
    top_down = h_raw < 0
    stride = (w * 3 + 3) // 4 * 4
    out = [0] * (w * h * 3)
    for row in range(h):
        y = row if top_down else h - 1 - row
        base = offset + row * stride
        for x in range(w):
            b, g, r = payload[base + x * 3 : base + x * 3 + 3]
            i = (y * w + x) * 3
            out[i], out[i + 1], out[i + 2] = r, g, b
    return w, h, out


def encode_ppm(w: int, h: int, rgb: list[int]) -> bytes:
    """Binary PPM (P6, maxval 255) from a top-down row-major RGB list."""
    return f"P6\n{w} {h}\n255\n".encode() + bytes(rgb)


def decode_ppm(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a binary PPM (P6) to (w, h, top-down RGB list). Tolerates
    arbitrary whitespace and '#' comments in the header, per spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = 4 whitespace-separated tokens (magic, w, h, maxval),
    # comments run # .. newline; pixel data starts after ONE whitespace
    # byte following maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM")
    pos += 1  # the single whitespace after maxval
    return w, h, list(payload[pos : pos + w * h * 3])


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """PCM16 mono WAV from signed int samples (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


# --------------------------------------------------------------------------
# G.711 µ-law / A-law (round 5). The telephony companding curves from
# ITU-T G.711 — the one compressed-audio family that is pure closed-form
# arithmetic, so it needs no codec wheel. Expansion follows the
# canonical public-domain Sun Microsystems g711.c segment math (the same
# tables every VoIP stack ships); the stdlib ``wave`` module only
# accepts WAVE_FORMAT_PCM, so the container side is a minimal RIFF
# chunk walker handling format codes 6 (A-law) and 7 (µ-law).
# --------------------------------------------------------------------------


def _ulaw2linear(b: int) -> int:
    """Expand one µ-law byte to a signed 16-bit sample (G.711 µ-law:
    complement, BIAS=0x84 segment math)."""
    u = ~b & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw2linear(b: int) -> int:
    """Expand one A-law byte to a signed 16-bit sample (G.711 A-law:
    XOR 0x55 toggle-mask, segment math; sign bit SET means positive)."""
    a = b ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


_ULAW_TABLE = [_ulaw2linear(b) for b in range(256)]
_ALAW_TABLE = [_alaw2linear(b) for b in range(256)]


def _linear2ulaw(x: int) -> int:
    """Compress a signed 16-bit sample to one µ-law byte (Sun g711.c:
    14-bit magnitude + BIAS, segment search, complement)."""
    x >>= 2
    if x < 0:
        x, mask = -x, 0x7F
    else:
        mask = 0xFF
    x = min(x, 8159) + (0x84 >> 2)
    seg = 0
    for bound in (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF):
        if x <= bound:
            break
        seg += 1
    if seg >= 8:  # clipped max + bias overflows the last segment
        return 0x7F ^ mask
    return ((seg << 4) | ((x >> (seg + 1)) & 0x0F)) ^ mask


def _linear2alaw(x: int) -> int:
    """Compress a signed 16-bit sample to one A-law byte (Sun g711.c:
    13-bit magnitude, segment search, XOR 0x55/0xD5 toggle mask)."""
    x >>= 3
    if x >= 0:
        mask = 0xD5
    else:
        mask, x = 0x55, -x - 1
    seg = 0
    for bound in (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF):
        if x <= bound:
            break
        seg += 1
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (x >> 1) & 0x0F if seg < 2 else (x >> seg) & 0x0F
    return aval ^ mask


_G711_CODES = {6: ("alaw", _ALAW_TABLE), 7: ("ulaw", _ULAW_TABLE)}


def _riff_chunks(payload: bytes) -> Iterator[tuple[bytes, bytes]]:
    """Walk a RIFF/WAVE container's chunks, honoring the spec's
    word-alignment padding byte after odd-sized chunks."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + size > len(payload):
            raise ValueError(f"truncated RIFF chunk {cid!r}")
        yield cid, payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)


def encode_wav_g711(sample_rate: int, data: bytes, law: str) -> bytes:
    """Minimal RIFF writer for WAVE_FORMAT_ALAW(6)/MULAW(7) — one
    companded byte per sample, mono. Writes the 18-byte fmt chunk
    (cbSize=0) plus the fact chunk the RIFF spec requires for non-PCM
    formats, and the spec's pad byte after an odd-sized data chunk."""
    code = {"ulaw": 7, "alaw": 6}[law]
    fmt = struct.pack("<HHIIHHH", code, 1, sample_rate, sample_rate, 1, 8, 0)
    body = bytearray(b"WAVE")
    for cid, cdata in ((b"fmt ", fmt),
                       (b"fact", struct.pack("<I", len(data))),
                       (b"data", data)):
        body += cid + struct.pack("<I", len(cdata)) + cdata
        if len(cdata) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Parse a mono WAV to (sample_rate, signed int samples). PCM16
    goes through the stdlib ``wave`` module; G.711 µ-law/A-law (format
    codes 7/6 — which ``wave`` rejects) are container-parsed by the
    RIFF walker and expanded through the closed-form G.711 tables."""
    fmt_code = None
    for cid, cdata in _riff_chunks(payload):
        if cid == b"fmt " and len(cdata) >= 16:
            fmt_code = struct.unpack_from("<H", cdata, 0)[0]
            break
    if fmt_code in _G711_CODES:
        return _decode_wav_g711(payload)
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise NotImplementedError("only PCM16 or G.711 mono WAV")
        sr = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    return sr, list(struct.unpack(f"<{len(raw) // 2}h", raw))


def _decode_wav_g711(payload: bytes) -> tuple[int, list[int]]:
    fmt = data = None
    for cid, cdata in _riff_chunks(payload):
        if cid == b"fmt ":
            fmt = cdata
        elif cid == b"data":
            data = cdata
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    code, channels, sr, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    _, table = _G711_CODES[code]
    if channels != 1 or bits != 8:
        raise NotImplementedError("only mono 8-bit G.711 WAV")
    return sr, [table[b] for b in data]


# --------------------------------------------------------------------------
# Real stdlib PNG codec (round 5). PNG's compression layer IS zlib
# (RFC 2083 §2.3: "deflate/inflate compression with a sliding window"),
# which ships in the Python stdlib — so PNG decode needs no external
# codec wheel: chunk framing + CRC-32 (zlib.crc32), inflate
# (zlib.decompress), and the five scanline filters are all spec-level
# struct math. Supports every color type (gray / RGB / palette /
# gray+alpha / RGBA) at every spec-legal bit depth (1/2/4/8/16 per the
# §11.2.2 table: sub-byte samples MSB-packed, 16-bit big-endian, the
# filter byte distance max(1, ch*depth/8)) in both non-interlaced and
# Adam7 layouts (seven independently filtered reduced images) — the
# complete static-PNG format, no gates left.
# --------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    """One spec-framed chunk: length, type, data, CRC-32 over type+data."""
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §6.6): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_filter_rows(rows: list[bytes], bpp: int, ftypes: list[int]) -> bytearray:
    """Serialize scanlines with per-row filter types (prior row starts
    at zeros — per spec this resets at the top of every Adam7 pass).
    ``bpp`` is the spec's filter byte distance: max(1, channels *
    depth / 8) — filters always operate on BYTES, so for sub-byte
    depths the "pixel to the left" is simply the previous byte."""
    raw = bytearray()
    stride = len(rows[0]) if rows else 0
    prior = bytes(stride)
    for row, ft in zip(rows, ftypes):
        raw.append(ft)
        if ft == 0:
            raw += row
        elif ft == 1:  # Sub
            raw += bytes((row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                         for i in range(stride))
        elif ft == 2:  # Up
            raw += bytes((row[i] - prior[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - bpp] if i >= bpp else 0) + prior[i]) // 2) & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prior[i],
                        prior[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prior = row
    return raw


def _png_legal_depth(depth: int, color_type: int) -> bool:
    """Spec §11.2.2 table: gray allows 1/2/4/8/16, palette 1/2/4/8,
    truecolor / gray+alpha / RGBA only 8/16."""
    if color_type == 0:
        return depth in (1, 2, 4, 8, 16)
    if color_type == 3:
        return depth in (1, 2, 4, 8)
    return depth in (8, 16)


def _png_pack_row(vals: list[int], depth: int) -> bytes:
    """Pack one scanline's channel values into bytes: sub-byte samples
    MSB-first with zero-padded final byte (spec §7.2), 16-bit samples
    big-endian, 8-bit verbatim."""
    if depth == 8:
        return bytes(vals)
    if depth == 16:
        return b"".join(struct.pack(">H", v) for v in vals)
    out = bytearray()
    acc = bits = 0
    for v in vals:
        acc = (acc << depth) | (v & ((1 << depth) - 1))
        bits += depth
        if bits == 8:
            out.append(acc)
            acc = bits = 0
    if bits:
        out.append(acc << (8 - bits))
    return bytes(out)


def _png_unpack_row(rb: bytes, n_samples: int, depth: int) -> list[int]:
    """Inverse of _png_pack_row: the first n_samples channel values of
    a reconstructed scanline (trailing pad bits discarded)."""
    if depth == 8:
        return list(rb[:n_samples])
    if depth == 16:
        return [(rb[2 * k] << 8) | rb[2 * k + 1] for k in range(n_samples)]
    mask = (1 << depth) - 1
    out = []
    for k in range(n_samples):
        bit = k * depth
        out.append((rb[bit >> 3] >> (8 - depth - (bit & 7))) & mask)
    return out


def encode_png(
    w: int,
    h: int,
    values: list[int],
    color_type: int = 2,
    palette: list[tuple[int, int, int]] | None = None,
    filters: list[int] | None = None,
    idat_chunk: int = 48,
    ancillary: tuple[tuple[bytes, bytes], ...] = (),
    interlace: bool = False,
    depth: int = 8,
) -> bytes:
    """Spec-correct PNG from a top-down row-major channel list
    (len = w*h*channels; palette images take index values + a palette).
    ``filters`` picks the per-row filter type (default cycles 0..4 so
    every filter appears); the compressed stream is split into
    ``idat_chunk``-byte IDAT chunks and ``ancillary`` (type, data)
    chunks are interleaved before IDAT — both legal per spec and both
    things a decoder must handle. interlace=True emits Adam7: seven
    independently-filtered reduced images (empty passes wholly absent,
    prior row reset per pass). ``depth`` takes the full spec-legal set
    per color type (1/2/4/8/16 gray, 1/2/4/8 palette, 8/16 otherwise);
    sub-byte samples pack MSB-first, 16-bit big-endian."""
    ch = _PNG_CHANNELS[color_type]
    if not _png_legal_depth(depth, color_type):
        raise ValueError(f"illegal PNG depth {depth} for color type {color_type}")
    if len(values) != w * h * ch:
        raise ValueError(f"need {w * h * ch} values for {w}x{h} type-{color_type}")
    if color_type == 3 and palette is None:
        raise ValueError("palette images need a palette")
    if any(v < 0 or v >= (1 << depth) for v in values):
        raise ValueError(f"channel value out of range for depth {depth}")
    bpp = max(1, ch * depth // 8)

    def ftype(y: int) -> int:
        return (filters[y % len(filters)] if filters is not None else y) % 5

    if not interlace:
        rows = [_png_pack_row(values[y * w * ch:(y + 1) * w * ch], depth)
                for y in range(h)]
        raw = _png_filter_rows(rows, bpp, [ftype(y) for y in range(h)])
    else:
        raw = bytearray()
        sl = 0  # global scanline counter across passes
        for x0, y0, dx, dy in _ADAM7:
            if x0 >= w or y0 >= h:
                continue
            prow = []
            for y in range(y0, h, dy):
                rvals: list[int] = []
                for x in range(x0, w, dx):
                    base = (y * w + x) * ch
                    rvals += values[base:base + ch]
                prow.append(_png_pack_row(rvals, depth))
            raw += _png_filter_rows(prow, bpp,
                                    [ftype(sl + j) for j in range(len(prow))])
            sl += len(prow)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                       1 if interlace else 0)
    out = bytearray(PNG_SIG)
    out += _png_chunk(b"IHDR", ihdr)
    for ctype, data in ancillary:
        out += _png_chunk(ctype, data)
    if color_type == 3:
        out += _png_chunk(b"PLTE", b"".join(bytes(rgb) for rgb in palette))
    comp = zlib.compress(bytes(raw))
    for i in range(0, len(comp), idat_chunk):
        out += _png_chunk(b"IDAT", comp[i : i + idat_chunk])
    out += _png_chunk(b"IEND", b"")
    return bytes(out)

def decode_png(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Parse a PNG to (w, h, color_type, top-down channel values).
    REAL decode, stdlib only: chunk framing with CRC-32 verification,
    multi-IDAT concatenation, ancillary-chunk skip, zlib inflate, and
    per-scanline reversal of all five filter types, for both
    non-interlaced and Adam7-interlaced layouts (seven independently
    filtered reduced images scattered back onto the pixel grid).
    Palette images (type 3) come back de-palettized to RGB (len =
    w*h*3); RGBA/gray+alpha keep their alpha channel. ALL spec-legal
    bit depths decode (1/2/4/8/16 per the §11.2.2 table): sub-byte
    samples unpack MSB-first with pad bits discarded and come back as
    raw 0..2^depth-1 values (palette indices select PLTE entries as
    usual), 16-bit samples come back as 0..65535 ints. Illegal
    depth/type combos, truncated, or CRC-corrupt containers raise
    ValueError."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, palette, idat = 8, None, None, bytearray()
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != zlib.crc32(ctype + data) & 0xFFFFFFFF:
            raise ValueError(f"PNG CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = [tuple(data[i : i + 3]) for i in range(0, len(data), 3)]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    if not _png_legal_depth(depth, color_type):
        raise ValueError(
            f"illegal PNG depth {depth} for color type {color_type}")
    if color_type == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE chunk")
    ch = _PNG_CHANNELS[color_type]
    bpp = max(1, ch * depth // 8)

    def rstride_of(npx: int) -> int:
        return (npx * ch * depth + 7) // 8

    raw = zlib.decompress(bytes(idat))

    def unfilter(off: int, n_rows: int, rstride: int) -> tuple[list[bytes], int]:
        rows: list[bytes] = []
        prior = bytes(rstride)
        for _ in range(n_rows):
            ft, line = raw[off], raw[off + 1 : off + 1 + rstride]
            if ft > 4:
                raise ValueError(f"invalid PNG filter type {ft}")
            recon = bytearray(rstride)
            for i in range(rstride):
                x = line[i]
                a = recon[i - bpp] if i >= bpp else 0
                b = prior[i]
                if ft == 1:
                    x += a
                elif ft == 2:
                    x += b
                elif ft == 3:
                    x += (a + b) // 2
                elif ft == 4:
                    x += _paeth(a, b, prior[i - bpp] if i >= bpp else 0)
                recon[i] = x & 0xFF
            prior = bytes(recon)
            rows.append(bytes(recon))
            off += 1 + rstride
        return rows, off

    if interlace == 0:
        stride = rstride_of(w)
        if len(raw) != h * (1 + stride):
            raise ValueError(
                f"PNG scanline data is {len(raw)}B, want {h * (1 + stride)}B")
        rows, _ = unfilter(0, h, stride)
        row_vals = [_png_unpack_row(r, w * ch, depth) for r in rows]
    else:  # Adam7: seven independently-filtered reduced images
        passes = []
        expected = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = len(range(x0, w, dx))
            ph = len(range(y0, h, dy))
            if pw and ph:
                passes.append((x0, y0, dx, dy, pw, ph))
                expected += ph * (1 + rstride_of(pw))
        if len(raw) != expected:
            raise ValueError(
                f"Adam7 scanline data is {len(raw)}B, want {expected}B")
        grid = [[0] * (w * ch) for _ in range(h)]
        off = 0
        for x0, y0, dx, dy, pw, ph in passes:
            prows, off = unfilter(off, ph, rstride_of(pw))
            for j, y in enumerate(range(y0, h, dy)):
                vals = _png_unpack_row(prows[j], pw * ch, depth)
                for k, x in enumerate(range(x0, w, dx)):
                    grid[y][x * ch:(x + 1) * ch] = vals[k * ch:(k + 1) * ch]
        row_vals = grid
    out: list[int] = []
    for vals in row_vals:
        if color_type == 3:
            for idx in vals:
                if idx >= len(palette):
                    raise ValueError("palette index out of range")
                out += palette[idx]
        else:
            out += vals
    return w, h, color_type, out


# --------------------------------------------------------------------------
# Real stdlib GIF codec (round 5). GIF needs no codec wheel either: the
# container is plain struct framing and the compression is LZW — ~60
# lines of spec math (variable-width codes 3..12 bits packed LSB-first
# into 255-byte sub-blocks, dictionary rebuilt on CLEAR). Implemented
# by hand from the GIF89a specification; the decoder handles dictionary
# growth, the code == next_code self-reference case, and mid-stream
# CLEAR resets, and the appendix-E four-pass interlace is decoded by
# row re-permutation. Animation is fully supported: decode_gif_frames
# enumerates every frame (rect offsets, GCE delays, per-frame local
# color tables, interlaced frames), encode_gif_animation produces
# multi-frame containers with the NETSCAPE loop extension, and
# decode_gif returns the poster frame (first frame composited onto the
# background color, honoring GCE transparency) for animated inputs —
# no GIF gates left.
# --------------------------------------------------------------------------

GIF_SIGS = (b"GIF87a", b"GIF89a")


def _lzw_encode(min_code_size: int, indices: list[int], clear_every: int | None = None) -> bytes:
    """GIF-variant LZW: emit CLEAR, then greedy longest-match coding
    with the code width growing as the dictionary fills (cap 12 bits,
    CLEAR + reset at 4096). ``clear_every`` forces a mid-stream CLEAR
    every K symbols so decoders' reset path gets exercised on small
    images too. Codes pack LSB-first."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    def fresh() -> tuple[dict, int, int]:
        return ({(i,): i for i in range(1 << min_code_size)}, eoi + 1, min_code_size + 1)

    table, next_code, width = fresh()
    emit(clear, width)
    w: tuple[int, ...] = ()
    since_clear = 0
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        since_clear += 1
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096 or (clear_every and since_clear >= clear_every):
            emit(clear, width)
            table, next_code, width = fresh()
            since_clear = 0
        w = (k,)
    if w:
        emit(table[w], width)
    # tail sync: the decoder ADDS an entry on reading that final data
    # code (the encoder doesn't — there is no following symbol), so if
    # that add lands exactly on a width threshold the decoder reads EOI
    # one bit wider; mirror its bump here. next_code equals the
    # decoder's post-add count because the final flush emit above is
    # the one data code with no encoder-side add.
    if w and next_code == (1 << width) and width < 12:
        width += 1
    emit(eoi, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """Inverse of _lzw_encode per the GIF89a spec, including the
    KwKwK case (code == next_code → prev + prev[0]) and CLEAR resets."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    pos = acc = n_bits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, n_bits
        while n_bits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        return code

    base = {i: (i,) for i in range(1 << min_code_size)}
    table = dict(base)
    next_code, width = eoi + 1, min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while True:
        code = read(width)
        if code == eoi:
            return out
        if code == clear:
            table, next_code, width = dict(base), eoi + 1, min_code_size + 1
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"invalid GIF LZW code {code}")
        out += entry
        if prev is not None:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            # the decoder's dictionary runs one entry BEHIND the
            # encoder's (the encoder adds right after emitting, the
            # decoder only on the NEXT code), so the width bump fires
            # at next_code == 2^width here vs next_code-1 on the
            # encode side — the classic off-by-one both sides must
            # agree on for the bitstream to stay in sync
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def _gif_subblocks(data: bytes) -> bytes:
    """Split a byte stream into GIF's length-prefixed <=255B sub-blocks
    plus the zero terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _gif_interlace_order(h: int) -> list[int]:
    """GIF89a appendix E four-pass interlace: storage position i holds
    display row order[i] (rows 0,8,.. then 4,12,.. then 2,6,.. then
    odd rows)."""
    return (list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2)))


def encode_gif(
    w: int,
    h: int,
    indices: list[int],
    palette: list[tuple[int, int, int]],
    clear_every: int | None = None,
    comment: bytes | None = None,
    interlace: bool = False,
) -> bytes:
    """Spec-correct single-frame GIF89a from top-down row-major palette
    indices. The color table is padded to the next power of two (spec
    requirement); a Graphic Control Extension and an optional comment
    extension are emitted so decoders must handle extension blocks.
    interlace=True stores rows in the four-pass appendix-E order and
    sets the descriptor flag."""
    if len(indices) != w * h:
        raise ValueError(f"need {w * h} indices for {w}x{h}")
    size_bits = max(2, (max(len(palette), 2) - 1).bit_length())
    table = list(palette) + [(0, 0, 0)] * ((1 << size_bits) - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)  # GCT flag+size
    out += b"".join(bytes(rgb) for rgb in table)
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE: no transparency, 0 delay
    if comment is not None:
        out += b"\x21\xfe" + _gif_subblocks(comment)
    iflag = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflag)  # no LCT
    if interlace:
        indices = [
            v for r in _gif_interlace_order(h)
            for v in indices[r * w:(r + 1) * w]
        ]
    min_code_size = size_bits
    out.append(min_code_size)
    out += _gif_subblocks(_lzw_encode(min_code_size, indices, clear_every))
    out += b"\x3b"
    return bytes(out)


def _gif_parse_frames(payload: bytes):
    """Shared GIF parse core: walk every block of the container and
    decode every frame. Returns (canvas_w, canvas_h, bg_rgb | None,
    frames) where each frame is (left, top, fw, fh, delay_cs,
    transparent_idx | None, rgb, idx) — rgb de-palettized top-down for
    the frame's own rect, idx the raw palette indices (needed for
    transparency compositing). The Graphic Control Extension preceding
    an image supplies its delay/transparency and resets afterwards per
    spec; other extensions (comment, application/NETSCAPE loop) are
    skipped by sub-block framing."""
    if payload[:6] not in GIF_SIGS:
        raise ValueError("not a GIF payload")
    cw, chh, packed, bg_idx, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = [tuple(payload[pos + 3 * k : pos + 3 * k + 3]) for k in range(n)]
        pos += 3 * n
    bg_rgb = gct[bg_idx] if gct is not None and bg_idx < len(gct) else None
    frames = []
    delay, transparent = 0, None
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            if not frames:
                raise ValueError("GIF has no image data")
            return cw, chh, bg_rgb, frames
        if block == 0x21:  # extension: label + sub-blocks
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:  # GCE (spec: size 4)
                flags = payload[pos + 1]
                delay = payload[pos + 2] | (payload[pos + 3] << 8)
                transparent = payload[pos + 4] if flags & 1 else None
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"invalid GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        interlaced = bool(ipacked & 0x40)
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = [tuple(payload[pos + 3 * k : pos + 3 * k + 3]) for k in range(n)]
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image has no color table")
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code_size, bytes(data))
        if len(idx) != w * h:
            raise ValueError(f"GIF decoded {len(idx)} pixels, want {w * h}")
        if interlaced:
            rows = [None] * h
            for i, r in enumerate(_gif_interlace_order(h)):
                rows[r] = idx[i * w:(i + 1) * w]
            idx = [v for row in rows for v in row]
        out: list[int] = []
        for i in idx:
            if i >= len(palette):
                raise ValueError(f"GIF index {i} outside color table")
            out += palette[i]
        frames.append((left, top, w, h, delay, transparent, out, idx))
        delay, transparent = 0, None
    raise ValueError("truncated GIF")


def decode_gif_frames(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int, int, int, list[int]]]]:
    """Parse an animated (or single-frame) GIF to (canvas_w, canvas_h,
    frames), each frame (left, top, fw, fh, delay_cs, rgb) with rgb the
    de-palettized top-down pixels of the frame's OWN rect — raw frames,
    no inter-frame compositing (disposal-method playback is a
    downstream concern; for curation pipelines the per-frame rects and
    stats are the signal). delay_cs is the GCE delay in centiseconds."""
    cw, chh, _, frames = _gif_parse_frames(payload)
    return cw, chh, [(l, t, w, h, d, rgb) for l, t, w, h, d, _, rgb, _ in frames]


def decode_gif(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a GIF to (w, h, top-down RGB list). REAL decode, stdlib
    only: struct framing, extension-block skip, a hand-implemented LZW
    decompressor (variable code width, CLEAR resets, KwKwK case), and
    four-pass interlace reordering. A full-canvas opaque single frame
    returns its pixels directly; otherwise (animated, offset rect, or
    transparency) the POSTER frame is returned — the first frame
    composited onto the background color (transparent pixels keep the
    background), which is the standard thumbnail/preview semantic.
    Truncated/invalid containers raise ValueError."""
    cw, chh, bg_rgb, frames = _gif_parse_frames(payload)
    left, top, fw, fh, _, transparent, rgb, idx = frames[0]
    if (left, top, fw, fh) == (0, 0, cw, chh) and transparent is None:
        return fw, fh, rgb
    canvas = list(bg_rgb or (0, 0, 0)) * (cw * chh)
    for y in range(fh):
        cy = top + y
        if cy >= chh:
            break
        for x in range(fw):
            cx = left + x
            if cx >= cw:
                break
            k = y * fw + x
            if transparent is not None and idx[k] == transparent:
                continue
            o = (cy * cw + cx) * 3
            canvas[o:o + 3] = rgb[3 * k:3 * k + 3]
    return cw, chh, canvas


def encode_gif_animation(
    w: int,
    h: int,
    frames: list[tuple],
    palette: list[tuple[int, int, int]],
    loop: int = 0,
    bg_index: int = 0,
) -> bytes:
    """Spec-correct animated GIF89a. ``frames`` is a list of
    (left, top, fw, fh, indices, delay_cs, lct | None, interlace,
    transparent_idx | None): each frame draws its own rect at (left,
    top) with its local color table when given, the global ``palette``
    otherwise. Emits the NETSCAPE 2.0 application extension (loop
    count; 0 = forever) and a Graphic Control Extension per frame
    (delay in centiseconds, optional transparency)."""
    def table_bits(pal):
        return max(2, (max(len(pal), 2) - 1).bit_length())

    gbits = table_bits(palette)
    gct = list(palette) + [(0, 0, 0)] * ((1 << gbits) - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gbits - 1), bg_index, 0)
    out += b"".join(bytes(rgb) for rgb in gct)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    for left, top, fw, fh, indices, delay, lct, interlace, transparent in frames:
        if len(indices) != fw * fh:
            raise ValueError(f"need {fw * fh} indices for {fw}x{fh} frame")
        if left + fw > w or top + fh > h:
            raise ValueError("frame rect exceeds canvas")
        flags = 0x01 if transparent is not None else 0x00
        out += b"\x21\xf9\x04" + bytes([flags]) + struct.pack("<H", delay)
        out += bytes([transparent or 0, 0])
        iflag = 0x40 if interlace else 0
        if lct is not None:
            lbits = table_bits(lct)
            out += b"\x2c" + struct.pack(
                "<HHHHB", left, top, fw, fh, iflag | 0x80 | (lbits - 1))
            out += b"".join(
                bytes(rgb) for rgb in
                list(lct) + [(0, 0, 0)] * ((1 << lbits) - len(lct)))
            mcs = lbits
        else:
            out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, iflag)
            mcs = gbits
        if interlace:
            indices = [
                v for r in _gif_interlace_order(fh)
                for v in indices[r * fw:(r + 1) * fw]
            ]
        out.append(mcs)
        out += _gif_subblocks(_lzw_encode(mcs, indices))
    out += b"\x3b"
    return bytes(out)


def generate_media_real(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Media table with REAL container payloads: media_id % 3 == 0 →
    24-bit BMP, 1 → binary PPM, 2 → PCM16 WAV. Pixel/sample values are
    a pure function of sha256(f"{seed}:{media_id}") so a relational
    oracle can recompute the expected decode output without any codec:
    pixel idx=(y*w+x) has channels (d[idx%32], d[(idx+7)%32],
    d[(idx+13)%32]); audio sample j = (d[j%32] - 128) * 101."""
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads, metas = [], []
            for i in ids:
                d = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                if i % 3 == 2:
                    ns = 40 + i % 32
                    samples = [(d[j % 32] - 128) * 101 for j in range(ns)]
                    payloads.append(encode_wav(8000, samples))
                    metas.append(
                        ("audio/wav", None, None, 8000, ns * 1000 // 8000 + 1, "pcm16")
                    )
                else:
                    w, h = 2 + i % 5, 2 + i % 4
                    rgb = []
                    for idx in range(w * h):
                        rgb += [d[idx % 32], d[(idx + 7) % 32], d[(idx + 13) % 32]]
                    if i % 3 == 0:
                        payloads.append(encode_bmp(w, h, rgb))
                        metas.append(("image/bmp", w, h, None, None, "bmp"))
                    else:
                        payloads.append(encode_ppm(w, h, rgb))
                        metas.append(("image/x-portable-pixmap", w, h, None, None, "ppm"))
            meta_arr = pa.StructArray.from_arrays(
                [
                    pa.array([m[0] for m in metas], pa.string()),
                    pa.array([m[1] for m in metas], pa.int32()),
                    pa.array([m[2] for m in metas], pa.int32()),
                    pa.array([m[3] for m in metas], pa.int32()),
                    pa.array([m[4] for m in metas], pa.int32()),
                    pa.array([m[5] for m in metas], pa.string()),
                ],
                names=["media_type", "width", "height", "sample_rate", "duration_ms", "codec"],
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary()), meta_arr],
                ["media_id", "payload", "meta"],
            )

    return spark.range(0, n).mapInArrow(
        _gen, f"media_id long, payload binary, meta struct<{MEDIA_META_DDL}>"
    )


# --------------------------------------------------------------------------
# Real stdlib TIFF codec (round 5). Baseline TIFF is also wheel-free:
# the container is IFD struct framing (both byte orders), and the three
# baseline compressions are all spec math — none, PackBits (RLE), and
# TIFF-variant LZW. TIFF's LZW differs from GIF's in exactly three
# documented ways: codes pack MSB-first, the symbol alphabet is fixed
# at 8 bits (CLEAR=256, EOI=257, first free 258), and the code width
# bumps one code EARLIER ("early change", at next_code == 2^width - 1).
# Horizontal-differencing predictor (tag 317 = 2) supported, and
# multi-page containers decode page-by-page via the 0-terminated
# next-IFD chain (cycle-guarded — real crawls contain TIFFs whose
# next pointer loops). Both layouts decode — strips AND §15 tiles —
# at 8- or 16-bit depth, gray or RGB, chunky AND PlanarConfiguration 2
# (separate component planes, strips only; r5); tiled-planar and other
# depths/compressions keep an honest gate.
# --------------------------------------------------------------------------

TIFF_SIGS = (b"II*\x00", b"MM\x00*")


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF LZW (spec §13): byte-alphabet dictionary, MSB-first bit
    packing, early-change width bumps, CLEAR at 4094 per the spec's
    recommendation."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n_bits
        acc = (acc << width) | code
        n_bits += width
        while n_bits >= 8:
            out.append((acc >> (n_bits - 8)) & 0xFF)
            n_bits -= 8

    def fresh() -> tuple[dict, int, int]:
        return ({(i,): i for i in range(256)}, 258, 9)

    table, next_code, width = fresh()
    emit(CLEAR, width)
    w: tuple[int, ...] = ()
    for k in data:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        # "early change" (TIFF 6.0 §13): the width bumps when code
        # 2^width - 1 is ADDED (one code earlier than GIF's rule)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # spec: CLEAR before the 12-bit space fills
            emit(CLEAR, width)
            table, next_code, width = fresh()
        w = (k,)
    if w:
        emit(table[w], width)
    # tail sync, same shape as the GIF codec: the decoder adds an entry
    # on the final data code (the encoder doesn't); with early change
    # its bump fires at next_code == 2^width - 1 of ITS count, which
    # equals ours here — mirror it so EOI is read at the same width
    if w and next_code == (1 << width) - 1 and width < 12:
        width += 1
    emit(EOI, width)
    if n_bits:
        out.append((acc << (8 - n_bits)) & 0xFF)
    return bytes(out)


def _tiff_lzw_decode(data: bytes) -> bytes:
    """Inverse of _tiff_lzw_encode per the TIFF 6.0 spec pseudo-code."""
    CLEAR, EOI = 256, 257
    pos = acc = n_bits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, n_bits
        while n_bits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            n_bits += 8
        code = (acc >> (n_bits - width)) & ((1 << width) - 1)
        n_bits -= width
        acc &= (1 << n_bits) - 1
        return code

    base = {i: bytes([i]) for i in range(256)}
    table = dict(base)
    next_code, width = 258, 9
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == EOI:
            return bytes(out)
        if code == CLEAR:
            table, next_code, width = dict(base), 258, 9
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"invalid TIFF LZW code {code}")
        out += entry
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
            # early change, decoder side: the dictionary runs one entry
            # BEHIND the encoder (same off-by-one as the GIF codec), so
            # the bump fires at 2^width - 1 of ITS OWN count — one add
            # before the encoder's 2^width
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry


def _packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773): runs of >=3 equal
    bytes become (257-n, byte); literals are chunked at 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += run
        if i - lit_start > 128:  # the 2-byte step can overshoot the
            i = lit_start + 128  # 128-byte literal cap (129 -> 0x80 noop)
        chunk = data[lit_start:i]
        out += bytes([len(chunk) - 1]) + chunk
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError("truncated PackBits stream")
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            if i + n + 1 > len(data):
                raise ValueError("truncated PackBits literal")
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("truncated PackBits repeat")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: noop per spec
    if len(out) != expected:
        raise ValueError(f"PackBits yielded {len(out)}B, want {expected}B")
    return bytes(out)


def _tiff_samples_to_bytes(values: list[int], bits: int, bo: str = "<") -> bytes:
    """Serialize sample values at the given depth in file byte order."""
    if bits == 8:
        return bytes(values)
    return struct.pack(f"{bo}{len(values)}H", *values)


def _tiff_apply_hdiff(
    rows: bytes, nrows: int, rowpix: int, samples: int, bits: int, bo: str = "<"
) -> bytes:
    """Forward horizontal-differencing (predictor 2, TIFF 6.0 §14):
    each sample becomes its delta vs the same-channel sample one pixel
    left, per row, at the image's native depth (mod 2^bits)."""
    n = rowpix * samples
    if bits == 8:
        buf = bytearray(rows)
        for r in range(nrows):
            base = r * n
            for i in range(n - 1, samples - 1, -1):
                buf[base + i] = (buf[base + i] - rows[base + i - samples]) & 0xFF
        return bytes(buf)
    buf = bytearray(rows)
    fmt = f"{bo}{n}H"
    for r in range(nrows):
        vals = list(struct.unpack_from(fmt, rows, r * n * 2))
        out = vals[:samples] + [
            (vals[i] - vals[i - samples]) & 0xFFFF for i in range(samples, n)
        ]
        struct.pack_into(fmt, buf, r * n * 2, *out)
    return bytes(buf)


def _tiff_undo_hdiff(
    buf: bytearray, nrows: int, rowpix: int, samples: int, sw: int, bo: str
) -> None:
    """In-place inverse of _tiff_apply_hdiff (sw = bytes per sample)."""
    n = rowpix * samples
    if sw == 1:
        for r in range(nrows):
            base = r * n
            for i in range(samples, n):
                buf[base + i] = (buf[base + i] + buf[base + i - samples]) & 0xFF
        return
    fmt = f"{bo}{n}H"
    for r in range(nrows):
        vals = list(struct.unpack_from(fmt, buf, r * n * 2))
        for i in range(samples, n):
            vals[i] = (vals[i] + vals[i - samples]) & 0xFFFF
        struct.pack_into(fmt, buf, r * n * 2, *vals)


def _tiff_compress(chunk: bytes, compression: int) -> bytes:
    if compression == 5:
        return _tiff_lzw_encode(chunk)
    if compression == 32773:
        return _packbits_encode(chunk)
    if compression in (8, 32946):
        # Deflate (TIFF-TN2 / Adobe code 8, legacy 32946): zlib stream
        return zlib.compress(chunk)
    return chunk


def _tiff_page_strips(
    w: int, h: int, values: list[int], samples: int,
    compression: int, predictor: int, rps: int, bits: int = 8,
    planar: int = 1,
) -> list[bytes]:
    """One page's compressed strips (predictor applied pre-compression).
    planar=2 (PlanarConfiguration 2) emits SamplesPerPixel x
    StripsPerImage strips — all of component 0's strips first, then
    component 1's, etc. (TIFF 6.0 §PlanarConfiguration); the predictor
    differences within each single-component plane."""
    sw = bits // 8
    strips = []
    if planar == 2 and samples > 1:
        for p in range(samples):
            praw = _tiff_samples_to_bytes(values[p::samples], bits)
            for y0 in range(0, h, rps):
                nrow = min(y0 + rps, h) - y0
                rows = praw[y0 * w * sw : (y0 + nrow) * w * sw]
                if predictor == 2:
                    rows = _tiff_apply_hdiff(rows, nrow, w, 1, bits)
                strips.append(_tiff_compress(rows, compression))
        return strips
    raw = _tiff_samples_to_bytes(values, bits)
    for y0 in range(0, h, rps):
        nrow = min(y0 + rps, h) - y0
        rows = raw[y0 * w * samples * sw : (y0 + nrow) * w * samples * sw]
        if predictor == 2:
            rows = _tiff_apply_hdiff(rows, nrow, w, samples, bits)
        strips.append(_tiff_compress(rows, compression))
    return strips


def _tiff_ifd_blob(
    w: int, h: int, samples: int, compression: int, predictor: int,
    rps: int, offsets: list[int], counts: list[int],
    ifd_off: int, next_ifd: int, bits: int = 8, planar: int = 1,
) -> bytes:
    """One little-endian 12-entry IFD (+ its after-IFD value arrays),
    laid out starting at ifd_off, chaining to next_ifd (0 = last)."""
    def entry(tag: int, typ: int, cnt: int, val: int) -> bytes:
        return struct.pack("<HHII", tag, typ, cnt, val)

    # arrays longer than 4 bytes live after the IFD
    extra = bytearray()
    entries = []
    extra_base = ifd_off + 2 + 12 * 12 + 4

    def arr_long(tag: int, vals: list[int]) -> None:
        if len(vals) == 1:
            entries.append(entry(tag, 4, 1, vals[0]))
        else:
            entries.append(entry(tag, 4, len(vals), extra_base + len(extra)))
            for v in vals:
                extra.extend(struct.pack("<I", v))

    entries.append(entry(256, 4, 1, w))
    entries.append(entry(257, 4, 1, h))
    if samples == 1:
        entries.append(entry(258, 3, 1, bits))
    else:
        entries.append(entry(258, 3, 3, extra_base + len(extra)))
        extra.extend(struct.pack("<HHH", bits, bits, bits))
        extra.extend(b"\x00\x00")  # keep extra area word-aligned
    entries.append(entry(259, 3, 1, compression))
    entries.append(entry(262, 3, 1, 1 if samples == 1 else 2))
    arr_long(273, offsets)
    entries.append(entry(277, 3, 1, samples))
    entries.append(entry(278, 4, 1, rps))
    arr_long(279, counts)
    entries.append(entry(284, 3, 1, planar))  # 1 = chunky, 2 = planar
    entries.append(entry(296, 3, 1, 2))  # resolution unit: inch
    entries.append(entry(317, 3, 1, predictor))
    assert len(entries) == 12  # extra_base above assumes exactly 12
    return (
        struct.pack("<H", len(entries))
        + b"".join(entries)
        + struct.pack("<I", next_ifd)
        + bytes(extra)
    )


def encode_tiff_multi(pages: list[tuple]) -> bytes:
    """Multi-page baseline little-endian TIFF: ``pages`` is a list of
    (w, h, values, samples, compression, predictor, rows_per_strip |
    None[, bits]) tuples (bits defaults to 8; 16 packs each sample as a
    little-endian SHORT); each page becomes one IFD in the chain
    (next-IFD pointers linked, 0-terminated), with all strip data laid
    out after the header and the IFDs after all strips. Layout:
    header(8) | page-1 strips | ... | page-N strips | IFD-1(+arrays) |
    ... | IFD-N(+arrays)."""
    per_page = []
    for page in pages:
        w, h, values, samples, compression, predictor, rows_per_strip = page[:7]
        bits = page[7] if len(page) > 7 else 8
        planar = page[8] if len(page) > 8 else 1
        if len(values) != w * h * samples:
            raise ValueError(f"need {w * h * samples} values")
        rps = rows_per_strip or h
        strips = _tiff_page_strips(w, h, values, samples, compression,
                                   predictor, rps, bits, planar)
        per_page.append((w, h, samples, compression, predictor, rps, bits,
                         planar, strips))
    pos = 8
    page_offsets = []
    for *_, strips in per_page:
        offs = []
        for s in strips:
            offs.append(pos)
            pos += len(s)
        page_offsets.append(offs)
    # IFD blob size is deterministic: 2 + 12*12 + 4 plus value arrays
    ifd_offs, cursor = [], pos
    blobs_sizes = []
    for (w, h, samples, compression, predictor, rps, bits, planar,
         strips) in per_page:
        extra = 8 if samples == 3 else 0  # BitsPerSample triple + pad
        if len(strips) > 1:
            extra += 4 * len(strips) * 2  # offsets + counts arrays
        size = 2 + 12 * 12 + 4 + extra
        ifd_offs.append(cursor)
        blobs_sizes.append(size)
        cursor += size
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_offs[0]))
    for *_, strips in per_page:
        for s in strips:
            out += s
    for i, (w, h, samples, compression, predictor, rps, bits, planar,
            strips) in enumerate(per_page):
        nxt = ifd_offs[i + 1] if i + 1 < len(per_page) else 0
        blob = _tiff_ifd_blob(
            w, h, samples, compression, predictor, rps,
            page_offsets[i], [len(s) for s in strips], ifd_offs[i], nxt,
            bits, planar)
        assert len(blob) == blobs_sizes[i]
        out += blob
    return bytes(out)


def encode_tiff(
    w: int,
    h: int,
    values: list[int],
    samples: int = 3,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    bits: int = 8,
) -> bytes:
    """Baseline little-endian TIFF from top-down row-major sample values
    (len = w*h*samples; samples 1=gray or 3=RGB; bits 8 or 16).
    compression 1=none, 5=LZW, 32773=PackBits; predictor 2 = horizontal
    differencing (LZW/PackBits only, per spec). Multi-strip when
    rows_per_strip < h so the strip-reassembly path is exercised."""
    return encode_tiff_multi(
        [(w, h, values, samples, compression, predictor, rows_per_strip,
          bits)])


def encode_tiff_planar(
    w: int,
    h: int,
    values: list[int],
    samples: int = 3,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    bits: int = 8,
) -> bytes:
    """PlanarConfiguration=2 little-endian TIFF: each component's rows
    in its own strips (all of plane 0's strips, then plane 1's, ...),
    predictor differencing within the single-component plane. Same
    top-down interleaved ``values`` input as encode_tiff — the planar
    split is the container's concern, so encode/decode round-trips are
    value-identical with the chunky twin."""
    return encode_tiff_multi(
        [(w, h, values, samples, compression, predictor, rows_per_strip,
          bits, 2)])


def encode_tiff_tiled(
    w: int,
    h: int,
    values: list[int],
    samples: int = 3,
    compression: int = 1,
    predictor: int = 1,
    tile_w: int = 16,
    tile_h: int = 16,
    bits: int = 8,
) -> bytes:
    """Single-page little-endian TILED TIFF (TIFF 6.0 §15): the image is
    cut into tile_w x tile_h tiles ordered left-to-right, top-to-bottom,
    each padded to full tile size (spec: padding content arbitrary —
    zeros here) and compressed independently; tags 322/323/324/325
    replace the strip tags. The spec requires tile dims to be multiples
    of 16 — callers wanting spec-legal output should honor that; the
    encoder itself only requires positive dims so tests can exercise
    dense tile grids on small images."""
    if len(values) != w * h * samples:
        raise ValueError(f"need {w * h * samples} values")
    if tile_w <= 0 or tile_h <= 0:
        raise ValueError("tile dims must be positive")
    sw = bits // 8
    raw = _tiff_samples_to_bytes(values, bits)
    row_bytes = w * samples * sw
    tile_row = tile_w * samples * sw
    tiles = []
    for ty in range(0, h, tile_h):
        for tx in range(0, w, tile_w):
            buf = bytearray(tile_h * tile_row)
            for r in range(min(tile_h, h - ty)):
                src = (ty + r) * row_bytes + tx * samples * sw
                ncopy = min(tile_w, w - tx) * samples * sw
                buf[r * tile_row : r * tile_row + ncopy] = raw[src : src + ncopy]
            chunk = bytes(buf)
            if predictor == 2:
                chunk = _tiff_apply_hdiff(chunk, tile_h, tile_w, samples, bits)
            tiles.append(_tiff_compress(chunk, compression))
    # layout: header(8) | tile data | IFD | value arrays
    offsets, pos = [], 8
    for t in tiles:
        offsets.append(pos)
        pos += len(t)
    ifd_off = pos
    n_entries = 13
    extra_base = ifd_off + 2 + 12 * n_entries + 4
    extra = bytearray()
    entries = []

    def entry(tag: int, typ: int, cnt: int, val: int) -> None:
        entries.append(struct.pack("<HHII", tag, typ, cnt, val))

    def arr_long(tag: int, vals: list[int]) -> None:
        if len(vals) == 1:
            entry(tag, 4, 1, vals[0])
        else:
            entry(tag, 4, len(vals), extra_base + len(extra))
            for v in vals:
                extra.extend(struct.pack("<I", v))

    entry(256, 4, 1, w)
    entry(257, 4, 1, h)
    if samples == 1:
        entry(258, 3, 1, bits)
    else:
        entry(258, 3, 3, extra_base + len(extra))
        extra.extend(struct.pack("<HHH", bits, bits, bits))
        extra.extend(b"\x00\x00")
    entry(259, 3, 1, compression)
    entry(262, 3, 1, 1 if samples == 1 else 2)
    entry(277, 3, 1, samples)
    entry(284, 3, 1, 1)
    entry(296, 3, 1, 2)
    entry(317, 3, 1, predictor)
    entry(322, 4, 1, tile_w)
    entry(323, 4, 1, tile_h)
    arr_long(324, offsets)
    arr_long(325, [len(t) for t in tiles])
    assert len(entries) == n_entries
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    for t in tiles:
        out += t
    out += struct.pack("<H", n_entries) + b"".join(entries)
    out += struct.pack("<I", 0) + extra
    return bytes(out)


def _tiff_decode_ifd(
    payload: bytes, bo: str, ifd_off: int
) -> tuple[int, int, int, list[int], int]:
    """Decode ONE IFD's image at ifd_off; returns (w, h, samples,
    values, next_ifd_offset)."""
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD offset")
    (n_entries,) = struct.unpack_from(f"{bo}H", payload, ifd_off)
    if ifd_off + 2 + 12 * n_entries + 4 > len(payload):
        raise ValueError("truncated TIFF IFD")
    type_size = {1: 1, 3: 2, 4: 4}
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        tag, typ, cnt = struct.unpack_from(f"{bo}HHI", payload, ifd_off + 2 + 12 * i)
        val_off = ifd_off + 2 + 12 * i + 8
        if typ not in type_size:
            continue  # RATIONAL etc. — not needed for baseline decode
        sz = type_size[typ]
        if cnt * sz > 4:
            (val_off,) = struct.unpack_from(f"{bo}I", payload, val_off)
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        if val_off + cnt * sz > len(payload):
            raise ValueError(f"truncated TIFF tag {tag}")
        tags[tag] = list(struct.unpack_from(f"{bo}{cnt}{fmt}", payload, val_off))
    (next_ifd,) = struct.unpack_from(
        f"{bo}I", payload, ifd_off + 2 + 12 * n_entries
    )
    try:
        w, h = tags[256][0], tags[257][0]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}")
    samples = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    compression = tags.get(259, [1])[0]
    predictor = tags.get(317, [1])[0]
    if samples not in (1, 3) or len(set(bits)) != 1 or bits[0] not in (8, 16):
        raise NotImplementedError(
            f"only 8/16-bit gray/RGB TIFF (spp={samples}, bits={bits})")
    planar = tags.get(284, [1])[0]
    if planar not in (1, 2):
        raise ValueError(f"bad TIFF PlanarConfiguration {planar}")
    if planar == 2 and (322 in tags or 324 in tags):
        # planar TILED is a spec corner real crawls essentially never
        # produce (planar writers are strip-era scanners/geo tools)
        raise NotImplementedError("tiled planar TIFF not supported")
    if samples == 1:
        planar = 1  # spec: PlanarConfiguration is meaningless at spp=1
    if compression not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(f"TIFF compression {compression} not supported")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} not supported")
    sw = bits[0] // 8
    row_bytes = w * samples * sw

    def chunk_at(off: int, cnt: int, expected: int) -> bytes:
        if off + cnt > len(payload):
            raise ValueError("truncated TIFF strip/tile")
        chunk = payload[off : off + cnt]
        if compression == 5:
            chunk = _tiff_lzw_decode(chunk)
        elif compression == 32773:
            chunk = _packbits_decode(chunk, expected)
        elif compression in (8, 32946):
            try:
                chunk = zlib.decompress(chunk)
            except zlib.error as e:
                raise ValueError(f"corrupt TIFF Deflate strip/tile: {e}")
        if len(chunk) < expected:
            raise ValueError("TIFF strip/tile shorter than its rows")
        return chunk[:expected]

    if 322 in tags or 324 in tags:
        # tiled layout (TIFF 6.0 §15): fixed-size tiles padded at the
        # right/bottom edges, ordered left-to-right then top-to-bottom;
        # the predictor resets per tile row over the PADDED width.
        try:
            tw, tl = tags[322][0], tags[323][0]
            offsets, counts = tags[324], tags[325]
        except KeyError as e:
            raise ValueError(f"tiled TIFF missing required tag {e}")
        if tw <= 0 or tl <= 0:
            raise ValueError("TIFF tile dims must be positive")
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        if len(offsets) != len(counts) or len(offsets) != across * down:
            raise ValueError("TIFF tile offset/count mismatch")
        tile_row = tw * samples * sw
        raw = bytearray(h * row_bytes)
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            buf = bytearray(chunk_at(off, cnt, tl * tile_row))
            if predictor == 2:
                _tiff_undo_hdiff(buf, tl, tw, samples, sw, bo)
            tx, ty = (ti % across) * tw, (ti // across) * tl
            ncopy = min(tw, w - tx) * samples * sw
            for r in range(min(tl, h - ty)):
                dst = (ty + r) * row_bytes + tx * samples * sw
                raw[dst : dst + ncopy] = buf[r * tile_row : r * tile_row + ncopy]
    else:
        try:
            offsets, counts = tags[273], tags[279]
        except KeyError as e:
            raise ValueError(f"TIFF missing required tag {e}")
        rps = tags.get(278, [h])[0]
        if len(offsets) != len(counts):
            raise ValueError("TIFF strip offset/count mismatch")
        if planar == 2:
            # PlanarConfiguration 2: SamplesPerPixel x StripsPerImage
            # strips, ALL of component 0's first, then component 1's,
            # ... (TIFF 6.0); each strip carries single-component rows,
            # so the predictor differences at stride 1 within the plane
            # and the planes interleave back sample-by-sample at the end
            spp_strips = (h + rps - 1) // rps
            if len(offsets) != samples * spp_strips:
                raise ValueError(
                    f"planar TIFF wants {samples * spp_strips} strips, "
                    f"has {len(offsets)}")
            plane_row = w * sw
            vals = [0] * (w * h * samples)
            for p in range(samples):
                praw = bytearray()
                for si in range(spp_strips):
                    idx = p * spp_strips + si
                    nrows = min(rps, h - si * rps)
                    strip = bytearray(
                        chunk_at(offsets[idx], counts[idx],
                                 nrows * plane_row))
                    if predictor == 2:
                        _tiff_undo_hdiff(strip, nrows, w, 1, sw, bo)
                    praw += strip
                if len(praw) != h * plane_row:
                    raise ValueError(
                        f"planar TIFF plane {p}: {len(praw)}B, "
                        f"want {h * plane_row}B")
                if sw == 1:
                    vals[p::samples] = list(praw)
                else:
                    vals[p::samples] = struct.unpack(
                        f"{bo}{w * h}H", bytes(praw))
            return w, h, samples, vals, next_ifd
        raw = bytearray()
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            nrows = min(rps, h - si * rps)
            strip = bytearray(chunk_at(off, cnt, nrows * row_bytes))
            if predictor == 2:
                _tiff_undo_hdiff(strip, nrows, w, samples, sw, bo)
            raw += strip
        if len(raw) != h * row_bytes:
            raise ValueError(
                f"TIFF strips yielded {len(raw)}B, want {h * row_bytes}B")
    if sw == 1:
        vals = list(raw)
    else:
        vals = list(struct.unpack(f"{bo}{w * h * samples}H", bytes(raw)))
    return w, h, samples, vals, next_ifd


def decode_tiff_pages(
    payload: bytes, max_pages: int = 1024
) -> list[tuple[int, int, int, list[int]]]:
    """Walk a (possibly multi-page) TIFF's IFD chain and decode every
    page to (w, h, samples, top-down values). The chain is 0-terminated
    per spec; a cycle or a chain longer than max_pages raises (a real
    crawl WILL contain a TIFF whose next-IFD pointer loops)."""
    if payload[:4] not in TIFF_SIGS:
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(f"{bo}I", payload, 4)
    pages, seen = [], set()
    while ifd_off:
        if ifd_off in seen or len(pages) >= max_pages:
            raise ValueError("TIFF IFD chain loops or exceeds page cap")
        seen.add(ifd_off)
        w, h, samples, vals, ifd_off = _tiff_decode_ifd(payload, bo, ifd_off)
        pages.append((w, h, samples, vals))
    if not pages:
        raise ValueError("TIFF has no IFD")
    return pages


def decode_tiff(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Parse a baseline TIFF to (w, h, samples, top-down values). REAL
    decode, stdlib only, BOTH byte orders: IFD walk, strip reassembly,
    none/LZW/PackBits decompression, horizontal-differencing predictor
    undo. Multi-page containers return the FIRST page (poster
    semantics, same convention as animated GIF; decode_tiff_pages
    enumerates the chain). Both the strip and the TILED (§15) layouts
    decode, at 8-bit (values 0..255) or 16-bit (values 0..65535, file
    byte order) depth, gray or RGB chunky. Planar configuration 2,
    other depths, and other compressions raise; truncated/invalid
    containers raise ValueError."""
    if payload[:4] not in TIFF_SIGS:
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(f"{bo}I", payload, 4)
    w, h, samples, vals, _ = _tiff_decode_ifd(payload, bo, ifd_off)
    return w, h, samples, vals


# --------------------------------------------------------------------------
# Real stdlib JPEG codec (round 5). Baseline sequential-DCT JPEG needs
# no codec wheel either: the container is marker framing (SOI/APP0/
# DQT/SOF0/DHT/SOS/EOI, ITU-T T.81), the entropy layer is canonical
# Huffman over DC-size / AC-(run,size) symbols with 0xFF byte
# stuffing, and the transform layer is the 8x8 type-II DCT — all spec
# math. The encoder is a two-pass OPTIMIZING encoder in the libjpeg
# tradition: it counts the scan's actual symbol frequencies and builds
# length-limited (<=16 bit) canonical Huffman tables per image, so no
# Annex K table constants are baked in; the tables travel in DHT and
# the decoder reads ANY baseline table. Grayscale and YCbCr color
# decode for real, including the layouts real crawl JPEGs actually
# use: 4:2:0 / 4:2:2 chroma subsampling (box-average downsample,
# sample-replication upsample) and DRI/RSTn restart intervals (byte
# re-align + DC-predictor reset every N MCUs). Progressive (SOF2),
# sampling factors above 2, 12-bit precision, and arithmetic coding
# keep the honest NotImplementedError gate.
#
# Exactness contract (what lets the DuckDB oracle verify a LOSSY
# format bit-exactly): with an all-ones quant table, an image whose
# 8x8 blocks are each CONSTANT encodes to DC-only blocks — the forward
# DCT of a constant block is 8*(v-128) in DC and exact zeros elsewhere
# — and the IDCT of a DC-only block is that constant again, so decode
# inverts generation exactly, including on dims that are NOT multiples
# of 8 (edge-replication padding of a constant block is the same
# constant; the decoder crops). Color adds the fixed-point YCbCr
# round trip, defined here as floor(x + 0.5) + clamp in BOTH
# directions so the oracle can replicate it relationally; 4:2:0/4:2:2
# extend it to MCU-grid-aligned constants (the box average of a
# constant is the constant, replication inverts it). Restart framing
# never changes pixels (property-tested). The AC/entropy machinery is
# locked by exact coefficient-level round-trip property tests (entropy
# coding is lossless) plus bounded-error full-pipeline tests in
# tests/test_jpeg_codec.py.
# --------------------------------------------------------------------------

JPEG_SIG = b"\xff\xd8"


def _zigzag_order() -> list[int]:
    """The T.81 zigzag scan as natural (row-major) indices: walk the
    anti-diagonals, alternating direction, odd diagonals starting at
    the top row."""
    out = []
    for s in range(15):
        diag = [(s - j) * 8 + j for j in range(s + 1) if s - j < 8 and j < 8]
        out.extend(reversed(diag) if s % 2 else diag)
    return out


_JPEG_ZZ = _zigzag_order()


def _dct_matrix():
    """Orthonormal 8-point DCT-II basis M with M @ M.T = I, scaled so
    F = M @ f @ M.T is exactly T.81's (1/4)c(u)c(v) double sum and the
    inverse is f = M.T @ F @ M."""
    import numpy as np

    x = np.arange(8, dtype=np.float64)
    m = 0.5 * np.cos((2.0 * x + 1.0) * x.reshape(8, 1) * np.pi / 16.0)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


class _JpegBitWriter:
    """MSB-first bit packer with T.81 byte stuffing (0xFF -> 0xFF 0x00
    inside entropy-coded data); flush pads the last byte with 1-bits."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | (code & ((1 << width) - 1))
        self.n += width
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)

    def emit_marker(self, marker: int) -> None:
        """Byte-align with 1-bit padding (stuffed if the pad byte lands
        on 0xFF), then write a bare marker — markers themselves are
        never byte-stuffed (T.81 restart markers)."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, marker])


class _JpegBitReader:
    """Inverse of _JpegBitWriter: un-stuffs 0xFF 0x00; any other
    marker inside the scan (we gate DRI, so no RSTn) is an error."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int:
        while self.n < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy-coded scan")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("marker inside JPEG entropy-coded scan")
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        v = (self.acc >> (self.n - width)) & ((1 << width) - 1)
        self.n -= width
        self.acc &= (1 << self.n) - 1
        return v

    def expect_rst(self, idx: int) -> None:
        """Discard the current byte's padding bits (the buffered
        remainder is always < 8 bits, all padding at a restart
        boundary) and consume the expected RSTn marker raw."""
        self.acc = 0
        self.n = 0
        if self.data[self.pos:self.pos + 2] != bytes([0xFF, 0xD0 + idx]):
            raise ValueError(f"expected JPEG restart marker RST{idx}")
        self.pos += 2


def _build_huffman(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """Canonical length-limited Huffman from symbol frequencies:
    (bits, huffval) in DHT form — bits[i] = number of codes of length
    i for i in 1..16, huffval = symbols in code order. Classic T.81
    K.2 shape: a dummy symbol (256, weight 1) rides along to reserve
    the all-ones codeword, depths come from heap merging, the K.3
    procedure folds lengths >16 down, and the dummy's slot (the
    numerically largest code of the longest length) is dropped at the
    end, which is exactly what keeps all-ones unused."""
    import heapq

    f = dict(freq)
    f[256] = 1
    heap = [(w, i, [s]) for i, (s, w) in enumerate(sorted(f.items()))]
    heapq.heapify(heap)
    depth = {s: 0 for s in f}
    if len(heap) == 1:  # single symbol still needs a 1-bit code
        depth[heap[0][2][0]] = 1
    tie = len(heap)
    while len(heap) > 1:
        w1, _, s1 = heapq.heappop(heap)
        w2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (w1 + w2, tie, s1 + s2))
        tie += 1
    max_d = max(depth.values())
    bits = [0] * (max(max_d, 16) + 1)
    for d in depth.values():
        bits[d] += 1
    i = len(bits) - 1
    while i > 16:  # T.81 Figure K.3: fold overlong lengths down
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    bits = bits[:17]
    last = max(k for k in range(1, 17) if bits[k] > 0)
    bits[last] -= 1  # drop the dummy: its code was the longest/largest
    # assign real symbols to the adjusted length counts, shortest first,
    # in (original depth, frequency desc, symbol) order — Kraft holds by
    # construction, so canonical assignment below is prefix-free
    order = sorted((s for s in f if s != 256),
                   key=lambda s: (depth[s], -f[s], s))
    return bits, order


def _huff_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            codes[huffval[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_decode_map(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-at-a-time canonical decode."""
    m: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            m[(ln, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return m


def _read_huff_symbol(br: "_JpegBitReader", m: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read(1)
        if (ln, code) in m:
            return m[(ln, code)]
    raise ValueError("invalid Huffman code in JPEG scan")


def _jpeg_csize(v: int) -> int:
    """T.81 value category: bit length of |v| (0 for 0)."""
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _jpeg_vbits(v: int, size: int) -> int:
    """Appended-bits form: v itself if positive, one's-complement
    offset if negative."""
    return v if v >= 0 else v + (1 << size) - 1


def _jpeg_vdecode(raw: int, size: int) -> int:
    return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


def _emit_block(bw: "_JpegBitWriter", zz: list[int], pred: int,
                dc_codes: dict, ac_codes: dict,
                freq_only: tuple[dict, dict] | None = None) -> int:
    """Emit one block's 64 zigzag-ordered quantized coefficients (or,
    with freq_only=(dcf, acf), just count symbols for the table-build
    pass). Returns the new DC predictor."""
    diff = zz[0] - pred
    s = _jpeg_csize(diff)
    if freq_only is not None:
        freq_only[0][s] = freq_only[0].get(s, 0) + 1
    else:
        c, ln = dc_codes[s]
        bw.write(c, ln)
        if s:
            bw.write(_jpeg_vbits(diff, s), s)
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            if freq_only is not None:
                freq_only[1][0xF0] = freq_only[1].get(0xF0, 0) + 1
            else:
                c, ln = ac_codes[0xF0]
                bw.write(c, ln)
            run -= 16
        s = _jpeg_csize(v)
        sym = (run << 4) | s
        if freq_only is not None:
            freq_only[1][sym] = freq_only[1].get(sym, 0) + 1
        else:
            c, ln = ac_codes[sym]
            bw.write(c, ln)
            bw.write(_jpeg_vbits(v, s), s)
        run = 0
    if run:
        if freq_only is not None:
            freq_only[1][0x00] = freq_only[1].get(0x00, 0) + 1
        else:
            c, ln = ac_codes[0x00]
            bw.write(c, ln)
    return zz[0]


def _read_block(br: "_JpegBitReader", pred: int, dc_map: dict, ac_map: dict) -> tuple[list[int], int]:
    """Decode one block to 64 zigzag-ordered coefficients."""
    zz = [0] * 64
    s = _read_huff_symbol(br, dc_map)
    diff = _jpeg_vdecode(br.read(s), s) if s else 0
    zz[0] = pred + diff
    k = 1
    while k < 64:
        sym = _read_huff_symbol(br, ac_map)
        if sym == 0x00:
            break
        run, s = sym >> 4, sym & 0x0F
        if s == 0:
            if run != 15:
                raise ValueError(f"invalid JPEG AC symbol {sym:#x}")
            k += 16
            continue
        k += run
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        zz[k] = _jpeg_vdecode(br.read(s), s)
        k += 1
    return zz, zz[0]


def _plane_to_qblocks(plane, qtab):
    """(h, w) float plane -> (n_blocks, 64) int32 zigzag-ordered
    quantized DCT coefficients, blocks in row-major MCU order. Padding
    is edge replication; quantization rounds half away from zero."""
    import numpy as np

    h, w = plane.shape
    bw_, bh_ = -(-w // 8), -(-h // 8)
    padded = np.pad(plane - 128.0, ((0, bh_ * 8 - h), (0, bw_ * 8 - w)), mode="edge")
    blocks = padded.reshape(bh_, 8, bw_, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    m = _dct_matrix()
    coefs = m @ blocks @ m.T
    q = coefs / qtab
    qz = (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int64)
    return qz.reshape(-1, 64)[:, _JPEG_ZZ]


def _qblocks_to_plane(zz_blocks, qtab, w: int, h: int):
    """Inverse of _plane_to_qblocks: dequantize, batched IDCT, pixel
    reconstruction floor(x + 128.5) clipped to [0, 255], crop."""
    import numpy as np

    bw_, bh_ = -(-w // 8), -(-h // 8)
    nat = np.zeros((len(zz_blocks), 64), dtype=np.float64)
    nat[:, _JPEG_ZZ] = zz_blocks
    coefs = (nat * qtab.reshape(64)).reshape(-1, 8, 8)
    m = _dct_matrix()
    px = m.T @ coefs @ m
    px = np.clip(np.floor(px + 128.5), 0.0, 255.0)
    full = px.reshape(bh_, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh_ * 8, bw_ * 8)
    return full[:h, :w]


def _jpeg_seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _rgb_to_ycbcr(rgb):
    """JFIF full-range color transform with the exactness-contract
    rounding: floor(x + 0.5), clamp to [0, 255]. The inverse below and
    the DuckDB oracle use the SAME expressions term-for-term."""
    import numpy as np

    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = np.floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.5)
    cr = np.floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128.5)
    return [np.clip(p, 0.0, 255.0) for p in (y, cb, cr)]


def _ycbcr_to_rgb(y, cb, cr):
    import numpy as np

    r = np.floor(y + 1.402 * (cr - 128.0) + 0.5)
    g = np.floor(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5)
    b = np.floor(y + 1.772 * (cb - 128.0) + 0.5)
    return [np.clip(p, 0.0, 255.0) for p in (r, g, b)]


_JPEG_SUBSAMPLE = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _downsample_box(plane, fh: int, fv: int):
    """Chroma box-average downsample with the contract rounding
    floor(mean + 0.5); plane dims must already be multiples of
    (fv, fh) (the caller pads to MCU multiples first). A constant
    region aligned to the box grid stays the same constant, which is
    what extends the bit-exactness contract to 4:2:0/4:2:2."""
    import numpy as np

    if fh == 1 and fv == 1:
        return plane
    h, w = plane.shape
    return np.floor(plane.reshape(h // fv, fv, w // fh, fh).mean(axis=(1, 3)) + 0.5)


def _jpeg_plan(w: int, h: int, values: list[int], samples: int,
               qtable: list[int] | None, qtable_chroma: list[int] | None,
               subsample: str) -> dict:
    """Shared encoder front half (baseline and progressive): color
    transform, chroma box-downsample, MCU padding, forward DCT +
    quantization. Returns the per-component zigzag coefficient grids
    plus the interleaved-MCU unit list and frame geometry."""
    import numpy as np

    qt0 = np.asarray(qtable if qtable is not None else [1] * 64,
                     dtype=np.float64).reshape(8, 8)
    qt1 = (np.asarray(qtable_chroma, dtype=np.float64).reshape(8, 8)
           if qtable_chroma is not None else qt0)
    vals = np.asarray(values, dtype=np.float64)
    if samples == 3:
        sh, sv = _JPEG_SUBSAMPLE[subsample]
        y, cb, cr = _rgb_to_ycbcr(vals.reshape(h, w, 3))
        mw, mh = 8 * sh, 8 * sv
        mcus_x, mcus_y = -(-w // mw), -(-h // mh)

        def pad(p):
            return np.pad(p, ((0, mcus_y * mh - p.shape[0]),
                              (0, mcus_x * mw - p.shape[1])), mode="edge")

        planes = [pad(y), _downsample_box(pad(cb), sh, sv),
                  _downsample_box(pad(cr), sh, sv)]
        qtabs, tclass = [qt0, qt1, qt1], [0, 1, 1]
        sampling = [(sh, sv), (1, 1), (1, 1)]
    elif samples == 1:
        mcus_x, mcus_y = -(-w // 8), -(-h // 8)
        planes = [np.pad(vals.reshape(h, w),
                         ((0, mcus_y * 8 - h), (0, mcus_x * 8 - w)),
                         mode="edge")]
        qtabs, tclass, sampling = [qt0], [0], [(1, 1)]
    else:
        raise NotImplementedError(f"JPEG with {samples} components not supported")

    grids = []  # (zigzag qblock array, grid block-width, hi, vi)
    for p, q, (hi, vi) in zip(planes, qtabs, sampling):
        grids.append((_plane_to_qblocks(p, q), p.shape[1] // 8, hi, vi))

    # scan order: MCU-major, each component contributing its hi*vi
    # blocks row-major within the MCU (T.81 interleave)
    mcus = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            units = []
            for ci, (qb, gbw, hi, vi) in enumerate(grids):
                for r in range(vi):
                    for c in range(hi):
                        units.append(
                            (ci, qb[(my * vi + r) * gbw + (mx * hi + c)].tolist()))
            mcus.append(units)

    return dict(qt0=qt0, qt1=qt1, grids=grids, mcus=mcus, tclass=tclass,
                sampling=sampling, mcus_x=mcus_x, mcus_y=mcus_y,
                n_classes=2 if samples == 3 else 1)


def _jpeg_emit_headers(out: bytearray, w: int, h: int, samples: int,
                       plan: dict, sof_marker: int, ri: int) -> None:
    """APP0 + DQT(s) + SOF + optional DRI, shared by both encoders;
    identical byte layout to the original baseline emitter."""
    import numpy as np

    out += _jpeg_seg(0xE0, b"JFIF\x00" + bytes([1, 1, 0]) +
                     (1).to_bytes(2, "big") * 2 + bytes([0, 0]))
    for tid, qt in enumerate([plan["qt0"], plan["qt1"]][:plan["n_classes"]]):
        zzq = qt.reshape(64)[_JPEG_ZZ].astype(np.int64)
        if np.any(zzq < 1) or np.any(zzq > 255):
            raise ValueError("8-bit quant table entries must be in [1, 255]")
        out += _jpeg_seg(0xDB, bytes([tid]) + bytes(int(v) for v in zzq))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([samples])
    for ci in range(samples):
        hi, vi = plan["sampling"][ci]
        sof += bytes([ci + 1, (hi << 4) | vi, plan["tclass"][ci]])
    out += _jpeg_seg(sof_marker, sof)
    if ri:
        out += _jpeg_seg(0xDD, ri.to_bytes(2, "big"))


def encode_jpeg(w: int, h: int, values: list[int], samples: int = 1,
                qtable: list[int] | None = None,
                qtable_chroma: list[int] | None = None,
                subsample: str = "444", restart_interval: int = 0) -> bytes:
    """Baseline JFIF JPEG from a top-down row-major value list
    (grayscale w*h for samples=1, interleaved RGB w*h*3 for
    samples=3). Quant tables are natural-order 64-lists (default
    all-ones — the exactness-contract table); Huffman tables are built
    per image from the scan's real symbol counts. subsample picks the
    chroma layout ("444", "422", "420" — Y carries the 2x1/2x2
    sampling factors, chroma is box-downsampled with floor(mean+0.5));
    restart_interval > 0 emits DRI + RSTn markers every that many
    MCUs with DC-predictor resets, the framing real crawl JPEGs use
    for error resilience."""
    plan = _jpeg_plan(w, h, values, samples, qtable, qtable_chroma, subsample)
    mcus, tclass = plan["mcus"], plan["tclass"]
    n_classes = plan["n_classes"]
    ri = int(restart_interval or 0)

    def _scan(dc_codes=None, ac_codes=None, freqs=None):
        bw = None if freqs is not None else _JpegBitWriter()
        preds = [0] * samples
        rst = 0
        for mi, units in enumerate(mcus):
            if ri and mi and mi % ri == 0:
                if bw is not None:
                    bw.emit_marker(0xD0 + (rst % 8))
                rst += 1
                preds = [0] * samples
            for ci, zz in units:
                tid = tclass[ci]
                if freqs is not None:
                    preds[ci] = _emit_block(None, zz, preds[ci], {}, {},
                                            freq_only=freqs[tid])
                else:
                    preds[ci] = _emit_block(bw, zz, preds[ci],
                                            dc_codes[tid], ac_codes[tid])
        return bw.flush() if bw is not None else None

    # pass 1: symbol frequencies, SAME iteration (incl. restart resets)
    # so the DC-diff categories match pass 2 exactly
    freqs = [({}, {}) for _ in range(n_classes)]
    _scan(freqs=freqs)
    tables = []  # (class 0=DC/1=AC, table id, bits, huffval)
    dc_codes, ac_codes = [], []
    for tid, (dcf, acf) in enumerate(freqs):
        db, dv = _build_huffman(dcf)
        ab, av = _build_huffman(acf)
        tables += [(0, tid, db, dv), (1, tid, ab, av)]
        dc_codes.append(_huff_codes(db, dv))
        ac_codes.append(_huff_codes(ab, av))
    scan = _scan(dc_codes, ac_codes)

    out = bytearray(b"\xff\xd8")  # SOI
    _jpeg_emit_headers(out, w, h, samples, plan, 0xC0, ri)
    for cls, tid, bits, huffval in tables:
        out += _jpeg_seg(0xC4, bytes([(cls << 4) | tid]) +
                         bytes(bits[1:17]) + bytes(huffval))
    sos = bytes([samples])
    for ci in range(samples):
        sos += bytes([ci + 1, (tclass[ci] << 4) | tclass[ci]])
    sos += bytes([0, 63, 0])
    out += _jpeg_seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)

def _jpeg_scan_end(payload: bytes, p: int) -> int:
    """Position of the first marker after an entropy-coded segment:
    skips stuffed 0xFF 0x00 pairs, RSTn markers, and 0xFF fill bytes."""
    while p < len(payload) - 1:
        if payload[p] != 0xFF:
            p += 1
            continue
        b = payload[p + 1]
        if b == 0x00 or 0xD0 <= b <= 0xD7:
            p += 2
        elif b == 0xFF:
            p += 1
        else:
            return p
    raise ValueError("truncated JPEG (no marker after scan)")


def _read_ac_first(br: "_JpegBitReader", ac_map: dict, zz: list[int],
                   ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC first scan, one block (T.81 G.1.2.2): spectral
    band [ss..se] at precision al, with cross-block EOB runs (EOBn
    symbols carry log2(run) extension bits). Returns the new eobrun."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_huff_symbol(br, ac_map)
        r, s = sym >> 4, sym & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("JPEG AC run past end of band")
            zz[k] = _jpeg_vdecode(br.read(s), s) << al
            k += 1
        elif r != 15:
            eobrun = 1 << r
            if r:
                eobrun += br.read(r)
            return eobrun - 1
        else:
            k += 16  # ZRL
    return 0


def _read_ac_refine(br: "_JpegBitReader", ac_map: dict, zz: list[int],
                    ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC refinement scan, one block (T.81 G.1.2.3):
    already-nonzero coefficients in the band receive a correction bit
    at weight 2^al; newly-nonzero ones arrive as run-length symbols of
    size 1 plus a sign bit, the run counting only still-zero history.
    Correction bits keep flowing while inside an EOB run. Returns the
    new eobrun."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_huff_symbol(br, ac_map)
            r, s = sym >> 4, sym & 0x0F
            val = 0
            if s:
                if s != 1:
                    raise ValueError("invalid JPEG AC-refine symbol size")
                val = p1 if br.read(1) else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.read(r)
                break
            while k <= se:
                if zz[k]:
                    if br.read(1) and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if k > se:
                if val:
                    raise ValueError("JPEG AC-refine run past end of band")
                break
            if val:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] and br.read(1) and (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_decode_scan(payload: bytes, data_pos: int, seg: bytes,
                      comps: list, grids: list, dc_maps: dict, ac_maps: dict,
                      restart: int, progressive: bool, w: int, h: int,
                      mcus_x: int, mcus_y: int, max_h: int, max_v: int) -> int:
    """Decode ONE scan's entropy-coded segment into the per-component
    coefficient grids (zigzag order) and return the payload position of
    the marker that follows it. Handles interleaved (ns > 1, MCU order
    over the padded grid) and non-interleaved (ns == 1, the component's
    own ceil-block grid) scans, baseline full-block reads, all four
    progressive scan kinds, and RSTn restarts (predictor + EOB-run
    reset every `restart` MCUs/blocks)."""
    ns = seg[0]
    if len(seg) != 4 + 2 * ns:
        raise ValueError("malformed JPEG scan header")
    cid_index = {c[0]: i for i, c in enumerate(comps)}
    scomps = []  # (component index, dc table id, ac table id)
    for i in range(ns):
        cid, tsel = seg[1 + 2 * i], seg[2 + 2 * i]
        if cid not in cid_index:
            raise ValueError(f"JPEG scan references unknown component {cid}")
        scomps.append((cid_index[cid], tsel >> 4, tsel & 0x0F))
    ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = a >> 4, a & 0x0F
    if progressive:
        if se > 63 or (ss == 0) != (se == 0):
            raise ValueError("invalid progressive JPEG spectral band")
        if ss > 0 and ns != 1:
            raise ValueError("progressive JPEG AC scan must be single-component")
        if ah and al != ah - 1:
            raise ValueError("invalid JPEG successive-approximation step")
    else:
        ss, se, ah, al = 0, 63, 0, 0

    if ns > 1:
        units = mcus_x * mcus_y
    else:
        ci0 = scomps[0][0]
        _, _, hi, vi = comps[ci0]
        cw, ch = -(-(w * hi) // max_h), -(-(h * vi) // max_v)
        cbw, cbh = -(-cw // 8), -(-ch // 8)
        units = cbw * cbh
    br = _JpegBitReader(payload, data_pos)
    preds = [0] * ns
    eobrun = 0
    rst = 0
    for ui in range(units):
        if restart and ui and ui % restart == 0:
            br.expect_rst(rst % 8)
            rst += 1
            preds = [0] * ns
            eobrun = 0
        if ns > 1:
            mx, my = ui % mcus_x, ui // mcus_x
            blocks = []
            for si, (ci, _td, _ta) in enumerate(scomps):
                _, _, hi, vi = comps[ci]
                gbw = mcus_x * hi
                for r in range(vi):
                    for c in range(hi):
                        blocks.append(
                            (si, grids[ci][(my * vi + r) * gbw + (mx * hi + c)]))
        else:
            _, _, hi, _vi = comps[scomps[0][0]]
            gbw = mcus_x * hi
            blocks = [(0, grids[scomps[0][0]][(ui // cbw) * gbw + ui % cbw])]
        for si, zz in blocks:
            _ci, td, ta = scomps[si]
            if not progressive:
                full, preds[si] = _read_block(br, preds[si],
                                              dc_maps[td], ac_maps[ta])
                zz[:] = full
            elif ss == 0 and ah == 0:  # DC first
                s = _read_huff_symbol(br, dc_maps[td])
                diff = _jpeg_vdecode(br.read(s), s) if s else 0
                preds[si] += diff
                zz[0] = preds[si] << al
            elif ss == 0:  # DC refinement: one raw bit per block
                if br.read(1):
                    zz[0] |= 1 << al
            elif ah == 0:
                eobrun = _read_ac_first(br, ac_maps[ta], zz, ss, se, al, eobrun)
            else:
                eobrun = _read_ac_refine(br, ac_maps[ta], zz, ss, se, al, eobrun)
    return _jpeg_scan_end(payload, br.pos)


def _jpeg_point_ac(v: int, al: int) -> int:
    """T.81 AC point transform: divide by 2^al truncating toward zero
    (DC uses a plain arithmetic shift instead — G.1.2.1/G.1.2.2)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


class _JpegScanSink:
    """Dual-mode symbol/bit sink for one progressive scan: with
    ``freqs`` it only counts Huffman symbols (the table-build pass);
    with ``bw``/``codes`` it writes the entropy segment. Both passes
    run the identical control flow, so the stream the second pass
    writes matches the tables the first pass sized."""

    def __init__(self, freqs: dict | None = None, bw=None, codes: dict | None = None):
        self.freqs, self.bw, self.codes = freqs, bw, codes

    def sym(self, tid: int, s: int) -> None:
        if self.freqs is not None:
            f = self.freqs.setdefault(tid, {})
            f[s] = f.get(s, 0) + 1
        else:
            c, ln = self.codes[tid][s]
            self.bw.write(c, ln)

    def bits(self, v: int, n: int) -> None:
        if n and self.bw is not None:
            self.bw.write(v, n)

    def rst(self, idx: int) -> None:
        if self.bw is not None:
            self.bw.emit_marker(0xD0 + idx)


def _enc_dc_scan(sink: "_JpegScanSink", segments: list, ah: int, al: int,
                 tids: list[int]) -> None:
    """DC scan encoder, first (ah == 0: shifted-domain differential
    coding) or refinement (one raw bit per block). ``segments`` is the
    restart segmentation; each element is a flat (class-keyed) list of
    (ci, zz) blocks in scan order."""
    for si, segm in enumerate(segments):
        if si:
            sink.rst((si - 1) % 8)
        preds: dict[int, int] = {}
        for ci, zz in segm:
            if ah:
                sink.bits((zz[0] >> al) & 1, 1)
                continue
            v = zz[0] >> al
            diff = v - preds.get(ci, 0)
            preds[ci] = v
            s = _jpeg_csize(diff)
            sink.sym(tids[ci], s)
            if s:
                sink.bits(_jpeg_vbits(diff, s), s)


def _enc_ac_first_scan(sink: "_JpegScanSink", segments: list, ss: int,
                       se: int, al: int, tid: int) -> None:
    """AC first scan encoder (T.81 G.1.2.2): band run-length coding at
    precision al with cross-block EOB runs, flushed before any new
    symbol, at the 0x7FFF cap, and at restart/scan boundaries."""
    for si, segm in enumerate(segments):
        if si:
            sink.rst((si - 1) % 8)
        eobrun = 0

        def flush() -> None:
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                sink.sym(tid, nb << 4)
                sink.bits(eobrun & ((1 << nb) - 1), nb)
                eobrun = 0

        for _ci, zz in segm:
            r = 0
            for k in range(ss, se + 1):
                v = _jpeg_point_ac(zz[k], al)
                if v == 0:
                    r += 1
                    continue
                flush()
                while r > 15:
                    sink.sym(tid, 0xF0)
                    r -= 16
                s = _jpeg_csize(v)
                sink.sym(tid, (r << 4) | s)
                sink.bits(_jpeg_vbits(v, s), s)
                r = 0
            if r:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
        flush()


def _enc_ac_refine_scan(sink: "_JpegScanSink", segments: list, ss: int,
                        se: int, al: int, tid: int) -> None:
    """AC refinement scan encoder (T.81 G.1.2.3): correction bits for
    already-nonzero coefficients buffer behind the next Huffman symbol
    — block-local bits flush after that block's own symbol, bits from
    completed EOB-run blocks flush after the EOBn symbol — and newly-
    nonzero coefficients emit (run << 4 | 1) + a sign bit, the run
    counting zero-history positions only."""
    for si, segm in enumerate(segments):
        if si:
            sink.rst((si - 1) % 8)
        eobrun = 0
        pend: list[int] = []  # correction bits from completed EOB-run blocks

        def flush_eob() -> None:
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                sink.sym(tid, nb << 4)
                sink.bits(eobrun & ((1 << nb) - 1), nb)
                for b in pend:
                    sink.bits(b, 1)
                pend.clear()
                eobrun = 0

        for _ci, zz in segm:
            absv = [0] * (se + 1)
            eob_k = ss - 1  # index of the last newly-nonzero coefficient
            for k in range(ss, se + 1):
                t = abs(zz[k]) >> al
                absv[k] = t
                if t == 1:
                    eob_k = k
            r = 0
            local: list[int] = []  # corrections since this block's last symbol
            for k in range(ss, se + 1):
                t = absv[k]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob_k:
                    flush_eob()
                    sink.sym(tid, 0xF0)
                    r -= 16
                    for b in local:
                        sink.bits(b, 1)
                    local.clear()
                if t > 1:
                    local.append(t & 1)
                    continue
                flush_eob()
                sink.sym(tid, (r << 4) | 1)
                sink.bits(1 if zz[k] >= 0 else 0, 1)
                for b in local:
                    sink.bits(b, 1)
                local.clear()
                r = 0
            if r or local:
                eobrun += 1
                pend.extend(local)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()


# libjpeg's standard progressive scan scripts (jcparam.c shape): DC
# first with one point-transform step, spectral-selection AC firsts,
# then successive-approximation refinements down to full precision.
_JPEG_PROG_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_JPEG_PROG_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def encode_jpeg_progressive(w: int, h: int, values: list[int],
                            samples: int = 1,
                            qtable: list[int] | None = None,
                            qtable_chroma: list[int] | None = None,
                            subsample: str = "444",
                            restart_interval: int = 0,
                            scan_script: list | None = None) -> bytes:
    """Progressive (SOF2) JFIF JPEG with the same pixel contract as
    encode_jpeg — identical color transform, chroma box-downsample,
    forward DCT, and quantization (shared _jpeg_plan), so a full
    decode of the progressive container reconstructs coefficient-
    identical data to the baseline container of the same image. The
    scan script defaults to libjpeg's standard spectral-selection +
    successive-approximation shape; each entry is (component indices,
    Ss, Se, Ah, Al). Huffman tables are rebuilt optimal per scan and
    re-emitted as DHT id 0 (id 0/1 per class for interleaved DC
    scans) before each SOS — the mid-stream table redefinition real
    optimized progressive files carry. restart_interval applies to
    every scan (MCU units for interleaved DC scans, block units for
    the rest), resetting DC predictors and EOB runs."""
    plan = _jpeg_plan(w, h, values, samples, qtable, qtable_chroma, subsample)
    grids, mcus, tclass = plan["grids"], plan["mcus"], plan["tclass"]
    mcus_x, mcus_y = plan["mcus_x"], plan["mcus_y"]
    ri = int(restart_interval or 0)
    if scan_script is None:
        scan_script = (_JPEG_PROG_SCRIPT_COLOR if samples == 3
                       else _JPEG_PROG_SCRIPT_GRAY)

    max_h = max(hi for _qb, _gbw, hi, _vi in grids)
    max_v = max(vi for _qb, _gbw, _hi, vi in grids)

    def _units(comp_idxs: tuple, interleaved: bool) -> list:
        """Scan-order unit list: each unit is a list of (ci, zz)."""
        if interleaved:
            out = []
            for mcu in mcus:
                out.append([(ci, zz) for ci, zz in mcu if ci in comp_idxs])
            return out
        ci = comp_idxs[0]
        qb, gbw, hi, vi = grids[ci]
        cw, ch = -(-(w * hi) // max_h), -(-(h * vi) // max_v)
        cbw, cbh = -(-cw // 8), -(-ch // 8)
        return [[(ci, qb[r * gbw + c].tolist())]
                for r in range(cbh) for c in range(cbw)]

    def _segments(units: list) -> list:
        """Restart segmentation: flat (ci, zz) lists per segment."""
        if not ri:
            return [[b for u in units for b in u]]
        return [[b for u in units[i:i + ri] for b in u]
                for i in range(0, len(units), ri)]

    out = bytearray(b"\xff\xd8")  # SOI
    _jpeg_emit_headers(out, w, h, samples, plan, 0xC2, ri)
    for comp_idxs, ss, se, ah, al in scan_script:
        interleaved = len(comp_idxs) > 1
        segments = _segments(_units(comp_idxs, interleaved))
        dc_scan = ss == 0
        tids = [tclass[ci] for ci in range(samples)]  # class = table id

        def _run(sink: "_JpegScanSink") -> None:
            if dc_scan:
                _enc_dc_scan(sink, segments, ah, al, tids)
            elif ah == 0:
                _enc_ac_first_scan(sink, segments, ss, se, al, 0)
            else:
                _enc_ac_refine_scan(sink, segments, ss, se, al, 0)

        needs_tables = not (dc_scan and ah)  # DC refine is raw bits only
        codes: dict[int, dict] = {}
        if needs_tables:
            freqs: dict[int, dict] = {}
            _run(_JpegScanSink(freqs=freqs))
            cls = 0 if dc_scan else 1
            for tid in sorted(freqs):
                bits, huffval = _build_huffman(freqs[tid])
                out += _jpeg_seg(0xC4, bytes([(cls << 4) | tid]) +
                                 bytes(bits[1:17]) + bytes(huffval))
                codes[tid] = _huff_codes(bits, huffval)
        bw = _JpegBitWriter()
        _run(_JpegScanSink(bw=bw, codes=codes))
        data = bw.flush()
        sos = bytes([len(comp_idxs)])
        for ci in comp_idxs:
            td = tclass[ci] if (dc_scan and not ah) else 0
            sos += bytes([ci + 1, td << 4])  # Ta is always table 0 here
        sos += bytes([ss, se, (ah << 4) | al])
        out += _jpeg_seg(0xDA, sos)
        out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Real DCT JPEG decode, baseline (SOF0/1) AND progressive (SOF2):
    marker walk with mid-stream DQT/DHT/DRI updates, multi-scan
    accumulation into per-component coefficient grids, canonical
    Huffman entropy decode with byte un-stuffing and RSTn restart
    handling (byte re-align + DC-predictor and EOB-run reset). For
    progressive frames all four T.81 Annex G scan kinds are decoded —
    DC first (point transform << Al), DC refinement (one raw bit per
    block), AC first with spectral selection and cross-block EOB runs,
    and AC refinement with correction bits — then the shared tail:
    dequantize, batched IDCT, pixel reconstruction floor(x + 128.5)
    clip [0, 255], chroma upsampling by sample replication (the exact
    inverse of the encoder's box average on grid-aligned constant
    regions), crop, and (for 3 components) the defined YCbCr->RGB
    inverse. Interleaved scans cover the MCU-padded grid; a
    non-interleaved scan covers only its component's own
    ceil(cw/8) x ceil(ch/8) blocks (T.81 A.2), which is how baseline
    multi-scan (one scan per component) decodes through the same loop.
    Returns (w, h, n_components, pixels) with pixels gray w*h or
    interleaved RGB w*h*3. Sampling factors > 2, 12-bit, arithmetic-
    coded, lossless, and hierarchical JPEGs raise NotImplementedError;
    malformed containers raise ValueError."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, "np.ndarray"] = {}
    dc_maps: dict[int, dict] = {}
    ac_maps: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (comp id, qtab id, hi, vi)
    w = h = 0
    restart = 0
    progressive = False
    grids: list[list] = []
    mcus_x = mcus_y = max_h = max_v = 0
    saw_scan = False
    while True:
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG (no EOI)")
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF{marker & 0x0F} not supported")
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment header")
        ln = int.from_bytes(payload[pos + 2:pos + 4], "big")
        seg = payload[pos + 4:pos + 2 + ln]
        if len(seg) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables not supported")
                nat = np.zeros(64, dtype=np.float64)
                nat[_JPEG_ZZ] = list(seg[p + 1:p + 65])
                qtabs[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = [0] + list(seg[p + 1:p + 17])
                nsym = sum(bits)
                huffval = list(seg[p + 17:p + 17 + nsym])
                (ac_maps if tc else dc_maps)[th] = _huff_decode_map(bits, huffval)
                p += 17 + nsym
        elif marker == 0xDD:
            restart = int.from_bytes(seg, "big")
        elif marker in (0xC0, 0xC1, 0xC2):
            if comps:
                raise ValueError("multiple JPEG frames")
            progressive = marker == 0xC2
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit JPEG precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(f"JPEG with {ncomp} components not supported")
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG sampling factors {hi}x{vi} not supported")
                comps.append((cid, tq, hi, vi))
            if w == 0 or h == 0:
                raise ValueError("JPEG frame with zero dimension")
            max_h = max(c[2] for c in comps)
            max_v = max(c[3] for c in comps)
            mcus_x, mcus_y = -(-w // (8 * max_h)), -(-h // (8 * max_v))
            grids = [
                [[0] * 64 for _ in range(mcus_x * hi * mcus_y * vi)]
                for _, _, hi, vi in comps
            ]
        elif marker == 0xDA:
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            pos = _jpeg_decode_scan(
                payload, pos + 2 + ln, seg, comps, grids, dc_maps, ac_maps,
                restart, progressive, w, h, mcus_x, mcus_y, max_h, max_v)
            saw_scan = True
            continue
        pos += 2 + ln
    if not saw_scan:
        raise ValueError("truncated JPEG (no SOS/EOI)")
    planes = []
    for ci, (cid, tq, hi, vi) in enumerate(comps):
        gbw, gbh = mcus_x * hi, mcus_y * vi
        full = _qblocks_to_plane(
            np.asarray(grids[ci], dtype=np.float64), qtabs[tq],
            gbw * 8, gbh * 8)
        cw, ch = -(-w * hi // max_h), -(-h * vi // max_v)
        p = full[:ch, :cw]
        if hi < max_h:
            p = np.repeat(p, max_h // hi, axis=1)
        if vi < max_v:
            p = np.repeat(p, max_v // vi, axis=0)
        planes.append(p[:h, :w])
    if len(comps) == 1:
        return w, h, 1, [int(v) for v in planes[0].reshape(-1)]
    r, g, b = _ycbcr_to_rgb(*planes)
    rgb = np.stack([r, g, b], axis=-1).reshape(-1)
    return w, h, 3, [int(v) for v in rgb]

def generate_media_jpeg(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Media table of GENUINE baseline JPEGs under the exactness
    contract (all-ones quant tables, per-block-constant pixels, so
    decode inverts generation bit-exactly): media_id % 4 == 0 -> small
    grayscale on non-multiple-of-8 dims (edge-padded partial blocks),
    1 -> 4:4:4 color (the defined YCbCr round trip applies), 2 ->
    wider grayscale (longer DC-differential chains), 3 -> 4:2:0 color
    with restart_interval=2 (16x16-aligned constants survive the box
    downsample + replication upsample exactly; RSTn markers + DC
    resets exercised). Block (bx, by) of image i takes digest value
    d[(5 + bx + 2*by) % 32] (gray) or the (d[(bx + 2*by) % 32],
    d[(bx + 2*by + 7) % 32], d[(bx + 2*by + 13) % 32]) RGB triple,
    with the block grid 8x8 for classes 0-2 and 16x16 for class 3."""
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads, metas = [], []
            for i in ids:
                d = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                m = i % 4
                if m == 0:
                    w, h = 9 + i % 8, 9 + i % 6
                elif m == 1:
                    w, h = 8 + i % 9, 8 + i % 5
                elif m == 2:
                    w, h = 17 + i % 8, 10 + i % 6
                else:
                    w, h = 17 + i % 16, 11 + i % 10
                if m in (1, 3):
                    bsz = 16 if m == 3 else 8
                    vals = []
                    for y in range(h):
                        for x in range(w):
                            k = (x // bsz) + 2 * (y // bsz)
                            vals += [d[k % 32], d[(k + 7) % 32], d[(k + 13) % 32]]
                    payloads.append(encode_jpeg(
                        w, h, vals, samples=3,
                        subsample="420" if m == 3 else "444",
                        restart_interval=2 if m == 3 else 0))
                else:
                    vals = [
                        d[(5 + (x // 8) + 2 * (y // 8)) % 32]
                        for y in range(h)
                        for x in range(w)
                    ]
                    payloads.append(encode_jpeg(w, h, vals, samples=1))
                metas.append(("image/jpeg", w, h, None, None, "jpeg"))
            meta_arr = pa.StructArray.from_arrays(
                [
                    pa.array([m[0] for m in metas], pa.string()),
                    pa.array([m[1] for m in metas], pa.int32()),
                    pa.array([m[2] for m in metas], pa.int32()),
                    pa.array([m[3] for m in metas], pa.int32()),
                    pa.array([m[4] for m in metas], pa.int32()),
                    pa.array([m[5] for m in metas], pa.string()),
                ],
                names=[
                    "media_type", "width", "height", "sample_rate",
                    "duration_ms", "codec",
                ],
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(payloads, pa.binary()),
                    meta_arr,
                ],
                ["media_id", "payload", "meta"],
            )

    return spark.range(n).mapInArrow(
        _gen, f"media_id long, payload binary, meta struct<{MEDIA_META_DDL}>"
    )


def generate_media_jpeg_prog(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Media table of GENUINE PROGRESSIVE (SOF2) JPEGs — the same four
    image classes, dims, and digest-derived per-block-constant pixels
    as generate_media_jpeg, encoded through encode_jpeg_progressive's
    libjpeg-shape scan script (spectral selection + successive
    approximation, optimized per-scan DHTs) instead of one baseline
    scan. Because the pixel contract is identical, the SAME relational
    oracle locks this table: any bug in the progressive scan decode
    (point transforms, EOB runs, refinement correction bits, per-scan
    table redefinition, restarts inside progressive scans — classes 2
    and 3 carry restart_interval) hash-fails against it. media_id % 4:
    0 -> small gray non-multiple-of-8; 1 -> 4:4:4 color; 2 -> wide
    gray WITH restart_interval=3; 3 -> 4:2:0 color restart_interval=2."""
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads, metas = [], []
            for i in ids:
                d = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                m = i % 4
                if m == 0:
                    w, h = 9 + i % 8, 9 + i % 6
                elif m == 1:
                    w, h = 8 + i % 9, 8 + i % 5
                elif m == 2:
                    w, h = 17 + i % 8, 10 + i % 6
                else:
                    w, h = 17 + i % 16, 11 + i % 10
                if m in (1, 3):
                    bsz = 16 if m == 3 else 8
                    vals = []
                    for y in range(h):
                        for x in range(w):
                            k = (x // bsz) + 2 * (y // bsz)
                            vals += [d[k % 32], d[(k + 7) % 32], d[(k + 13) % 32]]
                    payloads.append(encode_jpeg_progressive(
                        w, h, vals, samples=3,
                        subsample="420" if m == 3 else "444",
                        restart_interval=2 if m == 3 else 0))
                else:
                    vals = [
                        d[(5 + (x // 8) + 2 * (y // 8)) % 32]
                        for y in range(h)
                        for x in range(w)
                    ]
                    payloads.append(encode_jpeg_progressive(
                        w, h, vals, samples=1,
                        restart_interval=3 if m == 2 else 0))
                metas.append(("image/jpeg", w, h, None, None, "jpeg"))
            meta_arr = pa.StructArray.from_arrays(
                [
                    pa.array([m[0] for m in metas], pa.string()),
                    pa.array([m[1] for m in metas], pa.int32()),
                    pa.array([m[2] for m in metas], pa.int32()),
                    pa.array([m[3] for m in metas], pa.int32()),
                    pa.array([m[4] for m in metas], pa.int32()),
                    pa.array([m[5] for m in metas], pa.string()),
                ],
                names=[
                    "media_type", "width", "height", "sample_rate",
                    "duration_ms", "codec",
                ],
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(payloads, pa.binary()),
                    meta_arr,
                ],
                ["media_id", "payload", "meta"],
            )

    return spark.range(n).mapInArrow(
        _gen, f"media_id long, payload binary, meta struct<{MEDIA_META_DDL}>"
    )


def generate_media_gif(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Media table of GENUINE GIF89a containers: 16-color palettes and
    dims large enough (up to 23x19) that the LZW code width actually
    grows past its initial 5 bits; every fourth image forces mid-stream
    CLEAR codes (clear_every=100) and all carry a comment extension the
    decoder must skip. Palette/index derivation matches the PNG palette
    class — entry k is (d[k], d[(k+11)%32], d[(k+23)%32]), pixel idx
    selects index d[(idx+3)%32] % 16 over sha256(f"{seed}:{media_id}")
    — so the oracle recomputes expected RGB relationally. Every fifth
    image is stored INTERLACED (four-pass row order): the decoded
    pixels are identical, so the same oracle also locks the interlace
    reordering."""
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads, metas = [], []
            for i in ids:
                d = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                w, h = 8 + i % 16, 8 + i % 12
                pal = [(d[k], d[(k + 11) % 32], d[(k + 23) % 32]) for k in range(16)]
                idx = [d[(j + 3) % 32] % 16 for j in range(w * h)]
                payloads.append(
                    encode_gif(
                        w, h, idx, pal,
                        clear_every=100 if i % 4 == 0 else None,
                        comment=b"recon_spark synthetic",
                        interlace=(i % 5 == 2),  # four-pass rows, same pixels
                    )
                )
                metas.append(("image/gif", w, h, None, None, "gif"))
            meta_arr = pa.StructArray.from_arrays(
                [
                    pa.array([m[0] for m in metas], pa.string()),
                    pa.array([m[1] for m in metas], pa.int32()),
                    pa.array([m[2] for m in metas], pa.int32()),
                    pa.array([m[3] for m in metas], pa.int32()),
                    pa.array([m[4] for m in metas], pa.int32()),
                    pa.array([m[5] for m in metas], pa.string()),
                ],
                names=["media_type", "width", "height", "sample_rate", "duration_ms", "codec"],
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary()), meta_arr],
                ["media_id", "payload", "meta"],
            )

    return spark.range(0, n).mapInArrow(
        _gen, f"media_id long, payload binary, meta struct<{MEDIA_META_DDL}>"
    )


def generate_media_gif_anim(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Media table of GENUINE ANIMATED GIF89a containers: 2 + i%3
    frames on a (10 + i%8) x (9 + i%6) canvas, frame f drawing the
    inset rect (left, top, fw, fh) = (f, f, w-2f, h-2f) with delay
    4 + 3f centiseconds, odd frames stored interlaced (same pixels),
    NETSCAPE loop extension i%3. Palette entry k is (d[k], d[(k+11)%32],
    d[(k+23)%32]) over sha256(f"{seed}:{media_id}"); pixel j of frame f
    selects index d[(j + 3 + 5f) % 32] % 16 — every quantity a
    relational oracle can recompute without a codec."""
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads, metas = [], []
            for i in ids:
                d = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                w, h = 10 + i % 8, 9 + i % 6
                pal = [(d[k], d[(k + 11) % 32], d[(k + 23) % 32]) for k in range(16)]
                frames = []
                for f in range(2 + i % 3):
                    fw, fh = w - 2 * f, h - 2 * f
                    idx = [d[(j + 3 + 5 * f) % 32] % 16 for j in range(fw * fh)]
                    frames.append(
                        (f, f, fw, fh, idx, 4 + 3 * f, None, f % 2 == 1, None))
                payloads.append(
                    encode_gif_animation(w, h, frames, pal, loop=i % 3))
                metas.append(("image/gif", w, h, None, None, "gif"))
            meta_arr = pa.StructArray.from_arrays(
                [
                    pa.array([m[0] for m in metas], pa.string()),
                    pa.array([m[1] for m in metas], pa.int32()),
                    pa.array([m[2] for m in metas], pa.int32()),
                    pa.array([m[3] for m in metas], pa.int32()),
                    pa.array([m[4] for m in metas], pa.int32()),
                    pa.array([m[5] for m in metas], pa.string()),
                ],
                names=["media_type", "width", "height", "sample_rate", "duration_ms", "codec"],
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary()), meta_arr],
                ["media_id", "payload", "meta"],
            )

    return spark.range(0, n).mapInArrow(
        _gen, f"media_id long, payload binary, meta struct<{MEDIA_META_DDL}>"
    )


def generate_media_tiff(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Media table of GENUINE baseline TIFFs covering the three
    baseline compressions AND both layouts: media_id % 3 == 0 → RGB +
    LZW + horizontal-differencing predictor (multi-strip; every OTHER
    one of these is PlanarConfiguration=2 with separate component
    planes, decoding to identical pixels), 1 → RGB +
    PackBits in the TILED layout (8x8 tiles over 4-11 x 4-9 images, so
    every container has right/bottom edge tiles whose padding the
    decoder must discard), 2 → 8-bit gray uncompressed split across
    multiple strips. The decoded pixels are identical to the strip
    form, so the same relational DuckDB oracle verifies the tile
    reassembly. RGB values follow the generate_media_real derivation
    (d[idx%32], d[(idx+7)%32], d[(idx+13)%32]); gray pixel idx is
    d[(idx+5)%32]."""
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads, metas = [], []
            for i in ids:
                d = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                w, h = 4 + i % 8, 4 + i % 6
                if i % 3 == 2:
                    vals = [d[(idx + 5) % 32] for idx in range(w * h)]
                    payloads.append(
                        encode_tiff(w, h, vals, samples=1, compression=1,
                                    rows_per_strip=2)
                    )
                else:
                    vals = []
                    for idx in range(w * h):
                        vals += [d[idx % 32], d[(idx + 7) % 32], d[(idx + 13) % 32]]
                    if i % 3 == 0:
                        # every other LZW-class container is written
                        # PlanarConfiguration=2 (separate component
                        # planes, predictor per plane) — decoded pixels
                        # are identical to the chunky twin, so the SAME
                        # relational oracle locks the plane reassembly
                        enc = encode_tiff_planar if i % 6 == 0 else encode_tiff
                        payloads.append(
                            enc(w, h, vals, samples=3, compression=5,
                                predictor=2, rows_per_strip=3)
                        )
                    else:
                        payloads.append(
                            encode_tiff_tiled(w, h, vals, samples=3,
                                              compression=32773,
                                              tile_w=8, tile_h=8)
                        )
                metas.append(("image/tiff", w, h, None, None, "tiff"))
            meta_arr = pa.StructArray.from_arrays(
                [
                    pa.array([m[0] for m in metas], pa.string()),
                    pa.array([m[1] for m in metas], pa.int32()),
                    pa.array([m[2] for m in metas], pa.int32()),
                    pa.array([m[3] for m in metas], pa.int32()),
                    pa.array([m[4] for m in metas], pa.int32()),
                    pa.array([m[5] for m in metas], pa.string()),
                ],
                names=["media_type", "width", "height", "sample_rate", "duration_ms", "codec"],
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary()), meta_arr],
                ["media_id", "payload", "meta"],
            )

    return spark.range(0, n).mapInArrow(
        _gen, f"media_id long, payload binary, meta struct<{MEDIA_META_DDL}>"
    )


def generate_media_g711(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Media table of GENUINE G.711 WAV containers (format code 7 µ-law
    for even media_id, 6 A-law for odd): ns = 40 + id % 32 companded
    bytes, byte j = d[(j + 11) % 32] of the track's sha256 digest, at
    8 kHz (the G.711 native rate). The decoded linear samples are the
    closed-form segment expansion of those bytes — SQL-replicable, so
    the oracle verifies the expansion arithmetic relationally."""
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads, metas = [], []
            for i in ids:
                d = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                ns = 40 + i % 32
                law = "ulaw" if i % 2 == 0 else "alaw"
                data = bytes(d[(j + 11) % 32] for j in range(ns))
                payloads.append(encode_wav_g711(8000, data, law))
                metas.append(("audio/basic", None, None, 8000,
                              ns * 1000 // 8000, law))
            meta_arr = pa.StructArray.from_arrays(
                [
                    pa.array([m[0] for m in metas], pa.string()),
                    pa.array([m[1] for m in metas], pa.int32()),
                    pa.array([m[2] for m in metas], pa.int32()),
                    pa.array([m[3] for m in metas], pa.int32()),
                    pa.array([m[4] for m in metas], pa.int32()),
                    pa.array([m[5] for m in metas], pa.string()),
                ],
                names=["media_type", "width", "height", "sample_rate", "duration_ms", "codec"],
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary()), meta_arr],
                ["media_id", "payload", "meta"],
            )

    return spark.range(0, n).mapInArrow(
        _gen, f"media_id long, payload binary, meta struct<{MEDIA_META_DDL}>"
    )


def generate_media_png(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Media table of GENUINE PNG containers covering the three common
    color classes — media_id % 3 == 0 → truecolor RGB (type 2), 1 →
    RGBA (type 6), 2 → 16-entry indexed palette (type 3) — with the
    per-row filter type cycling ``(row + media_id) % 5`` so all five
    filters appear, the deflate stream split across multiple IDAT
    chunks, and a tEXt ancillary chunk the decoder must skip. Channel
    values are the same sha256(f"{seed}:{media_id}") derivation as
    generate_media_real: pixel idx has RGB (d[idx%32], d[(idx+7)%32],
    d[(idx+13)%32]), RGBA adds alpha d[(idx+19)%32]; palette entry k is
    (d[k], d[(k+11)%32], d[(k+23)%32]) and pixel idx selects index
    d[(idx+3)%32] % 16 — all recomputable relationally by the oracle.
    Every fifth image is stored ADAM7-INTERLACED, and every other
    palette image is stored at depth 4 (two indices per packed byte):
    decoded pixels are identical in both cases, so the same oracle
    also locks the seven-pass scatter AND the sub-byte unpacking."""
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads, metas = [], []
            for i in ids:
                d = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                w, h = 2 + i % 6, 2 + i % 5
                filters = [(y + i) % 5 for y in range(h)]
                text = (b"tEXt", b"Software\x00recon_spark")
                if i % 3 == 0:
                    vals = []
                    for idx in range(w * h):
                        vals += [d[idx % 32], d[(idx + 7) % 32], d[(idx + 13) % 32]]
                    payloads.append(
                        encode_png(w, h, vals, color_type=2, filters=filters,
                                   ancillary=(text,), interlace=(i % 5 == 2))
                    )
                elif i % 3 == 1:
                    vals = []
                    for idx in range(w * h):
                        vals += [
                            d[idx % 32],
                            d[(idx + 7) % 32],
                            d[(idx + 13) % 32],
                            d[(idx + 19) % 32],
                        ]
                    payloads.append(
                        encode_png(w, h, vals, color_type=6, filters=filters,
                                   ancillary=(text,), interlace=(i % 5 == 2))
                    )
                else:
                    pal = [(d[k], d[(k + 11) % 32], d[(k + 23) % 32]) for k in range(16)]
                    vals = [d[(idx + 3) % 32] % 16 for idx in range(w * h)]
                    payloads.append(
                        encode_png(
                            w, h, vals, color_type=3, palette=pal, filters=filters,
                            ancillary=(text,), interlace=(i % 5 == 2),
                            depth=(4 if i % 2 == 0 else 8),
                        )
                    )
                metas.append(("image/png", w, h, None, None, "png"))
            meta_arr = pa.StructArray.from_arrays(
                [
                    pa.array([m[0] for m in metas], pa.string()),
                    pa.array([m[1] for m in metas], pa.int32()),
                    pa.array([m[2] for m in metas], pa.int32()),
                    pa.array([m[3] for m in metas], pa.int32()),
                    pa.array([m[4] for m in metas], pa.int32()),
                    pa.array([m[5] for m in metas], pa.string()),
                ],
                names=["media_type", "width", "height", "sample_rate", "duration_ms", "codec"],
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary()), meta_arr],
                ["media_id", "payload", "meta"],
            )

    return spark.range(0, n).mapInArrow(
        _gen, f"media_id long, payload binary, meta struct<{MEDIA_META_DDL}>"
    )


def _decode_dims(meta: dict, fake: bool) -> tuple[int, int]:
    """The (w, h) layout of decode_image's output: the fake decoder
    collapses dims to small values; a real codec returns true metadata
    dims. Single source of truth — resize_image must index with the
    SAME dims the decoder laid pixels out with."""
    if fake:
        return (meta.get("width") or 8) % 8 + 1, (meta.get("height") or 8) % 8 + 1
    return meta["width"], meta["height"]


def decode_image(payload: bytes, meta: dict, fake: bool = False) -> list[int]:
    """Decode an image payload to a flat pixel list. BMP, binary PPM,
    PNG, GIF, baseline TIFF, and JPEG (baseline, multi-scan baseline,
    and progressive) decode FOR REAL via
    stdlib parsing (top-down row-major channel values; RGB formats
    give len = w*h*3, RGBA PNG w*h*4, palette PNG/GIF de-palettized to
    w*h*3, gray JPEG/TIFF w*h); formats whose codecs are not
    stdlib-implementable (WebP/HEIC-class) keep the honest gate, with
    fake=True selecting the deterministic test decoder."""
    if not fake:
        if payload[:2] == b"BM":
            return decode_bmp(payload)[2]
        if payload[:2] == b"P6":
            return decode_ppm(payload)[2]
        if payload[:8] == PNG_SIG:
            return decode_png(payload)[3]
        if payload[:6] in GIF_SIGS:
            return decode_gif(payload)[2]
        if payload[:4] in TIFF_SIGS:
            return decode_tiff(payload)[3]
        if payload[:2] == JPEG_SIG:
            return decode_jpeg(payload)[3]
        raise NotImplementedError(
            "image format not decodable with the stdlib (WebP/HEIC-class "
            "need a codec library); run with fake=True for the "
            "deterministic test decoder"
        )
    w, h = _decode_dims(meta, fake=True)
    # fake "pixels" are seeded by sha256 over the payload's hex form —
    # equally deterministic, and expressible in ANSI SQL (DuckDB's
    # sha256 takes VARCHAR only), so the driver oracle can replicate
    # the whole decode→pool pipeline exactly
    digest = hashlib.sha256(payload.hex().encode()).digest()
    return [digest[(x * h + y) % 32] for x in range(w) for y in range(h)]


def synth_crawl_image(i: int) -> tuple[bytes, str]:
    """Deterministic genuine image payload + Content-Type for media id
    ``i`` — the single construction both WARC media stagings in
    queries/extra.py (clean and corrupt) encode and both DuckDB oracles
    replicate arithmetically via ``_sql_media_px_parts``. Lives HERE (not in queries/) because
    executor closures capture it by reference: queries.extra has
    import-time oracle construction that cannot run inside a shipped
    --py-files zip, while this module is executor-import-safe."""
    import hashlib

    from recon_spark.operators.multimodal import (
        encode_bmp,
        encode_gif,
        encode_jpeg,
        encode_png,
    )

    d = hashlib.sha256(f"42:{i}".encode()).digest()
    m = i % 4
    if m in (0, 1):
        w, h = 2 + i % 6, 2 + i % 5
        vals = []
        for idx in range(w * h):
            vals += [d[idx % 32], d[(idx + 7) % 32], d[(idx + 13) % 32]]
        if m == 0:
            return encode_bmp(w, h, vals), "image/bmp"
        return (
            encode_png(w, h, vals, color_type=2, interlace=(i % 2 == 1)),
            "image/png",
        )
    if m == 2:
        w, h = 8 + i % 16, 8 + i % 12
        pal = [(d[k], d[(k + 11) % 32], d[(k + 23) % 32]) for k in range(16)]
        idxs = [d[(j + 3) % 32] % 16 for j in range(w * h)]
        return encode_gif(w, h, idxs, pal, interlace=(i % 2 == 1)), "image/gif"
    w, h = 9 + i % 8, 9 + i % 6
    vals = [d[(5 + (x // 8) + 2 * (y // 8)) % 32] for y in range(h) for x in range(w)]
    return encode_jpeg(w, h, vals), "image/jpeg"


def decode_image_safe(
    payload: bytes, meta: dict, fake: bool = False
) -> tuple[str, list[int]]:
    """Row-level quarantine wrapper around decode_image for raw-crawl
    inputs. At crawl scale some fraction of image records is ALWAYS
    truncated, mis-labeled, or bit-rotted; a decoder that raises out of
    a mapInArrow batch fails the whole task (and, after four retries,
    the whole 100TB job). This wrapper turns per-record failure into
    data: returns (status, pixels) where status is

      - "ok"          — decoded; pixels as decode_image
      - "unsupported" — honest capability gate (NotImplementedError:
                        WebP/HEIC-class formats with no stdlib codec)
      - "corrupt"     — the container matched a real decoder but the
                        payload is malformed (truncation, bad CRC, bad
                        Huffman stream, ...). Decoders raise a mix of
                        ValueError / struct.error / zlib.error /
                        IndexError depending on where parsing dies, so
                        everything non-gate is classed together.

    Pixels are [] for both non-ok classes. The status column is what a
    curation pipeline groups on to quarantine + audit bad records
    without losing the partition."""
    try:
        return "ok", decode_image(payload, meta, fake=fake)
    except NotImplementedError:
        return "unsupported", []
    except Exception:
        return "corrupt", []


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    meta_col: str = "meta",
    fake: bool = True,
    n_features: int = 8,
) -> DataFrame:
    """Arrow-batched feature extraction over image rows: filters to
    image media (metadata-only predicate — the binary column is not
    touched for non-image rows thanks to column pruning), decodes per
    batch, emits fixed-width feature vectors."""
    import numpy as np
    import pyarrow as pa

    out_ddl = f"media_id long, features array<double>"

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            metas = batch.column(meta_col).to_pylist()
            feats = []
            for p, m in zip(payloads, metas):
                px = np.asarray(decode_image(p, m, fake=fake), dtype=np.float64)
                # fixed-width pooled features: mean over n_features chunks
                chunks = np.array_split(px, n_features)
                feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(feats, pa.list_(pa.float64()))],
                ["media_id", "features"],
            )

    images = df.where(F.col(f"{meta_col}.media_type").startswith("image/"))
    return images.select("media_id", payload_col, meta_col).mapInArrow(_gen, out_ddl)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    meta_col: str = "meta",
) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_ts_ms)
    rows — pure JVM (sequence over duration), the decode of each frame
    being a downstream stubbed step. Shape: one-to-many, no Python."""
    videos = df.where(F.col(f"{meta_col}.media_type").startswith("video/"))
    return videos.select(
        "media_id",
        F.explode(
            F.expr(f"sequence(0, {meta_col}.duration_ms, {every_ms})")
        ).alias("frame_ts_ms"),
    )


def resize_image(
    df: DataFrame,
    target_w: int = 4,
    target_h: int = 4,
    payload_col: str = "payload",
    meta_col: str = "meta",
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched nearest-neighbor resize over image rows:
    (media_id, pixels ARRAY<INT>) of exactly target_w*target_h values.
    Source pixel for output (x, y) is (x*w // tw, y*h // th) — integer
    arithmetic only, so the DuckDB oracle replicates the fake-decode →
    resize pipeline exactly. Real decoding stays behind the same codec
    stub as decode_image."""
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            metas = batch.column(meta_col).to_pylist()
            out = []
            for p, m in zip(payloads, metas):
                px = decode_image(p, m, fake=fake)
                w, h = _decode_dims(m, fake=fake)  # dims the decoder used
                out.append(
                    [
                        px[(x * w // target_w) * h + (y * h // target_h)]
                        for x in range(target_w)
                        for y in range(target_h)
                    ]
                )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(out, pa.list_(pa.int32()))],
                ["media_id", "pixels"],
            )

    images = df.where(F.col(f"{meta_col}.media_type").startswith("image/"))
    return images.select("media_id", payload_col, meta_col).mapInArrow(
        _gen, "media_id long, pixels array<int>"
    )


def decode_audio(payload: bytes, meta: dict, fake: bool = False, max_samples: int = 1024) -> list[int]:
    """Decode an audio payload to signed samples. WAV containers decode
    FOR REAL — PCM16 via the stdlib ``wave`` module, G.711 µ-law/A-law
    (format codes 7/6) via the closed-form ITU-T segment expansion;
    perceptual formats (MP3/AAC) still need a codec library and keep
    the honest gate. The
    fake decoder strides the first ``max_samples`` of the track
    (sample j = digest[j % 32] - 128), deterministic and
    SQL-replicable."""
    if not fake:
        if payload[:4] == b"RIFF":
            return decode_wav(payload)[1][:max_samples]
        raise NotImplementedError(
            "non-WAV audio decoding requires a codec library (e.g. "
            "soundfile); run with fake=True for the deterministic test decoder"
        )
    sr = meta.get("sample_rate") or 16000
    dur = meta.get("duration_ms") or 0
    ns = min(max_samples, sr * dur // 1000)
    digest = hashlib.sha256(payload.hex().encode()).digest()
    return [digest[j % 32] - 128 for j in range(ns)]


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    meta_col: str = "meta",
    fake: bool = True,
    n_windows: int = 4,
) -> DataFrame:
    """Arrow-batched audio features: filters to audio media (metadata
    predicate), decodes per batch (strided stub), emits mean-absolute
    energy per time window — the framing/windowing plumbing a real
    fbank/MFCC extractor slots into."""
    import numpy as np
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            metas = batch.column(meta_col).to_pylist()
            feats = []
            for p, m in zip(payloads, metas):
                s = np.asarray(decode_audio(p, m, fake=fake), dtype=np.float64)
                wins = np.array_split(np.abs(s), n_windows)
                feats.append([float(w.mean()) if len(w) else 0.0 for w in wins])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(feats, pa.list_(pa.float64()))],
                ["media_id", "features"],
            )

    audio = df.where(F.col(f"{meta_col}.media_type").startswith("audio/"))
    return audio.select("media_id", payload_col, meta_col).mapInArrow(
        _gen, "media_id long, features array<double>"
    )
