"""Header-only media probe — the pre-decode triage pass of a 100 TB
crawl pipeline.

Decoding every media payload in a crawl shard is the single most
expensive Python stage in this repo (the media-decode scaling studies
in BENCH/BASELINE.md time it); real pipelines never decode blind.
They PROBE first: a few hundred header bytes per payload yield format,
dimensions, sample rate, frame/page counts and a duration estimate,
and only rows passing triage (right format, sane dims, wanted
duration) are routed to the decode stage. ``probe_media`` is that
pass: it never touches entropy-coded data —

- BMP / binary PPM: fixed header fields
- PNG: the IHDR chunk only (dims, depth, color type, Adam7 flag)
- GIF: logical-screen descriptor + a STRUCTURAL block walk (extension
  and image-data sub-blocks are hopped by their length bytes — no LZW
  work) counting image descriptors, so animations report frame counts
- TIFF: the IFD chain walked in both byte orders (dims/bps/samples
  tags only, next-IFD pointers with the same cycle guard the decoder
  uses) — page count without touching a strip
- JPEG: the marker walk to SOF0/SOF2 (dims, components, progressive
  flag) — stops before the scan, zero Huffman work
- WAV (PCM16 + G.711): RIFF chunk walk, fmt + data sizes
- FLAC: STREAMINFO only (rate, depth, channels, total samples)
- MP3 (MPEG-1 Layer III): ID3v2 skip (syncsafe size) + the per-frame
  HEADER walk — each frame is hopped by its computed byte length
  (144 * bitrate / rate + padding), so frame count and duration come
  out of a format whose full DECODE genuinely needs a codec wheel and
  stays behind the honest NotImplementedError gate in multimodal.py.
  This is the real-world shape of MP3 handling in curation pipelines:
  duration/bitrate triage without synthesis.

``generate_media_probe`` emits a mixed shard of all eight classes with
closed-form per-id parameters, so the DuckDB oracle recomputes every
probed field arithmetically. The MP3 containers are spec-valid frame
SEQUENCES (correct sync/version/layer/bitrate/rate/padding headers,
digest filler payload — a conformant parser walks them; only the
audio content is meaningless, which the probe never looks at).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from recon_spark.operators.multimodal import (
    GIF_SIGS,
    JPEG_SIG,
    PNG_SIG,
    TIFF_SIGS,
    _riff_chunks,
)

# MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 and 15 invalid
_MP3_BITRATES = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)  # sample-rate index 0..2 (3 reserved)
_MP3_SAMPLES_PER_FRAME = 1152


def _empty() -> dict:
    return {"format": "unknown", "variant": "", "width": 0, "height": 0,
            "sample_rate": 0, "channels": 0, "bps": 0, "n_frames": 0,
            "duration_ms": 0, "bitrate_kbps": 0}


# ----------------------------------------------------------------- images

def _probe_bmp(p: bytes) -> dict:
    if len(p) < 30:
        raise ValueError("bmp: truncated header")
    w, h = struct.unpack_from("<ii", p, 18)
    bpp = struct.unpack_from("<H", p, 28)[0]
    out = _empty()
    out.update(format="bmp", width=w, height=abs(h), channels=bpp // 8,
               bps=8, n_frames=1)
    return out


def _probe_ppm(p: bytes) -> dict:
    toks, i, tok = [], 2, b""
    while len(toks) < 3 and i < len(p):
        c = p[i:i + 1]
        if c.isspace():
            if tok:
                toks.append(tok)
                tok = b""
        else:
            tok += c
        i += 1
    if len(toks) < 3:
        raise ValueError("ppm: truncated header")
    out = _empty()
    out.update(format="ppm", width=int(toks[0]), height=int(toks[1]),
               channels=3, bps=8, n_frames=1)
    return out


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _probe_png(p: bytes) -> dict:
    if p[12:16] != b"IHDR" or struct.unpack_from(">I", p, 8)[0] != 13:
        raise ValueError("png: first chunk is not a 13-byte IHDR")
    w, h = struct.unpack_from(">II", p, 16)
    depth, ctype, _, _, interlace = p[24:29]
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"png: bad color type {ctype}")
    out = _empty()
    out.update(format="png", variant="adam7" if interlace == 1 else "",
               width=w, height=h, channels=_PNG_CHANNELS[ctype],
               bps=depth, n_frames=1)
    return out


def _probe_gif(p: bytes) -> dict:
    w, h = struct.unpack_from("<HH", p, 6)
    flags = p[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x07))

    def _skip_subblocks(at: int) -> int:
        while True:
            if at >= len(p):
                raise ValueError("gif: truncated sub-blocks")
            n = p[at]
            at += 1 + n
            if n == 0:
                return at

    frames = 0
    while True:
        if pos >= len(p):
            raise ValueError("gif: missing trailer")
        b = p[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos = _skip_subblocks(pos + 2)
        elif b == 0x2C:  # image descriptor
            frames += 1
            lflags = p[pos + 9]
            pos += 10
            if lflags & 0x80:
                pos += 3 * (2 << (lflags & 0x07))
            pos = _skip_subblocks(pos + 1)  # LZW min-code byte, then data
        else:
            raise ValueError(f"gif: unknown block 0x{b:02x}")
    out = _empty()
    out.update(format="gif", variant="animated" if frames > 1 else "",
               width=w, height=h, channels=3, bps=8, n_frames=frames)
    return out


def _probe_tiff(p: bytes) -> dict:
    bo = "<" if p[:2] == b"II" else ">"
    off = struct.unpack_from(bo + "I", p, 4)[0]
    seen: set[int] = set()
    pages = 0
    first: dict | None = None
    while off:
        if off in seen or len(seen) > 10_000:
            raise ValueError("tiff: cyclic IFD chain")
        seen.add(off)
        n = struct.unpack_from(bo + "H", p, off)[0]
        tags: dict[int, int] = {}
        for k in range(n):
            at = off + 2 + 12 * k
            tag, typ, cnt = struct.unpack_from(bo + "HHI", p, at)
            if cnt == 1 and typ == 3:  # SHORT inline
                tags[tag] = struct.unpack_from(bo + "H", p, at + 8)[0]
            elif cnt == 1 and typ == 4:  # LONG inline
                tags[tag] = struct.unpack_from(bo + "I", p, at + 8)[0]
        pages += 1
        if first is None:
            first = {"width": tags.get(256, 0), "height": tags.get(257, 0),
                     "channels": tags.get(277, 1), "bps": tags.get(258, 8)}
        off = struct.unpack_from(bo + "I", p, off + 2 + 12 * n)[0]
    if first is None:
        raise ValueError("tiff: no IFD")
    out = _empty()
    out.update(format="tiff", variant="multipage" if pages > 1 else "",
               n_frames=pages, **first)
    return out


def _probe_jpeg(p: bytes) -> dict:
    pos = 2
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            raise ValueError("jpeg: lost marker sync")
        m = p[pos + 1]
        if m == 0xFF:  # fill byte
            pos += 1
            continue
        if m in (0x01, 0xD8) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack_from(">H", p, pos + 2)[0]
        if m in (0xC0, 0xC1, 0xC2):  # SOF0 / extended-seq / SOF2
            prec = p[pos + 4]
            h, w = struct.unpack_from(">HH", p, pos + 5)
            ncomp = p[pos + 9]
            out = _empty()
            out.update(format="jpeg",
                       variant="sof2" if m == 0xC2 else "sof0",
                       width=w, height=h, channels=ncomp, bps=prec,
                       n_frames=1)
            return out
        if m == 0xDA:  # SOS before any SOF: malformed
            break
        pos += 2 + seglen
    raise ValueError("jpeg: no SOF marker before scan/EOF")


# ----------------------------------------------------------------- audio

def _probe_wav(p: bytes) -> dict:
    fmt = data_size = None
    for cid, body in _riff_chunks(p):
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data_size = len(body)
    if fmt is None or data_size is None:
        raise ValueError("wav: missing fmt or data chunk")
    code, ch, sr = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    variant = {1: "pcm16", 7: "ulaw", 6: "alaw"}.get(code)
    if variant is None:
        raise ValueError(f"wav: unsupported format code {code}")
    nsamp = data_size // (max(bits, 8) // 8) // ch
    out = _empty()
    out.update(format="wav", variant=variant, sample_rate=sr, channels=ch,
               bps=bits, n_frames=nsamp,
               duration_ms=nsamp * 1000 // sr)
    return out


def _probe_flac(p: bytes) -> dict:
    from recon_spark.operators.flac import parse_streaminfo

    info = parse_streaminfo(p)  # metadata blocks only — no frame decode
    out = _empty()
    out.update(format="flac", sample_rate=info["sample_rate"],
               channels=info["channels"], bps=info["bps"],
               n_frames=info["total_samples"],
               duration_ms=info["total_samples"] * 1000
               // info["sample_rate"])
    return out


def _probe_mp3(p: bytes) -> dict:
    pos = 0
    if p[:3] == b"ID3":
        # syncsafe 28-bit size, header itself is 10 bytes
        sz = 0
        for b in p[6:10]:
            if b & 0x80:
                raise ValueError("mp3: bad syncsafe ID3 size")
            sz = (sz << 7) | b
        pos = 10 + sz
    frames = 0
    sr = br = channels = None
    while pos < len(p):
        if pos + 4 > len(p):
            raise ValueError("mp3: truncated frame header")
        h = struct.unpack_from(">I", p, pos)[0]
        if h >> 21 != 0x7FF:
            raise ValueError("mp3: lost frame sync")
        version = (h >> 19) & 3
        layer = (h >> 17) & 3
        if version != 3 or layer != 1:
            raise ValueError("mp3: only MPEG-1 Layer III probed")
        bidx = (h >> 12) & 0xF
        ridx = (h >> 10) & 3
        if bidx in (0, 15) or ridx == 3:
            raise ValueError("mp3: invalid bitrate/rate index")
        pad = (h >> 9) & 1
        mode = (h >> 6) & 3
        f_sr = _MP3_RATES[ridx]
        f_br = _MP3_BITRATES[bidx] * 1000
        if sr is None:
            sr, br, channels = f_sr, f_br, (1 if mode == 3 else 2)
        flen = 144 * f_br // f_sr + pad
        frames += 1
        pos += flen
    if pos != len(p) or frames == 0:
        raise ValueError("mp3: frame walk did not land on EOF")
    out = _empty()
    out.update(format="mp3", variant="mpeg1l3", sample_rate=sr,
               channels=channels, bps=0, n_frames=frames,
               duration_ms=frames * _MP3_SAMPLES_PER_FRAME * 1000 // sr,
               bitrate_kbps=br // 1000)
    return out


def _probe_ogg(p: bytes) -> dict:
    """Ogg-FLAC: reassemble only the FIRST packet (the mapping header,
    which embeds the native STREAMINFO) — audio pages never parsed."""
    from recon_spark.operators.ogg import ogg_packets

    _, first = next(iter(ogg_packets(p)))
    if first[:5] != b"\x7fFLAC":
        raise ValueError("ogg: first packet is not a FLAC mapping "
                         "(other Ogg codecs not probed)")
    out = _probe_flac(first[9:])
    out["format"] = "ogg"
    out["variant"] = "flac"
    return out


def _probe_avi(p: bytes) -> dict:
    """MJPEG AVI: avih/strh headers only — no frame decode."""
    from recon_spark.operators.video import parse_avi_header

    hdr = parse_avi_header(p)
    out = _empty()
    out.update(format="avi", variant=hdr["handler"].lower().strip(),
               width=hdr["width"], height=hdr["height"], channels=3,
               bps=8, n_frames=hdr["n_frames"],
               duration_ms=hdr["duration_ms"])
    return out


def probe_media(payload: bytes) -> dict:
    """Signature-dispatch header probe (see module docstring). Returns
    {format, variant, width, height, sample_rate, channels, bps,
    n_frames, duration_ms} with 0/'' where a field doesn't apply;
    raises ValueError on structurally corrupt or unrecognized bytes
    (``probe_media_safe`` is the triage wrapper)."""
    if payload[:2] == b"BM":
        return _probe_bmp(payload)
    if payload[:2] == b"P6":
        return _probe_ppm(payload)
    if payload[:8] == PNG_SIG:
        return _probe_png(payload)
    if payload[:6] in GIF_SIGS:
        return _probe_gif(payload)
    if payload[:4] in TIFF_SIGS:
        return _probe_tiff(payload)
    if payload[:2] == JPEG_SIG:
        return _probe_jpeg(payload)
    if payload[:4] == b"RIFF":
        if payload[8:12] == b"AVI ":
            return _probe_avi(payload)
        return _probe_wav(payload)
    if payload[:4] == b"fLaC":
        return _probe_flac(payload)
    if payload[:4] == b"OggS":
        return _probe_ogg(payload)
    if payload[:3] == b"ID3" or (
        len(payload) >= 2 and payload[0] == 0xFF and payload[1] >> 5 == 7
    ):
        return _probe_mp3(payload)
    raise ValueError("unrecognized media signature")


def probe_media_safe(payload: bytes) -> dict:
    """Triage wrapper: corrupt/unknown bytes become a status, never a
    task failure (the decode_image_safe policy)."""
    try:
        out = probe_media(payload)
        out["status"] = "ok"
        return out
    except (ValueError, struct.error, IndexError) as e:
        out = _empty()
        out["status"] = f"corrupt:{e}" if "unrecognized" not in str(e) else "unknown"
        return out


# ------------------------------------------------------------- generators

def encode_id3v2(frames: list[tuple[str, str]],
                 utf16_ids: tuple[str, ...] = ()) -> bytes:
    """Real ID3v2.3 tag: 10-byte header (syncsafe size) + text frames
    (4-byte id, BE32 size, 2 flag bytes, encoding byte 0 = latin-1 or
    1 = UTF-16 with BOM, then the text). ``utf16_ids`` selects which
    frame ids are stored UTF-16 so both encodings appear in fixtures."""
    body = bytearray()
    for fid, text in frames:
        if fid in utf16_ids:
            payload = b"\x01" + text.encode("utf-16")  # BOM included
        else:
            payload = b"\x00" + text.encode("latin-1")
        body += fid.encode("ascii") + struct.pack(">I", len(payload))
        body += b"\x00\x00" + payload
    sz = len(body)
    if sz >= 1 << 28:
        raise ValueError("id3: tag too large for syncsafe size")
    return (b"ID3\x03\x00\x00"
            + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                     (sz >> 7) & 0x7F, sz & 0x7F])
            + bytes(body))


def parse_id3v2(p: bytes) -> dict[str, str]:
    """Text frames of an ID3v2.3 tag -> {frame_id: text}. Handles both
    text encodings (0 latin-1, 1 UTF-16/BOM), stops at zero padding,
    skips non-text frames. Returns {} when no tag is present."""
    if p[:3] != b"ID3":
        return {}
    if p[3] != 3:
        raise ValueError(f"id3: unsupported major version {p[3]}")
    sz = 0
    for b in p[6:10]:
        if b & 0x80:
            raise ValueError("id3: bad syncsafe size")
        sz = (sz << 7) | b
    out: dict[str, str] = {}
    pos, end = 10, 10 + sz
    while pos + 10 <= end:
        fid = p[pos:pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # zero padding
        flen = struct.unpack_from(">I", p, pos + 4)[0]
        payload = p[pos + 10:pos + 10 + flen]
        if len(payload) != flen:
            raise ValueError("id3: truncated frame")
        if fid[:1] == b"T" and flen >= 1:
            enc, text = payload[0], payload[1:]
            if enc == 0:
                out[fid.decode("ascii")] = text.decode("latin-1")
            elif enc == 1:
                out[fid.decode("ascii")] = text.decode("utf-16")
            # other encodings (v2.4 utf-8 etc.) skipped, not errors
        pos += 10 + flen
    return out


def encode_mp3_frames(n_frames: int, bitrate_kbps: int, sample_rate: int,
                      seed_tag: bytes, id3: bool = False,
                      mode_mono: bool = False,
                      id3_frames: list[tuple[str, str]] | None = None,
                      utf16_ids: tuple[str, ...] = ()) -> bytes:
    """Spec-valid MPEG-1 Layer III frame sequence: correct per-frame
    headers (sync/version/layer/bitrate/rate/alternating padding) and
    digest filler for the audio payload — a conformant parser walks it;
    the probe never reads past the headers. ``id3_frames`` prepends a
    REAL ID3v2.3 tag with the given text frames; bare ``id3=True``
    keeps the legacy opaque-filler tag (the skip path)."""
    bidx = _MP3_BITRATES.index(bitrate_kbps)
    ridx = _MP3_RATES.index(sample_rate)
    out = bytearray()
    if id3_frames is not None:
        out += encode_id3v2(id3_frames, utf16_ids)
    elif id3:
        tag = hashlib.sha256(seed_tag + b":id3").digest()
        sz = 20 + tag[0] % 40
        body = (tag * (sz // 32 + 1))[:sz]
        out += b"ID3\x03\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F,
             sz & 0x7F]) + body
    for f in range(n_frames):
        pad = f % 2
        h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
        h |= (bidx << 12) | (ridx << 10) | (pad << 9)
        h |= ((3 if mode_mono else 1) << 6) | (1 << 2)  # mode, original
        flen = 144 * bitrate_kbps * 1000 // sample_rate + pad
        filler = hashlib.sha256(seed_tag + f":{f}".encode()).digest()
        frame = struct.pack(">I", h) + (filler * (flen // 32 + 1))[:flen - 4]
        out += frame
    return bytes(out)


def _probe_spec(i: int, seed: int) -> dict:
    """Closed-form per-id parameters for the mixed probe shard (the SQL
    oracle recomputes every probed field from these formulas)."""
    cls = ["bmp", "png", "gif", "tiff", "jpeg", "wav", "flac", "mp3"][i % 8]
    s: dict = {"cls": cls}
    if cls in ("bmp", "png", "jpeg"):
        s["w"], s["h"] = 3 + i % 5, 2 + i % 4
    if cls == "png":
        s["interlace"] = i % 16 == 1
    if cls == "jpeg":
        s["progressive"] = i % 16 == 4
    if cls == "gif":
        s["w"], s["h"] = 4 + i % 5, 3 + i % 4
        s["frames"] = 1 + (i // 8) % 4
    if cls == "tiff":
        s["w"], s["h"] = 3 + i % 5, 2 + i % 4
        s["pages"] = 1 + (i // 8) % 3
    if cls == "wav":
        s["variant"] = ["pcm16", "ulaw", "alaw"][(i // 8) % 3]
        s["ns"] = 30 + i % 20
        s["sr"] = 8000
    if cls == "flac":
        s["ns"] = 50 + i % 30
        s["sr"] = [8000, 16000, 32000][(i // 8) % 3]
        s["bps"] = 16 if i % 16 == 6 else 8
    if cls == "mp3":
        s["frames"] = 3 + (i // 8) % 6
        s["kbps"] = [64, 96, 128, 192, 320][(i // 8) % 5]
        s["sr"] = [44100, 48000, 32000][(i // 8) % 3]
        s["id3"] = i % 16 == 7
    return s


def _build_probe_payload(i: int, seed: int) -> bytes:
    from recon_spark.operators import multimodal as M
    from recon_spark.operators.flac import encode_flac

    d = hashlib.sha256(f"{seed}:{i}".encode()).digest()
    s = _probe_spec(i, seed)
    cls = s["cls"]
    if cls == "bmp":
        return M.encode_bmp(s["w"], s["h"],
                            [d[k % 32] for k in range(s["w"] * s["h"] * 3)])
    if cls == "png":
        return M.encode_png(s["w"], s["h"],
                            [d[k % 32] for k in range(s["w"] * s["h"] * 3)],
                            color_type=2, interlace=s["interlace"])
    if cls == "gif":
        pal = [(d[k], d[(k + 7) % 32], d[(k + 13) % 32]) for k in range(4)]
        idxs = [d[k % 32] % 4 for k in range(s["w"] * s["h"])]
        if s["frames"] == 1:
            return M.encode_gif(s["w"], s["h"], idxs, pal)
        frames = [
            (0, 0, s["w"], s["h"],
             [d[(k + f) % 32] % 4 for k in range(s["w"] * s["h"])],
             5 + f, None, False, None)
            for f in range(s["frames"])
        ]
        return M.encode_gif_animation(s["w"], s["h"], frames, pal)
    if cls == "tiff":
        pages = [
            (s["w"], s["h"],
             [d[(k + pg) % 32] for k in range(s["w"] * s["h"])],
             1, 1, 1, None)
            for pg in range(s["pages"])
        ]
        return M.encode_tiff_multi(pages)
    if cls == "jpeg":
        vals = [d[(k // 8) % 32] for k in range(s["w"] * s["h"])]
        if s["progressive"]:
            return M.encode_jpeg_progressive(s["w"], s["h"], vals)
        return M.encode_jpeg(s["w"], s["h"], vals)
    if cls == "wav":
        if s["variant"] == "pcm16":
            return M.encode_wav(
                s["sr"], [d[k % 32] * 64 - 8192 for k in range(s["ns"])])
        return M.encode_wav_g711(
            s["sr"], bytes(d[k % 32] for k in range(s["ns"])),
            s["variant"])
    if cls == "flac":
        if s["bps"] == 16:
            pcm = [d[(2 * k) % 32] * 256 + d[(2 * k + 13) % 32] - 32768
                   for k in range(s["ns"])]
        else:
            pcm = [d[k % 32] - 128 for k in range(s["ns"])]
        return encode_flac(s["sr"], s["bps"], [pcm], block_size=16)
    # mp3
    return encode_mp3_frames(s["frames"], s["kbps"], s["sr"],
                             f"{seed}:{i}".encode(), id3=s["id3"])


def generate_media_probe(spark: SparkSession, n: int, seed: int = 42
                         ) -> DataFrame:
    """Mixed shard of all eight probe classes (media_id % 8), each a
    genuine container built by the corresponding real encoder, with
    ``_probe_spec``'s closed-form parameters."""
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()),
                 pa.array([_build_probe_payload(i, seed) for i in ids],
                          pa.binary())],
                ["media_id", "payload"],
            )

    return spark.range(0, n).mapInArrow(_gen, "media_id long, payload binary")
