"""Ogg container (RFC 3533) + the FLAC-to-Ogg mapping — the OTHER
container crawl audio arrives in.

A crawl shard's lossless audio is split between native ``.flac`` files
and Ogg-encapsulated FLAC (``.oga``, RFC 5334 media types); both carry
the identical RFC 9639 frame bitstream, so this module implements ONLY
the container layer and reuses operators/flac.py for everything below:

page layer (``parse_ogg_pages`` / ``_build_page``):
- 'OggS' capture pattern, stream-structure version 0
- header-type flags: continued-packet (0x01), BOS (0x02), EOS (0x04)
- 64-bit granule position, 32-bit serial number, 32-bit page sequence
  (gaps = page loss, hard error), segment table lacing (packets split
  into 255-byte segments, a terminal <255 segment ends a packet, a
  packet of exactly k*255 bytes needs a trailing 0 lacing value)
- page CRC-32: poly 0x04C11DB7, init 0, no reflection, no final XOR,
  computed with the CRC field zeroed (the Ogg-specific variant —
  NOT zlib's reflected CRC-32)

packet layer (``ogg_packets``): reassembles packets across page
boundaries (continued flag checked both directions).

FLAC mapping (``encode_ogg_flac`` / ``decode_ogg_flac``): the first
packet is the mapping header 0x7F 'FLAC' major=1 minor=0 + 16-bit
header-packet count + the native 'fLaC' magic + STREAMINFO block; each
subsequent packet is exactly one native FLAC frame; granule position
is the cumulative sample count of completed frames. decode_ogg_flac
rebuilds the native stream from the SAME parts and hands it to
decode_flac — every frame CRC and the stream MD5 still verify, so the
Ogg layer cannot silently corrupt audio.
"""

from __future__ import annotations

import struct
from typing import Iterator

_OGG_MAGIC = b"OggS"


def ogg_crc(data: bytes) -> int:
    """Ogg's CRC-32: poly 0x04C11DB7, init 0, non-reflected, no final
    XOR (distinct from zlib's reflected init-0xFFFFFFFF CRC-32)."""
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if crc & 0x80000000 \
                else (crc << 1) & 0xFFFFFFFF
    return crc


def _build_page(payload_segments: list[bytes], header_type: int,
                granule: int, serial: int, seq: int) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for seg in payload_segments:
        lacing.append(len(seg))
        body += seg
    hdr = bytearray(_OGG_MAGIC)
    hdr.append(0)  # stream structure version
    hdr.append(header_type)
    hdr += struct.pack("<q", granule)
    hdr += struct.pack("<I", serial)
    hdr += struct.pack("<I", seq)
    hdr += b"\x00\x00\x00\x00"  # CRC placeholder
    hdr.append(len(payload_segments))
    page = bytes(hdr) + bytes(lacing) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def parse_ogg_pages(payload: bytes) -> Iterator[dict]:
    """Walk pages, verifying capture pattern, version, CRC, and page-
    sequence continuity per serial. Yields dicts with flags, granule,
    serial, seq, and the per-segment payload list."""
    pos = 0
    next_seq: dict[int, int] = {}
    while pos < len(payload):
        if payload[pos:pos + 4] != _OGG_MAGIC:
            raise ValueError("ogg: lost capture pattern")
        if payload[pos + 4] != 0:
            raise ValueError("ogg: unsupported stream-structure version")
        htype = payload[pos + 5]
        granule = struct.unpack_from("<q", payload, pos + 6)[0]
        serial = struct.unpack_from("<I", payload, pos + 14)[0]
        seq = struct.unpack_from("<I", payload, pos + 18)[0]
        stored_crc = struct.unpack_from("<I", payload, pos + 22)[0]
        nsegs = payload[pos + 26]
        lacing = payload[pos + 27:pos + 27 + nsegs]
        if len(lacing) != nsegs:
            raise ValueError("ogg: truncated segment table")
        body_len = sum(lacing)
        end = pos + 27 + nsegs + body_len
        if end > len(payload):
            raise ValueError("ogg: truncated page body")
        page = bytearray(payload[pos:end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != stored_crc:
            raise ValueError("ogg: page CRC mismatch")
        if serial in next_seq and seq != next_seq[serial]:
            raise ValueError("ogg: page sequence gap (lost page)")
        next_seq[serial] = seq + 1
        segs = []
        at = pos + 27 + nsegs
        for n in lacing:
            segs.append(payload[at:at + n])
            at += n
        yield {"flags": htype, "granule": granule, "serial": serial,
               "seq": seq, "lacing": list(lacing), "segments": segs}
        pos = end


def ogg_packets(payload: bytes) -> Iterator[tuple[int, bytes]]:
    """Reassemble (serial, packet) tuples across page boundaries. A
    packet ends at any lacing value < 255; 255 continues (possibly onto
    the next page, which must then carry the continued flag)."""
    partial: dict[int, bytearray] = {}
    for page in parse_ogg_pages(payload):
        serial = page["serial"]
        cont = bool(page["flags"] & 0x01)
        if cont != (serial in partial and len(partial[serial]) > 0):
            raise ValueError("ogg: continued-packet flag inconsistent")
        buf = partial.setdefault(serial, bytearray())
        for lace, seg in zip(page["lacing"], page["segments"]):
            buf += seg
            if lace < 255:
                yield serial, bytes(buf)
                buf.clear()
    for serial, buf in partial.items():
        if buf:
            raise ValueError("ogg: stream ended mid-packet")


def _segments_of(packet: bytes) -> list[bytes]:
    segs = [packet[i:i + 255] for i in range(0, len(packet), 255)]
    if not segs or len(segs[-1]) == 255:
        segs.append(b"")  # terminal lacing value for k*255-byte packets
    return segs


def encode_ogg_flac(sample_rate: int, bps: int, chans: list[list[int]],
                    serial: int = 0x5241_4643, max_segs_per_page: int = 16,
                    **flac_kwargs) -> bytes:
    """FLAC-to-Ogg encapsulation over encode_flac_parts' output (the
    frames are bit-identical to the native container's). Small
    ``max_segs_per_page`` forces multi-page streams and packet spans so
    the continuation path is exercised by ordinary fixtures."""
    from recon_spark.operators.flac import encode_flac_parts

    streaminfo_body, frames = encode_flac_parts(
        sample_rate, bps, chans, **flac_kwargs)
    first = (b"\x7fFLAC\x01\x00" + struct.pack(">H", 0)
             + b"fLaC" + b"\x80" + len(streaminfo_body).to_bytes(3, "big")
             + streaminfo_body)
    total = len(chans[0])
    block_size = flac_kwargs.get("block_size", 16)

    pages: list[bytes] = []
    seq = 0
    pages.append(_build_page(_segments_of(first), 0x02, 0, serial, seq))
    seq += 1

    # pack audio packets into pages under the segment cap. Invariants:
    # - a page's continued flag (0x01) reflects whether its FIRST
    #   segment sits inside a packet begun on an earlier page;
    # - a page's granule is the cumulative sample count of the last
    #   frame COMPLETED on that page, or -1 if none completes on it.
    cur: list[bytes] = []
    cur_cont = False          # current page starts mid-packet
    carry_mid = False         # next page will start mid-packet
    page_last_done = -1       # granule of the page being assembled
    done_samples = 0

    def _flush(eos: bool) -> None:
        nonlocal seq, cur, page_last_done
        if not cur and not eos:
            return
        flags = (0x01 if (cur and cur_cont) else 0x00) | (0x04 if eos else 0x00)
        pages.append(_build_page(cur, flags,
                                 total if eos else page_last_done,
                                 serial, seq))
        seq += 1
        cur = []
        page_last_done = -1

    for fi, frame in enumerate(frames):
        segs = _segments_of(frame)
        for si, seg in enumerate(segs):
            if not cur:
                cur_cont = carry_mid
            cur.append(seg)
            last_of_packet = si == len(segs) - 1
            if last_of_packet:
                done_samples = min((fi + 1) * block_size, total)
                page_last_done = done_samples
            if len(cur) >= max_segs_per_page:
                _flush(eos=False)
                carry_mid = not last_of_packet
    _flush(eos=True)  # final page carries EOS (and granule = total)
    return b"".join(pages)


def decode_ogg_flac(payload: bytes, verify_md5: bool = True
                    ) -> tuple[int, int, list[list[int]]]:
    """Ogg-FLAC -> (sample_rate, bps, per-channel samples): unwrap the
    mapping, rebuild the native stream, decode through decode_flac
    (frame CRCs + stream MD5 still verify)."""
    from recon_spark.operators.flac import decode_flac

    packets = list(ogg_packets(payload))
    if not packets:
        raise ValueError("ogg-flac: no packets")
    serial0, first = packets[0]
    if first[:5] != b"\x7fFLAC":
        raise ValueError("ogg-flac: first packet is not the FLAC mapping")
    if first[5] != 1:
        raise ValueError("ogg-flac: unsupported mapping major version")
    n_hdr = struct.unpack_from(">H", first, 7)[0]
    native = bytearray(first[9:])  # 'fLaC' + STREAMINFO block
    if native[:4] != b"fLaC":
        raise ValueError("ogg-flac: mapping header lacks native magic")
    audio = [p for s, p in packets[1:] if s == serial0]
    for pkt in audio[n_hdr:]:
        native += pkt
    return decode_flac(bytes(native), verify_md5=verify_md5)


def ogg_flac_first_frame_mode(payload: bytes) -> str:
    """Channel assignment of the first audio frame, container-parsed
    (mapping header + first audio packet reassembled into a minimal
    native stream — the probe used by the decode query's independence
    check, same contract as flac.first_frame_channel_mode)."""
    from recon_spark.operators.flac import first_frame_channel_mode

    it = ogg_packets(payload)
    _, first = next(it)
    if first[:5] != b"\x7fFLAC":
        raise ValueError("ogg-flac: first packet is not the FLAC mapping")
    _, audio0 = next(it)
    return first_frame_channel_mode(first[9:] + audio0)


def generate_media_ogg(spark, n: int, seed: int = 42):
    """Media table of GENUINE Ogg-FLAC containers carrying the SAME
    digest-derived PCM as generate_media_flac (flac._track_spec) —
    lossless through two container layers, so the decode query reuses
    the FLAC oracle verbatim. The page-segment cap rotates 2..6 per
    track, forcing multi-page streams and packet continuation in
    ordinary fixtures."""
    import pyarrow as pa

    from recon_spark.operators.flac import _track_spec
    from recon_spark.operators.multimodal import MEDIA_META_DDL
    from typing import Iterator  # noqa: F401

    def _gen(batches):
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads, metas = [], []
            for i in ids:
                spec, chans = _track_spec(i, seed)
                payloads.append(encode_ogg_flac(
                    spec["sr"], spec["bps"], chans, block_size=16,
                    max_segs_per_page=2 + i % 5,
                    stereo_mode=spec["stereo_mode"],
                    type_sel=spec["type_sel"],
                    partition_order=spec["partition_order"],
                    rice2=spec["rice2"], force_escape=spec["force_escape"],
                    sr_in_frame=spec["sr_in_frame"],
                    bps_from_streaminfo=spec["bps_from_streaminfo"],
                ))
                metas.append(("audio/ogg", None, None, spec["sr"],
                              spec["ns"] * 1000 // spec["sr"], "ogg-flac"))
            meta_arr = pa.StructArray.from_arrays(
                [
                    pa.array([m[0] for m in metas], pa.string()),
                    pa.array([m[1] for m in metas], pa.int32()),
                    pa.array([m[2] for m in metas], pa.int32()),
                    pa.array([m[3] for m in metas], pa.int32()),
                    pa.array([m[4] for m in metas], pa.int32()),
                    pa.array([m[5] for m in metas], pa.string()),
                ],
                names=["media_type", "width", "height", "sample_rate",
                       "duration_ms", "codec"],
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary()),
                 meta_arr],
                ["media_id", "payload", "meta"],
            )

    return spark.range(0, n).mapInArrow(
        _gen, f"media_id long, payload binary, meta struct<{MEDIA_META_DDL}>"
    )
