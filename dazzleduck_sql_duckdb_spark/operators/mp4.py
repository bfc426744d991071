"""MP4 (ISO BMFF) container metadata — pure stdlib, no codec library.

Closes the last declared multimodal stub at the PLUMBING level: frame
decode of h264/h265 bitstreams genuinely needs a codec library (the
`stub_decoder` slot in multimodal.py stays), but the CONTAINER — the
ISO/IEC 14496-12 box tree — is plain big-endian structs, and container
metadata (duration, track count, codec fourcc, frame dimensions) is
what a training-data pipeline actually needs to filter / shard / route
video columns before any decode happens.

`parse_mp4_metadata` walks ftyp / moov / mvhd / trak / tkhd / mdia /
hdlr / stbl / stsd (handling 64-bit `size==1` largesize boxes and
version-0/1 full boxes), returning the brand, movie duration, track
count, and the first video track's sample-entry fourcc + dimensions.
`encode_mp4_skeleton` builds a minimal VALID box tree (what a muxer
emits before writing samples) so tests and the oracle-gated catalog
entry can synthesize byte-real payloads deterministically.

`video_metadata` is the DataFrame operator: an Arrow-batched
mapInPandas stage over an opaque binary column, emitting one metadata
row per payload and dropping the payload itself before anything
shuffles (the 100 TB discipline shared by extract_features /
media_dedup_keys in multimodal.py).

Reference parity note: the reference engine has NO video support at
all (its multimodal surface stops at blob columns); this operator is
part of the engine-added training-pipeline surface (SURVEY.md §2,
"multimodal").
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# containers whose payload is a sequence of child boxes
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def _boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in
    buf[start:end]; handles size==1 (64-bit largesize) and size==0
    (box extends to end)."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, i)
        typ = buf[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                raise ValueError("truncated largesize box header")
            (size,) = struct.unpack_from(">Q", buf, i + 8)
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            raise ValueError(f"corrupt box {typ!r} at {i}: size {size}")
        yield typ, i + hdr, i + size
        i += size


def _fullbox(buf: bytes, b0: int) -> tuple[int, int]:
    """(version, body offset past version+flags) of a full box."""
    return buf[b0], b0 + 4


def parse_mp4_metadata(payload: bytes) -> dict:
    """Container metadata from an ISO BMFF payload.

    Returns {major_brand, timescale, duration_ms, n_tracks, codec,
    width, height}: duration from mvhd (version 0 or 1), rescaled to
    integer milliseconds; codec/width/height from the FIRST track whose
    hdlr handler is 'vide' (fourcc from its stsd sample entry, pixel
    dimensions from its tkhd 16.16 fixed-point fields); None where a
    box is absent. Raises ValueError on a structurally corrupt tree."""
    meta: dict = {
        "major_brand": None,
        "timescale": None,
        "duration_ms": None,
        "n_tracks": 0,
        "codec": None,
        "width": None,
        "height": None,
    }
    for typ, b0, b1 in _boxes(payload, 0, len(payload)):
        if typ == b"ftyp":
            meta["major_brand"] = payload[b0 : b0 + 4].decode("ascii")
        elif typ == b"moov":
            _parse_moov(payload, b0, b1, meta)
    return meta


def _parse_moov(buf: bytes, start: int, end: int, meta: dict) -> None:
    for typ, b0, b1 in _boxes(buf, start, end):
        if typ == b"mvhd":
            ver, p = _fullbox(buf, b0)
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", buf, p + 16)
            else:
                ts, dur = struct.unpack_from(">II", buf, p + 8)
            meta["timescale"] = ts
            meta["duration_ms"] = (dur * 1000) // ts if ts else None
        elif typ == b"trak":
            meta["n_tracks"] += 1
            trk = _parse_trak(buf, b0, b1)
            if trk.get("handler") == "vide" and meta["codec"] is None:
                meta["codec"] = trk.get("codec")
                meta["width"] = trk.get("width")
                meta["height"] = trk.get("height")


def _parse_trak(buf: bytes, start: int, end: int) -> dict:
    trk: dict = {}
    for typ, b0, b1 in _boxes(buf, start, end):
        if typ == b"tkhd":
            ver, p = _fullbox(buf, b0)
            # width/height are the LAST 8 body bytes (16.16 fixed)
            w, h = struct.unpack_from(">II", buf, b1 - 8)
            trk["width"], trk["height"] = w >> 16, h >> 16
        elif typ == b"mdia":
            for t2, c0, c1 in _boxes(buf, b0, b1):
                if t2 == b"hdlr":
                    # version/flags 4 + predefined 4, then handler
                    trk["handler"] = buf[c0 + 8 : c0 + 12].decode(
                        "ascii", "replace"
                    )
                elif t2 == b"minf":
                    for t3, d0, d1 in _boxes(buf, c0, c1):
                        if t3 == b"stbl":
                            for t4, e0, e1 in _boxes(buf, d0, d1):
                                if t4 == b"stsd" and e1 - e0 > 16:
                                    # fullbox 4 + entry_count 4, then
                                    # first sample entry's fourcc
                                    trk["codec"] = buf[
                                        e0 + 12 : e0 + 16
                                    ].decode("ascii", "replace")
    return trk


# ------------------------------------------------------------- encoder


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def _full(typ: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(typ, bytes([version]) + flags.to_bytes(3, "big") + body)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
)


def _tkhd(track_id: int, duration: int, w: int, h: int) -> bytes:
    body = (
        struct.pack(">IIII", 0, 0, track_id, 0)
        + struct.pack(">III", duration, 0, 0)
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/altgroup/volume/res
        + _UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16)
    )
    return _full(b"tkhd", 0, 3, body)


def _mdhd(timescale: int, duration: int) -> bytes:
    # language 'und' packed 5-bit: 0x55C4
    body = struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    return _full(b"mdhd", 0, 0, body)


def _hdlr(handler: bytes, name: bytes) -> bytes:
    body = b"\x00" * 4 + handler + b"\x00" * 12 + name + b"\x00"
    return _full(b"hdlr", 0, 0, body)


def _dinf() -> bytes:
    url = _full(b"url ", 0, 1, b"")  # flags=1: data in this file
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    return _box(b"dinf", dref)


def _empty_stbl(sample_entry: bytes) -> bytes:
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">I", 0))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 0))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stco = _full(b"stco", 0, 0, struct.pack(">I", 0))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def _visual_entry(codec: str, w: int, h: int) -> bytes:
    body = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # predefined / reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, predefined
    )
    return _box(codec.encode("ascii"), body)


def _audio_entry(codec: str) -> bytes:
    body = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 8  # reserved
        + struct.pack(">HHHH", 2, 16, 0, 0)  # channels/bits/predef/res
        + struct.pack(">I", 44100 << 16)  # samplerate 16.16
    )
    return _box(codec.encode("ascii"), body)


def encode_mp4_skeleton(
    duration_ms: int,
    width: int,
    height: int,
    codec: str = "avc1",
    with_audio: bool = False,
    mdat: bytes = b"",
) -> bytes:
    """Minimal valid ISO BMFF tree: ftyp + moov(mvhd + video trak
    [+ audio trak]) + mdat. Timescale is fixed at 1000 so mvhd
    duration == duration_ms exactly (parse_mp4_metadata round-trips it
    with no rescaling loss). All boxes are fixed-size except mdat, so
    len(result) == VIDEO_SKELETON_BYTES [+ AUDIO_TRAK_BYTES] +
    len(mdat) — the size law the oracle-gated catalog entry pins."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"mp42")
    n_tracks = 2 if with_audio else 1
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, 1000, duration_ms)
        + struct.pack(">IHHII", 0x00010000, 0x0100, 0, 0, 0)
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", n_tracks + 1),
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    vminf = _box(b"minf", vmhd + _dinf() + _empty_stbl(
        _visual_entry(codec, width, height)
    ))
    vmdia = _box(
        b"mdia",
        _mdhd(1000, duration_ms)
        + _hdlr(b"vide", b"VideoHandler")
        + vminf,
    )
    traks = _box(b"trak", _tkhd(1, duration_ms, width, height) + vmdia)
    if with_audio:
        smhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
        aminf = _box(
            b"minf", smhd + _dinf() + _empty_stbl(_audio_entry("mp4a"))
        )
        amdia = _box(
            b"mdia",
            _mdhd(1000, duration_ms)
            + _hdlr(b"soun", b"SoundHandler")
            + aminf,
        )
        traks += _box(b"trak", _tkhd(2, duration_ms, 0, 0) + amdia)
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov + _box(b"mdat", mdat)


# fixed-size law constants (asserted by tests/test_multimodal.py and
# baked into the multimodal_video_metadata oracle SQL)
VIDEO_SKELETON_BYTES = len(encode_mp4_skeleton(1, 16, 16))
AUDIO_TRAK_BYTES = len(
    encode_mp4_skeleton(1, 16, 16, with_audio=True)
) - VIDEO_SKELETON_BYTES


# ------------------------------------------------------- DataFrame op

VIDEO_META_SCHEMA = (
    "media_id BIGINT, major_brand STRING, n_bytes BIGINT,"
    " duration_ms BIGINT, n_tracks INT, codec STRING,"
    " width INT, height INT"
)


def video_metadata(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-payload MP4 container metadata, payload dropped in-stage.

    One Arrow-batched mapInPandas pass: the binary column never leaves
    the scan partition (only the ~60-byte metadata row can shuffle
    downstream), so the operator's exchange volume is independent of
    video size — the same discipline as extract_features. Corrupt
    payloads raise (fail-loud; route through a try/except wrapper at
    the caller if quarantine semantics are wanted)."""
    cols = media.select(id_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                m = parse_mp4_metadata(raw)
                out.append(
                    (
                        mid,
                        m["major_brand"],
                        len(raw),
                        m["duration_ms"],
                        m["n_tracks"],
                        m["codec"],
                        m["width"],
                        m["height"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "major_brand",
                    "n_bytes",
                    "duration_ms",
                    "n_tracks",
                    "codec",
                    "width",
                    "height",
                ],
            )

    return cols.mapInPandas(run, schema=VIDEO_META_SCHEMA)
