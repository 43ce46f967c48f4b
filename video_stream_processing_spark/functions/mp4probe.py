"""Dependency-free MP4 / ISO-BMFF metadata probe (pure struct).

The reference's segment sink writes ``.mp4`` objects to MinIO/OSS
(`videos/{stream}/{yyyyMMdd/HH}/{stream}_{ms}.mp4` — SegmentProcessFunction,
SURVEY.md §2.1 #4); an ingest pipeline over that bucket needs to CATALOG
those objects — duration, timescale, track count, video dimensions —
without decoding a single frame. That is a container box walk, not a
codec: ISO-BMFF is `[u32 size][4cc type][payload]` recursively, with
64-bit `largesize` escapes. This module implements exactly that walk
plus `mvhd` (movie duration/timescale) and `tkhd` (track dimensions)
extraction — the fields every video-data catalog keys on.

Engine contract as usual: `probe_mp4` returns None for anything
malformed (truncated box, missing moov/mvhd, bad version) — the
decode-or-null convention every binary operator here follows.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass(frozen=True)
class Mp4Meta:
    duration: int  # in timescale units (mvhd)
    timescale: int
    n_tracks: int
    width: int  # first track's integer pixel width (tkhd 16.16 fixed)
    height: int


def _walk(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    [start, end); raises ValueError on malformed sizes."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError("bad box size")
        yield btype, body, pos + size
        pos += size


def probe_mp4(blob: bytes | None) -> Mp4Meta | None:
    """Parse ftyp/moov(mvhd, trak/tkhd) metadata; None on malformed."""
    if blob is None or len(blob) < 8:
        return None
    data = bytes(blob)
    try:
        duration = timescale = None
        n_tracks = 0
        width = height = None
        for btype, s, e in _walk(data, 0, len(data)):
            if btype != b"moov":
                continue
            for ctype, cs, ce in _walk(data, s, e):
                if ctype == b"mvhd":
                    ver = data[cs]
                    if ver == 0:
                        timescale, duration = struct.unpack_from(">II", data, cs + 12)
                    elif ver == 1:
                        (timescale,) = struct.unpack_from(">I", data, cs + 20)
                        (duration,) = struct.unpack_from(">Q", data, cs + 24)
                    else:
                        return None
                elif ctype == b"trak":
                    n_tracks += 1
                    for ttype, ts, te in _walk(data, cs, ce):
                        if ttype == b"tkhd" and width is None:
                            ver = data[ts]
                            # v0 payload: ver/flags 4, times 8, id 4,
                            # res 4, dur 4, res 8, layer/alt/vol/res 8,
                            # matrix 36 -> width at 76; v1 adds 12
                            off = ts + (76 if ver == 0 else 88)
                            w_fx, h_fx = struct.unpack_from(">II", data, off)
                            width, height = w_fx >> 16, h_fx >> 16
        if duration is None or timescale is None or timescale == 0:
            return None
        return Mp4Meta(
            duration=int(duration),
            timescale=int(timescale),
            n_tracks=n_tracks,
            width=int(width) if width is not None else 0,
            height=int(height) if height is not None else 0,
        )
    except (ValueError, struct.error):
        return None


# ---------------------------------------------------------------------------
# Minimal builder (tests + the x64 synth): enough structure to exercise
# the walker — ftyp, interleaved unknown boxes, largesize escapes.
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return struct.pack(">I4sQ", 1, btype, 16 + len(payload)) + payload
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def build_mp4(
    duration: int,
    timescale: int = 1000,
    tracks: list[tuple[int, int]] | None = None,
    junk: bool = True,
) -> bytes:
    """Canonical minimal MP4: ftyp + (junk) + moov[mvhd + trak/tkhd...]."""
    tracks = tracks if tracks is not None else [(320, 240)]
    mvhd = bytes(12) + struct.pack(">II", timescale, duration) + bytes(80)
    inner = _box(b"mvhd", mvhd)
    for i, (w, h) in enumerate(tracks):
        tkhd = bytes(76) + struct.pack(">II", w << 16, h << 16)
        # track id at offset 12 for realism
        tkhd = bytes(12) + struct.pack(">I", i + 1) + tkhd[16:]
        trak = _box(b"tkhd", tkhd)
        if junk:
            trak += _box(b"free", b"\x00" * 5)
        inner += _box(b"trak", trak)
    if junk:
        inner += _box(b"udta", b"meta?", largesize=True)
    out = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    if junk:
        out += _box(b"free", b"junk-box")
    return out + _box(b"moov", inner)
