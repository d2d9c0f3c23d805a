"""MP4 / ISO-BMFF container walk + MJPEG frame decode — pure stdlib,
from the public spec (ISO/IEC 14496-12 box structure; no codec
library exists in this environment, so the only genuinely decodable
video codec is MJPEG: every sample is a baseline JFIF image, decoded
by operators/jpeg.py).

Reference analogue: the multimodal-columns tier of the engine (video
as an opaque binary column + typed metadata). The container walk is
the part that matters at 100 TB — sample tables (stts/stsc/stsz/stco)
turn a byte blob into per-frame records without decoding anything,
so frame SAMPLING can skip bytes it never reads; the per-frame JPEG
decode is the narrow Arrow-batched kernel, and the swap point for a
native codec (H.264 etc. raise by name).

Both the encoder (deterministic staged payloads for the oracle) and
the decoder (real box parser: 32/64-bit sizes, nested walks, track
selection by handler, chunk-offset resolution incl. co64) live here.
"""

from __future__ import annotations

import struct

MP4_TIMESCALE = 1000  # ms ticks for the staged payloads


# ---------------------------------------------------------------------------
# box writers (encoder)
# ---------------------------------------------------------------------------


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">B", version) + flags.to_bytes(3, "big")
                + payload)


_IDENTITY_MATRIX = struct.pack(
    ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
)


def _stts(durations: list[int]) -> bytes:
    """Run-length encode (count, delta) entries — the spec's shape."""
    runs: list[list[int]] = []
    for d in durations:
        if runs and runs[-1][1] == d:
            runs[-1][0] += 1
        else:
            runs.append([1, d])
    payload = struct.pack(">I", len(runs)) + b"".join(
        struct.pack(">II", c, d) for c, d in runs
    )
    return _full(b"stts", 0, 0, payload)


def _visual_sample_entry(fourcc: bytes, w: int, h: int) -> bytes:
    body = (
        b"\x00" * 6                       # reserved
        + struct.pack(">H", 1)            # data_reference_index
        + b"\x00" * 16                    # pre_defined / reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4                     # reserved
        + struct.pack(">H", 1)            # frame_count
        + b"\x00" * 32                    # compressorname
        + struct.pack(">Hh", 24, -1)      # depth, pre_defined
    )
    return _box(fourcc, body)


def encode_mp4_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    durations: list[int] | None = None,
    mdat_first: bool = True,
) -> bytes:
    """Spec-correct single-track MJPEG MP4: ftyp, a `free` box (the
    walk must skip unknown/irrelevant boxes), mdat holding the JPEG
    samples back to back, and a moov whose stbl is REAL — stsz lists
    the true per-sample byte sizes, stsc splits samples 2-then-rest
    across two chunks when there are >= 3 (so chunk resolution is
    exercised), stco carries absolute file offsets that differ
    between the mdat-first and moov-first layouts, stts run-length
    encodes the (possibly varying) durations."""
    if not frames:
        raise ValueError("MP4 needs at least one sample")
    durations = durations or [40] * len(frames)
    if len(durations) != len(frames):
        raise ValueError("durations/frames length mismatch")
    sizes = [len(f) for f in frames]
    total_dur = sum(durations)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    free = _box(b"free", b"spark-graft staged payload")
    mdat = _box(b"mdat", b"".join(frames))

    # chunking: 2 samples in chunk 1, the rest in chunk 2 (if >= 3)
    if len(frames) >= 3:
        chunk_sample_counts = [2, len(frames) - 2]
        stsc_entries = [(1, 2, 1), (2, len(frames) - 2, 1)]
    else:
        chunk_sample_counts = [len(frames)]
        stsc_entries = [(1, len(frames), 1)]

    def moov_with(chunk_offsets: list[int]) -> bytes:
        mvhd = _full(b"mvhd", 0, 0, struct.pack(
            ">IIII", 0, 0, MP4_TIMESCALE, total_dur)
            + struct.pack(">I", 0x00010000)      # rate 1.0
            + struct.pack(">H", 0x0100)          # volume 1.0
            + b"\x00" * 10                        # reserved
            + _IDENTITY_MATRIX
            + b"\x00" * 24                        # pre_defined
            + struct.pack(">I", 2))               # next_track_ID
        tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0,
                                                total_dur)
                     + b"\x00" * 8
                     + struct.pack(">hhhh", 0, 0, 0, 0)
                     + _IDENTITY_MATRIX
                     + struct.pack(">II", width << 16, height << 16))
        mdhd = _full(b"mdhd", 0, 0, struct.pack(
            ">IIIIHH", 0, 0, MP4_TIMESCALE, total_dur, 0x55C4, 0))
        hdlr = _full(b"hdlr", 0, 0,
                     b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00")
        vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                     + _full(b"url ", 0, 1, b""))
        dinf = _box(b"dinf", dref)
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1)
                     + _visual_sample_entry(b"jpeg", width, height))
        stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(stsc_entries))
                     + b"".join(struct.pack(">III", *e)
                                for e in stsc_entries))
        stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, len(sizes))
                     + b"".join(struct.pack(">I", s) for s in sizes))
        stco = _full(b"stco", 0, 0, struct.pack(">I", len(chunk_offsets))
                     + b"".join(struct.pack(">I", o)
                                for o in chunk_offsets))
        stbl = _box(b"stbl", stsd + _stts(durations) + stsc + stsz + stco)
        minf = _box(b"minf", vmhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    def offsets(mdat_box_start: int) -> list[int]:
        out, pos = [], mdat_box_start + 8
        consumed = 0
        for n in chunk_sample_counts:
            out.append(pos)
            pos += sum(sizes[consumed : consumed + n])
            consumed += n
        return out

    if mdat_first:
        mdat_start = len(ftyp) + len(free)
        return ftyp + free + mdat + moov_with(offsets(mdat_start))
    # moov-first: moov size is independent of the offset VALUES
    # (entry count is fixed), so one sizing pass suffices
    moov_sz = len(moov_with([0] * len(chunk_sample_counts)))
    mdat_start = len(ftyp) + moov_sz + len(free)
    return ftyp + moov_with(offsets(mdat_start)) + free + mdat


# ---------------------------------------------------------------------------
# box parser (decoder)
# ---------------------------------------------------------------------------


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in
    [start, end), handling 64-bit largesize and size-0 (to EOF)."""
    i = start
    while i < end:
        if i + 8 > end:
            raise ValueError(f"MP4: truncated box header at {i}")
        size, = struct.unpack_from(">I", buf, i)
        typ = buf[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > end:
                raise ValueError("MP4: truncated largesize")
            size, = struct.unpack_from(">Q", buf, i + 8)
            body = i + 16
        elif size == 0:
            size = end - i
        if size < body - i or i + size > end:
            raise ValueError(f"MP4: box {typ!r} overruns container")
        yield typ, body, i + size
        i += size


def _child(buf: bytes, start: int, end: int, fourcc: bytes):
    for typ, b, e in _walk(buf, start, end):
        if typ == fourcc:
            return b, e
    return None


def _full_body(buf: bytes, b: int) -> tuple[int, int]:
    """(version, body_start_after_version_flags)."""
    return buf[b], b + 4


def decode_mp4(payload: bytes) -> dict:
    """Walk the ISO-BMFF box tree, resolve the video track's sample
    table, slice each sample out of the file by ABSOLUTE offset
    (stco/co64 + stsc chunk mapping + stsz sizes — never by trusting
    mdat order), and decode every MJPEG sample with the in-repo
    baseline JPEG decoder. Fragmented files (moof) and real video
    codecs (avc1/hev1/vp09/av01…) raise by name — honest gaps; the
    container walk is identical for them."""
    from gmall_realtime_flink_spark.operators.jpeg import decode_jpeg

    if payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (no ftyp)")
    if _child(payload, 0, len(payload), b"moof") is not None:
        raise NotImplementedError("fragmented MP4 (moof) not supported")
    moov = _child(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4: no moov box")

    video = None
    for typ, tb, te in _walk(payload, *moov):
        if typ != b"trak":
            continue
        mdia = _child(payload, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _child(payload, *mdia, b"hdlr")
        if hdlr is None:
            continue
        _, hb = _full_body(payload, hdlr[0])
        if payload[hb + 4 : hb + 8] == b"vide":
            video = mdia
            break
    if video is None:
        raise ValueError("MP4: no video track")

    mdhd = _child(payload, *video, b"mdhd")
    ver, mb = _full_body(payload, mdhd[0])
    timescale, = struct.unpack_from(
        ">I", payload, mb + (16 if ver == 1 else 8)
    )
    minf = _child(payload, *video, b"minf")
    stbl = _child(payload, *minf, b"stbl")

    # stsd: codec + declared dims
    sb, _se = _child(payload, *stbl, b"stsd")
    entry_start = sb + 8  # version/flags + entry_count
    fourcc = payload[entry_start + 4 : entry_start + 8]
    if fourcc not in (b"jpeg", b"mjpa", b"mp4v"):
        raise NotImplementedError(
            f"video codec {fourcc!r} needs a native decoder "
            "(only MJPEG samples are decodable without codec libs)"
        )
    w, h = struct.unpack_from(">HH", payload, entry_start + 8 + 24)

    # stts -> per-sample durations
    tb2, _ = _child(payload, *stbl, b"stts")
    _, p = _full_body(payload, tb2)
    n_runs, = struct.unpack_from(">I", payload, p)
    durations: list[int] = []
    for r in range(n_runs):
        c, d = struct.unpack_from(">II", payload, p + 4 + 8 * r)
        durations.extend([d] * c)

    # stsz -> sizes
    zb, _ = _child(payload, *stbl, b"stsz")
    _, p = _full_body(payload, zb)
    fixed, count = struct.unpack_from(">II", payload, p)
    sizes = (
        [fixed] * count
        if fixed
        else list(struct.unpack_from(f">{count}I", payload, p + 8))
    )

    # stsc + stco/co64 -> absolute sample offsets
    cb, _ = _child(payload, *stbl, b"stsc")
    _, p = _full_body(payload, cb)
    n_stsc, = struct.unpack_from(">I", payload, p)
    stsc = [struct.unpack_from(">III", payload, p + 4 + 12 * i)
            for i in range(n_stsc)]
    ob = _child(payload, *stbl, b"stco")
    if ob is not None:
        _, p = _full_body(payload, ob[0])
        n_chunks, = struct.unpack_from(">I", payload, p)
        chunk_offsets = list(
            struct.unpack_from(f">{n_chunks}I", payload, p + 4)
        )
    else:
        ob = _child(payload, *stbl, b"co64")
        if ob is None:
            raise ValueError("MP4: no stco/co64")
        _, p = _full_body(payload, ob[0])
        n_chunks, = struct.unpack_from(">I", payload, p)
        chunk_offsets = list(
            struct.unpack_from(f">{n_chunks}Q", payload, p + 4)
        )

    # expand stsc runs: samples-per-chunk for each chunk index
    per_chunk: list[int] = []
    for i, (first, spc, _sdi) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(chunk_offsets)
        per_chunk.extend([spc] * (last - first + 1))
    if sum(per_chunk) != len(sizes):
        raise ValueError("MP4: stsc/stsz sample count mismatch")

    frames: list[bytes] = []
    si = 0
    for ci, spc in enumerate(per_chunk):
        off = chunk_offsets[ci]
        for _ in range(spc):
            end = off + sizes[si]
            if end > len(payload):
                raise ValueError("MP4: sample overruns file")
            frames.append(payload[off:end])
            off = end
            si += 1

    decoded = [decode_jpeg(fr) for fr in frames]
    for d in decoded:
        if (d["width"], d["height"]) != (w, h):
            raise ValueError(
                "MP4: sample dims disagree with stsd "
                f"({d['width']}x{d['height']} vs {w}x{h})"
            )
    return {
        "fmt": "mp4",
        "width": int(w),
        "height": int(h),
        "channels": decoded[0]["channels"] if decoded else None,
        "sample_rate": None,
        "n_frames": len(frames),
        "timescale": timescale,
        "durations": durations,
        "frame_values": [d["values"] for d in decoded],
        "values": b"".join(d["values"] for d in decoded),
    }
