"""FLAC — a REAL lossless audio codec, implemented from the public
spec (RFC 9639 / the xiph.org FLAC format) with stdlib only.

Decoder scope (honest named gaps raise NotImplementedError): mono
and stereo 16-bit — including all three decorrelated channel
assignments (left/side, right/side, mid/side with parity-bit
recovery, the side channel at 17 bits) — CONSTANT / VERBATIM /
FIXED(0-4) / LPC subframes (quantized coefficients at any precision,
non-negative shift), Rice residuals (4-bit parameter) including the
escape-to-raw code, multi-partition residuals, fixed blocking
strategy. Remaining named gaps: >2 channels, wasted-bits subframes,
non-16-bit depths, variable blocking, multi-byte frame numbers.

Integrity is verified at every layer the spec defines: frame-header
CRC-8 (poly 0x07), whole-frame CRC-16 (poly 0x8005), and the
STREAMINFO MD5 of the raw little-endian sample stream. Because FLAC
is lossless, the staged corpus reuses the `_media_params` sample
formula — the DuckDB oracle recomputes the audio features
symbolically, exactly as for PCM WAV, and the decode (bit reader,
Rice codes, predictors, CRCs) must be right for the hash to match.

Scale posture: decode runs as an Arrow `mapInPandas` narrow
transform, no shuffle; FLAC frames are independently decodable
(each frame restarts from verbatim warm-up), so a production reader
can split on frame boundaries exactly like the ADPCM block restart.

Reference parity note: the reference engine has no media codecs;
this extends the multimodal tier of SURVEY §2 (beyond-reference
scope) alongside PNG/GIF/JPEG/MP4/ADPCM.
"""

from __future__ import annotations

import hashlib
import struct

FIXED_COEFFS = (
    (),
    (1,),
    (2, -1),
    (3, -3, 1),
    (4, -6, 4, -1),
)


def _crc8_table() -> tuple:
    tbl = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        tbl.append(crc)
    return tuple(tbl)


def _crc16_table() -> tuple:
    tbl = []
    for b in range(256):
        crc = b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
        tbl.append(crc)
    return tuple(tbl)


_CRC8_TABLE = _crc8_table()
_CRC16_TABLE = _crc16_table()


def crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8 + x^2 + x + 1 (0x07), init 0 — the
    FLAC frame-header CRC. Table-driven, one lookup per byte."""
    crc = 0
    tbl = _CRC8_TABLE
    for byte in data:
        crc = tbl[crc ^ byte]
    return crc


def crc16(data: bytes) -> int:
    """CRC-16 with polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0
    — the FLAC whole-frame CRC. Table-driven, one lookup per byte."""
    crc = 0
    tbl = _CRC16_TABLE
    for byte in data:
        crc = ((crc << 8) & 0xFFFF) ^ tbl[(crc >> 8) ^ byte]
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    """(byte, bit)-exact bit reader: multi-bit reads slice the needed
    byte span once via int.from_bytes (O(span) in C) instead of
    looping per bit; unary reads scan whole zero bytes at a time.
    The byte/bit attributes keep the original semantics (next unread
    bit), so the frame walk's direct use of r.byte (CRC offsets,
    skipping the CRC-8 byte) is unchanged."""

    __slots__ = ("data", "byte", "bit")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        byte, bit, data = self.byte, self.bit, self.data
        span = (bit + bits + 7) >> 3
        chunk = data[byte : byte + span]
        if len(chunk) < span:
            raise ValueError("FLAC: bitstream exhausted")
        v = (
            int.from_bytes(chunk, "big") >> ((span << 3) - bit - bits)
        ) & ((1 << bits) - 1)
        nb = bit + bits
        self.byte = byte + (nb >> 3)
        self.bit = nb & 7
        return v

    def read_unary(self) -> int:
        data, byte, bit = self.data, self.byte, self.bit
        n = len(data)
        q = 0
        if bit:
            if byte >= n:
                raise ValueError("FLAC: bitstream exhausted")
            cur = data[byte] & (0xFF >> bit)
            if cur:
                p = 8 - cur.bit_length()
                q = p - bit
                nb = p + 1
                self.byte = byte + (nb >> 3)
                self.bit = nb & 7
                return q
            q = 8 - bit
            byte += 1
        while True:
            if byte >= n:
                raise ValueError("FLAC: bitstream exhausted")
            b = data[byte]
            if b == 0:
                q += 8
                byte += 1
                if q > 1 << 20:
                    raise ValueError("FLAC: runaway unary code")
                continue
            p = 8 - b.bit_length()
            q += p
            if q > 1 << 20:
                raise ValueError("FLAC: runaway unary code")
            nb = p + 1
            self.byte = byte + (nb >> 3)
            self.bit = nb & 7
            return q

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >= 1 << (bits - 1) else v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


RICE_ESCAPE_BITS = 21  # raw-residual width used by the staged encoder


def _write_partition(w: _BitWriter, res: list[int], rice_param: int) -> None:
    w.write(rice_param, 4)
    if rice_param == 0xF:
        w.write(RICE_ESCAPE_BITS, 5)
        for v in res:
            w.write(v & ((1 << RICE_ESCAPE_BITS) - 1), RICE_ESCAPE_BITS)
    else:
        for v in res:
            u = _zigzag(v)
            w.write_unary(u >> rice_param)
            w.write(u, rice_param)


def _write_residuals(
    w: _BitWriter,
    res: list[int],
    rice_param: int,
    part_order: int = 0,
    block_size: int = 0,
    pred_order: int = 0,
) -> None:
    """Residual block: 2-bit method (00 = 4-bit Rice), 4-bit
    partition order, then 2^order partitions each with its own
    parameter (0b1111 escapes to raw fixed-width residuals; a 5-bit
    width follows). Partition sizes per RFC 9639: every partition
    holds block_size/2^order samples except the FIRST, which is
    short by the predictor order (warm-up samples are not
    residuals)."""
    w.write(0, 2)
    w.write(part_order, 4)
    if part_order == 0:
        _write_partition(w, res, rice_param)
        return
    n_parts = 1 << part_order
    per = block_size >> part_order
    pos = 0
    for k in range(n_parts):
        cnt = per - pred_order if k == 0 else per
        _write_partition(w, res[pos : pos + cnt], rice_param)
        pos += cnt


def _read_partition(r: _BitReader, n: int, pbits: int) -> list[int]:
    param = r.read(pbits)
    if param == (1 << pbits) - 1:
        width = r.read(5)
        return [
            (
                v - (1 << width)
                if width and v >= 1 << (width - 1)
                else v
            )
            for v in (r.read(width) for _ in range(n))
        ]
    return [
        _unzigzag((r.read_unary() << param) | r.read(param))
        for _ in range(n)
    ]


def _read_residuals(
    r: _BitReader, n: int, block_size: int = 0, pred_order: int = 0
) -> list[int]:
    """Residual decode incl. multi-partition blocks (RFC 9639 §9.2.7:
    2^order partitions, block_size/2^order samples each, the first
    short by the predictor order)."""
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError(f"FLAC: reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    part_order = r.read(4)
    if part_order == 0:
        return _read_partition(r, n, pbits)
    if block_size == 0:
        block_size = n + pred_order
    if block_size % (1 << part_order):
        raise ValueError(
            f"FLAC: block size {block_size} not divisible by "
            f"2^{part_order} partitions"
        )
    per = block_size >> part_order
    if per <= pred_order and pred_order:
        raise ValueError("FLAC: first partition would be empty")
    out: list[int] = []
    for k in range(1 << part_order):
        cnt = per - pred_order if k == 0 else per
        out.extend(_read_partition(r, cnt, pbits))
    return out


def encode_flac(rate: int, samples: list[int], type_seed: int = 0) -> bytes:
    """Encode mono 16-bit samples as a spec-correct FLAC stream:
    fLaC magic + STREAMINFO (with the raw-audio MD5), then frames of
    <= 16 samples whose subframe types cycle VERBATIM / FIXED(0..4) /
    LPC(order 2, quantized [3,-1]>>1) from `type_seed` — every decoder path (warm-up, predictors,
    Rice, escape) is exercised across a corpus. Lossless by
    construction: decode_flac returns exactly `samples`."""
    n = len(samples)
    raw = b"".join(struct.pack("<h", s) for s in samples)
    md5 = hashlib.md5(raw).digest()
    streaminfo = bytearray()
    streaminfo += struct.pack(">HH", 16, 16)  # min/max block size
    streaminfo += b"\x00\x00\x00" * 2  # min/max frame size unknown
    # 20-bit rate | 3-bit channels-1 | 5-bit bits-1 | 36-bit total
    bw = _BitWriter()
    bw.write(rate, 20)
    bw.write(0, 3)  # mono
    bw.write(15, 5)  # 16-bit
    bw.write(n, 36)
    streaminfo += bw.bytes()
    streaminfo += md5
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, 34]) + streaminfo  # last-block flag set

    frame_no = 0
    pos = 0
    while pos < n:
        bs = min(16, n - pos)
        block = samples[pos : pos + bs]
        w = _BitWriter()
        w.write(0b11111111111110, 14)  # sync
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocking strategy
        w.write(6, 4)  # block size: 8-bit value follows
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(0, 4)  # channel assignment: mono
        w.write(0b100, 3)  # 16 bits per sample
        w.write(0, 1)  # reserved
        w.align()
        hdr = bytearray(w.bytes())
        if frame_no > 0x7F:
            raise NotImplementedError("multi-byte frame numbers unstaged")
        hdr.append(frame_no)  # UTF-8 coded frame number (single byte)
        hdr.append(bs - 1)  # 8-bit block size - 1
        hdr.append(crc8(bytes(hdr)))

        w = _BitWriter()
        t = (type_seed + frame_no) % 7
        if t == 6 and bs > 2:
            # LPC order 2, coeffs [3, -1] at precision 5, shift 1:
            # predicts (3*s1 - s2) >> 1 — any quantized predictor is
            # lossless since residuals carry the exact difference
            order, prec, shift, coeffs = 2, 5, 1, (3, -1)
            w.write(0, 1)
            w.write(0b100000 | (order - 1), 6)
            w.write(0, 1)
            for s in block[:order]:
                w.write(s & 0xFFFF, 16)
            w.write(prec - 1, 4)
            w.write(shift, 5)
            for c in coeffs:
                w.write(c & ((1 << prec) - 1), prec)
            res = [
                block[i]
                - (
                    sum(
                        c * block[i - 1 - j]
                        for j, c in enumerate(coeffs)
                    )
                    >> shift
                )
                for i in range(order, bs)
            ]
            _write_residuals(w, res, 0xF)
        elif t == 0 or t == 6 or bs <= 4:
            w.write(0, 1)
            w.write(0b000001, 6)  # VERBATIM
            w.write(0, 1)
            for s in block:
                w.write(s & 0xFFFF, 16)
        else:
            order = t - 1  # FIXED order 0..4
            w.write(0, 1)
            w.write(0b001000 | order, 6)
            w.write(0, 1)
            for s in block[:order]:
                w.write(s & 0xFFFF, 16)
            coeffs = FIXED_COEFFS[order]
            res = [
                block[i]
                - sum(c * block[i - 1 - j] for j, c in enumerate(coeffs))
                for i in range(order, bs)
            ]
            # order 0 residuals fit 16 bits -> real Rice; deeper
            # orders can reach 2^20 -> the escape-to-raw path.
            # Full 16-sample blocks split into 2 partitions (the
            # multi-partition path); ragged tails use order 0
            po = 1 if bs == 16 else 0
            _write_residuals(
                w, res, 14 if order == 0 else 0xF, po, bs, order
            )
        w.align()
        frame = bytes(hdr) + w.bytes()
        out += frame + struct.pack(">H", crc16(frame))
        pos += bs
        frame_no += 1
    return bytes(out)


def _decode_subframe(r: _BitReader, bs: int, bits: int) -> list[int]:
    """One subframe at the given bit depth (decorrelated side
    channels carry bits+1): CONSTANT / VERBATIM / FIXED / LPC with
    Rice or escaped residuals."""
    if r.read(1) != 0:
        raise ValueError("FLAC: invalid subframe padding bit")
    stype = r.read(6)
    if r.read(1) != 0:
        raise NotImplementedError("wasted-bits subframes not supported")
    if stype == 0:
        v = r.read_signed(bits)
        return [v] * bs
    if stype == 1:
        return [r.read_signed(bits) for _ in range(bs)]
    if 8 <= stype <= 12:
        order = stype - 8
        block = [r.read_signed(bits) for _ in range(order)]
        res = _read_residuals(r, bs - order, bs, order)
        coeffs = FIXED_COEFFS[order]
        for e in res:
            pred = sum(
                c * block[len(block) - 1 - j]
                for j, c in enumerate(coeffs)
            )
            block.append(pred + e)
        return block
    if stype >= 32:
        order = stype - 31
        block = [r.read_signed(bits) for _ in range(order)]
        prec_code = r.read(4)
        if prec_code == 0xF:
            raise ValueError("FLAC: invalid QLP precision code")
        prec = prec_code + 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coeffs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residuals(r, bs - order, bs, order)
        for e in res:
            pred = (
                sum(
                    c * block[len(block) - 1 - j]
                    for j, c in enumerate(coeffs)
                )
                >> shift
            )
            block.append(pred + e)
        return block
    raise ValueError(f"FLAC: reserved subframe type {stype}")


def decode_flac(payload: bytes) -> dict:
    """Decode a FLAC stream: STREAMINFO parse, frame walk with CRC-8
    / CRC-16 verification, subframe decode (CONSTANT / VERBATIM /
    FIXED with Rice or escaped residuals), fixed-predictor
    reconstruction, and the final STREAMINFO MD5 check over the
    reconstructed raw samples. Returns the decode_media dict."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (no fLaC magic)")
    i = 4
    streaminfo = None
    while True:
        if i + 4 > len(payload):
            raise ValueError("FLAC: truncated metadata header")
        hdr = payload[i]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        size = int.from_bytes(payload[i + 1 : i + 4], "big")
        body = payload[i + 4 : i + 4 + size]
        if len(body) < size:
            raise ValueError("FLAC: truncated metadata block")
        if btype == 0:
            streaminfo = body
        i += 4 + size
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC: missing STREAMINFO")
    r = _BitReader(streaminfo, 10)
    rate = r.read(20)
    channels = r.read(3) + 1
    bits = r.read(5) + 1
    total = r.read(36)
    md5_expect = streaminfo[18:34]
    if channels not in (1, 2) or bits != 16:
        raise NotImplementedError(
            f"only mono/stereo 16-bit FLAC supported (channels="
            f"{channels}, bits={bits})"
        )

    samples: list[int] = []
    while len(samples) < total * channels:
        frame_start = i
        r = _BitReader(payload, i)
        if r.read(14) != 0b11111111111110:
            raise ValueError(f"FLAC: lost frame sync at {i}")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan = r.read(4)
        ss_code = r.read(3)
        r.read(1)
        if chan == 0:
            sub_bits = (16,)
        elif chan == 1:
            sub_bits = (16, 16)
        elif chan == 8:  # left/side: side carries one extra bit
            sub_bits = (16, 17)
        elif chan == 9:  # right/side
            sub_bits = (17, 16)
        elif chan == 10:  # mid/side
            sub_bits = (16, 17)
        else:
            raise NotImplementedError(
                f"channel assignment {chan} not supported "
                "(mono, stereo and the three decorrelated pairs only)"
            )
        if len(sub_bits) != channels:
            raise ValueError(
                f"FLAC: frame channel assignment {chan} disagrees with "
                f"STREAMINFO channels={channels}"
            )
        if ss_code != 0b100:
            raise NotImplementedError(
                f"sample-size code {ss_code} not supported (16-bit only)"
            )
        first = r.read(8)  # frame number, UTF-8 coded
        if first >= 0x80:
            raise NotImplementedError("multi-byte frame numbers unsupported")
        if bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        elif 2 <= bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 8:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError(f"FLAC: reserved block-size code {bs_code}")
        if sr_code not in (0,):
            raise NotImplementedError(
                f"in-frame sample-rate code {sr_code} not supported"
            )
        r.align()
        header_len = r.byte - frame_start
        if crc8(payload[frame_start : frame_start + header_len]) != payload[
            r.byte
        ]:
            raise ValueError(f"FLAC: frame-header CRC-8 mismatch at {i}")
        r.byte += 1

        subframes = [
            _decode_subframe(r, bs, b) for b in sub_bits
        ]
        r.align()
        if chan == 0:
            block = subframes[0]
        elif chan == 1:
            block = [
                v for pair in zip(subframes[0], subframes[1]) for v in pair
            ]
        elif chan == 8:  # left/side: R = L - S
            block = [
                v
                for lft, sd in zip(subframes[0], subframes[1])
                for v in (lft, lft - sd)
            ]
        elif chan == 9:  # right/side: L = R + S
            block = [
                v
                for sd, rgt in zip(subframes[0], subframes[1])
                for v in (rgt + sd, rgt)
            ]
        else:  # mid/side (RFC 9639 §4.2): mid<<1 | side&1, then +/-
            block = []
            for mid, sd in zip(subframes[0], subframes[1]):
                m2 = (mid << 1) | (sd & 1)
                block.extend(((m2 + sd) >> 1, (m2 - sd) >> 1))
        body_end = r.byte
        expect, = struct.unpack_from(">H", payload, body_end)
        if crc16(payload[frame_start:body_end]) != expect:
            raise ValueError(f"FLAC: frame CRC-16 mismatch at {i}")
        samples.extend(block)
        i = body_end + 2
    if len(samples) != total * channels:
        raise ValueError(
            f"FLAC: decoded {len(samples)} samples, STREAMINFO says "
            f"{total} x {channels}"
        )
    raw = b"".join(struct.pack("<h", s) for s in samples)
    if hashlib.md5(raw).digest() != md5_expect:
        raise ValueError("FLAC: STREAMINFO MD5 mismatch on decoded audio")
    return {
        "fmt": "flac", "width": None, "height": None,
        "channels": channels, "sample_rate": rate, "values": samples,
    }


def _write_verbatim(w: _BitWriter, block: list[int], bits: int) -> None:
    w.write(0, 1)
    w.write(0b000001, 6)
    w.write(0, 1)
    for s in block:
        w.write(s & ((1 << bits) - 1), bits)


def encode_flac_stereo(
    rate: int,
    left: list[int],
    right: list[int],
    assign_seed: int = 0,
) -> bytes:
    """Stereo FLAC with REAL inter-channel decorrelation: frames
    cycle through independent / left-side / right-side / mid-side
    channel assignments from `assign_seed` (the side channel carries
    17-bit verbatim samples, mid = (L+R)>>1 with the parity bit
    recovered from side per RFC 9639 §4.2). Lossless round-trip of
    interleaved (L, R); the STREAMINFO MD5 covers the interleaved
    stream as the spec requires."""
    assert len(left) == len(right)
    n = len(left)
    inter = [v for pair in zip(left, right) for v in pair]
    raw = b"".join(struct.pack("<h", s) for s in inter)
    md5 = hashlib.md5(raw).digest()
    streaminfo = bytearray()
    streaminfo += struct.pack(">HH", 16, 16)
    streaminfo += b"\x00\x00\x00" * 2
    bw = _BitWriter()
    bw.write(rate, 20)
    bw.write(1, 3)  # stereo (channels - 1)
    bw.write(15, 5)
    bw.write(n, 36)
    streaminfo += bw.bytes()
    streaminfo += md5
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, 34]) + streaminfo

    frame_no = 0
    pos = 0
    while pos < n:
        bs = min(16, n - pos)
        lb = left[pos : pos + bs]
        rb = right[pos : pos + bs]
        assign = (8, 9, 10, 1)[(assign_seed + frame_no) % 4]
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)
        w.write(6, 4)
        w.write(0, 4)
        w.write(assign, 4)
        w.write(0b100, 3)
        w.write(0, 1)
        w.align()
        hdr = bytearray(w.bytes())
        if frame_no > 0x7F:
            raise NotImplementedError("multi-byte frame numbers unstaged")
        hdr.append(frame_no)
        hdr.append(bs - 1)
        hdr.append(crc8(bytes(hdr)))

        w = _BitWriter()
        side = [a - b for a, b in zip(lb, rb)]
        if assign == 1:
            _write_verbatim(w, lb, 16)
            _write_verbatim(w, rb, 16)
        elif assign == 8:
            _write_verbatim(w, lb, 16)
            _write_verbatim(w, side, 17)
        elif assign == 9:
            _write_verbatim(w, side, 17)
            _write_verbatim(w, rb, 16)
        else:  # mid/side
            mid = [(a + b) >> 1 for a, b in zip(lb, rb)]
            _write_verbatim(w, mid, 16)
            _write_verbatim(w, side, 17)
        w.align()
        frame = bytes(hdr) + w.bytes()
        out += frame + struct.pack(">H", crc16(frame))
        pos += bs
        frame_no += 1
    return bytes(out)
