"""Baseline JPEG codec in stdlib + numpy — no external codec library.

Baseline sequential JPEG (ITU-T T.81 / JFIF) is, end to end: marker
segments, canonical Huffman coding of (run, size) symbols over
zig-zag-ordered quantized DCT coefficients, and the 8×8 type-II DCT.
Every piece is implementable from the public spec with numpy doing
the IDCT — which is why `decode_jpeg` here is a REAL decoder, not a
stub: it reads any baseline JFIF stream with

- DQT (8-bit tables), SOF0 (baseline, 8-bit precision, 1 or 3
  components, arbitrary sampling factors h,v ∈ {1,2}),
- DHT canonical Huffman tables (DC + AC, as emitted by any encoder —
  the tables are read from the FILE, never assumed),
- SOS entropy-coded data with 0xFF00 byte stuffing and DRI/RSTn
  restart-marker resynchronisation,
- per-component DC prediction, AC run-length/EOB decoding, dequant,
  de-zig-zag, float IDCT, level shift, chroma upsampling and
  YCbCr→RGB for 3-component scans.

Progressive (SOF2) decodes for REAL too (T.81 Annex G): multi-scan
coefficient accumulation — spectral selection, successive
approximation (DC bit planes and the AC refinement correction-bit
protocol), EOB-run coding — with one reconstruction at EOI. Since a
progressive file reorganises only the ENTROPY layer, the pinned
contract is strong: a progressive encode of the same quantized
coefficients decodes BIT-IDENTICALLY to its sequential twin
(encode_jpeg_progressive + tests). Arithmetic coding and 12-bit
precision still raise NotImplementedError by name.

The companion `encode_jpeg` exists so payloads can be staged
deterministically: it builds its OWN canonical Huffman tables from
the symbol histogram (writing them to DHT — exercising the
decoder's table reader far better than the spec's Annex K defaults
would) and uses a flat quality-biased quantization table. JPEG is
lossy, so round-trip tests assert bounded per-pixel error on
gradients — and EXACTNESS on uniform blocks, whose DCT is DC-only:
with the DC quant step chosen to divide 8·(p−128) the constant
image p survives encode→decode bit-for-bit, which is what makes a
DuckDB-recomputable oracle possible (plans/datapipe.py
`multimodal_decode_jpeg`).

Scale note: decode runs inside Arrow-batched mapInPandas like every
other media kernel (operators/multimodal.py) — a narrow transform,
no shuffle; numpy does the per-block IDCT vectorised across all
blocks of an image at once.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8x8 DCT-II basis (orthonormal): D @ block @ D.T = DCT coefficients
_C = np.array(
    [
        [np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8) * np.cos(
            (2 * x + 1) * u * np.pi / 16) for x in range(8)]
        for u in range(8)
    ]
)


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """blocks: (n, 8, 8) float -> (n, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)


def _idct(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("xu,nuv,yv->nxy", _C.T, coefs, _C.T)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers
    (leaving them for the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:  # stuffed literal 0xFF
                self.pos += 2
            else:  # a real marker: entropy data ended early
                raise ValueError(
                    f"JPEG: marker 0xFF{nxt:02x} inside entropy segment"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Drop pad bits; caller then reads the marker bytes."""
        self.acc = 0
        self.nbits = 0


def _receive_extend(reader: _BitReader, size: int) -> int:
    """The spec's RECEIVE+EXTEND: `size` magnitude bits -> signed."""
    if size == 0:
        return 0
    v = reader.read_bits(size)
    if v < (1 << (size - 1)):  # negative branch
        v -= (1 << size) - 1
    return v


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict:
    """DHT (counts per length, symbol list) -> {symbol: (code, len)}."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_from_freq(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """Build a canonical Huffman table (counts, symbols) from symbol
    frequencies, lengths capped at 16 the simple way: package-merge is
    overkill for ≤256 symbols, so build lengths by a standard
    two-queue Huffman and flatten any >16 into 16 (valid because we
    re-run the Kraft fix below)."""
    if not freq:
        return [0] * 16, []
    if len(freq) == 1:
        ((sym, _),) = freq.items()
        counts = [0] * 16
        counts[0] = 1
        return counts, [sym]
    import heapq

    heap = [(n, i, [s]) for i, (s, n) in enumerate(sorted(freq.items()))]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for s in freq}
    uid = len(heap)
    while len(heap) > 1:
        n1, _, s1 = heapq.heappop(heap)
        n2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (n1 + n2, uid, s1 + s2))
        uid += 1
    # cap at 16 and fix Kraft inequality by deepening shallower codes
    lengths = {s: min(d, 16) for s, d in depth.items()}
    while sum(2.0 ** -l for l in lengths.values()) > 1.0:
        # find a symbol shallower than 16 and push it down
        s = min((s for s in lengths if lengths[s] < 16),
                key=lambda s: lengths[s])
        lengths[s] += 1
    # T.81 Annex K (Adjust_BITS) reserves the all-ones codeword so
    # 1-bit padding never forms a valid symbol: keep the code
    # INCOMPLETE (Kraft sum < 1).  In a canonical code the all-1s
    # code of the deepest length is assigned iff the Kraft sum is
    # exactly 1, so deepen one deepest symbol below 16 by one level
    # (the extra-leaf-at-the-deepest convention).
    if sum(2.0 ** -l for l in lengths.values()) == 1.0:
        cands = [s for s in lengths if lengths[s] < 16]
        if cands:  # all-at-16 with Kraft==1 needs 2^16 leaves: can't
            s = max(cands, key=lambda s: (lengths[s], s))
            lengths[s] += 1
    counts = [0] * 16
    for _s, l in sorted(lengths.items(), key=lambda kv: (kv[1], kv[0])):
        counts[l - 1] += 1
    symbols = [s for s, _l in sorted(
        lengths.items(), key=lambda kv: (kv[1], kv[0]))]
    return counts, symbols


class _HuffDecoder:
    """Length-indexed canonical decode (maxcode/valptr, spec F.2.2.3)."""

    def __init__(self, counts: list[int], symbols: list[int]) -> None:
        self.symbols = symbols
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if counts[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += counts[length - 1]
                k += counts[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader: _BitReader) -> int:
        code = reader.read_bit()
        length = 1
        while code > self.maxcode[length]:
            code = (code << 1) | reader.read_bit()
            length += 1
            if length > 16:
                raise ValueError("JPEG: invalid Huffman code")
        return self.symbols[self.valptr[length] + code - self.mincode[length]]


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _quant_tables(dc_step: int, ac_step: int) -> np.ndarray:
    q = np.full(64, ac_step, dtype=np.int64)
    q[0] = dc_step
    return q


def _encode_blocks(
    blocks: np.ndarray, qtab: np.ndarray
) -> list[np.ndarray]:
    """(n,8,8) pixel blocks -> list of 64-long quantized zig-zag
    coefficient vectors."""
    coefs = _fdct(blocks.astype(np.float64) - 128.0)
    flat = coefs.reshape(-1, 64)[:, _ZIGZAG]
    return list(np.round(flat / qtab).astype(np.int64))


def _size_of(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg(
    w: int,
    h: int,
    pixels: bytes,
    channels: int = 1,
    dc_step: int = 8,
    ac_step: int = 16,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder (no subsampling: every component 1×1).
    `pixels` is row-major, interleaved for channels=3 (RGB; converted
    to YCbCr). Huffman tables are built canonically from this image's
    own symbol histogram and written to DHT. With the default
    dc_step=8, a uniform-gray image round-trips EXACTLY (its blocks
    are DC-only and 8·(p−128) is divisible by 8)."""
    assert channels in (1, 3) and len(pixels) == w * h * channels
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels)
    if channels == 3:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        comps = [np.clip(np.round(c), 0, 255) for c in comps]
    else:
        comps = [img[..., 0].astype(np.float64)]

    bw, bh = (w + 7) // 8, (h + 7) // 8
    qtab = _quant_tables(dc_step, ac_step)

    comp_blocks = []
    for c in comps:
        padded = np.pad(c, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        blocks = (
            padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        comp_blocks.append(_encode_blocks(blocks, qtab))

    # one event pass in MCU order (honoring restart-interval DC
    # predictor resets) feeds BOTH the histogram and the bit writer
    n_mcu = bw * bh
    events: list[list[tuple]] = []  # [mcu][comp] -> (dc_size, dc_diff, acs)
    preds = [0] * channels
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            preds = [0] * channels
        row = []
        for ci in range(channels):
            zz = comp_blocks[ci][m]
            diff = int(zz[0]) - preds[ci]
            preds[ci] = int(zz[0])
            acs = []
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    acs.append((0xF0, 0))
                    run -= 16
                acs.append(((run << 4) | _size_of(v), v))
                run = 0
            if run:
                acs.append((0x00, 0))
            row.append((_size_of(diff), diff, acs))
        events.append(row)

    # canonical tables from the histogram: table 0 = luma, 1 = chroma
    n_tables = 1 if channels == 1 else 2
    dc_freq: list[dict] = [{} for _ in range(n_tables)]
    ac_freq: list[dict] = [{} for _ in range(n_tables)]
    for row in events:
        for ci, (size, _diff, acs) in enumerate(row):
            t = 0 if ci == 0 else 1
            dc_freq[t][size] = dc_freq[t].get(size, 0) + 1
            for sym, _v in acs:
                ac_freq[t][sym] = ac_freq[t].get(sym, 0) + 1
    dc_tabs = [_huff_from_freq(f) for f in dc_freq]
    ac_tabs = [_huff_from_freq(f) for f in ac_freq]
    dc_codes = [_canonical_codes(*t) for t in dc_tabs]
    ac_codes = [_canonical_codes(*t) for t in ac_tabs]

    out = bytearray(b"\xff\xd8")  # SOI
    out += (  # APP0: JFIF 1.1, unitless density 1:1, no thumbnail
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    zz_q = np.zeros(64, dtype=np.int64)
    zz_q[:] = qtab  # qtab already in zig-zag order (flat fill)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        int(x) for x in zz_q
    )
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * channels, 8, h, w, channels
    )
    for ci in range(channels):
        out += bytes([ci + 1, 0x11, 0])  # id, h=1 v=1, qtab 0
    for t in range(n_tables):
        for cls, (counts, symbols) in ((0, dc_tabs[t]), (1, ac_tabs[t])):
            out += b"\xff\xc4" + struct.pack(
                ">HB", 19 + len(symbols), (cls << 4) | t
            ) + bytes(counts) + bytes(symbols)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * channels, channels)
    for ci in range(channels):
        t = 0 if ci == 0 else 1
        out += bytes([ci + 1, (t << 4) | t])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    writer = _BitWriter()
    rst = 0
    for m, row in enumerate(events):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
        for ci, (size, diff, acs) in enumerate(row):
            t = 0 if ci == 0 else 1
            code, length = dc_codes[t][size]
            writer.write(code, length)
            if size:
                v = diff if diff > 0 else diff + (1 << size) - 1
                writer.write(v, size)
            for sym, v in acs:
                code, length = ac_codes[t][sym]
                writer.write(code, length)
                s = sym & 0x0F
                if s:
                    ev = v if v > 0 else v + (1 << s) - 1
                    writer.write(ev, s)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline JFIF stream. Returns the same dict shape as
    operators/multimodal.decode_media: {fmt, width, height, channels,
    sample_rate, values} with `values` the row-major interleaved
    gray/RGB bytes."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_dec: dict[int, _HuffDecoder] = {}
    ac_dec: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    prog_planes = None  # per-component coefficient state (SOF2)
    while i < len(payload):
        if payload[i] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {i}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them so foreign encoders' output parses.
        while i + 1 < len(payload) and payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        seg_len, = struct.unpack_from(">H", payload, i)
        seg = payload[i + 2 : i + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qtabs[tq] = np.frombuffer(
                    seg[j + 1 : j + 65], dtype=np.uint8
                ).astype(np.int64)
                j += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {
                "w": fw, "h": fh, "comps": comps,
                "prog": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0/1) and huffman "
                f"progressive (SOF2) supported, got SOF 0xFF{marker:02x}"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0x0F
                counts = list(seg[j + 1 : j + 17])
                n = sum(counts)
                symbols = list(seg[j + 17 : j + 17 + n])
                dec = _HuffDecoder(counts, symbols)
                (dc_dec if cls == 0 else ac_dec)[tid] = dec
                j += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval, = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(
                    x for x in frame["comps"] if x["id"] == cs
                )
                # table decoders resolved lazily: progressive refine
                # scans may legally omit the table their class ignores
                scan.append({**comp, "td": tt >> 4, "ta": tt & 0x0F})
            if not frame.get("prog"):
                for c in scan:
                    c["dc"], c["ac"] = dc_dec[c["td"]], ac_dec[c["ta"]]
                data_start = i + seg_len
                pixels, consumed = _decode_scan(
                    payload, data_start, frame, scan, qtabs,
                    restart_interval,
                )
                return pixels
            # progressive: accumulate coefficients across scans
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            if prog_planes is None:
                prog_planes = _prog_init(frame)
            i = _decode_prog_scan(
                payload, i + seg_len, frame, scan, prog_planes,
                dc_dec, ac_dec, ss, se, ah, al, restart_interval,
            )
            continue
        i += seg_len
    if frame is not None and frame.get("prog") and prog_planes is not None:
        return _prog_reconstruct(frame, prog_planes, qtabs)
    raise ValueError("JPEG: no scan data")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan: list[dict],
    qtabs: dict[int, np.ndarray],
    restart_interval: int,
) -> tuple[dict, int]:
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # per-component coefficient planes (in blocks)
    planes = []
    for c in scan:
        bx, by = mcus_x * c["h"], mcus_y * c["v"]
        planes.append(np.zeros((by * bx, 64), dtype=np.int64))

    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    rst_expect = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_to_marker()
            b0, b1 = data[reader.pos], data[reader.pos + 1]
            if b0 != 0xFF or not (0xD0 <= b1 <= 0xD7):
                raise ValueError("JPEG: expected restart marker")
            if b1 - 0xD0 != (rst_expect & 7):
                raise ValueError("JPEG: restart marker out of sequence")
            reader.pos += 2
            rst_expect += 1
            preds = [0] * len(scan)
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(scan):
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    size = c["dc"].decode(reader)
                    diff = _receive_extend(reader, size)
                    preds[ci] += diff
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        sym = c["ac"].decode(reader)
                        if sym == 0x00:  # EOB
                            break
                        run, s = sym >> 4, sym & 0x0F
                        if s == 0:
                            if run != 15:
                                raise ValueError("JPEG: bad AC symbol")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("JPEG: AC index overflow")
                        zz[k] = _receive_extend(reader, s)
                        k += 1
                    bx_tot = mcus_x * c["h"]
                    row = my * c["v"] + v
                    col = mx * c["h"] + hh
                    planes[ci][row * bx_tot + col] = zz

    # dequant + IDCT per component, vectorised over all blocks
    comp_px = []
    for ci, c in enumerate(scan):
        q = qtabs[c["tq"]]
        coefs = np.zeros((planes[ci].shape[0], 64), dtype=np.float64)
        coefs[:, _ZIGZAG] = planes[ci] * q  # de-zig-zag + dequant
        blocks = _idct(coefs.reshape(-1, 8, 8)) + 128.0
        bx_tot, by_tot = mcus_x * c["h"], mcus_y * c["v"]
        plane = (
            blocks.reshape(by_tot, bx_tot, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by_tot * 8, bx_tot * 8)
        )
        # upsample to full MCU grid resolution, then crop
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0),
                hmax // c["h"], axis=1,
            )
        comp_px.append(plane[:h, :w])

    if len(scan) == 1:
        out = np.clip(np.round(comp_px[0]), 0, 255).astype(np.uint8)
        values = out.tobytes()
        channels = 1
    elif len(scan) == 3:
        y, cb, cr = comp_px
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        values = out.tobytes()
        channels = 3
    else:
        raise NotImplementedError(f"{len(scan)}-component scan")
    return (
        {
            "fmt": "jpeg", "width": w, "height": h, "channels": channels,
            "sample_rate": None, "values": values,
        },
        reader.pos,
    )


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding — T.81 Annex G
# ---------------------------------------------------------------------------
#
# A progressive frame splits the coefficient data across SCANS: DC
# first/refinement scans (spectral band 0..0, successive-approximation
# bit planes) and per-component AC scans (band Ss..Se, first pass with
# EOB-run coding, then refinement passes that add one bit per
# coefficient). The decoder accumulates a per-component coefficient
# plane across scans and reconstructs (dequant + IDCT) once at EOI —
# entropy reorganisation only, so a progressive file of the same
# quantized coefficients decodes BIT-IDENTICALLY to its sequential
# twin (pinned by tests/test_functions.py).


def _prog_geometry(frame: dict) -> dict:
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return {"hmax": hmax, "vmax": vmax, "mcus_x": mcus_x, "mcus_y": mcus_y}


def _prog_init(frame: dict) -> dict:
    g = _prog_geometry(frame)
    planes = {}
    for c in frame["comps"]:
        bx, by = g["mcus_x"] * c["h"], g["mcus_y"] * c["v"]
        planes[c["id"]] = np.zeros((by * bx, 64), dtype=np.int64)
    return {"geom": g, "planes": planes}


def _comp_block_grid(frame: dict, c: dict, g: dict) -> tuple[int, int, int]:
    """(blocks_wide, blocks_high, plane_row_stride) for a
    NON-interleaved scan over component c: the component's own pixel
    dims (ceil of the sampling-scaled frame dims) in 8-px blocks; the
    plane is stored at the padded MCU grid, so the row stride is the
    MCU-grid width."""
    cw = (frame["w"] * c["h"] + g["hmax"] - 1) // g["hmax"]
    chh = (frame["h"] * c["v"] + g["vmax"] - 1) // g["vmax"]
    return (cw + 7) // 8, (chh + 7) // 8, g["mcus_x"] * c["h"]


def _prog_restart(
    data: bytes, reader: _BitReader, rst_expect: int
) -> int:
    reader.align_to_marker()
    b0, b1 = data[reader.pos], data[reader.pos + 1]
    if b0 != 0xFF or not (0xD0 <= b1 <= 0xD7):
        raise ValueError("JPEG: expected restart marker")
    if b1 - 0xD0 != (rst_expect & 7):
        raise ValueError("JPEG: restart marker out of sequence")
    reader.pos += 2
    return rst_expect + 1


def _decode_prog_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan: list[dict],
    state: dict,
    dc_dec: dict,
    ac_dec: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> int:
    """Decode one progressive scan into the accumulated coefficient
    planes; returns the payload offset of the next marker."""
    g = state["geom"]
    reader = _BitReader(data, pos)
    rst_expect = 0
    if ss == 0:  # DC scan (may be interleaved)
        if se != 0:
            raise ValueError("JPEG: DC scan with Se != 0")
        preds = [0] * len(scan)

        def dc_one(zz, ci, c):
            if ah == 0:  # first DC scan
                size = dc_dec[c["td"]].decode(reader)
                diff = _receive_extend(reader, size)
                preds[ci] += diff
                zz[0] = preds[ci] << al
            else:  # refinement: one raw bit per block
                if reader.read_bit():
                    zz[0] |= 1 << al

        if len(scan) == 1:
            # non-interleaved: the MCU is one block of the COMPONENT
            # grid (no MCU padding), T.81 A.2.2
            c = scan[0]
            plane = state["planes"][c["id"]]
            bxc, byc, stride = _comp_block_grid(frame, c, g)
            for m in range(bxc * byc):
                if restart_interval and m and m % restart_interval == 0:
                    rst_expect = _prog_restart(data, reader, rst_expect)
                    preds = [0]
                r, q = divmod(m, bxc)
                dc_one(plane[r * stride + q], 0, c)
        else:
            for m in range(g["mcus_x"] * g["mcus_y"]):
                if restart_interval and m and m % restart_interval == 0:
                    rst_expect = _prog_restart(data, reader, rst_expect)
                    preds = [0] * len(scan)
                my, mx = divmod(m, g["mcus_x"])
                for ci, c in enumerate(scan):
                    plane = state["planes"][c["id"]]
                    stride = g["mcus_x"] * c["h"]
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            idx = (my * c["v"] + v) * stride + (
                                mx * c["h"] + hh
                            )
                            dc_one(plane[idx], ci, c)
        reader.align_to_marker()
        return reader.pos

    # AC scan: exactly one component by spec
    if len(scan) != 1:
        raise ValueError("JPEG: interleaved AC progressive scan")
    c = scan[0]
    plane = state["planes"][c["id"]]
    bxc, byc, stride = _comp_block_grid(frame, c, g)
    eobrun = 0
    for m in range(bxc * byc):
        if restart_interval and m and m % restart_interval == 0:
            rst_expect = _prog_restart(data, reader, rst_expect)
            eobrun = 0
        r, q = divmod(m, bxc)
        zz = plane[r * stride + q]
        if ah == 0:
            eobrun = _ac_first_block(
                reader, ac_dec[c["ta"]], zz, ss, se, al, eobrun
            )
        else:
            eobrun = _ac_refine_block(
                reader, ac_dec[c["ta"]], zz, ss, se, al, eobrun
            )
    reader.align_to_marker()
    return reader.pos


def _ac_first_block(
    reader, ac: _HuffDecoder, zz, ss: int, se: int, al: int, eobrun: int
) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = ac.decode(reader)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            return (1 << r) + reader.read_bits(r) - 1  # EOBn
        k += r
        if k > se:
            raise ValueError("JPEG: AC index overflow")
        zz[k] = _receive_extend(reader, s) << al
        k += 1
    return 0


def _ac_refine_block(
    reader, ac: _HuffDecoder, zz, ss: int, se: int, al: int, eobrun: int
) -> int:
    """AC successive-approximation refinement (G.1.2.3): newly
    significant coefficients arrive as (run, 1) symbols + sign bit;
    every nonzero-history coefficient passed over — including inside
    an EOB run — receives one correction bit."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = ac.decode(reader)
            r, s = sym >> 4, sym & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) + reader.read_bits(r)
                    break
                # ZRL: advance past 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG: bad AC refinement symbol")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    if reader.read_bit():
                        if (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if reader.read_bit():
                    if (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _prog_reconstruct(frame: dict, state: dict, qtabs: dict) -> dict:
    g = state["geom"]
    w, h = frame["w"], frame["h"]
    comp_px = []
    for c in frame["comps"]:
        q = qtabs[c["tq"]]
        plane = state["planes"][c["id"]]
        coefs = np.zeros((plane.shape[0], 64), dtype=np.float64)
        coefs[:, _ZIGZAG] = plane * q
        blocks = _idct(coefs.reshape(-1, 8, 8)) + 128.0
        bx_tot = g["mcus_x"] * c["h"]
        by_tot = g["mcus_y"] * c["v"]
        px = (
            blocks.reshape(by_tot, bx_tot, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by_tot * 8, bx_tot * 8)
        )
        if c["h"] != g["hmax"] or c["v"] != g["vmax"]:
            px = np.repeat(
                np.repeat(px, g["vmax"] // c["v"], axis=0),
                g["hmax"] // c["h"], axis=1,
            )
        comp_px.append(px[:h, :w])
    if len(comp_px) == 1:
        out = np.clip(np.round(comp_px[0]), 0, 255).astype(np.uint8)
        return {
            "fmt": "jpeg", "width": w, "height": h, "channels": 1,
            "sample_rate": None, "values": out.tobytes(),
        }
    if len(comp_px) == 3:
        y, cb, cr = comp_px
        r = y + 1.402 * (cr - 128.0)
        gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, gg, b], axis=-1)
        out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        return {
            "fmt": "jpeg", "width": w, "height": h, "channels": 3,
            "sample_rate": None, "values": out.tobytes(),
        }
    raise NotImplementedError(f"{len(comp_px)}-component frame")


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — staged-payload twin of encode_jpeg
# ---------------------------------------------------------------------------


def _dc_first_events(comp_blocks, channels, al):
    """Interleaved first DC scan: diffs of (DC >> al), per-comp preds."""
    events = []  # (table, "sym", s) / ("bits", v, n)
    preds = [0] * channels
    for m in range(len(comp_blocks[0])):
        for ci in range(channels):
            t = 0 if ci == 0 else 1
            dc = int(comp_blocks[ci][m][0]) >> al  # arithmetic shift
            diff = dc - preds[ci]
            preds[ci] = dc
            s = _size_of(diff)
            events.append((t, "sym", s))
            if s:
                v = diff if diff > 0 else diff + (1 << s) - 1
                events.append((t, "bits", v, s))
    return events


def _ac_first_events(blocks, al):
    """Single-component first AC scan (band 1..63) with EOB-run
    accumulation across blocks."""
    events = []
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            events.append((0, "sym", (n << 4) | 0))
            if n:
                events.append((0, "bits", eobrun - (1 << n), n))
            eobrun = 0

    for zz in blocks:
        vals = [
            (abs(int(zz[k])) >> al) * (1 if zz[k] >= 0 else -1)
            for k in range(64)
        ]
        nz = [k for k in range(1, 64) if vals[k] != 0]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        k = 1
        for pos in nz:
            r = pos - k
            while r > 15:
                events.append((0, "sym", 0xF0))  # ZRL
                r -= 16
            v = vals[pos]
            s = _size_of(v)
            events.append((0, "sym", (r << 4) | s))
            ev = v if v > 0 else v + (1 << s) - 1
            events.append((0, "bits", ev, s))
            k = pos + 1
        if k <= 63:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return events


def _ac_refine_events(blocks, al):
    """Single-component AC refinement scan (G.1.2.3 encoder side):
    (run,1)+sign for newly significant coefficients, buffered
    correction bits for history coefficients — flushed after each
    emitted symbol and after each EOB-run flush."""
    events = []
    eobrun = 0
    pend: list[int] = []  # buffered correction bits

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            events.append((0, "sym", (n << 4) | 0))
            if n:
                events.append((0, "bits", eobrun - (1 << n), n))
            eobrun = 0
        for b in pend:
            events.append((0, "bits", b, 1))
        pend.clear()

    for zz in blocks:
        absv = [abs(int(zz[k])) >> al for k in range(64)]
        eob = 0  # index of the LAST newly-significant coefficient
        for k in range(1, 64):
            if absv[k] == 1:
                eob = k
        r = 0
        block_bits: list[int] = []
        for k in range(1, 64):
            temp = absv[k]
            if temp == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush_eob()
                events.append((0, "sym", 0xF0))
                r -= 16
                for b in block_bits:
                    events.append((0, "bits", b, 1))
                block_bits = []
            if temp > 1:  # history coefficient: one correction bit
                block_bits.append(temp & 1)
                continue
            flush_eob()
            events.append((0, "sym", (r << 4) | 1))
            events.append((0, "bits", 1 if zz[k] >= 0 else 0, 1))
            for b in block_bits:
                events.append((0, "bits", b, 1))
            block_bits = []
            r = 0
        if r > 0 or block_bits:
            eobrun += 1
            pend.extend(block_bits)
            if eobrun == 0x7FFF or len(pend) > 900:
                flush_eob()
    flush_eob()
    return events


def _write_scan(out, events, huff_class, channels, scan_comps, ss, se,
                ah, al, n_tables):
    """DHT (per scan, from this scan's histogram) + SOS + entropy."""
    freqs: list[dict] = [{} for _ in range(n_tables)]
    for e in events:
        if e[1] == "sym":
            freqs[e[0]][e[2]] = freqs[e[0]].get(e[2], 0) + 1
    tabs = [_huff_from_freq(f) for f in freqs]
    codes = [_canonical_codes(*t) for t in tabs]
    for t in range(n_tables):
        counts, symbols = tabs[t]
        if not symbols:
            continue
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(symbols), (huff_class << 4) | t
        ) + bytes(counts) + bytes(symbols)
    out += b"\xff\xda" + struct.pack(
        ">HB", 6 + 2 * len(scan_comps), len(scan_comps)
    )
    for ci in scan_comps:
        t = 0 if ci == 0 else 1
        sel = (t << 4) if huff_class == 0 else t
        out += bytes([ci + 1, sel])
    out += bytes([ss, se, (ah << 4) | al])
    writer = _BitWriter()
    for e in events:
        if e[1] == "sym":
            code, length = codes[e[0]][e[2]]
            writer.write(code, length)
        else:
            writer.write(e[2], e[3])
    writer.flush()
    out += writer.out


def encode_jpeg_progressive(
    w: int,
    h: int,
    pixels: bytes,
    channels: int = 1,
    dc_step: int = 8,
    ac_step: int = 16,
) -> bytes:
    """Progressive JFIF encoder (SOF2, 1×1 sampling): the SAME
    quantized coefficients as encode_jpeg, reorganised into a
    4/8-scan script — interleaved first DC (Al=1), per-component
    first AC (band 1..63, Al=1, EOB-run coded), DC refinement (raw
    bits), per-component AC refinement (correction bits) — so a
    progressive file must decode BIT-IDENTICALLY to its sequential
    twin. Per-scan canonical Huffman tables from each scan's own
    histogram."""
    assert channels in (1, 3) and len(pixels) == w * h * channels
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels)
    if channels == 3:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        comps = [np.clip(np.round(c), 0, 255) for c in comps]
    else:
        comps = [img[..., 0].astype(np.float64)]
    bw, bh = (w + 7) // 8, (h + 7) // 8
    qtab = _quant_tables(dc_step, ac_step)
    comp_blocks = []
    for c in comps:
        padded = np.pad(c, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        blocks = (
            padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        comp_blocks.append(_encode_blocks(blocks, qtab))

    n_tables = 1 if channels == 1 else 2
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        int(x) for x in qtab
    )
    out += b"\xff\xc2" + struct.pack(
        ">HBHHB", 8 + 3 * channels, 8, h, w, channels
    )
    for ci in range(channels):
        out += bytes([ci + 1, 0x11, 0])

    # scan 1: interleaved first DC, Al=1
    _write_scan(out, _dc_first_events(comp_blocks, channels, 1),
                0, channels, list(range(channels)), 0, 0, 0, 1, n_tables)
    # scans 2..: per-component first AC (band 1..63, Al=1)
    for ci in range(channels):
        ev = [
            (0 if ci == 0 else 1, *e[1:])
            for e in _ac_first_events(comp_blocks[ci], 1)
        ]
        _write_scan(out, ev, 1, channels, [ci], 1, 63, 0, 1, n_tables)
    # DC refinement: raw bits, no Huffman symbols
    dc_ref = bytearray(b"\xff\xda" + struct.pack(
        ">HB", 6 + 2 * channels, channels))
    for ci in range(channels):
        dc_ref += bytes([ci + 1, 0])
    dc_ref += bytes([0, 0, (1 << 4) | 0])
    writer = _BitWriter()
    for m in range(bw * bh):
        for ci in range(channels):
            writer.write(int(comp_blocks[ci][m][0]) & 1, 1)
    writer.flush()
    out += dc_ref + writer.out
    # per-component AC refinement (Ah=1, Al=0)
    for ci in range(channels):
        ev = [
            (0 if ci == 0 else 1, *e[1:])
            for e in _ac_refine_events(comp_blocks[ci], 0)
        ]
        _write_scan(out, ev, 1, channels, [ci], 1, 63, 1, 0, n_tables)
    out += b"\xff\xd9"
    return bytes(out)
