"""Baseline JPEG codec in pure numpy + stdlib (no image libraries).

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
any standard chroma sampling (4:4:4 / 4:2:2 / 4:2:0), restart markers,
byte stuffing — the format subset that covers the overwhelming majority
of real-world JPEGs. Progressive (SOF2), arithmetic coding and 12-bit
depth return None (the caller falls back to the stub path).

Encoder: 4:4:4 baseline with the Annex K example quantization and
Huffman tables — exists so the decoder can be tested round-trip inside
this container (which has no PIL/libjpeg); it is a correct, if
unoptimized, JPEG writer.

Everything here is from the public ITU-T T.81 spec (Annex F baseline
procedure, Annex K example tables).
"""

from __future__ import annotations

import struct

import numpy as np

# ZIGZAG[k] = natural (row-major) index of the k-th coefficient in
# zigzag scan order (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# 8x8 DCT-II basis matrix: IDCT is C.T @ block @ C, FDCT is C @ x @ C.T
_k = np.arange(8)
_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.where(
    _k[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing removed and restart markers handled by the caller."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            self.bitbuf = (self.bitbuf << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:  # past end: pad with zeros (spec allows)
            self.bitbuf <<= n - self.nbits
            self.nbits = n
        self.nbits -= n
        v = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return v

    def reset(self) -> None:
        self.bitbuf = 0
        self.nbits = 0


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical per Annex C."""
    table = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    for _ in range(16):
        code = (code << 1) | br.read(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _extend(v: int, t: int) -> int:
    """Annex F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(blob: bytes) -> "np.ndarray | None":
    """Decode a baseline JPEG into (h, w, 3) uint8 RGB (grayscale
    replicates), or None for anything this subset doesn't cover."""
    if blob is None or len(blob) < 4 or blob[0:2] != b"\xff\xd8":
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    comp_tables: dict[int, tuple[int, int]] = {}  # cid -> (dc_id, ac_id)
    scan_order: list[int] = []
    data = None
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            return None
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", blob[pos : pos + 2])
        body = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0xF
                if pq != 0:
                    return None  # 16-bit tables: out of scope
                qt[tq] = np.frombuffer(b[1:65], np.uint8).astype(np.int32)
                b = b[65:]
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                return None
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / lossless
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                tc, th = b[0] >> 4, b[0] & 0xF
                counts = list(b[1:17])
                n = sum(counts)
                huff[(tc, th)] = _build_huffman(counts, bytes(b[17 : 17 + n]))
                b = b[17 + n :]
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for i in range(ns):
                cid, tables = body[1 + 2 * i], body[2 + 2 * i]
                comp_tables[cid] = (tables >> 4, tables & 0xF)
                scan_order.append(cid)
            data = blob[pos + seglen :]
            break
        pos += seglen
    if frame is None or data is None:
        return None
    h, w, comps = frame
    if not all(cid in comp_tables for cid, *_ in comps):
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # split entropy data at restart markers, strip stuffing per segment
    segments: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or other marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    planes = {
        cid: np.zeros((mcuy * vs * 8, mcux * hs * 8), np.float64)
        for cid, hs, vs, _ in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    seg_idx, br = 0, _BitReader(segments[0])
    mcus_done = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcus_done and mcus_done % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    return None
                br = _BitReader(segments[seg_idx])
                pred = {cid: 0 for cid, *_ in comps}
            for cid, hs, vs, tq in comps:
                dc_t = huff.get((0, comp_tables[cid][0]))
                ac_t = huff.get((1, comp_tables[cid][1]))
                q = qt.get(tq)
                if dc_t is None or ac_t is None or q is None:
                    return None
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, np.int32)
                        t = _huff_decode(br, dc_t)
                        diff = _extend(br.read(t), t)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            zz[k] = _extend(br.read(s), s)
                            k += 1
                        block = np.zeros(64, np.float64)
                        block[ZIGZAG] = zz * q
                        px = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
            mcus_done += 1

    # upsample to full resolution and crop
    full = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    if len(full) != 3:
        return None
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# ----------------------------------------------------------------- encoder

# Annex K.1/K.2 example quantization tables (luminance, chrominance)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int32)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int32)

# Annex K.3 example Huffman tables: (counts[16], symbols)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         bytes(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         bytes(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)


def _encode_table(counts, symbols) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length)."""
    dec = _build_huffman(counts, symbols)
    return {sym: (code, length) for (length, code), sym in dec.items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray,
                  dc_tab: dict, ac_tab: dict, pred: int) -> int:
    """FDCT + quantize + entropy-code one 8x8 block; returns the new DC
    predictor."""
    coef = _fdct2(block - 128.0)
    # zigzag order: zz[k] = quantized_coef[ZIGZAG[k]]
    zz = np.round(coef / q).astype(np.int32).ravel()[ZIGZAG]
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, length = dc_tab[t]
    bw.write(code, length)
    if t:
        mag = diff if diff >= 0 else diff + (1 << t) - 1
        bw.write(mag & ((1 << t) - 1), t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_tab[(run << 4) | s]
        bw.write(code, length)
        mag = v if v >= 0 else v + (1 << s) - 1
        bw.write(mag & ((1 << s) - 1), s)
        run = 0
    if last_nz < 63:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def _pad_to(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad a plane up to (ph, pw)."""
    h, w = p.shape
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    if ph > h:
        pp[h:, :w] = p[-1:, :]
    if pw > w:
        pp[:, w:] = pp[:, w - 1 : w]
    return pp


def encode_jpeg(arr: np.ndarray, subsample: bool = False) -> bytes:
    """Baseline JPEG from an (h, w, 3) uint8 RGB array (Annex K tables):
    4:4:4 by default, 4:2:0 (2x2 Y blocks + averaged chroma per MCU)
    with subsample=True."""
    h, w = arr.shape[:2]
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
    ql = _QL.reshape(8, 8).astype(np.float64)
    qc = _QC.reshape(8, 8).astype(np.float64)
    dc_l, dc_c = _encode_table(*_DC_L), _encode_table(*_DC_C)
    ac_l, ac_c = _encode_table(*_AC_L), _encode_table(*_AC_C)

    bw = _BitWriter()
    pred = [0, 0, 0]
    if not subsample:
        bh, bwid = -(-h // 8), -(-w // 8)
        planes = [_pad_to(p, bh * 8, bwid * 8) for p in (y, cb, cr)]
        qs, dcs, acs = [ql, qc, qc], [dc_l, dc_c, dc_c], [ac_l, ac_c, ac_c]
        for my in range(bh):
            for mx in range(bwid):
                for ci in range(3):
                    blk = planes[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                    pred[ci] = _encode_block(
                        bw, blk, qs[ci], dcs[ci], acs[ci], pred[ci]
                    )
        sampling = [0x11, 0x11, 0x11]
    else:
        mcuy, mcux = -(-h // 16), -(-w // 16)
        yp = _pad_to(y, mcuy * 16, mcux * 16)
        # chroma: 2x2 box average, one 8x8 block per 16x16 MCU
        cbp = _pad_to(cb, mcuy * 16, mcux * 16)
        crp = _pad_to(cr, mcuy * 16, mcux * 16)
        cbs = cbp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        crs = crp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(2):  # 4 Y blocks, raster order in MCU
                    for bx in range(2):
                        y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                        pred[0] = _encode_block(
                            bw, yp[y0 : y0 + 8, x0 : x0 + 8], ql, dc_l,
                            ac_l, pred[0],
                        )
                y0, x0 = my * 8, mx * 8
                pred[1] = _encode_block(
                    bw, cbs[y0 : y0 + 8, x0 : x0 + 8], qc, dc_c, ac_c, pred[1]
                )
                pred[2] = _encode_block(
                    bw, crs[y0 : y0 + 8, x0 : x0 + 8], qc, dc_c, ac_c, pred[2]
                )
        sampling = [0x22, 0x11, 0x11]
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    # DQT stores tables in zigzag order
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in _QL.ravel()[ZIGZAG]))
    out += seg(0xDB, bytes([0x01]) + bytes(int(x) for x in _QC.ravel()[ZIGZAG]))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes(
        [3, 1, sampling[0], 0, 2, sampling[1], 1, 3, sampling[2], 1]
    )
    out += seg(0xC0, sof)
    for tc_th, (counts, syms) in (
        (0x00, _DC_L), (0x10, _AC_L), (0x01, _DC_C), (0x11, _AC_C),
    ):
        out += seg(0xC4, bytes([tc_th]) + bytes(counts) + syms)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
