"""From-scratch baseline JPEG codec (ITU-T T.81 / ISO 10918-1), built
only on the published spec — no Pillow, no libjpeg.

Closes the last decode-tier gap (reference F17 relies on PIL throughout,
utils/utils.py:271-312; this sandbox has no Pillow, so JPEG page images
previously surfaced only as a distinct undecodable class). Scope:

  encode_jpeg: baseline sequential DCT, GRAYSCALE (one component,
    JFIF), Annex-K luminance quantization + Huffman tables, level
    shift -> 8x8 forward DCT -> quantize -> zigzag -> DC-differential
    + AC run-length Huffman coding with 0xFF byte stuffing.
  decode_jpeg: general baseline decoder — parses DQT/SOF0/DHT/SOS/DRI,
    builds Huffman tables from the file (not assumed), entropy-decodes
    with restart-marker support, dequantizes, inverse-zigzags, IDCTs.
    Grayscale (1 component) and non-subsampled YCbCr (3 components,
    4:4:4) are supported; progressive (SOF2), arithmetic coding, and
    subsampled MCUs raise ValueError — callers fall through to the
    undecodable accounting tier, never to silently wrong pixels.

EXACTNESS CONTRACT (what lets an ANSI-SQL oracle gate a lossy codec):
a block that is CONSTANT decodes bit-exactly whenever its level-shifted
value is a multiple of 2 — the only nonzero coefficient is the DC
(8*(v-128)), the Annex-K DC quantum is 16, so round(8u/16)*16 == 8u for
even u and the float IDCT reproduces u to ~1e-13 before rounding.
synth_jpeg builds such flat-block fixtures; arbitrary images round-trip
within a small tolerance (pytest pins both).
"""

from __future__ import annotations

import struct

import numpy as np

# -- Annex K.1: luminance quantization table (quality-50 base) ---------------
QTABLE_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

# -- Annex K.3: typical Huffman tables (BITS counts + values) ----------------
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
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
]

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    t = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    t[0, :] = 1.0 / np.sqrt(8.0)
    return t


_T = _dct_matrix()


def _huff_code_table(bits, vals):
    """(value -> (code, length)) per T.81 C.2 canonical code assignment."""
    codes = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:        # byte stuffing (F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill padding
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def encode_jpeg(arr: np.ndarray, restart_interval: int = 0) -> bytes:
    """(h, w) uint8 grayscale -> baseline JFIF bytes (Annex-K tables).

    `restart_interval` > 0 emits a DRI segment and an RSTn marker every
    N MCUs (T.81 E.1.2/F.1.2.3: bit padding, modulo-8 marker cycling,
    DC predictor reset) — restart markers are what let a decoder
    entropy-decode segments independently."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("encode_jpeg supports grayscale (h, w) only")
    h, w = a.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = a
    padded[h:, :w] = a[h - 1:h, :]          # edge replication
    padded[:, w:] = padded[:, w - 1:w]

    q = QTABLE_LUM.astype(np.float64)
    dc_codes = _huff_code_table(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _huff_code_table(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BitWriter()
    prev_dc = 0
    mcu = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # close the segment: 1-fill pad, RSTn (cycling 0..7)
                bw.out = bytearray(bw.flush())
                bw.acc = 0
                bw.nbits = 0
                bw.out += bytes(
                    [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8])
                prev_dc = 0
            mcu += 1
            block = padded[by:by + 8, bx:bx + 8] - 128.0
            coef = _T @ block @ _T.T
            quant = np.round(coef / q).astype(np.int64)
            zz = quant.reshape(-1)[ZIGZAG]
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            s = _category(diff)
            code, ln = dc_codes[s]
            bw.write(code, ln)
            if s:
                bw.write(_amplitude(diff, s), s)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]    # ZRL
                    bw.write(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = ac_codes[(run << 4) | s]
                bw.write(code, ln)
                bw.write(_amplitude(v, s), s)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]        # EOB
                bw.write(code, ln)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, b"\x00" + bytes(
        int(QTABLE_LUM.reshape(-1)[ZIGZAG[i]]) for i in range(64)))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1)
              + bytes([1, 0x11, 0]))
    dht = (seg(0xFFC4, b"\x00" + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
           + seg(0xFFC4, b"\x10" + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS)))
    sos = seg(0xFFDA, b"\x01" + bytes([1, 0x00]) + bytes([0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = (seg(0xFFDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    return (b"\xff\xd8" + app0 + dqt + sof + dht + dri + sos
            + entropy + b"\xff\xd9")


class _HuffDecode:
    """Canonical Huffman table compiled to a 16-bit DIRECT lookup:
    lut_sym[w]/lut_len[w] give the decoded symbol and code length for
    any 16-bit window w whose prefix is a valid code (length 0 marks an
    invalid prefix). One numpy index replaces the old per-bit walk +
    dict probe — the table-driven state machine of every production
    JPEG decoder. Memory: 3 bytes x 65,536 per table (4 tables in a
    baseline color scan)."""

    def __init__(self, bits, vals):
        self.lut_sym = np.zeros(1 << 16, dtype=np.int16)
        self.lut_len = np.zeros(1 << 16, dtype=np.uint8)
        code = 0
        idx = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                hi = (code + 1) << (16 - length)
                self.lut_sym[lo:hi] = vals[idx]
                self.lut_len[lo:hi] = length
                code += 1
                idx += 1
            code <<= 1


def _entropy_segments(data: bytes) -> list[np.ndarray]:
    """Vectorized entropy-stream preparation: strip FF00 byte stuffing
    and split at RSTn markers — all with numpy over the raw scan bytes.
    Returns the restart segments in order; any non-RST marker (EOI, the
    next header) terminates the scan."""
    b = np.frombuffer(data, dtype=np.uint8)
    ff = np.nonzero(b == 0xFF)[0]
    segs: list[np.ndarray] = []
    start = 0
    stuffed: list[int] = []

    def close(endpos: int) -> None:
        seg = b[start:endpos]
        if stuffed:
            seg = np.delete(seg, np.asarray(stuffed) - start)
        segs.append(seg)

    for p in ff:
        if p < start:
            continue            # consumed by a previous marker
        nxt = int(b[p + 1]) if p + 1 < len(b) else 0xD9
        if nxt == 0x00:
            stuffed.append(p + 1)
            continue
        close(p)
        if 0xD0 <= nxt <= 0xD7:       # restart marker: next segment
            start = p + 2
            stuffed = []
            continue
        return segs                    # EOI / next header: scan over
    close(len(b))
    return segs


def _idct_batch(zz: np.ndarray, q: np.ndarray) -> np.ndarray:
    """[n, 64] zigzag coefficient rows -> [n, 8, 8] spatial blocks: one
    dequantize + two batched GEMMs for ALL blocks of a component."""
    coef = np.zeros(zz.shape, dtype=np.float64)
    coef[:, ZIGZAG] = zz * q.reshape(-1)[ZIGZAG][None, :]
    c = coef.reshape(-1, 8, 8)
    return np.einsum("ij,njk,kl->nil", _T.T, c, _T, optimize=True)


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w) uint8 (grayscale) or (h, w, 3)
    uint8 RGB (non-subsampled YCbCr). Unsupported profiles raise."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecode] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    i = 2
    while i < len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        ln = struct.unpack(">H", payload[i + 2:i + 4])[0]
        seg = payload[i + 4:i + 2 + ln]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                n = 64 * (2 if prec else 1)
                raw = seg[p:p + n]
                vals = (np.frombuffer(raw, dtype=">u2") if prec
                        else np.frombuffer(raw, dtype=np.uint8))
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = vals
                qtables[tid] = tbl.reshape(8, 8)
                p += n
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                huff[(cls, tid)] = _HuffDecode(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, samp, qid = seg[6 + c * 3:9 + c * 3]
                if samp != 0x11:
                    raise ValueError("subsampled JPEG unsupported")
                comps.append({"id": cid, "qid": qid})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            tids = {}
            for c in range(ns):
                cid, tt = seg[1 + c * 2], seg[2 + c * 2]
                tids[cid] = (tt >> 4, tt & 0x0F)
            data = payload[i + 2 + ln:]
            return _decode_scan(data, comps, tids, qtables, huff,
                                h, w, restart_interval)
        i += 2 + ln
    raise ValueError("no SOS marker")


def _decode_scan(data, comps, tids, qtables, huff, h, w,
                 restart_interval) -> np.ndarray:
    """Entropy decode + batched reconstruction.

    The stream is prepared VECTORIZED (_entropy_segments: stuffing
    stripped, restart segments split with numpy); inside a segment the
    bit cursor is the only sequential state — each Huffman symbol is
    one precomputed-24-bit-window shift plus one direct-LUT index
    (_HuffDecode), each magnitude read one shift, with no per-bit
    Python. Decoded coefficients accumulate as [n_blocks, 64] zigzag
    rows per component and reconstruct in ONE dequant + batched-GEMM
    IDCT (_idct_batch) — image-heavy corpora no longer serialize on a
    per-bit reader and a per-block 8x8 GEMM."""
    bh, bw_ = -(-h // 8), -(-w // 8)
    n_comp = len(comps)
    mcu_total = bh * bw_
    per_seg = restart_interval if restart_interval else mcu_total
    zz = [np.zeros((mcu_total, 64), dtype=np.int64) for _ in comps]
    tabs = [(huff[(0, tids[c["id"]][0])], huff[(1, tids[c["id"]][1])])
            for c in comps]
    segs = _entropy_segments(data) or [np.zeros(0, dtype=np.uint8)]
    mcu = 0
    for seg in segs:
        if mcu >= mcu_total:
            break
        # B3[i] = 24-bit window starting at byte i (2-byte zero tail):
        # the 16-bit window at BIT p is one index + shift away
        byts = np.concatenate(
            [seg, np.zeros(4, dtype=np.uint8)]).astype(np.uint32)
        B3 = ((byts[:-2] << 16) | (byts[1:-1] << 8) | byts[2:]).tolist()
        nB = len(B3)
        p = 0
        prev_dc = [0] * n_comp
        end = min(mcu + per_seg, mcu_total)
        while mcu < end:
            for ci in range(n_comp):
                dc_tab, ac_tab = tabs[ci]
                row = zz[ci][mcu]
                # DC: one LUT hit + one magnitude read
                i = p >> 3
                wdw = (B3[i] >> (8 - (p & 7))) & 0xFFFF if i < nB else 0
                s = int(dc_tab.lut_sym[wdw])
                ln = int(dc_tab.lut_len[wdw])
                if ln == 0:
                    raise ValueError("bad huffman code")
                p += ln
                if s:
                    i = p >> 3
                    wdw = (B3[i] >> (8 - (p & 7))) & 0xFFFF if i < nB else 0
                    prev_dc[ci] += _extend(wdw >> (16 - s), s)
                    p += s
                row[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    i = p >> 3
                    wdw = (B3[i] >> (8 - (p & 7))) & 0xFFFF if i < nB else 0
                    rs = int(ac_tab.lut_sym[wdw])
                    ln = int(ac_tab.lut_len[wdw])
                    if ln == 0:
                        raise ValueError("bad huffman code")
                    p += ln
                    if rs == 0x00:
                        break
                    if rs == 0xF0:
                        k += 16
                        continue
                    k += rs >> 4
                    s = rs & 0x0F
                    if k > 63:
                        raise ValueError("AC index overrun")
                    i = p >> 3
                    wdw = (B3[i] >> (8 - (p & 7))) & 0xFFFF if i < nB else 0
                    row[k] = _extend(wdw >> (16 - s), s)
                    p += s
                    k += 1
            mcu += 1
    planes = []
    for ci, comp in enumerate(comps):
        blocks = _idct_batch(zz[ci], qtables[comp["qid"]])  # [n, 8, 8]
        plane = (blocks.reshape(bh, bw_, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8))
        planes.append(plane)
    out = [np.clip(np.round(p[:h, :w] + 128.0), 0, 255) for p in planes]
    if len(out) == 1:
        return out[0].astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def synth_jpeg(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic EXACT-round-trip fixture: every 8x8 block is
    constant with an EVEN level-shift (see the exactness contract), the
    value a closed-form function of (doc_id, block position) — so an
    ANSI-SQL oracle can recompute decoded features bit-for-bit.
    value(bx, by) = 128 + 2*(((doc_id + 3*bx + 7*by) % 49) - 24)."""
    bh, bw_ = -(-height // 8), -(-width // 8)
    by, bx = np.mgrid[0:bh, 0:bw_]
    vals = 128 + 2 * (((doc_id + 3 * bx + 7 * by) % 49) - 24)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)[:height, :width]
    return encode_jpeg(img.astype(np.uint8))
