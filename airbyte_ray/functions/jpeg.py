"""Baseline JPEG (JFIF) codec — pure Python/numpy, no external libs.

Implements the baseline sequential DCT process of ITU-T T.81 (the public
JPEG spec): marker parsing (DQT/SOF0/DHT/SOS/DRI), Huffman entropy
decode of interleaved MCUs, dequantize + inverse zigzag, 8×8 IDCT as a
matrix product (``C.T @ X @ C`` with the orthonormal DCT-II basis,
``einsum``-vectorized over ALL blocks of a component at once), chroma
upsampling for 4:2:0/4:2:2, and the BT.601 YCbCr→RGB transform.  The
encoder emits baseline 4:4:4 with the spec's Annex-K example quantization
and Huffman tables, scaled by a libjpeg-style quality factor.

Scope and honesty notes:

* Baseline sequential only — progressive (SOF2), arithmetic coding, and
  12-bit precision raise loudly rather than mis-decode.
* The entropy decoder's bit loop is Python (a Huffman stream is
  inherently sequential); everything after entropy decode is vectorized
  numpy.  This is a CORRECTNESS baseline for the multimodal decode
  stage — a production deployment would swap in a codec library inside
  the same ``MediaDecode`` actor signature, which is the Ray-side
  contract this module exists to exercise.
* JPEG is lossy: round-trip tests assert PSNR bounds and bit-exact
  determinism, not pixel equality (unlike the PPM/BMP/PNG codecs).

Reference analog: none — the reference ingests opaque blobs; this
belongs to the training-data operator family (decode → feature →
resize pipelines over binary columns).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

#: zigzag order: index i of the scan → (row, col) flat index in the 8×8 block
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K example tables (T.81 §K.1) — luminance / chrominance quant
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int64)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int64)

# Annex K example Huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _dct_basis() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis C: forward = C @ x @ C.T."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8)
    c[0] *= np.sqrt(0.5)
    return c


_C = _dct_basis()


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------

def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical codes per T.81 §C.2: value → (code, length)."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Canonical-Huffman decoder: per-length (min_code, max_code, value
    offset) arrays — decode walks lengths 1..16 comparing the running
    code, the standard T.81 §F.2.2.3 DECODE procedure."""

    def __init__(self, bits: list[int], values: list[int]):
        self.min_code = np.full(17, 0, np.int64)
        self.max_code = np.full(17, -1, np.int64)
        self.val_ptr = np.zeros(17, np.int64)
        self.values = list(values)
        code, i = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.val_ptr[length] = i
                self.min_code[length] = code
                code += n
                i += n
                self.max_code[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and RSTn awareness (T.81 §F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0  # pad past EOI (spec allows)
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed 0xFF
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                # a real marker (RSTn / EOI): stop feeding, pad with zeros
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def decode(self, h: _HuffDecoder) -> int:
        code = self.read_bit()
        for length in range(1, 17):
            if h.min_code[length] <= code <= h.max_code[length]:
                return h.values[h.val_ptr[length] + code - h.min_code[length]]
            code = (code << 1) | self.read_bit()
        raise ValueError("invalid Huffman code in entropy stream")

    def align_restart(self):
        """Byte-align and consume an RSTn marker (T.81 §F.2.1.3.1)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _extend(v: int, n: int) -> int:
    """T.81 §F.2.2.1 EXTEND: map the n-bit magnitude to its signed value."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB (grayscale replicates)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4: pos + 2 + seg_len]
        pos_next = pos + 2 + seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq_, tq = body[i] >> 4, body[i] & 0xF
                if pq_ != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                qt[tq] = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int64)
                i += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci], body[7 + 3 * ci], body[8 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise ValueError("progressive JPEG unsupported (baseline decoder)")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1: i + 17])
                nv = sum(bits)
                vals = list(body[i + 17: i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0xF))
            return _decode_scan(payload, pos_next, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        pos = pos_next
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient planes (in blocks)
    planes = {}
    for c in comps:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        planes[c["id"]] = np.zeros((bh * bw, 64), np.int64)
    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = mcux * mcuy
    for m in range(mcu_count):
        if dri and m and m % dri == 0:
            br.align_restart()
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for comp, td, ta in scan:
            hd, ha = huff_dc[td], huff_ac[ta]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    blk = np.zeros(64, np.int64)
                    t = br.decode(hd)
                    diff = _extend(br.receive(t), t)
                    pred[comp["id"]] += diff
                    blk[0] = pred[comp["id"]]
                    k = 1
                    while k < 64:
                        rs = br.decode(ha)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        blk[k] = _extend(br.receive(s), s)
                        k += 1
                    row = my * comp["v"] + by
                    col = mx * comp["h"] + bx
                    planes[comp["id"]][row * mcux * comp["h"] + col] = blk
    # dequantize + unzigzag + IDCT, vectorized per component
    out_planes = []
    for c in comps:
        coeffs = planes[c["id"]] * qt[c["tq"]][None, :]
        blocks = coeffs[:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        # IDCT: x = C.T @ X @ C for every block at once
        spatial = np.einsum("ij,bjk,kl->bil", _C.T, blocks, _C) + 128.0
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        img = spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # upsample to full MCU grid resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
        out_planes.append(img[: h, : w])
    if len(out_planes) == 1:
        y = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline 4:4:4, Annex-K tables)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec

    def restart(self, m: int):
        """Byte-align and emit RSTm (T.81 §F.1.2.3)."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (m % 8)])


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling (public IJG convention)."""
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def _mag_bits(v: int) -> tuple[int, int]:
    """Signed value → (size, magnitude bits) per T.81 §F.1.2.1.2."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = int(a).bit_length()
    return n, (v if v > 0 else v + (1 << n) - 1)


def _plane_coeffs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Pad to 8×8 blocks (edge replication), forward DCT, quantize →
    (block_rows, block_cols, 64) int64 in ZIGZAG scan order."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
    blocks = p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    dct = np.einsum("ij,bjk,kl->bil", _C, blocks, _C.T)
    # q is in RASTER order (the Annex-K matrices as printed); divide in
    # raster space, THEN permute the scan into zigzag order
    quant = np.round(dct.reshape(-1, 64) / q[None, :]).astype(np.int64)
    return quant[:, _ZIGZAG].reshape(ph // 8, pw // 8, 64)


def _write_block(bwr: _BitWriter, blk: np.ndarray, pred: int,
                 dc_t: dict, ac_t: dict) -> int:
    diff = int(blk[0]) - pred
    size, mag = _mag_bits(diff)
    code, ln = dc_t[size]
    bwr.write(code, ln)
    bwr.write(mag, size)
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_t[0xF0]  # ZRL
            bwr.write(code, ln)
            run -= 16
        size, mag = _mag_bits(v)
        code, ln = ac_t[(run << 4) | size]
        bwr.write(code, ln)
        bwr.write(mag, size)
        run = 0
    if last < 63:
        code, ln = ac_t[0x00]  # EOB
        bwr.write(code, ln)
    return int(blk[0])


def encode_jpeg(px: np.ndarray, quality: int = 90, subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (Annex-K tables).

    ``subsampling="420"`` downsamples chroma 2×2 (mean) and interleaves
    4 Y + Cb + Cr blocks per MCU; ``restart_interval`` emits DRI + RSTn
    markers every N MCUs — both exist chiefly so the decoder's MCU
    interleave / upsample / restart paths are exercised by round-trips."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w, _ = px.shape
    qy = _scale_quant(_QUANT_LUMA, quality)
    qc = _scale_quant(_QUANT_CHROMA, quality)
    # RGB → YCbCr (BT.601, JFIF full range)
    f = px.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128

    if subsampling == "420":
        hs = vs = 2
        eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
        def down(p):
            p = np.pad(p, ((0, eh - h), (0, ew - w)), mode="edge")
            return p.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        cb, cr = down(cb), down(cr)
        # luma padded so the MCU grid (16×16) is complete
        mh, mw = -(-h // 16) * 16, -(-w // 16) * 16
        y = np.pad(y, ((0, mh - h), (0, mw - w)), mode="edge")
    else:
        hs = vs = 1

    cy = _plane_coeffs(y, qy)
    ccb = _plane_coeffs(cb, qc)
    ccr = _plane_coeffs(cr, qc)
    dc_y = _huff_codes(*_DC_LUMA)
    ac_y = _huff_codes(*_AC_LUMA)
    dc_c = _huff_codes(*_DC_CHROMA)
    ac_c = _huff_codes(*_AC_CHROMA)

    bwr = _BitWriter()
    pred = [0, 0, 0]
    mcuy, mcux = ccb.shape[0], ccb.shape[1]  # chroma grid == MCU grid
    m = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and m and m % restart_interval == 0:
                bwr.restart(m // restart_interval - 1)
                pred = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    pred[0] = _write_block(
                        bwr, cy[my * vs + by, mx * hs + bx], pred[0], dc_y, ac_y)
            pred[1] = _write_block(bwr, ccb[my, mx], pred[1], dc_c, ac_c)
            pred[2] = _write_block(bwr, ccr[my, mx], pred[2], dc_c, ac_c)
            m += 1
    bwr.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qy[_ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, bytes([0x01]) + bytes(qc[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    samp = (hs << 4) | vs
    for cid, sf, tq in ((1, samp, 0), (2, 0x11, 1), (3, 0x11, 1)):
        sof += bytes([cid, sf, tq])
    out += seg(0xC0, sof)
    for tc_th, (bits, vals) in ((0x00, _DC_LUMA), (0x10, _AC_LUMA),
                                (0x01, _DC_CHROMA), (0x11, _AC_CHROMA)):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bwr.out
    out += b"\xff\xd9"
    return bytes(out)
