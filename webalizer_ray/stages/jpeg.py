"""Pure-numpy baseline JPEG codec (ITU-T T.81 / JFIF subset).

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr
with sampling factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0), restart
markers, canonical Huffman tables from DHT, dequant + vectorized
matrix IDCT over all blocks at once, BT.601 YCbCr→RGB.  Progressive
(SOF2), arithmetic coding, 12-bit and hierarchical modes raise
``ValueError`` — the same honest-subset discipline as decode_png /
decode_gif.  The entropy decode is inherently bit-serial (each
Huffman symbol's length depends on the previous ones) — the
documented per-payload exemption shared with zlib/LZW; everything
after the symbol stream (dequant, IDCT, upsample, color convert) is
vectorized numpy over all blocks.

Encoder: baseline 4:4:4 with the T.81 Annex K example quantization
tables (quality-scaled, the libjpeg convention) and Annex K typical
Huffman tables — it exists so fixtures can synthesize REAL JPEG
payloads; JPEG is lossy, so tests pin PSNR bounds and structural
round-trips rather than pixel equality.

This is a public-spec implementation from the standard's tables and
algorithms; no external codec library is involved.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

#: zigzag order: ZIGZAG[i] = block index (row*8+col) of the i-th
#: coefficient in transmission order
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

#: T.81 Annex K.1 example luminance / chrominance quant tables
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

# T.81 Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

#: 8×8 DCT-II basis matrix C: C[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        cu = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * cu * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _canonical_codes(bits, vals):
    """(code, length) per symbol from the DHT (bits, huffval) lists —
    canonical assignment: codes of each length count up from
    (prev + 1) << 1."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    """Huffman decode structures: per length, (min_code, max_code,
    first_symbol_index) — the T.81 F.2.2.3 DECODE procedure."""
    spans = []
    code = 0
    k = 0
    for length in range(1, 17):
        n = bits[length - 1]
        spans.append((code, code + n - 1, k) if n else None)
        code = (code + n) << 1
        k += n
    return spans, list(vals)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 unstuffing and
    RSTn awareness (T.81 F.2.2.5)."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # spec: the scan may end mid-byte — pad with 1-bits
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2        # stuffed data byte 0xFF
                    self.buf = (self.buf << 8) | 0xFF
                    self.nbits += 8
                    continue
                # RST / EOI / next marker: stop at the boundary and
                # pad — restart() consumes the marker explicitly
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.buf >> self.nbits) & ((1 << n) - 1)

    def restart(self) -> None:
        """Align to byte, consume the RSTn marker."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("malformed JPEG: missing restart marker")

    def huff(self, spans_vals) -> int:
        spans, vals = spans_vals
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            s = spans[length - 1]
            if s is not None and s[0] <= code <= s[1]:
                return vals[s[2] + (code - s[0])]
        raise ValueError("malformed JPEG: bad Huffman code")


def c_h(hv: int) -> int:
    return hv >> 4


def c_v(hv: int) -> int:
    return hv & 15


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t received bits to a signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB (grayscale
    replicated).  See module docstring for the supported subset."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    comps = None
    w = h = 0
    restart_interval = 0
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("malformed JPEG: lost marker sync")
        m = data[pos + 1]
        if m == 0xD9:                    # EOI
            break
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("malformed JPEG: truncated segment")
        if m == 0xDB:                    # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq:
                    raise ValueError("decode_jpeg: 16-bit quant "
                                     "tables not supported")
                tbl = np.frombuffer(body, np.uint8, 64, i + 1) \
                    .astype(np.int64)
                z = np.zeros(64, np.int64)
                z[ZIGZAG] = tbl
                qt[tq] = z.reshape(8, 8)
                i += 65
        elif m == 0xC4:                  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _decode_table(bits, vals)
                i += 17 + n
        elif m == 0xC0:                  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("decode_jpeg: only 8-bit precision")
            if len(body) < 6 + 3 * nc:
                raise ValueError("malformed JPEG: short SOF0")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                if not (1 <= c_h(hv) <= 4 and 1 <= c_v(hv) <= 4):
                    raise ValueError("malformed JPEG: bad sampling")
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                   0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"decode_jpeg: SOF{m - 0xC0} (progressive/"
                             "extended/arithmetic) not supported")
        elif m == 0xDD:                  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif m == 0xDA:                  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append({"cs": cs, "td": tt >> 4, "ta": tt & 15})
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if comps is None or scan is None:
        raise ValueError("malformed JPEG: missing SOF0/SOS")

    for sden in scan:
        if sden["cs"] not in {c["id"] for c in comps}:
            raise ValueError("malformed JPEG: scan references an "
                             "unknown component")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("decode_jpeg: sampling factors > 2 "
                         "not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scan]
    for c, s in zip(order, scan):
        c["td"], c["ta"] = s["td"], s["ta"]
        c["blocks"] = []

    for c in order:
        if c["td"] not in huff_dc or c["ta"] not in huff_ac:
            raise ValueError("malformed JPEG: missing Huffman table")
        if c["tq"] not in qt:
            raise ValueError("malformed JPEG: missing quant table")
    rdr = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    n_mcu = mcux * mcuy
    blocks_per_mcu = sum(c["h"] * c["v"] for c in comps)
    # every block costs ≥ 2 Huffman symbols ≥ ~3 bits; a corrupted SOF
    # declaring huge dimensions would otherwise spin millions of MCU
    # iterations against a few bytes of entropy data
    if n_mcu * blocks_per_mcu > max(len(data) - pos, 1) * 8:
        raise ValueError("malformed JPEG: dimensions inconsistent "
                         "with stream size")
    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            rdr.restart()
            pred = {c["id"]: 0 for c in comps}
        for c in order:
            for _ in range(c["h"] * c["v"]):
                coef = np.zeros(64, np.int64)
                t = rdr.huff(huff_dc[c["td"]])
                diff = _extend(rdr.bits(t), t)
                pred[c["id"]] += diff
                coef[0] = pred[c["id"]]
                k = 1
                while k < 64:
                    rs = rdr.huff(huff_ac[c["ta"]])
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:      # ZRL
                            k += 16
                            continue
                        break            # EOB
                    k += r
                    if k > 63:
                        raise ValueError("malformed JPEG: AC overrun")
                    coef[k] = _extend(rdr.bits(s), s)
                    k += 1
                c["blocks"].append(coef)

    # dequant + batched IDCT per component, assemble planes
    planes = []
    for c in comps:
        nbx = mcux * c["h"]
        nby = mcuy * c["v"]
        blocks = np.stack(c["blocks"]).astype(np.float64)   # (n, 64)
        deq = np.zeros((len(blocks), 64))
        deq[:, ZIGZAG] = blocks * qt[c["tq"]].reshape(-1)[ZIGZAG]
        deq = deq.reshape(-1, 8, 8)
        # IDCT: x = Cᵀ · Y · C, batched
        spatial = np.einsum("ux,nuv,vy->nxy", _C, deq, _C) + 128.0
        plane = np.zeros((nby * 8, nbx * 8))
        # blocks arrived in entropy order: MCU-major, then v-major,
        # h-minor inside each MCU — rebuild the (block-row, block-col)
        # position for each
        idx = 0
        order_pos = []
        for my in range(mcuy):
            for mx in range(mcux):
                for vv in range(c["v"]):
                    for hh in range(c["h"]):
                        order_pos.append((my * c["v"] + vv,
                                          mx * c["h"] + hh))
        for (byy, bxx) in order_pos:
            plane[byy * 8:(byy + 1) * 8, bxx * 8:(bxx + 1) * 8] = \
                spatial[idx]
            idx += 1
        # upsample to full resolution (nearest/replication — JFIF
        # allows any filter; replication matches the encoder below)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixture generation; baseline 4:4:4)
# ---------------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:                # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base table (public
    convention: scale = 5000/q below 50, 200−2q above)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = (tbl * scale + 50) // 100
    return np.clip(out, 1, 255).astype(np.int64)


def _mag_bits(v: int) -> tuple:
    """(category, raw bits) for a coefficient value (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = int(a).bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def encode_jpeg(rgb: np.ndarray, quality: int = 85,
                subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes.

    ``subsample``: "444" (one block per component per MCU), "422"
    (horizontal-only chroma halving) or "420" (2×2 luma blocks +
    box-averaged chroma — the common camera layout).  ``restart_interval`` > 0 emits DRI + RSTn markers every
    that many MCUs (the decoder's restart path is then exercised by
    real streams, not synthetic ones)."""
    gray = rgb.ndim == 2
    if rgb.dtype != np.uint8 or (not gray and
                                 (rgb.ndim != 3 or rgb.shape[2] != 3)):
        raise ValueError("encode_jpeg expects HxWx3 (or HxW grayscale) "
                         "uint8")
    if subsample not in ("444", "422", "420"):
        raise ValueError("subsample must be '444', '422' or '420'")
    h, w = rgb.shape[:2]
    if gray or subsample == "444":
        hmax = vmax = 1
    elif subsample == "422":
        hmax, vmax = 2, 1
    else:
        hmax = vmax = 2
    # pad to full MCUs with edge replication BEFORE the color split so
    # every plane blockifies exactly
    ph = -(-h // (8 * vmax)) * 8 * vmax
    pw = -(-w // (8 * hmax)) * 8 * hmax
    if gray:
        pad = np.empty((ph, pw), np.uint8)
        pad[:h, :w] = rgb
        pad[h:, :w] = rgb[-1:, :]
        pad[:, w:] = pad[:, w - 1:w]
        y = pad.astype(np.float64)
        cb = cr = None
    else:
        pad = np.empty((ph, pw, 3), np.uint8)
        pad[:h, :w] = rgb
        pad[h:, :w] = rgb[-1:, :, :]
        pad[:, w:] = pad[:, w - 1:w, :]
        f = pad.astype(np.float64)
        y = (0.299 * f[:, :, 0] + 0.587 * f[:, :, 1]
             + 0.114 * f[:, :, 2])
        cb = 128.0 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] \
            + 0.5 * f[:, :, 2]
        cr = 128.0 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] \
            - 0.081312 * f[:, :, 2]
        if subsample == "420":
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        elif subsample == "422":
            cb = cb.reshape(ph, pw // 2, 2).mean(axis=2)
            cr = cr.reshape(ph, pw // 2, 2).mean(axis=2)
    qy = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    def blockify(plane: np.ndarray, q: np.ndarray):
        nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (plane - 128.0).reshape(nby, 8, nbx, 8) \
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        dct = np.einsum("xu,nxy,yv->nuv", _C.T, blocks, _C.T)
        quant = np.round(dct / q).astype(np.int64)
        return quant.reshape(-1, 64)[:, ZIGZAG], nbx

    cspecs = []          # (zz blocks, nbx, h_i, v_i, table index)
    comp_planes = [(y, qy, hmax, vmax, 0)] if gray else \
        [(y, qy, hmax, vmax, 0), (cb, qc, 1, 1, 1), (cr, qc, 1, 1, 1)]
    for plane, q, hi, vi, ti in comp_planes:
        zz, nbx = blockify(plane, q)
        cspecs.append((zz, nbx, hi, vi, ti))

    dc_codes = [_canonical_codes(*_DC_LUMA),
                _canonical_codes(*_DC_CHROMA)]
    ac_codes = [_canonical_codes(*_AC_LUMA),
                _canonical_codes(*_AC_CHROMA)]

    bw = _BitWriter()
    pred = [0, 0, 0]
    mcux, mcuy = pw // (8 * hmax), ph // (8 * vmax)
    n_mcu = mcux * mcuy
    rst = 0
    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            pred = [0, 0, 0]
        my, mx = divmod(mi, mcux)
        for ci, (zzb, nbx, hi, vi, ti) in enumerate(cspecs):
            for vv in range(vi):
                for hh in range(hi):
                    bi = (my * vi + vv) * nbx + (mx * hi + hh)
                    zz = zzb[bi]
                    tdc, tac = dc_codes[ti], ac_codes[ti]
                    diff = int(zz[0]) - pred[ci]
                    pred[ci] = int(zz[0])
                    t, bits = _mag_bits(diff)
                    code, ln = tdc[t]
                    bw.put(code, ln)
                    if t:
                        bw.put(bits, t)
                    run = 0
                    last_nz = np.nonzero(zz[1:])[0]
                    last = last_nz[-1] + 1 if len(last_nz) else 0
                    for k in range(1, last + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run >= 16:
                            code, ln = tac[0xF0]
                            bw.put(code, ln)
                            run -= 16
                        t, bits = _mag_bits(v)
                        code, ln = tac[(run << 4) | t]
                        bw.put(code, ln)
                        bw.put(bits, t)
                        run = 0
                    if last < 63:
                        code, ln = tac[0x00]     # EOB
                        bw.put(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tq])
                   + bytes(int(x) for x in tbl.reshape(-1)[ZIGZAG]))

    def dht(tc: int, th: int, bits_vals) -> bytes:
        bits, vals = bits_vals
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits)
                   + bytes(vals))

    yhv = (hmax << 4) | vmax
    if gray:
        sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1)
                  + bytes([1, 0x11, 0]))
        sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    else:
        sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
                  + bytes([1, yhv, 0, 2, 0x11, 1, 3, 0x11, 1]))
        sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    dri = seg(0xDD, struct.pack(">H", restart_interval)) \
        if restart_interval else b""
    jfif = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (b"\xFF\xD8" + jfif + dqt(0, qy) + dqt(1, qc)
            + dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
            + dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
            + dri + sof + sos + bytes(bw.out) + b"\xFF\xD9")
