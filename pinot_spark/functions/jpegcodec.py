"""Pure-stdlib baseline JPEG codec (ITU-T T.81 sequential DCT).

The reference engine has no image functions — this backs the
LLM-data-pipeline multimodal operators (operators/multimodal.py) the
same way functions/imagecodec.py does for PNG/BMP/PPM, using nothing
beyond ``struct`` and numpy:

- **decode_jpeg**: baseline + extended-sequential Huffman JPEG (SOF0 /
  SOF1): DQT (8/16-bit), multiple DHT, DRI restart intervals, 1- or
  3-component scans, chroma subsampling up to 2x2 (4:2:0 / 4:2:2 /
  4:4:4), byte-stuffed entropy data → (H, W, 3) uint8 RGB.
  Progressive (SOF2) and arithmetic-coded variants raise
  NotImplementedError by name.
- **encode_jpeg**: baseline 4:4:4 with the Annex-K quantization tables
  scaled by the IJG quality formula. The Huffman tables are ENGINE-OWN
  canonical tables (DC: twelve 4-bit codes; AC: 8/9-bit two-level
  canonical) written into the file's DHT segments — any compliant
  decoder reads them from the stream, so interoperability is preserved;
  compression is a few percent worse than the Annex-K defaults, which
  this engine does not hand-copy.

The per-block Python loops are fine for the pipeline's thumbnail-scale
payloads; multimodal operators batch whole Arrow record-batches per UDF
call so the interpreter overhead amortizes.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# shared tables
# --------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag permutation, generated (not transcribed)."""
    out = []
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 else range(
            max(0, s - 7), min(s, 7) + 1
        )
        for r in rng:
            out.append((r, s - r))
    return np.array([r * 8 + c for r, c in out], dtype=np.int64)


_ZIGZAG = _zigzag_order()

# Annex K quantization tables (public spec constants)
_QT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)
_QT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    m = np.cos((2 * n + 1) * k * np.pi / 16)
    m[0, :] *= np.sqrt(0.5)
    return m * 0.5


_C = _dct_matrix()  # forward: C @ f @ C.T ; inverse: C.T @ F @ C


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    q = max(1, min(100, int(quality)))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


# --------------------------------------------------------------------------
# Huffman tables: canonical construction from (BITS, HUFFVAL)
# --------------------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 Annex C canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# engine-own encoder tables (valid canonical Huffman, carried in DHT)
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 94, 68, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = sorted(_AC_SYMBOLS)[: 94 + 68]
assert len(_AC_SYMBOLS) == 162


# --------------------------------------------------------------------------
# bit I/O
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # EOI or other marker inside entropy data: feed 0 pad
                self.pos -= 1
                b = 0
                self.acc = (self.acc << 8) | b
                self.n += 8
                return
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Consume a restart marker at the current byte position."""
        self.acc = 0
        self.n = 0
        while self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
            return


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG entropy data")


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline/extended-sequential JPEG bytes → (H, W, 3) uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.float64)
                    i += 128
                else:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.float64)
                    i += 64
                full = np.empty(64)
                full[_ZIGZAG] = tbl
                qt[tq] = full.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nvals])
                codes = _build_codes(bits, vals)
                huff[(tc, th)] = {(c, ln): sym for sym, (c, ln) in codes.items()}
                i += 17 + nvals
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} not implemented")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) not implemented")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x} (non-baseline coding) not implemented"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tbl = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tbl >> 4, tbl & 0xF))
            pos += seg_len
            return _decode_scan(data, pos, frame, scan, qt, huff, restart_interval)
        pos += seg_len
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for comp, _, _ in scan:
        planes.append(
            np.zeros((mcuy * comp["v"] * 8, mcux * comp["h"] * 8), dtype=np.float64)
        )
    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_restart()
                preds = [0] * len(scan)
            try:
                for ci, (comp, dc_id, ac_id) in enumerate(scan):
                    dc_tbl = huff[(0, dc_id)]
                    ac_tbl = huff[(1, ac_id)]
                    q = qt[comp["tq"]]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = _decode_block(reader, dc_tbl, ac_tbl, preds, ci)
                            full = np.zeros(64)
                            full[_ZIGZAG] = blk
                            f = _C.T @ (full.reshape(8, 8) * q) @ _C + 128.0
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = f
            except _RestartMarker:
                # marker consumed mid-MCU (foreign DRI streams): resync
                # the bit buffer at the byte boundary past the marker
                reader.acc = 0
                reader.n = 0
                preds = [0] * len(scan)
            mcu_count += 1
    # upsample each plane to full MCU-grid resolution, crop, color-convert
    out_planes = []
    for (comp, _, _), plane in zip(scan, planes):
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(out_planes[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_tbl, ac_tbl, preds, ci):
    blk = np.zeros(64)
    s = _huff_decode(reader, dc_tbl)
    diff = _extend(reader.read_bits(s), s) if s else 0
    preds[ci] += diff
    blk[0] = preds[ci]
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        blk[k] = _extend(reader.read_bits(s), s)
        k += 1
    return blk


# --------------------------------------------------------------------------
# encoder (baseline, 4:4:4)
# --------------------------------------------------------------------------


def encode_jpeg(arr: np.ndarray, quality: int = 75) -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) gray) → baseline JFIF bytes."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = np.dstack([arr, arr, arr])
    h, w = arr.shape[:2]
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
    qly = _scaled_qt(_QT_LUMA, quality)
    qlc = _scaled_qt(_QT_CHROMA, quality)
    qt_luma = np.empty(64)
    qt_luma[_ZIGZAG] = qly
    qt_chroma = np.empty(64)
    qt_chroma[_ZIGZAG] = qlc

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tbl in ((0, qly), (1, qlc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(v) for v in tbl)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])  # 4:4:4
    for tc, th, bits, vals in (
        (0, 0, _ENC_DC_BITS, _ENC_DC_VALS),
        (0, 1, _ENC_DC_BITS, _ENC_DC_VALS),
        (1, 0, _ENC_AC_BITS, _ENC_AC_VALS),
        (1, 1, _ENC_AC_BITS, _ENC_AC_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + sum(bits))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])

    dc_codes = _build_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _build_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    qmats = (qt_luma.reshape(8, 8), qt_chroma.reshape(8, 8), qt_chroma.reshape(8, 8))
    bw = _BitWriter()
    preds = [0, 0, 0]
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            for ci, plane in enumerate((y, cb, cr)):
                blk = plane[y0 : y0 + 8, x0 : x0 + 8]
                if blk.shape != (8, 8):  # edge padding by replication
                    blk = np.pad(
                        blk, ((0, 8 - blk.shape[0]), (0, 8 - blk.shape[1])), mode="edge"
                    )
                coef = _C @ (blk - 128.0) @ _C.T
                qz = np.round(coef / qmats[ci]).astype(np.int64).reshape(-1)[_ZIGZAG]
                _encode_block(bw, qz, preds, ci, dc_codes, ac_codes)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_block(bw, qz, preds, ci, dc_codes, ac_codes):
    diff = int(qz[0]) - preds[ci]
    preds[ci] = int(qz[0])
    s = _category(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if qz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(qz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
