"""Pure-stdlib GIF codec (GIF87a/89a, CompuServe spec + RFC-style LZW).

The reference engine has no image functions — like jpegcodec.py this
backs the LLM-data-pipeline multimodal operators with nothing beyond
``struct`` and numpy:

- **decode_gif**: logical screen descriptor, global/local color tables,
  variable-width LSB-first LZW with CLEAR/END codes and deferred-clear
  tolerance, interlaced and non-interlaced images, 89a extension blocks
  (graphic control / comment / application) skipped structurally, first
  image frame → (H, W, 3) uint8 RGB. Transparency index (when a GCE
  declares one) renders as the palette color — the pipeline treats GIF
  as an opaque still.
- **encode_gif**: global-palette still GIF from an (H, W, 3) image with
  ≤256 distinct colors (raises loudly beyond — palette quantization is
  a modeling choice, not a container feature), optional interlacing to
  exercise the decoder's pass re-ordering. GIF is LOSSLESS for
  palettized content, so decode(encode(img)) == img exactly — the
  validation the tests assert.
"""

from __future__ import annotations

import struct

import numpy as np


class _LzwReader:
    """Variable-width LSB-first code stream over concatenated GIF data
    sub-blocks."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return -1  # truncated stream: treat as end
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    reader = _LzwReader(data)
    out = bytearray()
    table: list[bytes] = []
    width = 0
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while True:
        code = reader.read(width)
        if code == -1 or code == end:
            break
        if code == clear:
            reset()
            continue
        if code < len(table) and (code < clear or len(table[code]) > 0):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW stream (code out of range)")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    buf = b""
    for b in indices:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            # widen AFTER assigning the code that fills the width
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        buf = bytes([b])
    if buf:
        emit(table[buf], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    return rows[order]


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → (H, W, 3) uint8 RGB (first image frame)."""
    try:
        return _decode_gif_body(data)
    except struct.error as e:  # truncated header/descriptor bytes
        raise ValueError(f"truncated GIF: {e}") from e


def _decode_gif_body(data: bytes) -> np.ndarray:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image has no color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(_lzw_decode(bytes(lzw), mcs)[: w * h], dtype=np.uint8)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data truncated")
        rows = idx.reshape(h, w)
        if ipacked & 0x40:
            rows = _deinterlace(rows)
        rgb = palette[np.minimum(rows, len(palette) - 1)]
        # compose onto the logical screen when the frame is smaller
        if (left, top, w, h) != (0, 0, sw, sh) and sw and sh:
            screen = np.zeros((sh, sw, 3), dtype=np.uint8)
            screen[top : top + h, left : left + w] = rgb[: sh - top, : sw - left]
            return screen
        return rgb.astype(np.uint8)
    raise ValueError("GIF has no image frame")


def median_cut_palette(flat: np.ndarray, n: int = 256) -> np.ndarray:
    """Median-cut palette (Heckbert 1982, the public algorithm): start
    with one box of all distinct colors, repeatedly split the most
    populous box at the median of its widest channel, until ``n`` boxes;
    each box contributes its population-weighted mean color. Pure numpy
    over the DISTINCT colors (≤ 2^24 rows), not the pixels."""
    colors, counts = np.unique(
        flat.reshape(-1, 3), axis=0, return_counts=True
    )
    boxes = [(colors, counts)]
    while len(boxes) < n:
        # split the box holding the most pixels that is still splittable
        order = sorted(
            range(len(boxes)),
            key=lambda i: int(boxes[i][1].sum()),
            reverse=True,
        )
        for bi in order:
            cols, cnts = boxes[bi]
            if len(cols) > 1:
                break
        else:
            break  # every box is a single color
        cols, cnts = boxes.pop(bi)
        ch = int(np.argmax(cols.max(axis=0) - cols.min(axis=0)))
        sel = np.argsort(cols[:, ch], kind="stable")
        cols, cnts = cols[sel], cnts[sel]
        # median by pixel population, clamped so both halves are non-empty
        cut = int(np.searchsorted(np.cumsum(cnts), cnts.sum() / 2)) + 1
        cut = min(max(cut, 1), len(cols) - 1)
        boxes.append((cols[:cut], cnts[:cut]))
        boxes.append((cols[cut:], cnts[cut:]))
    pal = np.array(
        [
            np.round(
                (cols.astype(np.float64) * cnts[:, None]).sum(axis=0)
                / cnts.sum()
            )
            for cols, cnts in boxes
        ],
        dtype=np.uint8,
    )
    return pal


def _nearest_palette_indices(flat: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Exact nearest palette entry (squared-L2 in RGB) per pixel,
    chunked so the (pixels × palette) distance block stays small."""
    idx = np.empty(len(flat), dtype=np.uint8)
    p = palette.astype(np.int32)
    for off in range(0, len(flat), 1 << 16):
        chunk = flat[off : off + (1 << 16)].astype(np.int32)
        d = ((chunk[:, None, :] - p[None, :, :]) ** 2).sum(axis=2)
        idx[off : off + (1 << 16)] = np.argmin(d, axis=1).astype(np.uint8)
    return idx


def encode_gif(
    arr: np.ndarray, interlace: bool = False, quantize: bool = False
) -> bytes:
    """(H, W, 3) uint8 RGB (≤256 distinct colors) or (H, W) gray →
    still GIF89a bytes. Lossless for palettized content. With
    ``quantize=True``, >256-color images are median-cut quantized to a
    256-entry palette first (lossy, nearest-color mapping); the default
    keeps the loud boundary so the lossless contract stays checkable."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = np.dstack([arr, arr, arr])
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256 and quantize:
        colors = median_cut_palette(flat, 256)
        inverse = _nearest_palette_indices(flat, colors)
    elif len(colors) > 256:
        raise NotImplementedError(
            f"GIF encoding needs a palette: {len(colors)} distinct colors > 256 "
            "(pass quantize=True for median-cut quantization, or pre-quantize)"
        )
    # palette size: power of two ≥ max(2, n_colors)
    bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    n_pal = 1 << bits
    palette = np.zeros((n_pal, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += palette.tobytes()
    ipacked = 0x40 if interlace else 0x00
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    rows = inverse.reshape(h, w).astype(np.uint8)
    if interlace:
        rows = _interlace(rows)
    mcs = max(2, bits)
    out.append(mcs)
    lzw = _lzw_encode(rows.tobytes(), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif_frames(data: bytes) -> list[tuple[int, np.ndarray]]:
    """Animated GIF → [(delay_ms, (H, W, 3) uint8 RGB canvas), ...]:
    every frame COMPOSED onto the logical screen per the GIF89a
    animation model — Graphic Control Extension delay (centiseconds),
    transparency index (transparent pixels leave the canvas
    untouched), and disposal methods 0/1 (keep), 2 (restore
    background, rendered as black), 3 (restore previous canvas).
    This is the REAL video decode path for the multimodal operators:
    animated GIF is the one video container expressible losslessly in
    pure stdlib."""
    try:
        return _decode_gif_frames_body(data)
    except struct.error as e:  # truncated header/descriptor bytes
        raise ValueError(f"truncated GIF: {e}") from e


def _decode_gif_frames_body(data: bytes) -> list[tuple[int, np.ndarray]]:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((sh, sw, 3), np.uint8)
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    disposal = 0
    transparent: int | None = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            subs = []
            while data[pos] != 0:
                ln = data[pos]
                subs.append(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and subs:  # Graphic Control Extension
                gpacked, delay_cs = subs[0][0], struct.unpack(
                    "<H", subs[0][1:3]
                )[0]
                delay_ms = delay_cs * 10
                disposal = (gpacked >> 2) & 0x07
                transparent = subs[0][3] if gpacked & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack(
            "<HHHHB", data[pos : pos + 9]
        )
        pos += 9
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(
                data[pos : pos + 3 * n], np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image has no color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(bytes(lzw), mcs)[: w * h], np.uint8
        )
        if len(idx) < w * h:
            raise ValueError("GIF pixel data truncated")
        rows = idx.reshape(h, w)
        if ipacked & 0x40:
            rows = _deinterlace(rows)
        prev = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        rgb = palette[np.minimum(rows, len(palette) - 1)]
        # a frame descriptor extending past the logical screen is clipped
        # (what most decoders render) in BOTH branches (r16 ADVICE: the
        # transparent path previously raised on the shape mismatch)
        rh, rw = region.shape[:2]
        if transparent is not None:
            keep = rows[:rh, :rw] != transparent
            region[keep] = rgb[:rh, :rw][keep]
        else:
            region[:, :] = rgb[:rh, :rw]
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:  # restore background
            canvas[top : top + h, left : left + w] = 0
        elif disposal == 3 and prev is not None:
            canvas = prev
        delay_ms, disposal, transparent = 0, 0, None
    if not frames:
        raise ValueError("GIF has no image frame")
    return frames


def encode_gif_animation(
    frames: list[np.ndarray], delays_ms: list[int], loop: int = 0
) -> bytes:
    """Full-canvas animated GIF89a writer: one GLOBAL palette over all
    frames (≤256 distinct colors across the animation — lossless, same
    contract as the still encoder), a NETSCAPE2.0 loop block, and a
    Graphic Control Extension per frame carrying its delay (rounded to
    the format's centisecond grid).  Frames are written full-canvas
    with disposal 'none', so decode composition is exact."""
    if len(frames) != len(delays_ms) or not frames:
        raise ValueError("need equal nonzero frame/delay counts")
    h, w = frames[0].shape[:2]
    stack = np.stack([np.asarray(f, np.uint8) for f in frames])
    if stack.shape[1:] != (h, w, 3):
        raise ValueError("all frames must be (H, W, 3) and same size")
    flat = stack.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise NotImplementedError(
            f"animation palette: {len(colors)} distinct colors > 256"
        )
    bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    n_pal = 1 << bits
    palette = np.zeros((n_pal, 3), np.uint8)
    palette[: len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += struct.pack(
        "<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0
    )
    out += palette.tobytes()
    # NETSCAPE2.0 application extension: loop count (0 = forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop)
    out += b"\x00"
    per_frame = inverse.reshape(len(frames), h, w).astype(np.uint8)
    mcs = max(2, bits)
    for f, delay in zip(per_frame, delays_ms):
        out += b"\x21\xf9\x04" + bytes([0x00]) + struct.pack(
            "<H", max(0, int(delay)) // 10
        ) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x00)
        out.append(mcs)
        lzw = _lzw_encode(f.tobytes(), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # image-data block terminator
    out += b"\x3b"
    return bytes(out)
