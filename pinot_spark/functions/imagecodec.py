"""Pure-stdlib image codecs: PNG, BMP, PPM decode + PNG/PPM encode +
nearest-neighbor resize + integer-luma thumbnail features.

The reference engine has no image functions — this module backs the
LLM-data-pipeline multimodal operators (operators/multimodal.py):
decode / feature-extract / resize run REAL bytes for the three formats
whose specifications need nothing beyond ``zlib`` (stdlib) and numpy:

- **PNG** (W3C spec / RFC 2083): 8-bit gray / RGB / RGBA / paletted
  (PLTE), non-interlaced, all five scanline filters
  (None/Sub/Up/Average/Paeth).
- **BMP** (BITMAPINFOHEADER): uncompressed 24/32-bit BI_RGB, bottom-up or
  top-down.
- **PPM** (netpbm P6): binary RGB, maxval 255.
- **JPEG** (ITU-T T.81): full codec in functions/jpegcodec.py
  (sequential AND progressive decode, baseline + progressive encode),
  dispatched from here by magic sniff.
- **GIF** (87a/89a): full LZW codec in functions/gifcodec.py
  (variable-width LSB codes, interlacing, local/global palettes).
- **TIFF** (6.0 baseline): functions/tiffcodec.py (II/MM byte orders,
  strip layout, uncompressed + PackBits, 8-bit gray/RGB).

- **WebP lossless** (VP8L, RFC 9649): functions/webpcodec.py — full
  decoder (prefix codes, color cache, meta groups, LZ77, all four
  transforms) + a literal/cache/run encoder. Lossy 'VP8 ' decodes
  through functions/vp8codec.py (full RFC 6386 keyframe
  reconstruction, byte-exact against libwebp).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff(data: bytes) -> str:
    """Identify the container format from magic bytes."""
    if not data:
        return "empty"
    if data[:8] == _PNG_MAGIC:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    return "unknown"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}  # gray, RGB, palette, RGBA


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG → (H, W, 3) uint8 RGB. 8-bit gray/RGB/RGBA, non-interlaced."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos, idat, header, plte = 8, [], None, None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            header = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"PLTE":
            plte = np.frombuffer(
                chunk[: (len(chunk) // 3) * 3], np.uint8
            ).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if header is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = header
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG depth={depth} color={color} interlace={interlace}: only "
            "8-bit gray/RGB/RGBA non-interlaced is implemented"
        )
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    needed = h * (stride + 1)
    # zlib's max ratio is ~1030x: dims demanding more output than the
    # file could hold are corrupt, and capping the inflate at `needed`
    # defuses decompression bombs (round-16 fuzz hardening)
    if needed > 2048 * len(data) + 65536:
        raise ValueError(
            f"corrupt PNG: {w}x{h}x{ch} impossible for a "
            f"{len(data)}-byte file"
        )
    raw = zlib.decompressobj().decompress(b"".join(idat), needed)
    if len(raw) < needed:
        raise ValueError("PNG pixel data truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    rpos = 0
    for y in range(h):
        f = raw[rpos]
        row = np.frombuffer(raw, np.uint8, stride, rpos + 1).astype(np.int32)
        rpos += 1 + stride
        if f == 0:  # None
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f == 1:  # Sub: per-channel prefix sum
            cur = row.reshape(w, ch)
            cur = np.cumsum(cur, axis=0, dtype=np.int64).reshape(stride) & 0xFF
        elif f == 3:  # Average — sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth — sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                cur[i] = (row[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur.astype(np.int32)
    px = out.reshape(h, w, ch)
    if color == 3:  # palette indices -> PLTE colors
        if plte is None or len(plte) == 0:
            raise ValueError("paletted PNG missing PLTE chunk")
        return plte[np.minimum(px[:, :, 0], len(plte) - 1)]
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    if ch == 4:
        return px[:, :, :3].copy()
    return px


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → PNG bytes (filter 0, one zlib stream)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("encode_png expects (H, W, 3) RGB")
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(typ: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP / PPM
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP → (H, W, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    pix_off = int.from_bytes(data[10:14], "little")
    hdr_size = int.from_bytes(data[14:18], "little")
    if hdr_size < 40:
        raise NotImplementedError("BMP core-header variant not implemented")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}: only uncompressed 24/32-bit")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3
    # BMP is uncompressed: every pixel byte must exist in the file —
    # corrupt header dims are an allocation bomb otherwise
    if w <= 0 or h == 0:
        raise ValueError(f"corrupt BMP dimensions {w}x{h}")
    if pix_off + (h - 1) * row_bytes + w * nch > len(data):
        raise ValueError("BMP pixel data truncated")
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        row = np.frombuffer(data, np.uint8, w * nch, pix_off + y * row_bytes).reshape(w, nch)
        ty = y if top_down else h - 1 - y
        px[ty] = row[:, [2, 1, 0]]  # BGR → RGB
    return px


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary netpbm P6 (maxval ≤ 255) → (H, W, 3) uint8 RGB."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM stream")
    # header: three whitespace-separated ints after P6 (comments start '#')
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not implemented")
    need = w * h * 3
    px = np.frombuffer(data, np.uint8, need, pos)
    return px.reshape(h, w, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


# ---------------------------------------------------------------------------
# dispatch + transforms
# ---------------------------------------------------------------------------

def _decode_jpeg(data: bytes) -> np.ndarray:
    from pinot_spark.functions.jpegcodec import decode_jpeg

    return decode_jpeg(data)


def _decode_gif(data: bytes) -> np.ndarray:
    from pinot_spark.functions.gifcodec import decode_gif

    return decode_gif(data)


def _decode_tiff(data: bytes) -> np.ndarray:
    from pinot_spark.functions.tiffcodec import decode_tiff

    return decode_tiff(data)


def _decode_webp(data: bytes) -> np.ndarray:
    from pinot_spark.functions.webpcodec import decode_webp

    # VP8L lossless AND lossy 'VP8 ' keyframes both decode fully
    return decode_webp(data)


_DECODERS = {
    "png": decode_png,
    "bmp": decode_bmp,
    "ppm": decode_ppm,
    "jpeg": _decode_jpeg,
    "gif": _decode_gif,
    "tiff": _decode_tiff,
    "webp": _decode_webp,
}


def decode(data: bytes) -> np.ndarray:
    """Any supported container → (H, W, 3) uint8 RGB; NotImplementedError
    names the format for containers needing external codec libraries.

    Exception contract (what the multimodal operator layer classifies):
    a malformed payload raises ValueError or IndexError, NEVER a
    parser-internal type — corrupt crawled media must mark the ROW
    corrupt, not fail the executor task.  Fuzzing (round 16) showed
    corrupt PNGs surface zlib.error (the dominant case) and corrupt
    JPEGs can surface struct.error/KeyError/StopIteration from deep in
    the entropy decoder; this boundary normalizes that named set to
    ValueError, preserving the original type in the message."""
    import struct as _struct
    import zlib as _zlib

    fmt = sniff(data or b"")
    dec = _DECODERS.get(fmt)
    if dec is None:
        raise NotImplementedError(
            f"image format {fmt!r} requires a codec library not present in "
            "this container (supported: png, bmp, ppm, jpeg, gif, tiff, webp-lossless)"
        )
    try:
        return dec(data)
    except (_zlib.error, _struct.error, KeyError, StopIteration,
            OverflowError) as e:
        raise ValueError(
            f"corrupt {fmt} payload ({type(e).__name__}: {e})"
        ) from e


def resize_nearest(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize to (h, w, 3)."""
    sh, sw = arr.shape[:2]
    ys = (np.arange(h) * sh) // h
    xs = (np.arange(w) * sw) // w
    return arr[ys][:, xs]


def luma_thumbnail_features(arr: np.ndarray, grid: int = 4) -> np.ndarray:
    """grid×grid integer-luma thumbnail: gray = (77R + 150G + 29B) >> 8
    (classic integer BT.601 weights), block means floored to integers.
    Integer-valued features ≤ 255 are exactly representable in float32,
    so downstream sums are bit-stable across engines — that is what makes
    the decode path oracle-checkable in plain SQL."""
    gray = (
        77 * arr[:, :, 0].astype(np.int64)
        + 150 * arr[:, :, 1].astype(np.int64)
        + 29 * arr[:, :, 2].astype(np.int64)
    ) >> 8
    h, w = gray.shape
    feats = np.empty(grid * grid, dtype=np.float32)
    for by in range(grid):
        y0, y1 = (by * h) // grid, max((by + 1) * h // grid, (by * h) // grid + 1)
        for bx in range(grid):
            x0, x1 = (bx * w) // grid, max((bx + 1) * w // grid, (bx * w) // grid + 1)
            block = gray[y0:y1, x0:x1]
            feats[by * grid + bx] = float(int(block.sum()) // block.size)
    return feats
