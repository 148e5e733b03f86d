"""Pure-stdlib baseline TIFF codec (TIFF 6.0 spec, Adobe 1992).

Backs the LLM-data-pipeline multimodal operators like the other codecs,
using nothing beyond ``struct`` and numpy:

- **decode_tiff**: both byte orders (II/MM), IFD walk with the baseline
  tag set, 8-bit grayscale (PhotometricInterpretation 0/1) and RGB (2),
  strip layout (any RowsPerStrip), Compression 1 (none) and 32773
  (PackBits), PlanarConfiguration 1 → (H, W, 3) uint8 RGB. Other
  compressions (LZW/JPEG-in-TIFF/deflate), tiled layout, palette color
  and >8-bit samples raise NotImplementedError by name.
- **encode_tiff**: little-endian single-IFD RGB with uncompressed or
  PackBits strips. TIFF is LOSSLESS here, so decode(encode(img)) == img
  exactly — the validation the tests assert.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9): n∈[0,127] → n+1 literals,
    n∈[129,255] → next byte repeated 257-n times, 128 → no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs ≥3 become replicate records; literals batch
    up to 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # measure run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j
            continue
        # literal stretch: until a ≥3 run starts or 128 bytes
        lit_start = i
        while i < n and i - lit_start < 128:
            j = i + 1
            while j < n and j - i < 128 and data[j] == data[i]:
                j += 1
            if j - i >= 3:
                break
            i = j
        # The stretch loop can overshoot 128 by one 2-byte mini-run; a
        # single record of 129 literals would need count byte 128 — the
        # PackBits NO-OP — so emit the segment in ≤128-byte chunks.
        seg = data[lit_start:i]
        for off in range(0, len(seg), 128):
            chunk = seg[off : off + 128]
            out.append(len(chunk) - 1)
            out += chunk
    return bytes(out)


def _read_ifd_value(data: bytes, endian: str, ftype: int, count: int, raw: bytes):
    size = _TYPE_SIZES.get(ftype, 1) * count
    # a value array can never exceed the file itself — a corrupt count
    # (u32, up to 4e9) would otherwise drive multi-GB format strings /
    # list allocations below (round-16 fuzz: executor-hang bomb)
    if size > len(data):
        raise ValueError(
            f"corrupt TIFF: IFD value size {size} exceeds file size"
        )
    if size > 4:
        (offset,) = struct.unpack(endian + "I", raw)
        payload = data[offset : offset + size]
    else:
        payload = raw[:size]
    if ftype == 3:
        return list(struct.unpack(endian + "H" * count, payload))
    if ftype == 4:
        return list(struct.unpack(endian + "I" * count, payload))
    if ftype == 1:
        return list(payload)
    return [0] * count


def decode_tiff(data: bytes) -> np.ndarray:
    """Baseline TIFF bytes → (H, W, 3) uint8 RGB.  Malformed payloads
    raise ValueError/IndexError only (the multimodal operator layer's
    corrupt-classification contract)."""
    try:
        return _decode_tiff_body(data)
    except struct.error as e:  # truncated header/IFD bytes
        raise ValueError(f"truncated TIFF: {e}") from e


def _decode_tiff_body(data: bytes) -> np.ndarray:
    if data[:4] == b"II*\x00":
        endian = "<"
    elif data[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order header)")
    (ifd_off,) = struct.unpack(endian + "I", data[4:8])
    (n_entries,) = struct.unpack(endian + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag, ftype, count = struct.unpack(endian + "HHI", data[e : e + 8])
        tags[tag] = _read_ifd_value(data, endian, ftype, count, data[e + 8 : e + 12])
    if _TAG_WIDTH not in tags or _TAG_HEIGHT not in tags:
        raise ValueError("corrupt TIFF: missing width/height tags")
    w = tags[_TAG_WIDTH][0]
    h = tags[_TAG_HEIGHT][0]
    spp = tags.get(_TAG_SPP, [1])[0]
    # corrupt dimensions are an allocation bomb: a legitimate image
    # cannot exceed the file's bytes by more than PackBits' max 128x
    # expansion (plus slack for tiny files)
    if w < 1 or h < 1 or spp < 1 or spp > 16:
        raise ValueError(f"corrupt TIFF dimensions {w}x{h}x{spp}")
    if w * h * spp > 128 * len(data) + 65536:
        raise ValueError(
            f"corrupt TIFF: {w}x{h}x{spp} impossible for a "
            f"{len(data)}-byte file"
        )
    bits = tags.get(_TAG_BITS, [8] * spp)
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    photo = tags.get(_TAG_PHOTOMETRIC, [1])[0]
    planar = tags.get(_TAG_PLANAR, [1])[0]
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} (only 8-bit)")
    if comp not in (1, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} (only 1=none and 32773=PackBits)"
        )
    if photo not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photo} (only gray 0/1 and RGB 2)"
        )
    if planar != 1:
        raise NotImplementedError("TIFF planar configuration 2 not implemented")
    if _TAG_STRIP_OFFSETS not in tags or _TAG_STRIP_COUNTS not in tags:
        raise ValueError("corrupt TIFF: missing strip tables")
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags[_TAG_STRIP_COUNTS]
    rows_per_strip = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
    if rows_per_strip < 1:
        raise ValueError("corrupt TIFF: rows_per_strip < 1")
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = data[off : off + cnt]
        rows = max(0, min(rows_per_strip, h - si * rows_per_strip))
        if comp == 32773:
            strip = packbits_decode(strip, rows * w * spp)
        raw += strip
    arr = np.frombuffer(bytes(raw[: h * w * spp]), dtype=np.uint8).reshape(h, w, spp)
    if spp == 1:
        g = arr[:, :, 0]
        if photo == 0:  # white-is-zero
            g = 255 - g
        return np.dstack([g, g, g])
    return arr[:, :, :3].copy()


def encode_tiff(arr: np.ndarray, packbits: bool = False, rows_per_strip: int = 16) -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) gray) → little-endian baseline
    TIFF, strip layout, uncompressed or PackBits."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    if gray:
        arr = arr[:, :, None]
    h, w, spp = arr.shape
    strips = []
    for y0 in range(0, h, rows_per_strip):
        chunk = arr[y0 : y0 + rows_per_strip].tobytes()
        strips.append(packbits_encode(chunk) if packbits else chunk)
    n_strips = len(strips)

    def short(v):
        return struct.pack("<HH", v, 0)

    def long_(v):
        return struct.pack("<I", v)

    # layout: header(8) + IFD + external arrays + strip data
    n_entries = 10
    ifd_size = 2 + 12 * n_entries + 4
    ext = bytearray()
    ext_base = 8 + ifd_size

    def ext_array(fmt: str, vals: list[int]) -> int:
        off = ext_base + len(ext)
        ext.extend(struct.pack("<" + fmt * len(vals), *vals))
        return off

    bits_payload = (
        short(8)
        if spp == 1
        else long_(ext_array("H", [8, 8, 8]))
    )
    strip_sizes = [len(s) for s in strips]
    # reserve external arrays for offsets/counts when n_strips > 1
    entries = [
        (_TAG_WIDTH, 3, 1, short(w)),
        (_TAG_HEIGHT, 3, 1, short(h)),
        (_TAG_BITS, 3, spp, bits_payload),
        (_TAG_COMPRESSION, 3, 1, short(32773 if packbits else 1)),
        (_TAG_PHOTOMETRIC, 3, 1, short(1 if spp == 1 else 2)),
        (_TAG_STRIP_OFFSETS, 4, n_strips, None),  # filled below
        (_TAG_SPP, 3, 1, short(spp)),
        (_TAG_ROWS_PER_STRIP, 3, 1, short(rows_per_strip)),
        (_TAG_STRIP_COUNTS, 4, n_strips, None),
        (_TAG_PLANAR, 3, 1, short(1)),
    ]
    # external arrays for strip offsets/counts (always external for
    # simplicity when n_strips > 1)
    if n_strips > 1:
        counts_off = ext_array("I", strip_sizes)
        offsets_off = ext_array("I", [0] * n_strips)  # patched below
    data_start = ext_base + len(ext)
    offs = []
    acc = data_start
    for s in strip_sizes:
        offs.append(acc)
        acc += s
    if n_strips > 1:
        struct.pack_into("<" + "I" * n_strips, ext, offsets_off - ext_base, *offs)
        strip_off_payload = long_(offsets_off)
        strip_cnt_payload = long_(counts_off)
    else:
        strip_off_payload = long_(offs[0])
        strip_cnt_payload = long_(strip_sizes[0])
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", n_entries)
    for tag, ftype, count, payload in entries:
        if tag == _TAG_STRIP_OFFSETS:
            payload = strip_off_payload
        elif tag == _TAG_STRIP_COUNTS:
            payload = strip_cnt_payload
        out += struct.pack("<HHI", tag, ftype, count) + payload
    out += struct.pack("<I", 0)  # no next IFD
    out += ext
    for s in strips:
        out += s
    return bytes(out)
