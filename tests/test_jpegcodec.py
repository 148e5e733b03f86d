"""functions/jpegcodec.py: baseline JPEG codec — roundtrip accuracy,
container structure, subsampled decode, loud non-baseline boundaries."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pinot_spark.functions.jpegcodec import (
    _ENC_AC_BITS,
    _ENC_AC_VALS,
    _ENC_DC_BITS,
    _ENC_DC_VALS,
    _ZIGZAG,
    _BitWriter,
    _build_codes,
    _category,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.dstack(
        [(xx * 9) % 250, (yy * 7 + 30) % 250, ((xx + yy) * 4 + 60) % 250]
    ).astype(np.uint8)


def test_roundtrip_psnr_and_edge_padding():
    img = _gradient(17, 24)  # non-multiple-of-8 exercises edge padding
    back = decode_jpeg(encode_jpeg(img, quality=90))
    assert back.shape == img.shape
    mse = float(((back.astype(float) - img.astype(float)) ** 2).mean())
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 35.0


def test_flat_block_is_lossless_and_gray_input():
    flat = np.full((8, 8, 3), 120, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 90)), flat)
    g = decode_jpeg(encode_jpeg(np.full((10, 10), 77, np.uint8), 85))
    assert g.shape == (10, 10, 3) and abs(int(g[0, 0, 0]) - 77) <= 1


def test_container_structure_and_quality_sizes():
    img = _gradient(32, 32)
    hi, lo = encode_jpeg(img, 95), encode_jpeg(img, 10)
    for b in (hi, lo):
        assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
        for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
            assert marker in b
    assert len(lo) < len(hi)


def test_zigzag_is_the_standard_permutation():
    assert _ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(_ZIGZAG.tolist()) == list(range(64))


def test_huffman_tables_are_canonical_and_complete():
    dc = _build_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac = _build_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    assert len(dc) == 12 and len(ac) == 162
    # prefix-free: no code is a prefix of another
    all_codes = sorted(
        format(c, f"0{ln}b") for c, ln in list(dc.values())
    )
    for a, b in zip(all_codes, all_codes[1:]):
        assert not b.startswith(a)


def test_category_widths():
    assert [_category(v) for v in (0, 1, -1, 2, 3, -3, 4, 255, -255)] == [
        0, 1, 1, 2, 2, 2, 3, 8, 8,
    ]


def test_arithmetic_raises_loudly():
    sof9 = b"\xff\xd8\xff\xc9" + struct.pack(">H", 11) + bytes(9)
    with pytest.raises(NotImplementedError, match="0xc9"):
        decode_jpeg(sof9)


def test_progressive_roundtrip_bit_identical_to_baseline():
    """encode_jpeg_progressive carries the SAME quantized coefficients
    as encode_jpeg through the Annex-G scan script (DC first/refine, AC
    first with EOB runs, AC refine with correction bits) — so decoding
    both streams must give BIT-IDENTICAL pixels. This validates every
    progressive decode procedure against the conformance-tested
    sequential path."""
    from pinot_spark.functions.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(42)
    h, w = 41, 67
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.dstack(
        [(xx * 3 + yy * 2) % 256, ((xx // 8) * 32) % 256,
         rng.integers(0, 256, (h, w))]
    ).astype(np.uint8)
    for q in (10, 50, 75, 95):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, q)),
            decode_jpeg(encode_jpeg_progressive(img, q)),
        ), f"progressive != baseline at quality {q}"
    prog = encode_jpeg_progressive(img, 75)
    assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog  # SOF2 frame
    assert prog.count(b"\xff\xda") >= 8  # 2 DC + 6 AC scans


def test_progressive_edge_shapes_and_eob_runs():
    """Flat images drive maximal EOBn runs, sparse ones drive ZRL in
    both AC passes, tiny/gray inputs drive the edge-padding paths."""
    from pinot_spark.functions.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    sparse = np.full((48, 48, 3), 128, np.uint8)
    sparse[::7, ::11] = 255
    cases = [
        np.full((64, 64, 3), 130, np.uint8),          # flat → EOB runs
        rng.integers(0, 256, (3, 5, 3)).astype(np.uint8),
        np.full((1, 1, 3), 7, np.uint8),
        rng.integers(0, 256, (17, 23)).astype(np.uint8),  # gray 2-D
        sparse,                                        # ZRL paths
    ]
    for img in cases:
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, 75)),
            decode_jpeg(encode_jpeg_progressive(img, 75)),
        )


def _handcraft_420(y_dc: list[int], cb_dc: int, cr_dc: int) -> bytes:
    """Build a 16x16 4:2:0 JPEG by hand (DC-only blocks): exercises the
    decoder's multi-block MCU ordering and 2x2 chroma upsampling, which
    the 4:4:4 encoder never produces."""
    out = bytearray(b"\xff\xd8")
    qt = bytes([16] * 64)  # flat quant table, id 0
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qt
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += bytes([1, 0x22, 0])  # Y: 2x2 sampling
    out += bytes([2, 0x11, 0])
    out += bytes([3, 0x11, 0])
    for tc, th, bits, vals in (
        (0, 0, _ENC_DC_BITS, _ENC_DC_VALS),
        (1, 0, _ENC_AC_BITS, _ENC_AC_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + sum(bits))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    dc = _build_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac = _build_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    bw = _BitWriter()

    def put_block(diff):
        s = _category(diff)
        code, ln = dc[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        code, ln = ac[0x00]  # EOB
        bw.write(code, ln)

    pred = 0
    for v in y_dc:  # 4 Y blocks, differential DC
        put_block(v - pred)
        pred = v
    put_block(cb_dc)
    put_block(cr_dc)
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def test_420_subsampled_decode():
    # DC quantized value 2 with q=16: IDCT constant = 2*16/8 = 4 → Y=132
    img = decode_jpeg(_handcraft_420([2, 2, 2, 2], 0, 0))
    assert img.shape == (16, 16, 3)
    assert np.all(np.abs(img.astype(int) - 132) <= 1)  # neutral gray
    # distinct Y DC per quadrant: upsampled chroma stays neutral, luma steps
    img2 = decode_jpeg(_handcraft_420([0, 4, 8, 12], 0, 0))
    assert img2[0, 0, 0] < img2[0, 15, 0] < img2[15, 0, 0] < img2[15, 15, 0]


def test_imagecodec_dispatch_includes_jpeg():
    from pinot_spark.functions import imagecodec as ic

    img = _gradient(8, 8)
    assert ic.sniff(encode_jpeg(img)) == "jpeg"
    out = ic.decode(encode_jpeg(img, 95))
    assert out.shape == (8, 8, 3)


def test_progressive_payload_through_image_dispatch():
    """A progressive JPEG payload decodes through the generic image
    dispatch (the multimodal operators' entry point) identically to its
    baseline twin — format sniffing keys on the JPEG SOI, not the frame
    marker."""
    from pinot_spark.functions import imagecodec as ic
    from pinot_spark.functions.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 31, 3)).astype(np.uint8)
    prog = encode_jpeg_progressive(img, 80)
    assert ic.sniff(prog) == "jpeg"
    assert np.array_equal(ic.decode(prog), decode_jpeg(encode_jpeg(img, 80)))


def test_progressive_property_random_shapes():
    """Property sweep of the progressive==baseline bit-identity over
    random shapes/contents/qualities (the round-9 greedy-boundary
    audit: refinement-bit and EOB-run paths under arbitrary block
    occupancy). Seeded loop rather than hypothesis: each case costs
    ~100 ms of pure-python DCT, and the invariant is cross-path
    identity, not a parsed-input property."""
    from pinot_spark.functions.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(20260814)
    for _ in range(24):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        q = int(rng.choice([8, 25, 50, 80, 97]))
        if rng.integers(0, 2):
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        else:  # low-frequency content drives long EOB runs
            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            img = np.dstack([
                (xx * int(rng.integers(1, 5))) % 256,
                (yy * int(rng.integers(1, 5))) % 256,
                np.full((h, w), int(rng.integers(0, 256))),
            ]).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, q)),
            decode_jpeg(encode_jpeg_progressive(img, q)),
        ), (h, w, q)


def test_q100_constant_gray_exact_above_82():
    """Baseline q100 roundtrips constant-gray blocks EXACTLY for every
    level in [82, 255] (float-DCT rounding drifts some levels below 82
    by -1) — the multimodal_video_mjpeg_avi driver row keys its
    formula-exact oracle on this range, so a regression must surface
    here first."""
    for v in range(82, 256):
        img = np.full((8, 8, 3), v, np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img, 100)), img), v


def test_throughput_guard_realistic_frame():
    """Wall-time bound at a realistic 640×360 frame: the table-driven
    Huffman decode (round 17: peek-16 LUT + masked bit accumulator)
    runs ~0.15 s here vs 2.8 s before — the bound catches an
    order-of-magnitude regression of the entropy hot loop while
    leaving headroom for loaded CI machines."""
    import time

    x = np.linspace(0, 4 * np.pi, 640)
    y = np.linspace(0, 3 * np.pi, 360)
    img = np.ascontiguousarray(
        np.stack(
            [
                (127 + 120 * np.outer(np.sin(y + p), np.cos(x))).astype(
                    np.uint8
                )
                for p in (0.0, 1.0, 2.0)
            ],
            axis=2,
        )
    )
    data = encode_jpeg(img, 75)
    t0 = time.monotonic()
    out = decode_jpeg(data)
    t = time.monotonic() - t0
    assert out.shape == (360, 640, 3)
    assert t < 1.5, f"baseline decode took {t:.2f}s"
