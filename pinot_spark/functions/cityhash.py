"""Pure-Python CityHash v1.1 (Google's public algorithm, MIT-licensed spec).

Implements the exact bit-for-bit CityHash family the reference exposes as
scalar functions (reference surface: pinot-common .../scalar/HashFunctions.java:289-330,
backed by pinot-spi .../utils/hash/CityHashFunctions.java — itself a port of
the public google/cityhash C++ implementation).  This module is written from
the published v1.1 algorithm; parity is proven against reference-generated
golden vectors in tests/data/cityhash_md2_vectors.json (211 lengths covering
every branch split: 0-200 plus large sizes through 65537).

Public entry points (signed two's-complement results, matching Java):
    city_hash_32(data)                      -> int  (signed 32-bit)
    city_hash_64(data)                      -> int  (signed 64-bit)
    city_hash_64_with_seed(data, seed)      -> int
    city_hash_64_with_seeds(data, s0, s1)   -> int
    city_hash_128(data)                     -> bytes (16: big-endian hi||lo)
"""

from __future__ import annotations

import struct

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF

# Primes between 2^63 and 2^64 (public CityHash constants)
_K0 = 0xC3A5C85C97CB3127
_K1 = 0xB492B66FBE98F273
_K2 = 0x9AE16A3B2F90404F
_K_MUL = 0x9DDFEA08EB382D69

# 32-bit magic (shared with Murmur3)
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _f64(s: bytes, i: int) -> int:
    return struct.unpack_from("<Q", s, i)[0]


def _f32(s: bytes, i: int) -> int:
    return struct.unpack_from("<I", s, i)[0]


def _rot64(v: int, n: int) -> int:
    return ((v >> n) | (v << (64 - n))) & _M64 if n else v


def _rot32(v: int, n: int) -> int:
    return ((v >> n) | (v << (32 - n))) & _M32 if n else v


def _bswap64(v: int) -> int:
    return int.from_bytes(v.to_bytes(8, "little"), "big")


def _bswap32(v: int) -> int:
    return int.from_bytes(v.to_bytes(4, "little"), "big")


def _shift_mix(v: int) -> int:
    return (v ^ (v >> 47)) & _M64


def _hash128_to_64(lo: int, hi: int) -> int:
    a = ((lo ^ hi) * _K_MUL) & _M64
    a ^= a >> 47
    b = ((hi ^ a) * _K_MUL) & _M64
    b ^= b >> 47
    return (b * _K_MUL) & _M64


def _hash_len_16_mul(u: int, v: int, mul: int) -> int:
    a = ((u ^ v) * mul) & _M64
    a ^= a >> 47
    b = ((v ^ a) * mul) & _M64
    b ^= b >> 47
    return (b * mul) & _M64


def _hash_len_0_to_16(s: bytes) -> int:
    n = len(s)
    if n >= 8:
        mul = (_K2 + n * 2) & _M64
        a = (_f64(s, 0) + _K2) & _M64
        b = _f64(s, n - 8)
        c = (_rot64(b, 37) * mul + a) & _M64
        d = ((_rot64(a, 25) + b) * mul) & _M64
        return _hash_len_16_mul(c, d, mul)
    if n >= 4:
        mul = (_K2 + n * 2) & _M64
        a = _f32(s, 0)
        return _hash_len_16_mul((n + (a << 3)) & _M64, _f32(s, n - 4), mul)
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & _M32
        z = (n + (c << 2)) & _M32
        return (_shift_mix((y * _K2 ^ z * _K0) & _M64) * _K2) & _M64
    return _K2


def _hash_len_17_to_32(s: bytes) -> int:
    n = len(s)
    mul = (_K2 + n * 2) & _M64
    a = (_f64(s, 0) * _K1) & _M64
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * mul) & _M64
    d = (_f64(s, n - 16) * _K2) & _M64
    return _hash_len_16_mul(
        (_rot64((a + b) & _M64, 43) + _rot64(c, 30) + d) & _M64,
        (a + _rot64((b + _K2) & _M64, 18) + c) & _M64,
        mul,
    )


def _weak_hash_len_32_with_seeds(w: int, x: int, y: int, z: int, a: int, b: int):
    a = (a + w) & _M64
    b = _rot64((b + a + z) & _M64, 21)
    c = a
    a = (a + x + y) & _M64
    b = (b + _rot64(a, 44)) & _M64
    return (a + z) & _M64, (b + c) & _M64


def _weak_hash_at(s: bytes, i: int, a: int, b: int):
    return _weak_hash_len_32_with_seeds(
        _f64(s, i), _f64(s, i + 8), _f64(s, i + 16), _f64(s, i + 24), a, b
    )


def _hash_len_33_to_64(s: bytes) -> int:
    n = len(s)
    mul = (_K2 + n * 2) & _M64
    a = (_f64(s, 0) * _K2) & _M64
    b = _f64(s, 8)
    c = _f64(s, n - 24)
    d = _f64(s, n - 32)
    e = (_f64(s, 16) * _K2) & _M64
    f = (_f64(s, 24) * 9) & _M64
    g = _f64(s, n - 8)
    h = (_f64(s, n - 16) * mul) & _M64
    u = (_rot64((a + g) & _M64, 43) + (_rot64(b, 30) + c) * 9) & _M64
    v = (((a + g) ^ d) + f + 1) & _M64
    w = (_bswap64(((u + v) & _M64) * mul & _M64) + h) & _M64
    x = (_rot64((e + f) & _M64, 42) + c) & _M64
    y = ((_bswap64(((v + w) & _M64) * mul & _M64) + g) * mul) & _M64
    z = (e + f + c) & _M64
    a = (_bswap64(((x + z) & _M64) * mul + y & _M64) + b) & _M64
    b = (_shift_mix(((z + a) & _M64) * mul + d + h & _M64) * mul) & _M64
    return (b + x) & _M64


def _city64(s: bytes) -> int:
    n = len(s)
    if n <= 32:
        if n <= 16:
            return _hash_len_0_to_16(s)
        return _hash_len_17_to_32(s)
    if n <= 64:
        return _hash_len_33_to_64(s)

    x = _f64(s, n - 40)
    y = (_f64(s, n - 16) + _f64(s, n - 56)) & _M64
    z = _hash128_to_64((_f64(s, n - 48) + n) & _M64, _f64(s, n - 24))
    v = _weak_hash_at(s, n - 64, n & _M64, z)
    w = _weak_hash_at(s, n - 32, (y + _K1) & _M64, x)
    x = (x * _K1 + _f64(s, 0)) & _M64

    pos = 0
    remaining = (n - 1) & ~63
    while True:
        x = (_rot64((x + y + v[0] + _f64(s, pos + 8)) & _M64, 37) * _K1) & _M64
        y = (_rot64((y + v[1] + _f64(s, pos + 48)) & _M64, 42) * _K1) & _M64
        x ^= w[1]
        y = (y + v[0] + _f64(s, pos + 40)) & _M64
        z = (_rot64((z + w[0]) & _M64, 33) * _K1) & _M64
        v = _weak_hash_at(s, pos, (v[1] * _K1) & _M64, (x + w[0]) & _M64)
        w = _weak_hash_at(
            s, pos + 32, (z + w[1]) & _M64, (y + _f64(s, pos + 16)) & _M64
        )
        z, x = x, z
        pos += 64
        remaining -= 64
        if remaining == 0:
            break
    return _hash128_to_64(
        (_hash128_to_64(v[0], w[0]) + _shift_mix(y) * _K1 + z) & _M64,
        (_hash128_to_64(v[1], w[1]) + x) & _M64,
    )


def _city64_with_seeds(s: bytes, seed0: int, seed1: int) -> int:
    return _hash128_to_64((_city64(s) - seed0) & _M64, seed1 & _M64)


# ---------------------------------------------------------------------------
# 32-bit
# ---------------------------------------------------------------------------


def _fmix32(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def _mur(a: int, h: int) -> int:
    a = (a * _C1) & _M32
    a = _rot32(a, 17)
    a = (a * _C2) & _M32
    h ^= a
    h = _rot32(h, 19)
    return (h * 5 + 0xE6546B64) & _M32


def _hash32_len_0_to_4(s: bytes) -> int:
    b = 0
    c = 9
    for ch in s:
        v = ch - 256 if ch >= 128 else ch  # signed char, as in the C original
        b = (b * _C1 + v) & _M32
        c ^= b
    return _fmix32(_mur(b, _mur(len(s), c)))


def _hash32_len_5_to_12(s: bytes) -> int:
    n = len(s)
    a = (n + _f32(s, 0)) & _M32
    b = (n * 5 + _f32(s, n - 4)) & _M32
    c = (9 + _f32(s, (n >> 1) & 4)) & _M32
    d = (n * 5) & _M32
    return _fmix32(_mur(c, _mur(b, _mur(a, d))))


def _hash32_len_13_to_24(s: bytes) -> int:
    n = len(s)
    a = _f32(s, (n >> 1) - 4)
    b = _f32(s, 4)
    c = _f32(s, n - 8)
    d = _f32(s, n >> 1)
    e = _f32(s, 0)
    f = _f32(s, n - 4)
    return _fmix32(_mur(f, _mur(e, _mur(d, _mur(c, _mur(b, _mur(a, n & _M32)))))))


def _city32(s: bytes) -> int:
    n = len(s)
    if n <= 24:
        if n <= 4:
            return _hash32_len_0_to_4(s)
        if n <= 12:
            return _hash32_len_5_to_12(s)
        return _hash32_len_13_to_24(s)

    h = n & _M32
    g = (_C1 * n) & _M32
    f = g
    a0 = (_rot32((_f32(s, n - 4) * _C1) & _M32, 17) * _C2) & _M32
    a1 = (_rot32((_f32(s, n - 8) * _C1) & _M32, 17) * _C2) & _M32
    a2 = (_rot32((_f32(s, n - 16) * _C1) & _M32, 17) * _C2) & _M32
    a3 = (_rot32((_f32(s, n - 12) * _C1) & _M32, 17) * _C2) & _M32
    a4 = (_rot32((_f32(s, n - 20) * _C1) & _M32, 17) * _C2) & _M32
    h ^= a0
    h = (_rot32(h, 19) * 5 + 0xE6546B64) & _M32
    h ^= a2
    h = (_rot32(h, 19) * 5 + 0xE6546B64) & _M32
    g ^= a1
    g = (_rot32(g, 19) * 5 + 0xE6546B64) & _M32
    g ^= a3
    g = (_rot32(g, 19) * 5 + 0xE6546B64) & _M32
    f = (f + a4) & _M32
    f = (_rot32(f, 19) * 5 + 0xE6546B64) & _M32

    pos = 0
    for _ in range((n - 1) // 20):
        a0 = (_rot32((_f32(s, pos) * _C1) & _M32, 17) * _C2) & _M32
        a1 = _f32(s, pos + 4)
        a2 = (_rot32((_f32(s, pos + 8) * _C1) & _M32, 17) * _C2) & _M32
        a3 = (_rot32((_f32(s, pos + 12) * _C1) & _M32, 17) * _C2) & _M32
        a4 = _f32(s, pos + 16)
        h ^= a0
        h = (_rot32(h, 18) * 5 + 0xE6546B64) & _M32
        f = (f + a1) & _M32
        f = (_rot32(f, 19) * _C1) & _M32
        g = (g + a2) & _M32
        g = (_rot32(g, 18) * 5 + 0xE6546B64) & _M32
        h ^= (a3 + a1) & _M32
        h = (_rot32(h, 19) * 5 + 0xE6546B64) & _M32
        g ^= a4
        g = (_bswap32(g) * 5) & _M32
        h = (h + a4 * 5) & _M32
        h = _bswap32(h)
        f = (f + a0) & _M32
        f, h, g = g, f, h  # PERMUTE3(f, h, g)
        pos += 20

    g = (_rot32(g, 11) * _C1) & _M32
    g = (_rot32(g, 17) * _C1) & _M32
    f = (_rot32(f, 11) * _C1) & _M32
    f = (_rot32(f, 17) * _C1) & _M32
    h = _rot32((h + g) & _M32, 19)
    h = (h * 5 + 0xE6546B64) & _M32
    h = (_rot32(h, 17) * _C1) & _M32
    h = _rot32((h + f) & _M32, 19)
    h = (h * 5 + 0xE6546B64) & _M32
    h = (_rot32(h, 17) * _C1) & _M32
    return h


# ---------------------------------------------------------------------------
# 128-bit
# ---------------------------------------------------------------------------


def _city_murmur(s: bytes, seed0: int, seed1: int):
    n = len(s)
    a, b, c, d = seed0, seed1, 0, 0
    if n <= 16:
        a = (_shift_mix((a * _K1) & _M64) * _K1) & _M64
        c = (b * _K1 + _hash_len_0_to_16(s)) & _M64
        d = _shift_mix((a + (_f64(s, 0) if n >= 8 else c)) & _M64)
    else:
        c = _hash128_to_64((_f64(s, n - 8) + _K1) & _M64, a)
        d = _hash128_to_64((b + n) & _M64, (c + _f64(s, n - 16)) & _M64)
        a = (a + d) & _M64
        pos = 0
        remaining = n - 16
        while remaining > 0:
            a ^= (_shift_mix((_f64(s, pos) * _K1) & _M64) * _K1) & _M64
            a = (a * _K1) & _M64
            b ^= a
            c ^= (_shift_mix((_f64(s, pos + 8) * _K1) & _M64) * _K1) & _M64
            c = (c * _K1) & _M64
            d ^= c
            pos += 16
            remaining -= 16
    a = _hash128_to_64(a, c)
    b = _hash128_to_64(d, b)
    return (a ^ b) & _M64, _hash128_to_64(b, a)


def _city128_with_seed(s: bytes, seed0: int, seed1: int):
    n = len(s)
    if n < 128:
        return _city_murmur(s, seed0, seed1)

    x, y = seed0, seed1
    z = (n * _K1) & _M64
    v0 = (_rot64((y ^ _K1) & _M64, 49) * _K1 + _f64(s, 0)) & _M64
    v1 = (_rot64(v0, 42) * _K1 + _f64(s, 8)) & _M64
    w0 = (_rot64((y + z) & _M64, 35) * _K1 + x) & _M64
    w1 = (_rot64((x + _f64(s, 88)) & _M64, 53) * _K1) & _M64
    v = (v0, v1)
    w = (w0, w1)

    pos = 0
    remaining = n
    while True:
        for _ in range(2):
            x = (_rot64((x + y + v[0] + _f64(s, pos + 8)) & _M64, 37) * _K1) & _M64
            y = (_rot64((y + v[1] + _f64(s, pos + 48)) & _M64, 42) * _K1) & _M64
            x ^= w[1]
            y = (y + v[0] + _f64(s, pos + 40)) & _M64
            z = (_rot64((z + w[0]) & _M64, 33) * _K1) & _M64
            v = _weak_hash_at(s, pos, (v[1] * _K1) & _M64, (x + w[0]) & _M64)
            w = _weak_hash_at(
                s, pos + 32, (z + w[1]) & _M64, (y + _f64(s, pos + 16)) & _M64
            )
            z, x = x, z
            pos += 64
        remaining -= 128
        if remaining < 128:
            break

    x = (x + _rot64((v[0] + z) & _M64, 49) * _K0) & _M64
    y = (y * _K0 + _rot64(w[1], 37)) & _M64
    z = (z * _K0 + _rot64(w[0], 27)) & _M64
    w = ((w[0] * 9) & _M64, w[1])
    v = ((v[0] * _K0) & _M64, v[1])

    # hash up to 4 chunks of 32 bytes each from the END of the tail
    tail_done = 0
    while tail_done < remaining:
        tail_done += 32
        y = (_rot64((x + y) & _M64, 42) * _K0 + v[1]) & _M64
        w = ((w[0] + _f64(s, pos + remaining - tail_done + 16)) & _M64, w[1])
        x = (x * _K0 + w[0]) & _M64
        z = (z + w[1] + _f64(s, pos + remaining - tail_done)) & _M64
        w = (w[0], (w[1] + v[0]) & _M64)
        v = _weak_hash_at(s, pos + remaining - tail_done, (v[0] + z) & _M64, v[1])
        v = ((v[0] * _K0) & _M64, v[1])

    x = _hash128_to_64(x, v[0])
    y = _hash128_to_64((y + z) & _M64, w[0])
    return (
        (_hash128_to_64((x + v[1]) & _M64, w[1]) + y) & _M64,
        _hash128_to_64((x + w[1]) & _M64, (y + v[1]) & _M64),
    )


def _city128(s: bytes):
    if len(s) >= 16:
        return _city128_with_seed(
            s[16:], _f64(s, 0), (_f64(s, 8) + _K0) & _M64
        )
    return _city128_with_seed(s, _K0, _K1)


# ---------------------------------------------------------------------------
# Public signed-result API (Java semantics)
# ---------------------------------------------------------------------------


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


def city_hash_32(data: bytes) -> int:
    """Signed 32-bit CityHash (reference HashFunctions.java:289 widens to long)."""
    return _signed(_city32(bytes(data)), 32)


def city_hash_64(data: bytes) -> int:
    return _signed(_city64(bytes(data)), 64)


def city_hash_64_with_seed(data: bytes, seed: int) -> int:
    return city_hash_64_with_seeds(data, _K2, seed)


def city_hash_64_with_seeds(data: bytes, seed0: int, seed1: int) -> int:
    return _signed(
        _city64_with_seeds(bytes(data), seed0 & _M64, seed1 & _M64), 64
    )


def city_hash_128(data: bytes) -> bytes:
    """16 bytes: hash[0] then hash[1], each big-endian (Java ByteBuffer order)."""
    h0, h1 = _city128(bytes(data))
    return h0.to_bytes(8, "big") + h1.to_bytes(8, "big")
