"""Pure-Python MD2 (RFC 1319), matching the reference's md2 scalar
(pinot-common .../scalar/HashFunctions.java:84, DigestUtils.md2Hex).

The 256-byte substitution table is DERIVED here from the decimal digits of
pi via the documented construction (a Durstenfeld shuffle driven by
rejection-sampled pi digits) rather than transcribed — the derivation is
validated against all seven RFC 1319 test vectors plus 211 JDK-generated
vectors in tests/test_exact_hashes.py.
"""

from __future__ import annotations


def _pi_digits(n: int) -> list[int]:
    """First n decimal digits of pi (Rabinowitz-Wagon spigot)."""
    q, r, t, m, l2 = 1, 0, 1, 3, 3
    k = 1
    out: list[int] = []
    while len(out) < n:
        if 4 * q + r - t < m * t:
            out.append(m)
            q, r, m = 10 * q, 10 * (r - m * t), (10 * (3 * q + r)) // t - 10 * m
        else:
            q, r, t, k, m, l2 = (
                q * k,
                (2 * q + r) * l2,
                t * l2,
                k + 1,
                (q * (7 * k + 2) + r * l2) // (t * l2),
                l2 + 2,
            )
    return out


def _build_sbox() -> bytes:
    digits = _pi_digits(800)
    pos = 0

    def rand(n: int) -> int:
        # uniform draw in [0, n) from base-10 pi digits with rejection
        nonlocal pos
        while True:
            x, y = digits[pos], 10
            pos += 1
            if n > 10:
                x, y = x * 10 + digits[pos], 100
                pos += 1
            if n > 100:
                x, y = x * 10 + digits[pos], 1000
                pos += 1
            if x < n * (y // n):
                return x % n

    s = list(range(256))
    for i in range(2, 257):
        j = rand(i)
        s[i - 1], s[j] = s[j], s[i - 1]
    return bytes(s)


_S = _build_sbox()


def md2_hex(data: bytes) -> str:
    """Lowercase hex MD2 digest of data (RFC 1319 pad/checksum/digest)."""
    data = bytes(data)
    padlen = 16 - (len(data) % 16)
    m = data + bytes([padlen]) * padlen

    checksum = bytearray(16)
    last = 0
    for i in range(0, len(m), 16):
        for j in range(16):
            checksum[j] ^= _S[m[i + j] ^ last]
            last = checksum[j]
    m += bytes(checksum)

    x = bytearray(48)
    for i in range(0, len(m), 16):
        for j in range(16):
            x[16 + j] = m[i + j]
            x[32 + j] = x[16 + j] ^ x[j]
        t = 0
        for rnd in range(18):
            for k in range(48):
                t = x[k] ^ _S[t]
                x[k] = t
            t = (t + rnd) & 0xFF
    return bytes(x[:16]).hex()
