"""Apache DataSketches CPC sketch FULL wire interop: read (parse +
decompress), WRITE (build + compress, round 11), and UNION — all
byte-canonical with datasketches-java 6.2.0.

The reference's DISTINCTCOUNTCPCSKETCH family wraps
``org.apache.datasketches.cpc.CpcSketch`` and its scalar reader is
``getCpcSketchEstimate(bytes) = Math.round(sketch.getEstimate())``
(pinot-core/.../function/scalar/SketchFunctions.java:378-392).
Round 10 landed the preamble-only estimate path (``DsCpcView`` — the
HIP accumulator for never-merged sketches, the ICON estimator for
merged ones).  Round 11 adds the full state machine: ``DsCpcSketch``
builds, compresses, serializes, parses, and unions — Java heapifies
the bytes, Java ``toByteArray`` round-trips through ``parse_cpc``
byte-identically, and ``cpc_union``/``from_bit_matrix`` reproduce
``CpcUnion.getResult`` exactly (tests/test_ds_cpc.py).

Layout facts (pinned by reflective probes of the library's
PreambleUtil and 22 byte dumps, tests/data/ds_cpc_vectors.json):

  byte 0  preamble ints (per format: [2,2,4,8,4,8,6,10])
  byte 1  serVer = 1;  byte 2  family id = 16 (CPC)
  byte 3  lgK;  byte 4  fiCol
  byte 5  flags: 1=bigEndian 2=compressed 4=HIP 8=SV(has surprise
          values) 16=WINDOW;  format ordinal = window<<2 | sv<<1 | hip
  bytes 6-7  seed hash (LE u16; 37836 for the default update seed
          9001 — the same domain the theta family uses)
  [non-empty] numCoupons (LE u32) at offset 8; when HIP: kxp (LE f64)
  at 16 and hipAccum (LE f64) at 24 (after the format's length
  fields); compressed streams follow at the format's stream offsets.

The ICON estimator is reconstructed from the library's (public)
implementation: for c < 2 return c; above the c > (5.7|5.6)·k
threshold use 0.7940236163830469·k·2^(c/k); otherwise evaluate the
20-term Horner polynomial for lgK (rows 4..26 of the public
iconPolynomialCoefficents table, pinot_spark/data/cpc_icon.json — the
CPC paper's characterization data) at x = c/(2k), times
c·(1 + (c/k)³/66.774757), floored at c.  Exact against 27 reflective
probes and every golden sketch estimate, including a CpcUnion result
(the merged / ICON path).
"""

from __future__ import annotations

import json
import os
import struct

DEFAULT_LGK = 12  # CommonConstants.DEFAULT_CPC_SKETCH_LGK
_FAMILY_CPC = 16
_SEED_HASH = 0xCC93  # LE bytes of 37836, ThetaUtil.computeSeedHash(9001)
_F_HIP, _F_SV, _F_WINDOW = 4, 8, 16
_PRE_INTS = [2, 2, 4, 8, 4, 8, 6, 10]

_ICON_PATH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "data", "cpc_icon.json"
)
_ICON_CACHE: list | None = None


def _icon_coeffs() -> list:
    global _ICON_CACHE
    if _ICON_CACHE is None:
        _ICON_CACHE = json.load(open(_ICON_PATH))["iconPolynomialCoefficents"]
    return _ICON_CACHE


def icon_estimate(lg_k: int, c: int) -> float:
    """IconEstimator.getIconEstimate — bit-faithful reconstruction."""
    if not 4 <= lg_k <= 26:
        raise ValueError("CPC lgK out of the supported 4..26 range")
    if c < 2:
        return 0.0 if c == 0 else 1.0
    k = 1 << lg_k
    thresh = 5.7 if lg_k < 14 else 5.6
    if c > thresh * k:
        return 0.7940236163830469 * k * 2.0 ** (c / k)
    coeffs = _icon_coeffs()
    start = 20 * (lg_k - 4)
    x = c / (2.0 * k)
    # Horner from the highest coefficient down
    acc = coeffs[start + 20 - 1]
    for i in range(start + 18, start - 1, -1):
        acc = acc * x + coeffs[i]
    ratio = c / k
    result = c * acc * (1.0 + (ratio * ratio * ratio) / 66.774757)
    return result if result >= c else float(c)


class DsCpcView:
    """A parsed-preamble view of a serialized CpcSketch — enough state
    to estimate; the compressed streams stay opaque."""

    def __init__(self, lg_k: int, num_coupons: int, has_hip: bool, hip_accum: float):
        self.lg_k = lg_k
        self.num_coupons = num_coupons
        self.has_hip = has_hip
        self.hip_accum = hip_accum

    @classmethod
    def parse(cls, b: bytes) -> "DsCpcView":
        if len(b) < 8:
            raise ValueError("not a DataSketches CPC byte array")
        pre_ints, ser_ver, family, lg_k, _fi_col, flags, seed_hash = struct.unpack_from(
            "<BBBBBBH", b, 0
        )
        if family != _FAMILY_CPC or ser_ver != 1:
            raise ValueError("not a DataSketches CPC byte array")
        fmt = (
            (4 if flags & _F_WINDOW else 0)
            | (2 if flags & _F_SV else 0)
            | (1 if flags & _F_HIP else 0)
        )
        if pre_ints != _PRE_INTS[fmt]:
            raise ValueError("CPC preamble length does not match its format")
        if seed_hash != (_SEED_HASH & 0xFFFF) and seed_hash != 0x93CC:
            # the engine only exchanges default-seed (9001) sketches,
            # like its theta family — a foreign seed estimates wrong
            raise ValueError(
                "CPC sketch uses a non-default update seed — only the "
                "DataSketches default seed 9001 is exchangeable here"
            )
        if fmt in (0, 1):  # EMPTY_MERGED / EMPTY_HIP
            return cls(lg_k, 0, bool(flags & _F_HIP), 0.0)
        num_coupons = struct.unpack_from("<I", b, 8)[0]
        hip = bool(flags & _F_HIP)
        hip_accum = struct.unpack_from("<d", b, 24)[0] if hip else 0.0
        return cls(lg_k, num_coupons, hip, hip_accum)

    def estimate(self) -> float:
        """CpcSketch.getEstimate: the HIP accumulator when the sketch
        was never merged, else the ICON estimator."""
        if self.num_coupons == 0:
            return 0.0
        if self.has_hip:
            return self.hip_accum
        return icon_estimate(self.lg_k, self.num_coupons)


def is_ds_cpc_bytes(b: bytes) -> bool:
    if len(b) < 8 or b[2] != _FAMILY_CPC or b[1] != 1:
        return False
    flags = b[5]
    fmt = (
        (4 if flags & _F_WINDOW else 0)
        | (2 if flags & _F_SV else 0)
        | (1 if flags & _F_HIP else 0)
    )
    return b[0] == _PRE_INTS[fmt]


# ===========================================================================
# CPC WRITE path (round 11): a full CpcSketch build + compressed
# serialization, byte-canonical with datasketches-java 6.2.0.
#
# Reconstructed from the library's BYTECODE (javap over CpcSketch,
# PairTable, CpcUtil, CpcCompression, CompressedState, PreambleUtil —
# the jar ships with PySpark; no source in the container) plus the
# public CPC paper's characterization data: the 22 high-entropy-byte
# encoding tables, the 65-entry length-limited-unary table, and the 16
# column permutations (pinot_spark/data/cpc_tables.json, extracted from
# the library's CompressionData by a reflective probe).  Validated by
# byte-equality against Java toByteArray() over a dense (lgK, n) build
# matrix and a live Java round-trip + CpcUnion (tests/test_ds_cpc.py).
#
# Sketch mechanics (CpcSketch.java semantics):
# - update(long) hashes murmur3 x64-128 (seed 9001); col = nlz64(h1)
#   capped at 63, row = h0 & (k-1); rowCol = row<<6 | col; the
#   all-ones value -1 (the pair table's empty marker) flips to col 6.
# - phases by c = numCoupons: SPARSE (32c < 3k) keeps every coupon in
#   a linear-probe pair table; at 3k/32 the table converts to a k-byte
#   sliding window (offset 0) plus a surprise table; once 8c >= 27k
#   the window starts sliding (offset = (8c - 19k) >> (lgK+3)), pairs
#   below the window recording surprising ZEROS with inverted logic.
# - HIP: every novel coupon adds k/kxp to the running estimate and
#   subtracts 2^-(col+1) from kxp; each 8th offset shift re-derives
#   kxp from the bit matrix via the byte-lookup summation (which, as
#   in the library, drops the byteSums[7] term).
# ===========================================================================

_TABLES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "data", "cpc_tables.json"
)
_TABLES_CACHE: dict | None = None


def _tables() -> dict:
    global _TABLES_CACHE
    if _TABLES_CACHE is None:
        _TABLES_CACHE = json.load(open(_TABLES_PATH))
    return _TABLES_CACHE


def _inv_pow2(e: int) -> float:
    return 2.0 ** -e


def _kxp_byte_lookup(b: int) -> float:
    """CpcSketch.kxpByteLookup[b] = sum of 2^-(i+1) over CLEAR bits i
    (verified against the library's table, reflectively dumped)."""
    s = 0.0
    for i in range(8):
        if not (b >> i) & 1:
            s += _inv_pow2(i + 1)
    return s


_KXP_LOOKUP = [_kxp_byte_lookup(b) for b in range(256)]


class _PairTable:
    """PairTable.java: linear-probe open hash over rowCol ints, probe
    start = item >>> (validBits - lgSizeInts), -1 empty, upsize at
    3/4 load, downsize at 1/4."""

    __slots__ = ("lg_size", "valid_bits", "num_pairs", "slots")

    def __init__(self, lg_size: int, valid_bits: int):
        self.lg_size = lg_size
        self.valid_bits = valid_bits
        self.num_pairs = 0
        self.slots = [-1] * (1 << lg_size)

    def _start(self, item: int) -> int:
        return (item & 0xFFFFFFFF) >> (self.valid_bits - self.lg_size)

    def maybe_insert(self, item: int) -> bool:
        mask = (1 << self.lg_size) - 1
        probe = self._start(item)
        slots = self.slots
        fetched = slots[probe]
        while fetched != item and fetched != -1:
            probe = (probe + 1) & mask
            fetched = slots[probe]
        if fetched == item:
            return False
        slots[probe] = item
        self.num_pairs += 1
        while 4 * self.num_pairs > 3 * (1 << self.lg_size):
            self._rebuild(self.lg_size + 1)
        return True

    def maybe_delete(self, item: int) -> bool:
        mask = (1 << self.lg_size) - 1
        probe = self._start(item)
        slots = self.slots
        fetched = slots[probe]
        while fetched != item and fetched != -1:
            probe = (probe + 1) & mask
            fetched = slots[probe]
        if fetched == -1:
            return False
        slots[probe] = -1
        self.num_pairs -= 1
        # re-insert the rest of the probe cluster
        probe = (probe + 1) & mask
        fetched = slots[probe]
        while fetched != -1:
            slots[probe] = -1
            self._must_insert(fetched)
            probe = (probe + 1) & mask
            fetched = slots[probe]
        while 4 * self.num_pairs < (1 << self.lg_size) and self.lg_size > 2:
            self._rebuild(self.lg_size - 1)
        return True

    def _must_insert(self, item: int) -> None:
        mask = (1 << self.lg_size) - 1
        probe = self._start(item)
        slots = self.slots
        fetched = slots[probe]
        while fetched != item and fetched != -1:
            probe = (probe + 1) & mask
            fetched = slots[probe]
        if fetched == item:
            raise RuntimeError("PairTable mustInsert() failed")
        slots[probe] = item

    def _rebuild(self, new_lg: int) -> None:
        old = self.slots
        self.slots = [-1] * (1 << new_lg)
        self.lg_size = new_lg
        for it in old:
            if it != -1:
                self._must_insert(it)

    def clear(self) -> None:
        self.slots = [-1] * (1 << self.lg_size)
        self.num_pairs = 0

    def unwrapping_get_items(self) -> list[int]:
        """Unwraps the probe cluster that straddles slot 0 so the items
        come out 'essentially sorted' for the compressor's sort."""
        if self.num_pairs < 1:
            return []
        slots = self.slots
        size = 1 << self.lg_size
        out = [0] * self.num_pairs
        i, l, r = 0, 0, self.num_pairs - 1
        hi_bit = 1 << (self.valid_bits - 1)
        while i < size and slots[i] != -1:
            it = slots[i]
            i += 1
            if it & hi_bit:
                out[r] = it
                r -= 1
            else:
                out[l] = it
                l += 1
        while i < size:
            it = slots[i]
            i += 1
            if it != -1:
                out[l] = it
                l += 1
        return out


def _u32(x: int) -> int:
    return x & 0xFFFFFFFF


class DsCpcSketch:
    """A buildable CpcSketch in the exact datasketches-java state
    machine; ``serialize`` emits bytes Java's heapify accepts and
    ``toByteArray`` would produce identically."""

    def __init__(self, lg_k: int = DEFAULT_LGK):
        if not 4 <= lg_k <= 26:
            raise ValueError("CPC lgK must be in 4..26")
        self.lg_k = lg_k
        self.reset()

    def reset(self) -> None:
        self.num_coupons = 0
        self.merge_flag = False
        self.fi_col = 0
        self.window_offset = 0
        self.sliding_window: bytearray | None = None
        self.pair_table: _PairTable | None = None
        self.kxp = float(1 << self.lg_k)
        self.hip_est_accum = 0.0

    # -- updates -----------------------------------------------------------

    def update_long(self, v: int) -> None:
        from pinot_spark.functions.scalar_ext import _murmur3_x64_128

        h0, h1 = _murmur3_x64_128(
            int(v).to_bytes(8, "little", signed=True), seed=9001
        )
        self._hash_update(h0, h1)

    def update_bytes(self, b: bytes) -> None:
        if len(b) == 0:
            return
        from pinot_spark.functions.scalar_ext import _murmur3_x64_128

        h0, h1 = _murmur3_x64_128(bytes(b), seed=9001)
        self._hash_update(h0, h1)

    def update_str(self, s: str) -> None:
        if not s:
            return
        self.update_bytes(s.encode("utf-8"))

    def update_double(self, d: float) -> None:
        # Java canonicalizes: d = (d == 0.0) ? 0.0 : d; NaN -> canonical
        if d == 0.0:
            d = 0.0
        if d != d:
            bits = 0x7FF8000000000000
        else:
            bits = struct.unpack("<q", struct.pack("<d", d))[0]
        self.update_long(bits)

    def _hash_update(self, hash0: int, hash1: int) -> None:
        h1 = hash1 & 0xFFFFFFFFFFFFFFFF
        col = 64 - h1.bit_length() if h1 else 64
        if col < self.fi_col:
            return  # "nothing the sketch needs to know"
        if col > 63:
            col = 63
        if self.num_coupons == 0:
            self._promote_empty_to_sparse()
        k = 1 << self.lg_k
        row = hash0 & (k - 1)
        row_col = (row << 6) | col
        if row_col == 0xFFFFFFFF:  # Java's (rowCol == -1)
            row_col ^= 1 << 6  # the pair table's empty marker is avoided
        if (self.num_coupons << 5) < 3 * k:
            self._update_sparse(row_col)
        else:
            self._update_windowed(row_col)

    def row_col_update(self, row_col: int) -> None:
        col = row_col & 63
        if col < self.fi_col:
            return
        if self.num_coupons == 0:
            self._promote_empty_to_sparse()
        k = 1 << self.lg_k
        if (self.num_coupons << 5) < 3 * k:
            self._update_sparse(row_col)
        else:
            self._update_windowed(row_col)

    def _promote_empty_to_sparse(self) -> None:
        self.pair_table = _PairTable(2, 6 + self.lg_k)

    def _update_sparse(self, row_col: int) -> None:
        k = 1 << self.lg_k
        if self.pair_table.maybe_insert(row_col):
            self.num_coupons += 1
            self._update_hip(row_col)
            if (self.num_coupons << 5) >= 3 * k:
                self._promote_sparse_to_windowed()

    def _promote_sparse_to_windowed(self) -> None:
        k = 1 << self.lg_k
        window = bytearray(k)
        new_table = _PairTable(2, 6 + self.lg_k)
        for it in self.pair_table.slots:
            if it == -1:
                continue
            col = it & 63
            if col < 8:
                window[_u32(it) >> 6] |= 1 << col
            else:
                new_table.maybe_insert(it)
        self.sliding_window = window
        self.pair_table = new_table

    def _update_windowed(self, row_col: int) -> None:
        k = 1 << self.lg_k
        w8pre = self.window_offset << 3
        is_novel = False
        col = row_col & 63
        if col < self.window_offset:
            # surprising ZEROS before the window: inverted logic
            is_novel = self.pair_table.maybe_delete(row_col)
        elif col < self.window_offset + 8:
            row = _u32(row_col) >> 6
            old = self.sliding_window[row]
            new = old | (1 << (col - self.window_offset))
            if new != old:
                self.sliding_window[row] = new
                is_novel = True
        else:
            is_novel = self.pair_table.maybe_insert(row_col)
        if is_novel:
            self.num_coupons += 1
            self._update_hip(row_col)
            if (self.num_coupons << 3) >= (27 + w8pre) * k:
                self._modify_offset(self.window_offset + 1)

    def _modify_offset(self, new_offset: int) -> None:
        k = 1 << self.lg_k
        bit_matrix = self.bit_matrix()
        if (new_offset & 7) == 0:
            self._refresh_kxp(bit_matrix)
        self.pair_table.clear()
        table = self.pair_table
        window = self.sliding_window
        mask_clear = ((0xFF << new_offset) ^ 0xFFFFFFFFFFFFFFFF) & 0xFFFFFFFFFFFFFFFF
        mask_flip = (1 << new_offset) - 1
        all_surprises = 0
        for i in range(k):
            pattern = bit_matrix[i]
            window[i] = (pattern >> new_offset) & 0xFF
            pattern &= mask_clear
            pattern ^= mask_flip  # complement the below-window bits
            all_surprises |= pattern
            while pattern:
                col = (pattern & -pattern).bit_length() - 1
                pattern ^= 1 << col
                table.maybe_insert((i << 6) | col)
        self.window_offset = new_offset
        self.fi_col = (
            (all_surprises & -all_surprises).bit_length() - 1
            if all_surprises
            else 64
        )
        if self.fi_col > new_offset:
            self.fi_col = new_offset

    def _update_hip(self, row_col: int) -> None:
        k = 1 << self.lg_k
        col = row_col & 63
        self.hip_est_accum += k / self.kxp
        self.kxp -= _inv_pow2(col + 1)

    def _refresh_kxp(self, bit_matrix: list[int]) -> None:
        byte_sums = [0.0] * 8
        for row in bit_matrix:
            for j in range(8):
                byte_sums[j] += _KXP_LOOKUP[row & 0xFF]
                row >>= 8
        total = 0.0
        for j in range(6, -1, -1):  # the library drops byteSums[7]
            total += _inv_pow2(8 * j) * byte_sums[j]
        self.kxp = total

    # -- state queries -----------------------------------------------------

    def bit_matrix(self) -> list[int]:
        """CpcUtil.bitMatrixOfSketch: k uint64 rows; below-window
        columns default to 1, pair entries XOR (flip)."""
        k = 1 << self.lg_k
        if self.num_coupons == 0:
            return [0] * k
        default = (1 << self.window_offset) - 1
        matrix = [default] * k
        if self.sliding_window is not None:
            off = self.window_offset
            for i in range(k):
                matrix[i] |= self.sliding_window[i] << off
        if self.pair_table is not None:
            for it in self.pair_table.slots:
                if it != -1:
                    matrix[_u32(it) >> 6] ^= 1 << (it & 63)
        return matrix

    def flavor(self) -> str:
        c, k = self.num_coupons, 1 << self.lg_k
        if c == 0:
            return "EMPTY"
        if (c << 5) < 3 * k:
            return "SPARSE"
        if (c << 1) < k:
            return "HYBRID"
        if (c << 3) < 27 * k:
            return "PINNED"
        return "SLIDING"

    def estimate(self) -> float:
        if self.num_coupons == 0:
            return 0.0
        if not self.merge_flag:
            return self.hip_est_accum
        return icon_estimate(self.lg_k, self.num_coupons)

    # -- compression -------------------------------------------------------

    def serialize(self) -> bytes:
        """CompressedState.compress + exportToMemory, byte-canonical
        with toByteArray()."""
        csv_stream, csv_len, num_csv, cw_stream, cw_len = self._compress()
        fmt = (
            (4 if cw_len > 0 else 0)
            | (2 if num_csv > 0 else 0)
            | (0 if self.merge_flag else 1)
        )
        pre_ints = _PRE_INTS[fmt]
        flags = 2  # compressed
        if fmt & 1:
            flags |= _F_HIP
        if fmt & 2:
            flags |= _F_SV
        if fmt & 4:
            flags |= _F_WINDOW
        out = bytearray()
        out += struct.pack(
            "<BBBBBBH", pre_ints, 1, _FAMILY_CPC, self.lg_k, self.fi_col,
            flags, 0x93CC,
        )
        if fmt in (0, 1):
            return bytes(out)
        out += struct.pack("<I", self.num_coupons)
        if fmt in (2, 3):  # SPARSE_HYBRID
            out += struct.pack("<I", csv_len)
            if fmt == 3:
                out += struct.pack("<dd", self.kxp, self.hip_est_accum)
            out += b"".join(struct.pack("<I", _u32(w)) for w in csv_stream[:csv_len])
        elif fmt in (4, 5):  # PINNED_SLIDING_NOSV
            out += struct.pack("<I", cw_len)
            if fmt == 5:
                out += struct.pack("<dd", self.kxp, self.hip_est_accum)
            out += b"".join(struct.pack("<I", _u32(w)) for w in cw_stream[:cw_len])
        else:  # PINNED_SLIDING (6 merged / 7 hip)
            out += struct.pack("<I", num_csv)
            if fmt == 7:
                out += struct.pack("<dd", self.kxp, self.hip_est_accum)
            out += struct.pack("<II", csv_len, cw_len)
            # the window stream precedes the sv stream on the wire
            out += b"".join(struct.pack("<I", _u32(w)) for w in cw_stream[:cw_len])
            out += b"".join(struct.pack("<I", _u32(w)) for w in csv_stream[:csv_len])
        return bytes(out)

    def _compress(self):
        """CpcCompression.compress: returns (csvStream, csvLengthInts,
        numCsv, cwStream, cwLengthInts)."""
        fl = self.flavor()
        if fl == "EMPTY":
            return [], 0, 0, [], 0
        if fl == "SPARSE":
            pairs = sorted(
                self.pair_table.unwrapping_get_items(), key=_u32
            )
            csv, csv_len = _compress_surprising_values(
                self.lg_k, pairs, len(pairs)
            )
            return csv, csv_len, len(pairs), [], 0
        if fl == "HYBRID":
            k = 1 << self.lg_k
            pairs = sorted(self.pair_table.unwrapping_get_items(), key=_u32)
            num_pairs_from_table = len(pairs)
            num_pairs_from_window = self.num_coupons - num_pairs_from_table
            win_pairs = _tricky_get_pairs_from_window(
                self.sliding_window, k
            )
            all_pairs = sorted(pairs + win_pairs, key=_u32)
            csv, csv_len = _compress_surprising_values(
                self.lg_k, all_pairs, self.num_coupons
            )
            return csv, csv_len, self.num_coupons, [], 0
        # PINNED / SLIDING: window + surprises
        cw, cw_len = _compress_the_window(
            self.sliding_window, self.lg_k, self.num_coupons
        )
        num_pairs = self.pair_table.num_pairs
        if num_pairs > 0:
            pairs = self.pair_table.unwrapping_get_items()
            if fl == "PINNED":
                pairs = [p - 8 for p in pairs]  # cols are >= 8 here
                pairs.sort(key=_u32)
            else:  # SLIDING: rotate columns by the pseudo-phase perm
                pseudo_phase = _determine_pseudo_phase(
                    self.lg_k, self.num_coupons
                )
                perm = _tables()["columnPermutationsForEncoding"][pseudo_phase]
                off = self.window_offset
                rot = []
                for p in pairs:
                    row = _u32(p) >> 6
                    col = (((p & 63) + 56) - off) & 63
                    rot.append((row << 6) | perm[col])
                rot.sort(key=_u32)
                pairs = rot
            csv, csv_len = _compress_surprising_values(
                self.lg_k, pairs, num_pairs
            )
            return csv, csv_len, num_pairs, cw, cw_len
        return [], 0, 0, cw, cw_len

    # -- building from streams / merging ------------------------------------

    @classmethod
    def build_from_longs(cls, values, lg_k: int = DEFAULT_LGK) -> "DsCpcSketch":
        s = cls(lg_k)
        for v in values:
            s.update_long(int(v))
        return s

    @classmethod
    def from_bit_matrix(
        cls, matrix: list[int], lg_k: int
    ) -> "DsCpcSketch":
        """CpcUnion.getResult semantics: a merged sketch rebuilt from
        an accumulated bit matrix — mergeFlag set, HIP invalid (the
        union cannot maintain it), window offset re-derived from the
        coupon count."""
        s = cls(lg_k)
        k = 1 << lg_k
        c = sum(bin(row).count("1") for row in matrix)
        s.num_coupons = c
        s.merge_flag = True
        if c == 0:
            s.kxp = float(k)
            s.hip_est_accum = 0.0
            return s
        if (c << 5) < 3 * k:
            # SPARSE result (the library's all-sparse accumulator path):
            # every coupon lives in the pair table, no window
            table = _PairTable(2, 6 + lg_k)
            for i, row in enumerate(matrix):
                while row:
                    col = (row & -row).bit_length() - 1
                    row ^= 1 << col
                    table.maybe_insert((i << 6) | col)
            s.pair_table = table
            s.kxp = -1.0
            s.hip_est_accum = -1.0
            return s
        offset = _determine_correct_offset(lg_k, c)
        s.window_offset = offset
        window = bytearray(k)
        table = _PairTable(2, 6 + lg_k)
        mask_clear = ((0xFF << offset) ^ 0xFFFFFFFFFFFFFFFF) & 0xFFFFFFFFFFFFFFFF
        mask_flip = (1 << offset) - 1
        all_surprises = 0
        for i in range(k):
            pattern = matrix[i]
            window[i] = (pattern >> offset) & 0xFF
            pattern &= mask_clear
            pattern ^= mask_flip
            all_surprises |= pattern
            while pattern:
                col = (pattern & -pattern).bit_length() - 1
                pattern ^= 1 << col
                table.maybe_insert((i << 6) | col)
        s.sliding_window = window
        s.pair_table = table
        s.fi_col = (
            (all_surprises & -all_surprises).bit_length() - 1
            if all_surprises
            else 64
        )
        if s.fi_col > offset:
            s.fi_col = offset
        s.kxp = -1.0  # invalid, as in the library's merged sketches
        s.hip_est_accum = -1.0
        # Java stores kxp/hipEstAccum only for HIP formats; merged
        # formats never serialize them, so the sentinel never leaks
        return s


def _determine_correct_offset(lg_k: int, c: int) -> int:
    k = 1 << lg_k
    tmp = (c << 3) - 19 * k
    if tmp < 0:
        return 0
    return tmp >> (lg_k + 3)


def _determine_pseudo_phase(lg_k: int, c: int) -> int:
    k = 1 << lg_k
    if 1000 * c < 2375 * k:
        if 4 * c < 3 * k:
            return 16
        if 10 * c < 11 * k:
            return 17
        if 100 * c < 132 * k:
            return 18
        if 3 * c < 5 * k:
            return 19
        if 1000 * c < 1965 * k:
            return 20
        if 1000 * c < 2275 * k:
            return 21
        return 6  # steady-state table employed before its actual phase
    return (c >> (lg_k - 4)) & 15


def _tricky_get_pairs_from_window(window, num_rows: int) -> list[int]:
    pairs = []
    for i in range(num_rows):
        b = window[i]
        while b:
            col = (b & -b).bit_length() - 1
            b ^= 1 << col
            pairs.append((i << 6) | col)
    return pairs


def _golomb_choose_number_of_base_bits(k: int, count: int) -> int:
    quotient = (k - count) // count  # Java long division (operands > 0)
    if quotient == 0:
        return 0
    return quotient.bit_length() - 1  # floorLog2


def _compress_surprising_values(lg_k: int, pairs: list[int], num_pairs: int):
    """compressTheSurprisingValues + lowLevelCompressPairs."""
    k = 1 << lg_k
    num_base_bits = _golomb_choose_number_of_base_bits(k + num_pairs, num_pairs)
    golomb_lo_mask = (1 << num_base_bits) - 1
    table = _tables()["lengthLimitedUnaryEncodingTable65"]
    out: list[int] = []
    bit_buf = 0
    buf_bits = 0
    pred_row = 0
    pred_col = 0
    for row_col in pairs:
        u = _u32(row_col)
        row = u >> 6
        col = u & 63
        if row != pred_row:
            pred_col = 0
        y_delta = row - pred_row
        x_delta = col - pred_col
        pred_row = row
        pred_col = col + 1
        code = table[x_delta] & 0xFFFF
        bit_buf |= (code & 0xFFF) << buf_bits
        buf_bits += code >> 12
        if buf_bits >= 32:
            out.append(bit_buf & 0xFFFFFFFF)
            bit_buf >>= 32
            buf_bits -= 32
        golomb_lo = y_delta & golomb_lo_mask
        golomb_hi = y_delta >> num_base_bits
        # writeUnary
        v = golomb_hi
        while v >= 16:
            v -= 16
            buf_bits += 16
            if buf_bits >= 32:
                out.append(bit_buf & 0xFFFFFFFF)
                bit_buf >>= 32
                buf_bits -= 32
        bit_buf |= (1 << v) << buf_bits
        buf_bits += v + 1
        if buf_bits >= 32:
            out.append(bit_buf & 0xFFFFFFFF)
            bit_buf >>= 32
            buf_bits -= 32
        bit_buf |= golomb_lo << buf_bits
        buf_bits += num_base_bits
        if buf_bits >= 32:
            out.append(bit_buf & 0xFFFFFFFF)
            bit_buf >>= 32
            buf_bits -= 32
    padding = 10 - num_base_bits
    if padding < 0:
        padding = 0
    buf_bits += padding
    if buf_bits >= 32:
        out.append(bit_buf & 0xFFFFFFFF)
        bit_buf >>= 32
        buf_bits -= 32
    if buf_bits > 0:
        out.append(bit_buf & 0xFFFFFFFF)
    return out, len(out)


def _compress_the_window(window, lg_k: int, num_coupons: int):
    """compressTheWindow + lowLevelCompressBytes."""
    k = 1 << lg_k
    pseudo_phase = _determine_pseudo_phase(lg_k, num_coupons)
    table = _tables()["encodingTablesForHighEntropyByte"][pseudo_phase]
    out: list[int] = []
    bit_buf = 0
    buf_bits = 0
    for i in range(k):
        code = table[window[i]] & 0xFFFF
        bit_buf |= (code & 0xFFF) << buf_bits
        buf_bits += code >> 12
        if buf_bits >= 32:
            out.append(bit_buf & 0xFFFFFFFF)
            bit_buf >>= 32
            buf_bits -= 32
    buf_bits += 11  # padding for the decoder's lookahead
    if buf_bits >= 32:
        out.append(bit_buf & 0xFFFFFFFF)
        bit_buf >>= 32
        buf_bits -= 32
    if buf_bits > 0:
        out.append(bit_buf & 0xFFFFFFFF)
    return out, len(out)


# ---------------------------------------------------------------------------
# CPC DECODE path: full parse (importFromMemory + CpcCompression.uncompress)
# so foreign compressed bytes rebuild the exact sketch state — enabling
# unions of serialized sketches (CpcSketchUnion) and byte-stable
# re-serialization.  The decoding tables ship alongside the encoders.
# ---------------------------------------------------------------------------


class _BitReader:
    """The library's (nextWordIndex, bitBuf, bufBits) pointer triple."""

    __slots__ = ("words", "idx", "buf", "bits")

    def __init__(self, words: list[int]):
        self.words = words
        self.idx = 0
        self.buf = 0
        self.bits = 0

    def _fill(self, need: int) -> None:
        if self.bits < need:
            self.buf |= _u32(self.words[self.idx]) << self.bits
            self.idx += 1
            self.bits += 32

    def take(self, n: int) -> int:
        self._fill(n)
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.bits -= n
        return v

    def read_unary(self) -> int:
        sub_total = 0
        while True:
            self._fill(8)
            peek8 = self.buf & 0xFF
            tz = 8
            if peek8:
                tz = (peek8 & -peek8).bit_length() - 1
            if tz == 8:
                sub_total += 8
                self.buf >>= 8
                self.bits -= 8
                continue
            self.buf >>= tz + 1
            self.bits -= tz + 1
            return sub_total + tz


def _uncompress_bytes(num_bytes: int, table: list[int], words: list[int]) -> bytearray:
    out = bytearray(num_bytes)
    r = _BitReader(words)
    for i in range(num_bytes):
        r._fill(12)
        lookup = table[r.buf & 0xFFF] & 0xFFFF
        length = lookup >> 8
        out[i] = lookup & 0xFF
        r.buf >>= length
        r.bits -= length
    return out


def _uncompress_pairs(
    num_pairs: int, num_base_bits: int, words: list[int], unary_table: list[int]
) -> list[int]:
    out = [0] * num_pairs
    r = _BitReader(words)
    lo_mask = (1 << num_base_bits) - 1
    pred_row = 0
    pred_col = 0
    for i in range(num_pairs):
        r._fill(12)
        lookup = unary_table[r.buf & 0xFFF] & 0xFFFF
        length = lookup >> 8
        x_delta = lookup & 0xFF
        r.buf >>= length
        r.bits -= length
        golomb_hi = r.read_unary()
        golomb_lo = r.take(num_base_bits) if num_base_bits else 0
        y_delta = (golomb_hi << num_base_bits) | golomb_lo
        if y_delta > 0:
            pred_col = 0
        row = pred_row + y_delta
        col = pred_col + x_delta
        out[i] = (row << 6) | col
        pred_row = row
        pred_col = col + 1
    return out


def parse_cpc(b: bytes) -> "DsCpcSketch":
    """Full CpcSketch.heapify: preamble + stream decompression into the
    exact uncompressed sketch state.  ``serialize(parse_cpc(b)) == b``
    for every library-emitted payload (golden + live tests)."""
    view = DsCpcView.parse(b)  # validates preamble / family / seed
    pre_ints, _sv, _fam, lg_k, fi_col, flags, _sh = struct.unpack_from(
        "<BBBBBBH", b, 0
    )
    fmt = (
        (4 if flags & _F_WINDOW else 0)
        | (2 if flags & _F_SV else 0)
        | (1 if flags & _F_HIP else 0)
    )
    s = DsCpcSketch(lg_k)
    s.merge_flag = not (fmt & 1)
    s.fi_col = fi_col
    if fmt in (0, 1):
        return s
    k = 1 << lg_k
    num_coupons = struct.unpack_from("<I", b, 8)[0]
    s.num_coupons = num_coupons
    s.window_offset = _determine_correct_offset(lg_k, num_coupons)
    tbl = _tables()
    unary_dec = tbl["lengthLimitedUnaryDecodingTable65"]

    def words_at(off: int, n: int) -> list[int]:
        return list(struct.unpack_from(f"<{n}I", b, off)) if n else []

    if fmt in (2, 3):  # SPARSE_HYBRID: every coupon in the csv stream
        csv_len = struct.unpack_from("<I", b, 12)[0]
        base = 16
        if fmt == 3:
            s.kxp, s.hip_est_accum = struct.unpack_from("<dd", b, 16)
            base = 32
        num_base_bits = _golomb_choose_number_of_base_bits(
            k + num_coupons, num_coupons
        )
        pairs = _uncompress_pairs(
            num_coupons, num_base_bits, words_at(base, csv_len), unary_dec
        )
        if (num_coupons << 5) < 3 * k:  # true sparse: table only
            table = _PairTable(2, 6 + lg_k)
            for p in pairs:
                table.maybe_insert(p)
            s.pair_table = table
        else:  # hybrid: cols < 8 in the window, rest in the table
            window = bytearray(k)
            table = _PairTable(2, 6 + lg_k)
            for p in pairs:
                col = p & 63
                if col < 8:
                    window[_u32(p) >> 6] |= 1 << col
                else:
                    table.maybe_insert(p)
            s.sliding_window = window
            s.pair_table = table
        return s
    # window formats
    pseudo_phase = _determine_pseudo_phase(lg_k, num_coupons)
    win_dec = tbl["decodingTablesForHighEntropyByte"][pseudo_phase]
    if fmt in (4, 5):  # no surprising values
        cw_len = struct.unpack_from("<I", b, 12)[0]
        base = 16 if fmt == 4 else 32
        if fmt == 5:
            s.kxp, s.hip_est_accum = struct.unpack_from("<dd", b, 16)
        s.sliding_window = _uncompress_bytes(k, win_dec, words_at(base, cw_len))
        s.pair_table = _PairTable(2, 6 + lg_k)
        return s
    # fmt 6/7: window stream first, then the sv stream
    num_sv = struct.unpack_from("<I", b, 12)[0]
    if fmt == 7:
        s.kxp, s.hip_est_accum = struct.unpack_from("<dd", b, 16)
        csv_len, cw_len = struct.unpack_from("<II", b, 32)
        base = 40
    else:
        csv_len, cw_len = struct.unpack_from("<II", b, 16)
        base = 24
    s.sliding_window = _uncompress_bytes(k, win_dec, words_at(base, cw_len))
    sv_words = words_at(base + 4 * cw_len, csv_len)
    num_base_bits = _golomb_choose_number_of_base_bits(k + num_sv, num_sv)
    pairs = _uncompress_pairs(num_sv, num_base_bits, sv_words, unary_dec)
    table = _PairTable(2, 6 + lg_k)
    if s.flavor() == "PINNED":
        for p in pairs:
            table.maybe_insert(p + 8)
    else:  # SLIDING: invert the column rotation/permutation
        perm_dec = tbl["columnPermutationsForDecoding"][pseudo_phase]
        off = s.window_offset
        for p in pairs:
            row = _u32(p) >> 6
            col = (perm_dec[p & 63] + off + 8) & 63
            table.maybe_insert((row << 6) | col)
    s.pair_table = table
    return s


def cpc_union(sketches: list["DsCpcSketch"], lg_k: int | None = None) -> "DsCpcSketch":
    """CpcUnion semantics over parsed sketches: OR of bit matrices at
    the minimum lgK (higher-lgK matrices fold by row index)."""
    if lg_k is None:
        lg_k = DEFAULT_LGK
    for s in sketches:  # the union downsamples to the smallest lgK seen
        if s.lg_k < lg_k:
            lg_k = s.lg_k
    k = 1 << lg_k
    acc = [0] * k
    for s in sketches:
        m = s.bit_matrix()
        if s.lg_k == lg_k:
            for i in range(k):
                acc[i] |= m[i]
        else:  # fold down
            for i, row in enumerate(m):
                acc[i & (k - 1)] |= row
    return DsCpcSketch.from_bit_matrix(acc, lg_k)
