"""Apache DataSketches FREQUENT-ITEMS sketch WIRE-FORMAT interop
(LongsSketch + ItemsSketch<String>), read + write + merge + estimates.

The reference's FREQUENT_STRINGS_SKETCH / FREQUENT_LONGS_SKETCH
aggregations wrap ``org.apache.datasketches.frequencies``
(FrequentStringsSketchAggregationFunction.java — BYTES inputs
auto-deserialize as serialized sketches and merge;
ObjectSerDeUtils.FREQUENT_LONGS_SKETCH_SER_DE ships
``toByteArray()``), so exchanging heavy-hitter state with a real
cluster means these layouts, implemented here from scratch.

Layout facts (verified against datasketches-java 6.2.0 byte dumps,
tests/data/ds_freq_vectors.json):

  byte 0   preamble longs: 1 (empty) or 4
  byte 1   serial version = 1
  byte 2   family id = 10 (FREQUENCY)
  byte 3   lgMaxMapSize, byte 4  lgCurMapSize
  byte 5   flags (empty sketches carry 0x05, non-empty 0x00 — mirrored
           byte-for-byte; bit 2 is the EMPTY mask)
  bytes 6-7 unused
  [non-empty] @8 numActive (LE int32) + 4 pad; @16 streamLength
  (LE int64); @24 offset a.k.a. maximum error (LE int64); then
  numActive counts (LE int64 each); then numActive items — raw LE
  int64 for the longs sketch, ``ArrayOfStringsSerDe`` entries
  (LE int32 UTF-8 byte length + bytes) for the strings sketch.

Algorithm notes: this is the deterministic Misra-Gries-style
reverse-purge map — on overflow at the max map size the MEDIAN of the
stored counts is selected, entries at/below it are evicted and the
global ``offset`` absorbs it (estimate(item) = count + offset, an
upper-bound estimator with error <= offset).  The library samples at
most 1024 counts for the median, so for maxMapSize <= 1024 (the
reference default is 256) the whole algorithm is deterministic and
this module's builds agree with Java EXACTLY on the
(item -> estimate) map, the offset, and the stream length — pinned by
golden parity tests.  Serialized entry ORDER is the library's
hash-map slot order (implementation-defined), so cross-writer byte
equality is not meaningful; ``parse``/``serialize`` preserve any
order byte-stably and the live Java round-trip proves the library
heapifies this module's output (tests/test_ds_freq.py).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

DEFAULT_MAX_MAP_SIZE = 256  # FrequentStringsSketchAggregationFunction
_FAMILY_FREQ = 10
_LOAD_FACTOR = 0.75
_SAMPLE_SIZE = 1024


def _lg(x: int) -> int:
    if x <= 0 or x & (x - 1):
        raise ValueError("map size must be a positive power of 2")
    return x.bit_length() - 1


@dataclass
class DsFrequentSketch:
    """A parsed / buildable frequencies sketch.  ``items`` are ints for
    the longs flavor, strs for the strings flavor (mixing raises at
    serialize time via the flavor check)."""

    lg_max: int
    lg_cur: int
    stream_length: int = 0
    offset: int = 0
    counts: dict = field(default_factory=dict)  # item -> stored count

    @classmethod
    def empty(cls, max_map_size: int = DEFAULT_MAX_MAP_SIZE) -> "DsFrequentSketch":
        lg = _lg(max_map_size)
        # the library starts at the minimum map size (8 slots)
        return cls(lg_max=lg, lg_cur=min(3, lg))

    # -- stream processing -------------------------------------------------

    @property
    def _cur_capacity(self) -> int:
        return int((1 << self.lg_cur) * _LOAD_FACTOR)

    def update(self, item, count: int = 1) -> None:
        if count <= 0:
            if count == 0:
                return
            raise ValueError("count must be non-negative")
        self.stream_length += count
        self.counts[item] = self.counts.get(item, 0) + count
        if len(self.counts) > self._cur_capacity:
            if self.lg_cur < self.lg_max:
                self.lg_cur += 1
            else:
                self._purge()

    def _purge(self) -> None:
        """Evict at/below the median stored count; the offset absorbs
        it (deterministic: all counts participate when numActive <=
        1024, the library's sample cap)."""
        vals = sorted(self.counts.values())
        take = min(_SAMPLE_SIZE, len(vals))
        median = vals[take // 2]
        self.counts = {
            k: v - median for k, v in self.counts.items() if v > median
        }
        self.offset += median

    @classmethod
    def build_from_values(
        cls, values, max_map_size: int = DEFAULT_MAX_MAP_SIZE
    ) -> "DsFrequentSketch":
        s = cls.empty(max_map_size)
        for v in values:
            s.update(v)
        return s

    # -- queries -----------------------------------------------------------

    def estimate(self, item) -> int:
        c = self.counts.get(item)
        return 0 if c is None else c + self.offset

    def lower_bound(self, item) -> int:
        c = self.counts.get(item)
        return 0 if c is None else c

    def upper_bound(self, item) -> int:
        c = self.counts.get(item)
        return 0 if c is None else c + self.offset

    @property
    def maximum_error(self) -> int:
        return self.offset

    def frequent_items(self, no_false_positives: bool = True) -> list[tuple]:
        """(item, estimate, lower, upper) rows, estimate-descending —
        the NO_FALSE_POSITIVES cut keeps items whose lower bound
        REACHES the maximum error (>=, pinned by the golden vector
        where an item sits exactly at lb == maxError);
        NO_FALSE_NEGATIVES keeps upper bound >= maxError."""
        rows = []
        for item in self.counts:
            lb, ub = self.lower_bound(item), self.upper_bound(item)
            keep = lb >= self.offset if no_false_positives else ub >= self.offset
            if keep:
                rows.append((item, self.estimate(item), lb, ub))
        rows.sort(key=lambda r: -r[1])
        return rows

    # -- merge -------------------------------------------------------------

    def merge(self, other: "DsFrequentSketch") -> "DsFrequentSketch":
        """Java's merge (LongsSketch/ItemsSketch bytecode, identical):
        skip iff other.isEmpty() — numActive == 0, so a purged-to-empty
        partial (counts empty, offset/streamLength > 0) is DROPPED
        entirely, offset and all; otherwise every (item, RAW stored
        count) of ``other`` feeds ``update``, the offsets add, and the
        stream length is the pre-captured true sum."""
        if not other.counts:
            return self
        out = DsFrequentSketch(
            lg_max=self.lg_max, lg_cur=self.lg_cur,
            stream_length=self.stream_length, offset=self.offset,
            counts=dict(self.counts),
        )
        stream = out.stream_length + other.stream_length
        for item, c in other.counts.items():
            out.update(item, c)
        out.stream_length = stream
        out.offset += other.offset
        return out

    # -- wire format -------------------------------------------------------

    def _is_strings(self) -> bool:
        return any(isinstance(k, str) for k in self.counts)

    def serialize(self) -> bytes:
        if self.stream_length == 0:
            return struct.pack(
                "<BBBBBBH", 1, 1, _FAMILY_FREQ, self.lg_max, self.lg_cur, 5, 0
            )
        head = struct.pack(
            "<BBBBBBH", 4, 1, _FAMILY_FREQ, self.lg_max, self.lg_cur, 0, 0
        )
        head += struct.pack("<iI", len(self.counts), 0)
        head += struct.pack("<qq", self.stream_length, self.offset)
        items = list(self.counts)
        head += b"".join(struct.pack("<q", self.counts[i]) for i in items)
        if self._is_strings():
            body = b""
            for it in items:
                raw = str(it).encode("utf-8")
                body += struct.pack("<i", len(raw)) + raw
            return head + body
        return head + b"".join(struct.pack("<q", int(i)) for i in items)

    @classmethod
    def parse(cls, b: bytes, strings: bool) -> "DsFrequentSketch":
        if len(b) < 8:
            raise ValueError("not a DataSketches frequencies byte array")
        pre, ver, fam, lg_max, lg_cur, flags, _u = struct.unpack_from("<BBBBBBH", b, 0)
        if fam != _FAMILY_FREQ or ver != 1 or pre not in (1, 4):
            raise ValueError("not a DataSketches frequencies byte array")
        if pre == 1:
            return cls(lg_max=lg_max, lg_cur=lg_cur)
        num_active = struct.unpack_from("<i", b, 8)[0]
        stream_length, offset = struct.unpack_from("<qq", b, 16)
        pos = 32
        counts = list(struct.unpack_from(f"<{num_active}q", b, pos))
        pos += 8 * num_active
        items: list = []
        if strings:
            for _ in range(num_active):
                ln = struct.unpack_from("<i", b, pos)[0]
                pos += 4
                items.append(b[pos : pos + ln].decode("utf-8"))
                pos += ln
        else:
            items = list(struct.unpack_from(f"<{num_active}q", b, pos))
            pos += 8 * num_active
        return cls(
            lg_max=lg_max, lg_cur=lg_cur, stream_length=stream_length,
            offset=offset, counts=dict(zip(items, counts)),
        )


def is_ds_freq_bytes(b: bytes) -> bool:
    return (
        len(b) >= 8 and b[2] == _FAMILY_FREQ and b[1] == 1 and b[0] in (1, 4)
    )
