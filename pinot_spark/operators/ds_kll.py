"""Apache DataSketches KLL doubles-sketch WIRE-FORMAT interop (read +
write + quantiles + merge).

The reference's PERCENTILEKLL / PERCENTILERAWKLL family wraps
``org.apache.datasketches.kll.KllDoublesSketch`` and ships
``toByteArray()`` via ``ObjectSerDeUtils.KLL_SKETCH_SER_DE``
(pinot-core/.../common/ObjectSerDeUtils.java:1176+), so exchanging
quantile sketches with a real cluster means this layout, implemented
here from scratch:

Layout facts (verified against datasketches-java 6.2.0 byte dumps,
tests/data/ds_kll_vectors.json):

  byte 0   preamble ints: 2 (empty / single item) or 5 (full)
  byte 1   serial version: 1 (empty / full), 2 (single item)
  byte 2   family id = 15 (KLL)
  byte 3   flags: 1=EMPTY, 2=LEVEL_ZERO_SORTED, 4=SINGLE_ITEM
  bytes 4-5  k (LE uint16), byte 6  m (=8), byte 7  unused
  [single]   bytes 8-15: the one item (LE float64)
  [full]     bytes 8-15 n (LE int64); 16-17 minK (LE uint16);
             18 numLevels; 19 unused;
             levels[0..numLevels-1] (LE int32 each — absolute indices
             into the in-memory items array; the final boundary is NOT
             serialized);
             min item, max item (LE float64);
             the retained items, items[levels[0] .. capacity)

Level-0 grows DOWNWARD (new items insert at ``--levels[0]``), so a
freshly-updated sketch serializes its level-0 region in REVERSE
insertion order with the sorted flag clear; the library's quantile
queries sort level zero IN PLACE and set the flag, so a post-query
sketch serializes sorted (both probed live — the goldens are the
post-query form because the harness read quantiles before dumping).
``build_from_values`` finalizes into the post-query form, making byte
parity hold through the whole no-compaction regime (n <= k), the
analog of the theta exact regime; ``parse``/``serialize`` preserve
either state byte-for-byte.  Level capacities
follow the library's rounding: ``max(m, floor(k * (2/3)^depth + 0.5))``
with depth = numLevels-1-height (pinned by reflective probes of
``KllHelper.levelCapacity``).

Quantiles use the INCLUSIVE rule the Java ``getQuantile(rank)``
defaults to: over the weight-sorted view (level i carries weight 2^i),
return the first item whose cumulative weight >= rank * n — pinned at
six ranks per golden vector, including multi-level sketches the
library built with its own (random) compactions.

Compaction note: the library picks a RANDOM half (odd/even offset)
when halving a full level, so two independent builders never agree
byte-for-byte past the no-compaction regime — this implementation uses
a FIXED even offset (deterministic, reproducible plans).  The result
is a structurally valid sketch the library heapifies and merges (live
Java round-trip in tests/test_ds_kll.py); its estimates carry the same
KLL error bounds in practice, without the randomized tie-breaking.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

DEFAULT_K = 200  # KllSketch.DEFAULT_K — also the reference's default
_M = 8  # KllSketch minimum level width (DEFAULT_M)
_FAMILY_KLL = 15
_F_EMPTY, _F_L0_SORTED, _F_SINGLE = 1, 2, 4


def level_capacity(k: int, num_levels: int, height: int, m: int = _M) -> int:
    """KllHelper.levelCapacity: width budget of the level at ``height``
    (0 = bottom) when the sketch has ``num_levels`` levels."""
    depth = num_levels - 1 - height
    return max(m, int(k * (2.0 / 3.0) ** depth + 0.5))


def total_capacity(k: int, num_levels: int, m: int = _M) -> int:
    return sum(level_capacity(k, num_levels, h, m) for h in range(num_levels))


@dataclass
class DsKllSketch:
    """A parsed / buildable KllDoublesSketch (heap, doubles)."""

    k: int = DEFAULT_K
    m: int = _M
    n: int = 0
    min_k: int = DEFAULT_K
    level_items: list[np.ndarray] = field(default_factory=list)
    # level_items[i] holds level i's retained values; level 0 is kept in
    # REVERSE insertion order (the in-memory layout) until sorted by a
    # compaction or an explicit sort
    level0_sorted: bool = True
    min_v: float = float("nan")
    max_v: float = float("nan")

    # -- construction ------------------------------------------------------

    @classmethod
    def empty(cls, k: int = DEFAULT_K) -> "DsKllSketch":
        return cls(k=k, min_k=k, level_items=[np.array([], dtype=np.float64)])

    def update(self, v: float) -> None:
        v = float(v)
        if self.n == 0:
            self.min_v = self.max_v = v
        else:
            self.min_v = min(self.min_v, v)
            self.max_v = max(self.max_v, v)
        if not self.level_items:
            self.level_items = [np.array([], dtype=np.float64)]
        l0 = self.level_items[0]
        if self._free_space() == 0:
            self._compress()
            l0 = self.level_items[0]
        # level 0 inserts at the front (in-memory: items[--levels[0]])
        self.level_items[0] = np.concatenate(([v], l0))
        self.level0_sorted = len(self.level_items[0]) <= 1
        self.n += 1

    def _free_space(self) -> int:
        cap = total_capacity(self.k, len(self.level_items), self.m)
        return cap - sum(len(x) for x in self.level_items)

    def _compress(self) -> None:
        """Halve the lowest level that is at/over its capacity,
        promoting the kept half upward (deterministic even offset —
        see module docstring)."""
        nl = len(self.level_items)
        target = None
        for h in range(nl):
            if len(self.level_items[h]) >= level_capacity(self.k, nl, h, self.m):
                target = h
                break
        if target is None:
            target = 0
        if target == nl - 1:
            self.level_items.append(np.array([], dtype=np.float64))
            nl += 1
        lvl = np.sort(self.level_items[target])
        keep = lvl[0::2]  # fixed even offset
        if target == 0:
            self.level_items[0] = np.array([], dtype=np.float64)
            self.level0_sorted = True
        else:
            self.level_items[target] = np.array([], dtype=np.float64)
        up = self.level_items[target + 1]
        self.level_items[target + 1] = np.sort(np.concatenate((up, keep)))
        self.min_k = min(self.min_k, self.k)

    def finalize_level0(self) -> "DsKllSketch":
        """Sort level zero in place and set the flag — the state a Java
        sketch reaches after any quantile query, and the form this
        engine emits as canonical."""
        if self.level_items and not self.level0_sorted:
            self.level_items[0] = np.sort(self.level_items[0])
            self.level0_sorted = True
        return self

    @classmethod
    def build_from_values(cls, values, k: int = DEFAULT_K) -> "DsKllSketch":
        s = cls.empty(k)
        for v in values:
            s.update(v)
        return s.finalize_level0()

    # -- merge -------------------------------------------------------------

    def merge(self, other: "DsKllSketch") -> "DsKllSketch":
        if other.n == 0:
            return self
        if self.n == 0:
            out = DsKllSketch(
                k=self.k, m=self.m, n=other.n, min_k=min(self.min_k, other.min_k),
                level_items=[x.copy() for x in other.level_items],
                level0_sorted=other.level0_sorted,
                min_v=other.min_v, max_v=other.max_v,
            )
            return out
        nl = max(len(self.level_items), len(other.level_items))
        levels = []
        for h in range(nl):
            a = self.level_items[h] if h < len(self.level_items) else np.array([])
            b = other.level_items[h] if h < len(other.level_items) else np.array([])
            merged = np.concatenate((a, b)).astype(np.float64)
            levels.append(np.sort(merged) if h > 0 else merged)
        out = DsKllSketch(
            k=self.k, m=self.m, n=self.n + other.n,
            min_k=min(self.min_k, other.min_k),
            level_items=levels, level0_sorted=False,
            min_v=min(self.min_v, other.min_v),
            max_v=max(self.max_v, other.max_v),
        )
        while out._free_space() < 0:
            out._compress()
        return out

    # -- quantiles ---------------------------------------------------------

    def _sorted_view(self) -> tuple[np.ndarray, np.ndarray]:
        self.finalize_level0()  # Java sorts level 0 in place on query
        items, weights = [], []
        for h, lvl in enumerate(self.level_items):
            if len(lvl):
                items.append(np.asarray(lvl, dtype=np.float64))
                weights.append(np.full(len(lvl), 1 << h, dtype=np.int64))
        if not items:
            return np.array([]), np.array([], dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], np.cumsum(wt[order])

    def quantile(self, rank: float) -> float:
        """Java getQuantile(rank) with the default INCLUSIVE rule."""
        if self.n == 0:
            raise ValueError("quantile of an empty KLL sketch")
        if not 0.0 <= rank <= 1.0:
            raise ValueError("rank must be in [0, 1]")
        # Java special-cases the extremes to the tracked min/max items
        # (a compaction may have dropped them from the retained set)
        if rank == 0.0:
            return self.min_v
        if rank == 1.0:
            return self.max_v
        items, cum = self._sorted_view()
        natural = rank * self.n
        idx = int(np.searchsorted(cum, natural, side="left"))
        if idx >= len(items):
            idx = len(items) - 1
        return float(items[idx])

    def rank_of(self, value: float) -> float:
        """Normalized INCLUSIVE rank of ``value``."""
        if self.n == 0:
            raise ValueError("rank of an empty KLL sketch")
        items, cum = self._sorted_view()
        idx = int(np.searchsorted(items, value, side="right"))
        return float(cum[idx - 1] / self.n) if idx > 0 else 0.0

    # -- wire format -------------------------------------------------------

    def serialize(self) -> bytes:
        if self.n == 0:
            return struct.pack("<BBBBHBB", 2, 1, _FAMILY_KLL, _F_EMPTY, self.k, self.m, 0)
        if self.n == 1:
            head = struct.pack(
                "<BBBBHBB", 2, 2, _FAMILY_KLL, _F_L0_SORTED | _F_SINGLE, self.k, self.m, 0
            )
            return head + struct.pack("<d", self.min_v)
        nl = len(self.level_items)
        # toByteArray serializes the CURRENT state: level 0 stays in
        # whatever order it holds (reverse-insertion until a quantile
        # query sorts it in place — the Java side effect mirrored by
        # quantile()/finalize_level0()); the flag records which
        flags = _F_L0_SORTED if self.level0_sorted else 0
        head = struct.pack("<BBBBHBB", 5, 1, _FAMILY_KLL, flags, self.k, self.m, 0)
        head += struct.pack("<q", self.n)
        head += struct.pack("<HBB", self.min_k, nl, 0)
        cap = total_capacity(self.k, nl, self.m)
        # absolute level boundaries in the in-memory items array: the
        # array is packed from the TOP; garbage space sits below level 0
        bounds = [0] * (nl + 1)
        bounds[nl] = cap
        for h in range(nl - 1, -1, -1):
            bounds[h] = bounds[h + 1] - len(self.level_items[h])
        head += b"".join(struct.pack("<i", bounds[h]) for h in range(nl))
        head += struct.pack("<dd", self.min_v, self.max_v)
        body = np.concatenate(
            [np.asarray(x, dtype=np.float64) for x in self.level_items]
        ).astype("<f8").tobytes()
        return head + body

    @classmethod
    def parse(cls, b: bytes) -> "DsKllSketch":
        if len(b) < 8:
            raise ValueError("not a KLL sketch byte array")
        pre_ints, ser_ver, family, flags, k, m, _u = struct.unpack_from("<BBBBHBB", b, 0)
        if family != _FAMILY_KLL or pre_ints not in (2, 5) or ser_ver not in (1, 2):
            raise ValueError("not a KLL sketch byte array")
        if flags & _F_EMPTY:
            return cls.empty(k)
        if flags & _F_SINGLE:
            (v,) = struct.unpack_from("<d", b, 8)
            s = cls.empty(k)
            s.update(v)
            return s
        n = struct.unpack_from("<q", b, 8)[0]
        min_k, nl, _u2 = struct.unpack_from("<HBB", b, 16)
        pos = 20
        bounds = list(struct.unpack_from(f"<{nl}i", b, pos))
        pos += 4 * nl
        min_v, max_v = struct.unpack_from("<dd", b, pos)
        pos += 16
        retained = (len(b) - pos) // 8
        items = np.frombuffer(b, dtype="<f8", count=retained, offset=pos).astype(
            np.float64
        )
        bounds.append(bounds[0] + retained)  # final boundary
        levels = [
            items[bounds[h] - bounds[0] : bounds[h + 1] - bounds[0]].copy()
            for h in range(nl)
        ]
        return cls(
            k=k, m=m, n=n, min_k=min_k, level_items=levels,
            level0_sorted=bool(flags & _F_L0_SORTED),
            min_v=min_v, max_v=max_v,
        )


def is_ds_kll_bytes(b: bytes) -> bool:
    """True for DataSketches KLL doubles payloads (family id 15 with a
    KLL preamble shape) — disjoint from the engine-own t-digest blob
    (whose first 8 bytes are an IEEE-double compression factor)."""
    if len(b) < 8:
        return False
    pre_ints, ser_ver, family = b[0], b[1], b[2]
    return family == _FAMILY_KLL and pre_ints in (2, 5) and ser_ver in (1, 2)


def grouped_ds_kll(df, keys: list[str], col: str, k: int = DEFAULT_K):
    """Per-group DataSketches KllDoublesSketch bytes over ``col`` — the
    EXPORT path for exchanging quantile sketches with a real reference
    cluster (ObjectSerDeUtils.KLL_SKETCH_SER_DE).

    Same scale shape as the theta/HLL exports: one mapInPandas pass
    builds partition-local per-group sketches, then only sketch blobs
    (~(k..3k) doubles each, independent of row count) shuffle and merge
    level-wise per group.  Groups whose total count stays within the
    no-compaction regime serialize byte-canonically with the library;
    beyond that, the deterministic-offset compaction yields valid
    sketches the library heapifies (module docstring).

    Returns a DataFrame (keys..., ds_kll binary).
    """
    import pandas as pd
    import pyspark.sql.functions as F

    src = df.select(*keys, F.col(col).cast("double").alias("__v"))
    key_fields = [src.schema[kc] for kc in keys]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in key_fields]
        + ["__kll binary"]
    )

    def partials(batches):
        acc: dict[tuple, DsKllSketch] = {}
        for pdf in batches:
            for key_tuple, grp in pdf.groupby(keys, dropna=False, sort=False):
                if not isinstance(key_tuple, tuple):
                    key_tuple = (key_tuple,)
                s = acc.get(key_tuple)
                if s is None:
                    s = acc[key_tuple] = DsKllSketch.empty(k)
                for v in grp["__v"].dropna():
                    s.update(float(v))
        rows = [list(kt) + [s.serialize()] for kt, s in acc.items()]
        cols = keys + ["__kll"]
        yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
            {c: [] for c in cols}
        )

    part = src.mapInPandas(partials, schema=out_schema)

    def merge(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            rows = []
            for key_tuple, grp in pdf.groupby(keys, dropna=False, sort=False):
                if not isinstance(key_tuple, tuple):
                    key_tuple = (key_tuple,)
                out = DsKllSketch.empty(k)
                for blob in grp["__blobs"].iloc[0]:
                    out = out.merge(DsKllSketch.parse(bytes(blob)))
                # emit the canonical post-query form (sorted level 0):
                # groups within the no-compaction regime then serialize
                # byte-identically regardless of partitioning
                rows.append(list(key_tuple) + [out.finalize_level0().serialize()])
            cols = keys + ["ds_kll"]
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                {c: [] for c in cols}
            )

    import pyspark.sql.functions as F2

    merged = part.groupBy(*keys).agg(F2.collect_list("__kll").alias("__blobs"))
    final_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in key_fields]
        + ["ds_kll binary"]
    )
    return merged.mapInPandas(merge, schema=final_schema)
