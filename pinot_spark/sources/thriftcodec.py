"""Minimal pure-stdlib Thrift TBinaryProtocol struct decoder (reference:
pinot-plugins/pinot-input-format/pinot-thrift ThriftRecordReader; wire
format: Apache Thrift binary protocol spec).

Pinot's reader deserializes via a generated TBase class; the engine's
analog of that generated class is a **field spec** ``{field_id: name}``
— values are decoded by their wire type, so the spec only has to name
the fields to keep (unknown field ids are skipped by wire type, exactly
like Thrift's own skip()). Containers (list/set/map/struct) decode
recursively; nested structs decode to dicts of field-id keys unless a
nested spec is supplied.
"""

from __future__ import annotations

import struct

# wire type ids (TBinaryProtocol)
_STOP, _BOOL, _BYTE, _DOUBLE, _I16, _I32, _I64, _STRING, _STRUCT, _MAP, _SET, _LIST = (
    0, 2, 3, 4, 6, 8, 10, 11, 12, 13, 14, 15,
)


class _Reader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) < n:
            raise ValueError("thrift: truncated input")
        self.pos += n
        return b


def _read_value(r: _Reader, t: int, spec=None):
    if t == _BOOL:
        return r.take(1) != b"\x00"
    if t == _BYTE:
        return struct.unpack(">b", r.take(1))[0]
    if t == _DOUBLE:
        return struct.unpack(">d", r.take(8))[0]
    if t == _I16:
        return struct.unpack(">h", r.take(2))[0]
    if t == _I32:
        return struct.unpack(">i", r.take(4))[0]
    if t == _I64:
        return struct.unpack(">q", r.take(8))[0]
    if t == _STRING:  # also binary — caller decides; utf-8 with fallback
        raw = r.take(struct.unpack(">i", r.take(4))[0])
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError:
            return raw
    if t == _STRUCT:
        return _read_struct(r, spec)
    if t in (_LIST, _SET):
        et = r.take(1)[0]
        n = struct.unpack(">i", r.take(4))[0]
        return [_read_value(r, et) for _ in range(n)]
    if t == _MAP:
        kt, vt = r.take(1)[0], r.take(1)[0]
        n = struct.unpack(">i", r.take(4))[0]
        out = {}
        for _ in range(n):
            k = _read_value(r, kt)  # key before value (RHS-first hazard)
            out[k] = _read_value(r, vt)
        return out
    raise NotImplementedError(f"thrift wire type {t}")


def _read_struct(r: _Reader, spec: dict | None) -> dict:
    out: dict = {}
    while True:
        t = r.take(1)[0]
        if t == _STOP:
            return out
        fid = struct.unpack(">h", r.take(2))[0]
        val = _read_value(r, t)
        if spec is None:
            out[fid] = val
        elif fid in spec:
            out[spec[fid]] = val
        # unknown field: decoded (to advance the stream) and dropped,
        # mirroring TProtocolUtil.skip


def decode_struct(buf: bytes, spec: dict[int, str] | None = None) -> dict:
    """One TBinaryProtocol struct → dict keyed by spec names (or field
    ids when no spec is given)."""
    return _read_struct(_Reader(bytes(buf)), spec)


# ---------------------------------------------------------------------------
# encoder (tests/fixtures)
# ---------------------------------------------------------------------------


def encode_struct(fields: list[tuple[int, object]]) -> bytes:
    """[(field_id, value)] → TBinaryProtocol struct bytes. Types are
    inferred from Python values (bool/int→i64/float/str/bytes/list/dict/
    nested field-list)."""

    def enc(v) -> tuple[int, bytes]:
        if isinstance(v, bool):
            return _BOOL, b"\x01" if v else b"\x00"
        if isinstance(v, float):
            return _DOUBLE, struct.pack(">d", v)
        if isinstance(v, int):
            return _I64, struct.pack(">q", v)
        if isinstance(v, str):
            raw = v.encode("utf-8")
            return _STRING, struct.pack(">i", len(raw)) + raw
        if isinstance(v, bytes):
            return _STRING, struct.pack(">i", len(v)) + v
        if isinstance(v, list) and v and isinstance(v[0], tuple):
            body = b""
            for fid, x in v:
                t, payload = enc(x)
                body += struct.pack(">bh", t, fid) + payload
            return _STRUCT, body + b"\x00"
        if isinstance(v, list):
            et, _ = enc(v[0]) if v else (_I64, b"")
            body = b"".join(enc(x)[1] for x in v)
            return _LIST, struct.pack(">bi", et, len(v)) + body
        if isinstance(v, dict):
            items = list(v.items())
            kt, _ = enc(items[0][0]) if items else (_STRING, b"")
            vt, _ = enc(items[0][1]) if items else (_I64, b"")
            body = b"".join(enc(k)[1] + enc(x)[1] for k, x in items)
            return _MAP, struct.pack(">bbi", kt, vt, len(items)) + body
        raise NotImplementedError(type(v).__name__)

    out = b""
    for fid, v in fields:
        t, payload = enc(v)
        out += struct.pack(">bh", t, fid) + payload
    return out + b"\x00"
