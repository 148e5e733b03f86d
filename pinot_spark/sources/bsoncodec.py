"""Minimal pure-stdlib BSON decoder (reference: pinot-plugins/
pinot-input-format BSON record reader; format: bsonspec.org).

Covers the types a data pipeline actually lands in documents: double,
string, embedded document, array, binary, bool, UTC datetime, null,
int32, int64, decimal-as-double is NOT guessed — unknown element types
raise NotImplementedError with the type byte, never skip silently.

A ``.bson`` file is simply concatenated documents (mongodump layout), so
:func:`iter_documents` walks a whole file buffer.
"""

from __future__ import annotations

import datetime
import struct
from collections.abc import Iterator


def _read_cstring(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(0, pos)
    return buf[pos:end].decode("utf-8"), end + 1


def _read_element(t: int, buf: bytes, pos: int):
    if t == 0x01:  # double
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == 0x02:  # string
        ln = struct.unpack_from("<i", buf, pos)[0]
        return buf[pos + 4 : pos + 3 + ln].decode("utf-8"), pos + 4 + ln
    if t == 0x03:  # embedded document
        doc, end = _read_document(buf, pos)
        return doc, end
    if t == 0x04:  # array — document with "0","1",... keys
        doc, end = _read_document(buf, pos)
        return [doc[k] for k in sorted(doc, key=int)], end
    if t == 0x05:  # binary: int32 len + subtype byte + bytes
        ln = struct.unpack_from("<i", buf, pos)[0]
        return bytes(buf[pos + 5 : pos + 5 + ln]), pos + 5 + ln
    if t == 0x08:  # bool
        return buf[pos] != 0, pos + 1
    if t == 0x09:  # UTC datetime, int64 epoch millis
        ms = struct.unpack_from("<q", buf, pos)[0]
        return (
            datetime.datetime.fromtimestamp(ms / 1000.0, tz=datetime.timezone.utc),
            pos + 8,
        )
    if t == 0x0A:  # null
        return None, pos
    if t == 0x10:  # int32
        return struct.unpack_from("<i", buf, pos)[0], pos + 4
    if t == 0x12:  # int64
        return struct.unpack_from("<q", buf, pos)[0], pos + 8
    raise NotImplementedError(f"BSON element type 0x{t:02x} not implemented")


def _read_document(buf: bytes, pos: int) -> tuple[dict, int]:
    total = struct.unpack_from("<i", buf, pos)[0]
    end = pos + total
    pos += 4
    out: dict = {}
    while pos < end - 1:
        t = buf[pos]
        name, pos = _read_cstring(buf, pos + 1)
        out[name], pos = _read_element(t, buf, pos)
    if buf[end - 1] != 0:
        raise ValueError("BSON document missing terminator")
    return out, end


def decode_document(buf: bytes) -> dict:
    """One BSON document → dict."""
    doc, _ = _read_document(bytes(buf), 0)
    return doc


def iter_documents(buf: bytes) -> Iterator[dict]:
    """Concatenated BSON documents (mongodump .bson file) → dicts."""
    buf = bytes(buf)
    pos = 0
    while pos + 4 <= len(buf):
        doc, pos = _read_document(buf, pos)
        yield doc


def encode_document(doc: dict) -> bytes:
    """Encoder for tests/fixtures (same type subset)."""

    def enc_val(v) -> tuple[int, bytes]:
        if isinstance(v, bool):  # before int check
            return 0x08, b"\x01" if v else b"\x00"
        if isinstance(v, float):
            return 0x01, struct.pack("<d", v)
        if isinstance(v, int):
            if -(2**31) <= v < 2**31:
                return 0x10, struct.pack("<i", v)
            return 0x12, struct.pack("<q", v)
        if isinstance(v, str):
            raw = v.encode("utf-8") + b"\x00"
            return 0x02, struct.pack("<i", len(raw)) + raw
        if isinstance(v, bytes):
            return 0x05, struct.pack("<i", len(v)) + b"\x00" + v
        if isinstance(v, datetime.datetime):
            ms = int(v.timestamp() * 1000)
            return 0x09, struct.pack("<q", ms)
        if v is None:
            return 0x0A, b""
        if isinstance(v, list):
            return 0x04, encode_document({str(i): x for i, x in enumerate(v)})
        if isinstance(v, dict):
            return 0x03, encode_document(v)
        raise NotImplementedError(f"cannot encode {type(v).__name__}")

    body = b""
    for k, v in doc.items():
        t, payload = enc_val(v)
        body += bytes([t]) + k.encode("utf-8") + b"\x00" + payload
    total = len(body) + 5
    return struct.pack("<i", total) + body + b"\x00"
