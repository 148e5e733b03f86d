"""Pure-stdlib Avro decoder: binary encoding + Object Container Files
(reference: pinot-plugins/pinot-input-format/pinot-avro record reader;
format: Apache Avro 1.11 specification).

Implemented: all primitive types, records, enums, arrays, maps, unions,
fixed; OCF header/blocks with ALL SIX spec codecs (round 12): ``null``,
``deflate`` (raw zlib), ``snappy`` (pyarrow's bundled codec + the
spec's CRC32-of-uncompressed suffix — the reference's own SSB example
avro ships snappy blocks), ``bzip2``/``xz`` (stdlib bz2/lzma), and
``zstandard`` (pyarrow + an RFC 8878 frame-header parse for the
decompressed size; streaming frames without Frame_Content_Size raise).
Non-trivial unions in the schema mapper raise NotImplementedError
naming the construct.

This makes the avro input format REAL in this container instead of
jar-gated: ``readers.read_table(..., "avro")`` first tries the JVM
spark-avro source (faster at scale), then falls back to this decoder via
binaryFile + mapInPandas.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) < n:
            raise ValueError("avro: truncated input")
        self.pos += n
        return b

    def long(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def bytes_(self) -> bytes:
        return self.read(self.long())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


def _decode_value(r: _Reader, schema):
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) != b"\x00"
        if t in ("int", "long"):
            return r.long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.bytes_()
        if t == "string":
            return r.string()
        raise NotImplementedError(f"avro type {t!r}")
    if isinstance(schema, list):  # union: long index then value
        idx = r.long()
        return _decode_value(r, schema[idx])
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode_value(r, f["type"]) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.long()]
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:  # block with byte size
                r.long()
                n = -n
            out.extend(_decode_value(r, schema["items"]) for _ in range(n))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                r.long()
                n = -n
            for _ in range(n):
                k = r.string()  # key before value: RHS-first evaluation
                out[k] = _decode_value(r, schema["values"])
        return out
    # named-type reference or wrapped primitive {"type": "string"}
    if isinstance(t, (str, list, dict)):
        return _decode_value(r, t)
    raise NotImplementedError(f"avro schema {schema!r}")


# ---------------------------------------------------------------------------
# Object Container File
# ---------------------------------------------------------------------------


def read_header(buf: bytes) -> tuple[dict, bytes, int]:
    """→ (schema JSON dict, sync marker, position after header)."""
    r = _Reader(buf)
    if r.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file")
    meta = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            r.long()
            n = -n
        for _ in range(n):
            # NB: key must be read before the value — assignment would
            # evaluate the RHS first and swap the stream order
            k = r.string()
            meta[k] = r.bytes_()
    sync = r.read(16)
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate", "snappy", "bzip2", "xz", "zstandard"):
        raise NotImplementedError(f"avro codec {codec!r} is not supported")
    schema = json.loads(meta["avro.schema"])
    schema["__codec__"] = codec
    return schema, sync, r.pos


def _zstd_content_size(buf: bytes) -> int:
    """Parse the decompressed size out of a zstd frame header (RFC 8878
    §3.1.1) — pyarrow's codec needs it for buffer allocation.  Frames
    written without Frame_Content_Size (streaming writers) raise
    loudly; every one-shot compressor (including pyarrow's own and the
    zstd-jni the avro-java zstandard codec uses) records it."""
    if buf[:4] != b"\x28\xb5\x2f\xfd":
        raise ValueError("avro: not a zstd frame")
    fhd = buf[4]
    single = (fhd >> 5) & 1
    fcs_code = fhd >> 6
    pos = 5 + (0 if single else 1)  # window descriptor when not single
    pos += (0, 1, 2, 4)[fhd & 3]  # dictionary id field
    if fcs_code == 0:
        if not single:
            raise NotImplementedError(
                "avro: zstd frame without Frame_Content_Size "
                "(streaming writer) is not supported"
            )
        return buf[pos]
    width = (0, 2, 4, 8)[fcs_code]
    val = int.from_bytes(buf[pos : pos + width], "little")
    return val + 256 if fcs_code == 1 else val


def _decode_block(block: bytes, codec: str) -> bytes:
    """OCF block → raw avro bytes for every supported codec (avro spec
    §Required/Optional Codecs: snappy carries a big-endian CRC32 of the
    UNCOMPRESSED data; the others are bare compressed streams)."""
    if codec == "null":
        return block
    if codec == "deflate":
        return zlib.decompress(block, -15)
    if codec == "snappy":
        return _snappy_block(block)
    if codec == "bzip2":
        import bz2

        return bz2.decompress(block)
    if codec == "xz":
        import lzma

        return lzma.decompress(block)
    if codec == "zstandard":
        import pyarrow as pa

        return pa.decompress(
            block,
            decompressed_size=_zstd_content_size(block),
            codec="zstd",
            asbytes=True,
        )
    raise NotImplementedError(f"avro codec {codec!r} is not supported")


def _snappy_block(block: bytes) -> bytes:
    """Avro ``snappy`` block: raw snappy stream + 4-byte big-endian
    CRC32 of the UNCOMPRESSED data (avro spec §Required Codecs).  The
    raw stream's varint preamble carries the uncompressed length, which
    pyarrow's codec needs for buffer allocation — no external snappy
    lib required."""
    import pyarrow as pa

    comp, crc = block[:-4], int.from_bytes(block[-4:], "big")
    size, shift, i = 0, 0, 0
    while True:
        b = comp[i]
        size |= (b & 0x7F) << shift
        i += 1
        shift += 7
        if not b & 0x80:
            break
    out = pa.decompress(comp, decompressed_size=size, codec="snappy",
                        asbytes=True)
    if zlib.crc32(out) != crc:
        raise ValueError("avro: snappy block CRC mismatch")
    return out


def iter_records(buf: bytes):
    """Every record in an OCF buffer, as dicts (for record schemas)."""
    schema, sync, pos = read_header(buf)
    codec = schema.pop("__codec__")
    r = _Reader(buf)
    r.pos = pos
    while r.pos < len(buf):
        count = r.long()
        size = r.long()
        block = r.read(size)
        block = _decode_block(block, codec)
        br = _Reader(block)
        for _ in range(count):
            yield _decode_value(br, schema)
        if r.read(16) != sync:
            raise ValueError("avro: sync marker mismatch")


def schema_to_spark_ddl(schema: dict) -> str:
    """Avro record schema → Spark DDL string (nullable via [null, X])."""

    def one(s) -> str:
        if isinstance(s, str):
            return {
                "boolean": "boolean", "int": "int", "long": "bigint",
                "float": "float", "double": "double", "bytes": "binary",
                "string": "string", "null": "string",
            }[s]
        if isinstance(s, list):
            non_null = [x for x in s if x != "null"]
            if len(non_null) != 1:
                raise NotImplementedError(f"avro union {s!r} has no single Spark type")
            return one(non_null[0])
        t = s["type"]
        if t == "record":
            inner = ", ".join(f"{f['name']}: {one(f['type'])}" for f in s["fields"])
            return f"struct<{inner}>"
        if t == "enum":
            return "string"
        if t == "fixed":
            return "binary"
        if t == "array":
            return f"array<{one(s['items'])}>"
        if t == "map":
            return f"map<string, {one(s['values'])}>"
        return one(t)

    if schema.get("type") != "record":
        raise NotImplementedError("top-level avro schema must be a record")
    return ", ".join(f"{f['name']} {one(f['type'])}" for f in schema["fields"])


# ---------------------------------------------------------------------------
# encoder (tests/fixtures)
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_value(w: io.BytesIO, schema, v):
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            w.write(b"\x01" if v else b"\x00")
        elif t in ("int", "long"):
            w.write(_zigzag(v))
        elif t == "float":
            w.write(struct.pack("<f", v))
        elif t == "double":
            w.write(struct.pack("<d", v))
        elif t == "bytes":
            w.write(_zigzag(len(v)) + v)
        elif t == "string":
            raw = v.encode("utf-8")
            w.write(_zigzag(len(raw)) + raw)
        else:
            raise NotImplementedError(t)
        return
    if isinstance(schema, list):
        if v is None and "null" in schema:
            idx = schema.index("null")
        else:
            idx = next(i for i, s in enumerate(schema) if s != "null")
        w.write(_zigzag(idx))
        _encode_value(w, schema[idx], v)
        return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode_value(w, f["type"], v[f["name"]])
    elif t == "array":
        if v:
            w.write(_zigzag(len(v)))
            for x in v:
                _encode_value(w, schema["items"], x)
        w.write(_zigzag(0))
    elif t == "map":
        if v:
            w.write(_zigzag(len(v)))
            for k, x in v.items():
                raw = k.encode("utf-8")
                w.write(_zigzag(len(raw)) + raw)
                _encode_value(w, schema["values"], x)
        w.write(_zigzag(0))
    elif t == "enum":
        w.write(_zigzag(schema["symbols"].index(v)))
    else:
        raise NotImplementedError(t)


def write_ocf(schema: dict, records: list, codec: str = "deflate") -> bytes:
    """Records → Avro OCF bytes (one block)."""
    sync = b"\x00" * 8 + b"pinotsprk"[:8]
    body = io.BytesIO()
    for rec in records:
        _encode_value(body, schema, rec)
    block = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        block = co.compress(block) + co.flush()
    elif codec == "snappy":
        import pyarrow as pa

        crc = zlib.crc32(block)
        block = (
            pa.compress(block, codec="snappy", asbytes=True)
            + crc.to_bytes(4, "big")
        )
    elif codec == "bzip2":
        import bz2

        block = bz2.compress(block)
    elif codec == "xz":
        import lzma

        block = lzma.compress(block)
    elif codec == "zstandard":
        import pyarrow as pa

        block = pa.compress(block, codec="zstd", asbytes=True)
    elif codec != "null":
        raise NotImplementedError(f"avro codec {codec!r} is not supported")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    out = io.BytesIO()
    out.write(_MAGIC)
    out.write(_zigzag(len(meta)))
    for k, v in meta.items():
        raw = k.encode()
        out.write(_zigzag(len(raw)) + raw)
        out.write(_zigzag(len(v)) + v)
    out.write(_zigzag(0))
    out.write(sync)
    out.write(_zigzag(len(records)))
    out.write(_zigzag(len(block)))
    out.write(block)
    out.write(sync)
    return out.getvalue()
