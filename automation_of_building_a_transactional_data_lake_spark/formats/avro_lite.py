"""Minimal, dependency-free Apache Avro object-container codec.

Exists for ONE reason: Apache Iceberg's metadata (manifest lists and
manifests) is Avro-encoded, and this environment ships no Avro library
(pyarrow has no Avro reader) — so reading a REAL Iceberg table
(``formats/interop.read_iceberg``) needs exactly this: a generic,
schema-driven decoder for the Avro 1.x object container format
(https://avro.apache.org/docs/current/specification/). An encoder
ships too — it is what the tests use to build genuine Avro fixtures,
and what a future Iceberg writer would emit manifests with.

Scope (all of what Iceberg metadata uses, nothing exotic):

- primitives: null, boolean, int, long (zigzag varints), float, double
  (IEEE little-endian), bytes, string (length-prefixed UTF-8)
- complex: record, enum, array, map, union, fixed
- logical types pass through as their underlying primitive (Iceberg's
  readers apply them by field id; callers here get raw values)
- codecs: ``null`` and ``deflate`` (raw RFC-1951, no zlib header)

Driver-side metadata work only — manifests are KBs to MBs; the data
files they point at are read by Spark, never through this module.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# -- primitive codecs -------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (Avro int and long share the encoding)."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated Avro varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated Avro bytes")
    return data


def _write_bytes(out: io.BytesIO, data: bytes) -> None:
    _write_long(out, len(data))
    out.write(data)


# -- schema-driven value codec ----------------------------------------------


def _decode(schema, buf: io.BytesIO, named: dict):
    if isinstance(schema, list):  # union: branch index then value
        idx = _read_long(buf)
        return _decode(schema[idx], buf, named)
    if isinstance(schema, str):
        if schema in named:
            return _decode(named[schema], buf, named)
        t = schema
    else:
        t = schema["type"]
        if t in ("record", "enum", "fixed") and schema.get("name"):
            named.setdefault(schema["name"], schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "record":
        named.setdefault(schema["name"], schema)
        return {f["name"]: _decode(f["type"], buf, named) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block-size form: byte length precedes items
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode(schema["items"], buf, named))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, named)
    raise NotImplementedError(f"Avro type {t!r} is not supported")


def _encode(schema, value, out: io.BytesIO, named: dict) -> None:
    if isinstance(schema, list):  # union: pick the branch by value shape
        for idx, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                _write_long(out, idx)
                return
            if value is not None and bt != "null":
                _write_long(out, idx)
                _encode(branch, value, out, named)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    if isinstance(schema, str):
        if schema in named:
            _encode(named[schema], value, out, named)
            return
        t = schema
    else:
        t = schema["type"]
        if t in ("record", "enum", "fixed") and schema.get("name"):
            named.setdefault(schema["name"], schema)
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(out, bytes(value))
    elif t == "string":
        _write_bytes(out, str(value).encode("utf-8"))
    elif t == "record":
        for f in schema["fields"]:
            _encode(f["type"], value.get(f["name"]), out, named)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif t == "fixed":
        out.write(bytes(value))
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(schema["items"], item, out, named)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, str(k).encode("utf-8"))
                _encode(schema["values"], v, out, named)
        _write_long(out, 0)
    else:
        raise NotImplementedError(f"Avro type {t!r} is not supported")


# -- object container format ------------------------------------------------


def decode_datum(schema: dict | list | str, data: bytes):
    """Decode ONE raw (container-less) Avro binary datum — the shape
    Hudi log blocks carry their records in."""
    buf = io.BytesIO(data)
    value = _decode(schema, buf, {})
    if buf.read(1):
        raise ValueError("trailing bytes after Avro datum")
    return value


def encode_datum(schema: dict | list | str, value) -> bytes:
    """Encode ONE raw (container-less) Avro binary datum."""
    out = io.BytesIO()
    _encode(schema, value, out, {})
    return out.getvalue()


def read_avro_file(path: str) -> tuple[dict, list]:
    """Decode an Avro object-container file: (writer schema, records)."""
    with open(path, "rb") as f:
        raw = f.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container (bad magic)")
    meta = _decode({"type": "map", "values": "bytes"}, buf, {})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r} is not supported")
    sync = buf.read(16)
    records: list = []
    while buf.tell() < len(raw):
        n = _read_long(buf)
        block = _read_bytes(buf)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        named: dict = {}
        for _ in range(n):
            records.append(_decode(schema, bbuf, named))
        marker = buf.read(16)
        if marker != sync:
            raise ValueError(f"{path}: Avro sync marker mismatch")
    return schema, records


def write_avro_file(
    path: str,
    schema: dict,
    records: list,
    codec: str = "null",
    extra_meta: dict[str, bytes] | None = None,
) -> None:
    """Encode records into an Avro object container (one block).
    ``extra_meta`` adds file-metadata pairs beyond avro.schema/avro.codec
    — Iceberg manifests carry their table schema / partition spec /
    format-version there and real readers consult them."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r} is not supported")
    body = io.BytesIO()
    named: dict = {}
    for rec in records:
        _encode(schema, rec, body, named)
    block = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = co.compress(block) + co.flush()
    sync = os.urandom(16)
    out = io.BytesIO()
    out.write(_MAGIC)
    _encode(
        {"type": "map", "values": "bytes"},
        {"avro.schema": json.dumps(schema).encode("utf-8"),
         "avro.codec": codec.encode("utf-8"),
         **(extra_meta or {})},
        out,
        {},
    )
    out.write(sync)
    _write_long(out, len(records))
    _write_bytes(out, block)
    out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())
