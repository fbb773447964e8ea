"""Minimal Avro Object Container File reader/writer (no dependencies).

Implements exactly the subset of the public Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/) that Apache Iceberg's
metadata files use — binary encoding of records, unions, arrays, maps,
primitives and fixed, inside the Object Container File framing — so
``sources/iceberg_lite.py`` can read and write manifest lists and manifest
files without the Iceberg runtime jars or the ``avro`` pip package (absent
in this container; see ``sources/lakehouse.py``).

Scope decisions, each spec-cited:

- **Binary encoding only** (spec §"Binary Encoding"): zig-zag varint
  int/long, little-endian float/double, length-prefixed bytes/string,
  union = long branch index + value, arrays/maps as counted blocks with a
  zero terminator. Block writers emit a single positive-count block (the
  spec allows any block split; readers must and do handle the
  negative-count + byte-size form too, which the Java writer emits for
  large arrays).
- **Codecs**: ``null`` and ``deflate`` (spec §"Required Codecs"); deflate
  is raw zlib (RFC 1951, no zlib header) per spec. Snappy is optional per
  spec and absent here — a loud error, not a silent misread.
- **Schema resolution**: files are read with their own embedded writer
  schema (reader==writer), which is all a self-describing metadata file
  needs; the cross-schema promotion rules are out of scope.
- **Named types**: records/fixed/enums register by full name on first
  definition and may be referenced by name later (Iceberg's manifest
  schema reuses the partition record ``r102`` this way).

Determinism: ``write_ocf`` derives the 16-byte sync marker from the schema
and record count instead of ``os.urandom`` so rewriting identical content
yields byte-identical files (the repo's fingerprint-stability gates diff
file bytes).
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# primitive codecs
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def read_long(buf) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated avro varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc)
        shift += 7
        if shift > 70:
            raise ValueError("avro varint longer than 10 bytes")


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    write_long(buf, len(data))
    buf.write(data)


def _read_n(buf, n: int) -> bytes:
    data = buf.read(n)
    if len(data) != n:
        raise EOFError(f"truncated avro payload: wanted {n} bytes, got {len(data)}")
    return data


def _read_bytes(buf) -> bytes:
    return _read_n(buf, read_long(buf))


# ---------------------------------------------------------------------------
# schema-driven encode/decode
# ---------------------------------------------------------------------------

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


class _Names:
    """Registry of named types (record/fixed/enum) for by-name references."""

    def __init__(self) -> None:
        self.defs: dict[str, dict] = {}

    def define(self, schema: dict) -> None:
        name = schema.get("name")
        if name:
            ns = schema.get("namespace")
            full = f"{ns}.{name}" if ns and "." not in name else name
            self.defs[full] = schema
            self.defs[name] = schema  # short-name lookup is enough here

    def resolve(self, ref: str) -> dict:
        if ref in self.defs:
            return self.defs[ref]
        raise KeyError(f"avro named-type reference {ref!r} not defined before use")


def _encode(buf: io.BytesIO, schema, value, names: _Names) -> None:
    if isinstance(schema, str):
        t = schema
        if t not in _PRIMITIVES:
            _encode(buf, names.resolve(t), value, names)
            return
        if t == "null":
            if value is not None:
                raise TypeError(f"null schema got {value!r}")
            return
        if t == "boolean":
            buf.write(b"\x01" if value else b"\x00")
        elif t in ("int", "long"):
            write_long(buf, int(value))
        elif t == "float":
            buf.write(struct.pack("<f", float(value)))
        elif t == "double":
            buf.write(struct.pack("<d", float(value)))
        elif t == "bytes":
            _write_bytes(buf, bytes(value))
        elif t == "string":
            _write_bytes(buf, value.encode("utf-8"))
        return
    if isinstance(schema, list):  # union: branch index, then value
        idx = _union_branch(schema, value, names)
        write_long(buf, idx)
        _encode(buf, schema[idx], value, names)
        return
    t = schema["type"]
    if t in _PRIMITIVES or isinstance(t, (list, dict)):
        # e.g. {"type": "long", "logicalType": ...} or nested wrapper
        _encode(buf, t, value, names)
        return
    if t == "record":
        names.define(schema)
        for field in schema["fields"]:
            try:
                fv = value.get(field["name"], field.get("default"))
            except AttributeError:
                raise TypeError(f"record schema needs a dict, got {type(value)}")
            _encode(buf, field["type"], fv, names)
        return
    if t == "array":
        items = list(value or [])
        if items:
            write_long(buf, len(items))
            for item in items:
                _encode(buf, schema["items"], item, names)
        write_long(buf, 0)
        return
    if t == "map":
        entries = dict(value or {})
        if entries:
            write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, str(k).encode("utf-8"))
                _encode(buf, schema["values"], v, names)
        write_long(buf, 0)
        return
    if t == "fixed":
        names.define(schema)
        data = bytes(value)
        if len(data) != schema["size"]:
            raise ValueError(
                f"fixed {schema.get('name')}: got {len(data)} bytes, "
                f"declared {schema['size']}"
            )
        buf.write(data)
        return
    if t == "enum":
        names.define(schema)
        write_long(buf, schema["symbols"].index(value))
        return
    raise NotImplementedError(f"avro type {t!r} not in the supported subset")


def _union_branch(union: list, value, names: _Names) -> int:
    """Pick the union branch for a Python value. The Iceberg metadata
    schemas only use [null, X] / [X, null] two-branch unions, so None →
    the null branch and anything else → the other; general multi-branch
    type dispatch is deliberately out of scope (loud error)."""
    null_at = [i for i, s in enumerate(union) if s == "null"]
    if value is None:
        if not null_at:
            raise TypeError("None for a union without a null branch")
        return null_at[0]
    others = [i for i in range(len(union)) if i not in null_at]
    if len(others) != 1:
        raise NotImplementedError(
            f"multi-branch avro union {union!r} needs type dispatch; only "
            f"[null, X] unions are in the supported subset"
        )
    return others[0]


def _decode(buf, schema, names: _Names):
    if isinstance(schema, str):
        t = schema
        if t not in _PRIMITIVES:
            return _decode(buf, names.resolve(t), names)
        if t == "null":
            return None
        if t == "boolean":
            return _read_n(buf, 1) != b"\x00"
        if t in ("int", "long"):
            return read_long(buf)
        if t == "float":
            return struct.unpack("<f", _read_n(buf, 4))[0]
        if t == "double":
            return struct.unpack("<d", _read_n(buf, 8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
    if isinstance(schema, list):
        idx = read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError(f"union branch {idx} out of range for {schema!r}")
        return _decode(buf, schema[idx], names)
    t = schema["type"]
    if t in _PRIMITIVES or isinstance(t, (list, dict)):
        return _decode(buf, t, names)
    if t == "record":
        names.define(schema)
        return {
            field["name"]: _decode(buf, field["type"], names)
            for field in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            count = read_long(buf)
            if count == 0:
                return out
            if count < 0:  # spec: negative count ⇒ byte size follows
                count = -count
                read_long(buf)
            for _ in range(count):
                out.append(_decode(buf, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            count = read_long(buf)
            if count == 0:
                return out
            if count < 0:
                count = -count
                read_long(buf)
            for _ in range(count):
                key = _read_bytes(buf).decode("utf-8")
                out[key] = _decode(buf, schema["values"], names)
    if t == "fixed":
        names.define(schema)
        return _read_n(buf, schema["size"])
    if t == "enum":
        names.define(schema)
        return schema["symbols"][read_long(buf)]
    raise NotImplementedError(f"avro type {t!r} not in the supported subset")


# ---------------------------------------------------------------------------
# Object Container File framing
# ---------------------------------------------------------------------------


def write_ocf(
    path: str,
    schema,
    records: list[dict],
    codec: str = "null",
    extra_meta: dict[str, bytes] | None = None,
) -> None:
    """Write one OCF with a single data block (metadata files are small —
    an Iceberg manifest tracking 10k data files is ~single-digit MB, and
    one block keeps the writer trivially correct; readers accept any
    blocking)."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}: supported are null/deflate")
    schema_json = json.dumps(schema, separators=(",", ":"))
    names = _Names()
    body = io.BytesIO()
    for rec in records:
        _encode(body, schema, rec, names)
    payload = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)  # raw deflate per spec
        payload = comp.compress(payload) + comp.flush()
    sync = hashlib.md5(
        schema_json.encode() + str(len(records)).encode() + b"iceberg_lite"
    ).digest()
    meta: dict[str, bytes] = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    if extra_meta:
        meta.update(extra_meta)
    head = io.BytesIO()
    head.write(MAGIC)
    write_long(head, len(meta))
    for k, v in meta.items():
        _write_bytes(head, k.encode("utf-8"))
        _write_bytes(head, v)
    write_long(head, 0)
    head.write(sync)
    if records:
        write_long(head, len(records))
        write_long(head, len(payload))
        head.write(payload)
        head.write(sync)
    with open(path, "wb") as f:
        f.write(head.getvalue())


def read_ocf(path: str) -> tuple[dict, list[dict]]:
    """Read an OCF, returning (writer schema, records)."""
    with open(path, "rb") as f:
        return read_ocf_bytes(f.read(), where=path)


def _read_header(buf, where: str) -> dict[str, bytes]:
    """Magic check + file-metadata map (shared by the full reader and the
    header-only schema probe so header parsing cannot drift)."""
    if _read_n(buf, 4) != MAGIC:
        raise ValueError(f"{where}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        count = read_long(buf)
        if count == 0:
            return meta
        if count < 0:
            count = -count
            read_long(buf)
        for _ in range(count):
            key = _read_bytes(buf).decode("utf-8")
            meta[key] = _read_bytes(buf)


def read_ocf_bytes(data: bytes, where: str = "<bytes>") -> tuple[dict, list[dict]]:
    """Read an OCF from memory (the ``binaryFile``-sourced executor path in
    ``sources/avro_source.py`` hands whole files as bytes)."""
    buf = io.BytesIO(data)
    path = where
    meta = _read_header(buf, path)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}: supported are null/deflate")
    sync = _read_n(buf, 16)
    records: list[dict] = []
    names = _Names()
    while buf.tell() < len(data):
        count = read_long(buf)
        size = read_long(buf)
        block = _read_n(buf, size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(_decode(bbuf, schema, names))
        if _read_n(buf, 16) != sync:
            raise ValueError(f"{path}: block sync marker mismatch (corrupt file)")
    return schema, records

def schema_of_ocf(path: str) -> dict:
    """Writer schema from the file HEADER only — O(header) bytes, used by
    ``read_avro`` to derive the Spark schema without decoding any block.
    Streams the file handle (no size guess): the header map reader stops
    at its terminator, so only header bytes are consumed."""
    with open(path, "rb") as f:
        meta = _read_header(f, path)
    if "avro.schema" not in meta:
        raise ValueError(f"{path}: header carries no avro.schema")
    return json.loads(meta["avro.schema"].decode("utf-8"))
