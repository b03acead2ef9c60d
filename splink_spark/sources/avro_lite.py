"""Minimal Avro object-container-file codec (read + write), pure
Python, implementing the public Apache Avro 1.11 spec — no avro /
fastavro dependency (neither ships in this sandbox).

Scope: what Iceberg manifest files need — records, primitives
(null/boolean/int/long/float/double/bytes/string/fixed), arrays,
maps, unions; ``null`` and ``deflate`` codecs. Schema resolution is
writer-schema-only (we always decode with the schema embedded in the
file header, which is all Iceberg's own readers do for manifests).

reference: n/a (splink has no storage layer; Iceberg support is a
north-rule addition and this codec exists only to serve it).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------

def _read_long(buf: io.BytesIO) -> int:
    """zigzag varint."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_zigzag(out: bytearray, v: int) -> None:
    u = (v << 1) if v >= 0 else (((-v) << 1) - 1)
    while True:
        if u & ~0x7F:
            out.append((u & 0x7F) | 0x80)
            u >>= 7
        else:
            out.append(u)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


def _write_bytes(out: bytearray, b: bytes) -> None:
    _write_zigzag(out, len(b))
    out.extend(b)


# ---------------------------------------------------------------------------
# schema-driven decode
# ---------------------------------------------------------------------------

def _decode(schema, buf: io.BytesIO):
    if isinstance(schema, list):  # union: branch index then value
        idx = _read_long(buf)
        return _decode(schema[idx], buf)
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
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
    if t in ("bytes",):
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "record":
        return {
            f["name"]: _decode(f["type"], buf)
            for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block size follows; skippable, we just decode
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], buf))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf)
        return out
    raise ValueError(f"unsupported avro type {t!r}")


# ---------------------------------------------------------------------------
# schema-driven encode
# ---------------------------------------------------------------------------

def _union_branch(schema: list, v):
    """Pick the union branch for a python value (null-vs-other is all
    Iceberg manifests use)."""
    for i, s in enumerate(schema):
        t = s if isinstance(s, str) else s.get("type")
        if v is None and t == "null":
            return i, s
        if v is not None and t != "null":
            return i, s
    raise ValueError(f"no union branch for {v!r} in {schema}")


def _encode(schema, v, out: bytearray) -> None:
    if isinstance(schema, list):
        idx, branch = _union_branch(schema, v)
        _write_zigzag(out, idx)
        _encode(branch, v, out)
        return
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        _write_zigzag(out, int(v))
    elif t == "float":
        out.extend(struct.pack("<f", float(v)))
    elif t == "double":
        out.extend(struct.pack("<d", float(v)))
    elif t == "bytes":
        _write_bytes(out, bytes(v))
    elif t == "string":
        _write_bytes(out, v.encode("utf-8"))
    elif t == "fixed":
        assert len(v) == schema["size"]
        out.extend(v)
    elif t == "record":
        for f in schema["fields"]:
            name = f["name"]
            if name not in v and "default" in f:
                fv = f["default"]
            else:
                fv = v[name]
            _encode(f["type"], fv, out)
    elif t == "array":
        if v:
            _write_zigzag(out, len(v))
            for item in v:
                _encode(schema["items"], item, out)
        _write_zigzag(out, 0)
    elif t == "map":
        if v:
            _write_zigzag(out, len(v))
            for k, mv in v.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], mv, out)
        _write_zigzag(out, 0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------

def read_avro(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro object container file -> (writer schema, records)."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an avro container file")
    meta = _decode({"type": "map", "values": "bytes"}, buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records: list[dict] = []
    while buf.tell() < len(data):
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        bbuf = io.BytesIO(block)
        for _ in range(n):
            records.append(_decode(schema, bbuf))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, records


def write_avro(
    path: str, schema: dict, records: list[dict], codec: str = "null"
) -> None:
    """Write records as one Avro container block (plenty for manifest
    files, which hold at most thousands of entries)."""
    body = bytearray()
    for r in records:
        _encode(schema, r, body)
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        body = bytearray(comp.compress(bytes(body)) + comp.flush())
    elif codec != "null":
        raise ValueError(f"unsupported avro codec {codec!r}")

    out = bytearray()
    out.extend(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _encode({"type": "map", "values": "bytes"}, meta, out)
    # deterministic sync marker: content-addressed, no RNG
    import hashlib

    sync = hashlib.md5(bytes(body) + str(len(records)).encode()).digest()
    out.extend(sync)
    if records:
        _write_zigzag(out, len(records))
        _write_zigzag(out, len(body))
        out.extend(body)
        out.extend(sync)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(out))
