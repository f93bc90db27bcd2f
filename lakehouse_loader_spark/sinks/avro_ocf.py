"""Minimal Avro Object Container File writer/reader (Avro 1.x spec).

The Iceberg spec requires manifest and manifest-list files to be Avro OCF
(reference writes them via the iceberg-rust crate: iceberg_destination.rs:271,
315).  This environment has no Python Avro library, so this module implements
the small subset of the public Avro specification those files need:

  types   : null, boolean, int, long, float, double, bytes, string,
            record, array, map, fixed, union
  encoding: binary with zigzag-varint ints/longs, length-prefixed
            bytes/strings, block-encoded arrays/maps
  framing : OCF header (magic Obj\\x01, metadata map with avro.schema +
            avro.codec, 16-byte sync marker) + data blocks

Codec is always ``null`` (uncompressed) on write; the reader also accepts
``deflate``.  Schemas are plain JSON dicts (as parsed from ``avro.schema``).
Correctness is cross-validated in tests against the JVM's org.apache.avro
1.12 (bundled with Spark) via py4j: files written here are read back with
``DataFileReader`` and vice versa.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# -- binary primitives ------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf: io.BufferedIOBase) -> int:
    shift, acc = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf: io.BufferedIOBase) -> bytes:
    n = read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


# -- schema-directed datum encode/decode ------------------------------------


def _is_union(schema) -> bool:
    return isinstance(schema, list)


def _schema_type(schema):
    if isinstance(schema, str):
        return schema
    if isinstance(schema, dict):
        return schema["type"]
    raise ValueError(f"bad schema node: {schema!r}")


def write_datum(buf: io.BytesIO, schema, datum) -> None:
    if _is_union(schema):
        # resolve by None-ness first (the only union Iceberg uses is
        # [null, X]), falling back to first-match for general unions
        for i, branch in enumerate(schema):
            if (_schema_type(branch) == "null") == (datum is None):
                write_long(buf, i)
                return write_datum(buf, branch, datum)
        raise ValueError(f"datum {datum!r} matches no union branch {schema}")
    t = _schema_type(schema)
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(datum))
    elif t == "float":
        buf.write(struct.pack("<f", float(datum)))
    elif t == "double":
        buf.write(struct.pack("<d", float(datum)))
    elif t == "bytes":
        _write_bytes(buf, bytes(datum))
    elif t == "string":
        _write_bytes(buf, datum.encode("utf-8"))
    elif t == "fixed":
        if len(datum) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(datum)} != {schema['size']}")
        buf.write(bytes(datum))
    elif t == "record":
        for f in schema["fields"]:
            try:
                write_datum(buf, f["type"], datum[f["name"]])
            except KeyError:
                raise ValueError(f"record missing field {f['name']!r}") from None
    elif t == "array":
        if datum:
            write_long(buf, len(datum))
            for item in datum:
                write_datum(buf, schema["items"], item)
        write_long(buf, 0)
    elif t == "map":
        if datum:
            write_long(buf, len(datum))
            for k, v in datum.items():
                _write_bytes(buf, k.encode("utf-8"))
                write_datum(buf, schema["values"], v)
        write_long(buf, 0)
    else:
        raise ValueError(f"unsupported avro type: {t}")


def read_datum(buf: io.BufferedIOBase, schema):
    if _is_union(schema):
        return read_datum(buf, schema[read_long(buf)])
    t = _schema_type(schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "record":
        return {f["name"]: read_datum(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                read_long(buf)
            for _ in range(n):
                out.append(read_datum(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = read_datum(buf, schema["values"])
    raise ValueError(f"unsupported avro type: {t}")


# -- object container file --------------------------------------------------


def write_ocf(path: str, schema: dict, records: list[dict], metadata: dict[str, str] | None = None) -> None:
    """Write records as a single-block Avro OCF (codec null).  ``metadata``
    entries land in the file-level key-value map next to avro.schema —
    Iceberg stores the table schema / partition spec there."""
    meta = {"avro.schema": json.dumps(schema), "avro.codec": "null"}
    for k, v in (metadata or {}).items():
        meta[k] = v
    sync = os.urandom(16)

    body = io.BytesIO()
    for rec in records:
        write_datum(body, schema, rec)
    payload = body.getvalue()

    buf = io.BytesIO()
    buf.write(MAGIC)
    write_long(buf, len(meta))
    for k, v in meta.items():
        _write_bytes(buf, k.encode("utf-8"))
        _write_bytes(buf, v.encode("utf-8"))
    write_long(buf, 0)
    buf.write(sync)
    if records:
        write_long(buf, len(records))
        write_long(buf, len(payload))
        buf.write(payload)
        buf.write(sync)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())


def _read_header(fh, path: str) -> dict[str, bytes]:
    """Parse the OCF magic + metadata map, leaving ``fh`` positioned at the
    16-byte sync marker.  Shared by the full reader and the header-only
    schema probe so framing fixes can't diverge."""
    if fh.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(fh)
        if n == 0:
            break
        if n < 0:
            n = -n
            read_long(fh)
        for _ in range(n):
            k = _read_bytes(fh).decode("utf-8")
            meta[k] = _read_bytes(fh)
    return meta


def read_ocf(path: str) -> tuple[dict, dict[str, str], list[dict]]:
    """Read an Avro OCF → (schema, metadata, records).  Accepts codec null
    and deflate, any block layout (so files written by other Avro
    implementations, e.g. the JVM library, parse too)."""
    with open(path, "rb") as fh:
        meta = _read_header(fh, path)
        sync = fh.read(16)
        schema = json.loads(meta["avro.schema"].decode("utf-8"))
        codec = meta.get("avro.codec", b"null").decode("utf-8")
        records: list[dict] = []
        while True:
            try:
                count = read_long(fh)
            except EOFError:
                break
            size = read_long(fh)
            block = fh.read(size)
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            elif codec != "null":
                raise ValueError(f"unsupported avro codec: {codec}")
            bio = io.BytesIO(block)
            for _ in range(count):
                records.append(read_datum(bio, schema))
            if fh.read(16) != sync:
                raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
        str_meta = {
            k: v.decode("utf-8", "replace") for k, v in meta.items() if k != "avro.schema"
        }
        return schema, str_meta, records


def read_ocf_schema(path: str) -> dict:
    """Writer schema from the OCF header ONLY (no block decode) — the
    'prepare' step for the avro source: schema inference must not read
    data (mirrors the reference's prepare-before-execute contract,
    src/pg_arrow_source.rs:220-236)."""
    with open(path, "rb") as fh:
        meta = _read_header(fh, path)
        return json.loads(meta["avro.schema"].decode("utf-8"))
