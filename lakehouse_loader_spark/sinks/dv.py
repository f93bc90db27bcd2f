"""Deletion-vector codec for the Delta sink: pure-numpy RoaringBitmapArray
serialization plus the on-disk DV file framing, from the PUBLIC specs only —
the Delta protocol's "Deletion Vectors" section (PROTOCOL.md: descriptor
schema, `storageType` u/i/p, the 1681511377 magic, the 64-bit "portable"
RoaringBitmapArray layout) and the RoaringFormatSpec
(github.com/RoaringBitmap/RoaringFormatSpec: cookies 12346/12347,
descriptive/offset headers, array/bitmap/run containers).

Reference parity note: splitgraph/lakehouse-loader pins its Delta protocol
at minReader/minWriter=1 (src/delta_destination.rs:446-458) and has no
row-level DML at all; deletion vectors are this repo's merge-on-read
extension for Delta, the format twin of the Iceberg sink's position
deletes.  No delta-spark JAR exists in this environment, so fidelity is
enforced by byte-level round-trip property tests against the published
layout rather than cross-reads.

Layout written here (and read back):

- DV file: ``[version byte = 1]`` then per packed DV
  ``[int32 BE size][data][int32 BE crc32(data)]``; a descriptor's
  ``offset`` points at its size field, ``sizeInBytes`` is len(data).
- data: ``[int32 LE magic 1681511377][int64 LE nBitmaps]`` then per
  32-bit bitmap in increasing high-key order ``[int32 LE key][standard
  roaring bitmap]``.
- standard roaring bitmap (little-endian): cookie 12346 (no runs — this
  writer never emits run containers) + container count; per-container
  ``u16 key, u16 cardinality-1`` descriptive header; int32 offset header
  (always present with cookie 12346); then array containers
  (cardinality ≤ 4096: sorted u16 values) or bitmap containers (fixed
  1024 × u64 bitset).  The reader additionally accepts run containers
  (cookie 12347) so any spec-conformant writer's DVs load.

Everything is vectorized numpy — at 100 TB the bitmaps are built
executor-side (one applyInPandas group per data file) and only the
compressed bytes ever reach the driver.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

import numpy as np

DV_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_ARRAY_MAX = 4096  # container cardinality above which a bitset is smaller

# ZeroMQ Z85 alphabet (spec: rfc.zeromq.org/spec/32) — Delta encodes DV
# UUIDs and inline bitmaps with it.
_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """Z85: each big-endian 4-byte group → 5 chars, most significant first."""
    if len(data) % 4:
        raise ValueError(f"z85 input must be 4-byte aligned, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        (n,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            n, rem = divmod(n, 85)
            chunk.append(_Z85_CHARS[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 input must be 5-char aligned, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i : i + 5]:
            n = n * 85 + _Z85_INDEX[c]
        out += struct.pack(">I", n)
    return bytes(out)


# -- 32-bit roaring serialization -------------------------------------------


def _serialize_rb32(low32: np.ndarray) -> bytes:
    """Standard-format serialization of one 32-bit roaring bitmap from a
    SORTED UNIQUE uint32 array."""
    keys = (low32 >> 16).astype(np.uint16)
    lows = (low32 & 0xFFFF).astype(np.uint16)
    ckeys, starts = np.unique(keys, return_index=True)
    bounds = np.append(starts, len(low32))
    n_containers = len(ckeys)
    header = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, n_containers)
    desc = bytearray()
    bodies: list[bytes] = []
    for i in range(n_containers):
        vals = lows[bounds[i] : bounds[i + 1]]
        card = len(vals)
        desc += struct.pack("<HH", int(ckeys[i]), card - 1)
        if card <= _ARRAY_MAX:
            bodies.append(vals.astype("<u2").tobytes())
        else:
            bits = np.zeros(1024, dtype=np.uint64)
            np.bitwise_or.at(
                bits, vals >> np.uint16(6), np.uint64(1) << (vals.astype(np.uint64) & np.uint64(63))
            )
            bodies.append(bits.astype("<u8").tobytes())
    # offset header: absolute byte offsets of each container body from the
    # start of this bitmap's serialization (always present for cookie 12346)
    base = len(header) + len(desc) + 4 * n_containers
    offsets = bytearray()
    pos = base
    for b in bodies:
        offsets += struct.pack("<i", pos)
        pos += len(b)
    return bytes(header) + bytes(desc) + bytes(offsets) + b"".join(bodies)


def _deserialize_rb32(buf: bytes, start: int) -> tuple[np.ndarray, int]:
    """Parse one standard-format 32-bit bitmap at ``buf[start:]`` → (sorted
    uint32 values, bytes consumed).  Accepts run containers (cookie 12347)
    for spec completeness even though this writer never emits them."""
    (cookie16,) = struct.unpack_from("<H", buf, start)
    run_flags = None
    if cookie16 == _SERIAL_COOKIE_RUN:
        (n_containers,) = struct.unpack_from("<H", buf, start + 2)
        n_containers += 1
        p = start + 4
        n_flag_bytes = (n_containers + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8, count=n_flag_bytes, offset=p),
            bitorder="little",
        )[:n_containers]
        p += n_flag_bytes
    else:
        (cookie, n_containers) = struct.unpack_from("<ii", buf, start)
        if cookie != _SERIAL_COOKIE_NO_RUN:
            raise ValueError(f"bad roaring cookie {cookie}")
        p = start + 8
    keys = np.empty(n_containers, dtype=np.uint32)
    cards = np.empty(n_containers, dtype=np.int64)
    for i in range(n_containers):
        k, c_minus_1 = struct.unpack_from("<HH", buf, p)
        keys[i], cards[i] = k, c_minus_1 + 1
        p += 4
    has_offsets = run_flags is None or n_containers >= 4
    if has_offsets:
        p += 4 * n_containers  # bodies are contiguous; offsets not needed
    parts: list[np.ndarray] = []
    for i in range(n_containers):
        card = int(cards[i])
        if run_flags is not None and run_flags[i]:
            (n_runs,) = struct.unpack_from("<H", buf, p)
            p += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs, offset=p).reshape(
                -1, 2
            )
            p += 4 * n_runs
            # int() before arithmetic: s and ln are numpy uint16 scalars, and
            # under NumPy>=2 (NEP 50) a spec-valid run ending at 65535 would
            # wrap (s+ln+1 -> 0) into an empty range — silently undeleting
            # a foreign writer's rows.  Python ints never wrap.
            vals = np.concatenate(
                [
                    np.arange(int(s), int(s) + int(ln) + 1, dtype=np.uint32)
                    for s, ln in runs
                ]
            ) if n_runs else np.empty(0, dtype=np.uint32)
        elif card <= _ARRAY_MAX:
            vals = np.frombuffer(buf, dtype="<u2", count=card, offset=p).astype(
                np.uint32
            )
            p += 2 * card
        else:
            bits = np.frombuffer(buf, dtype="<u8", count=1024, offset=p)
            p += 8192
            vals = np.flatnonzero(
                np.unpackbits(bits.view(np.uint8), bitorder="little")
            ).astype(np.uint32)
        parts.append((np.uint32(int(keys[i]) << 16) | vals).astype(np.uint32))
    values = np.concatenate(parts) if parts else np.empty(0, dtype=np.uint32)
    return values, p - start


# -- 64-bit RoaringBitmapArray (the Delta DV payload) -----------------------


def serialize_positions(positions: np.ndarray) -> bytes:
    """Sorted-unique int64/uint64 row positions → Delta DV bitmap bytes
    (magic + portable RoaringBitmapArray)."""
    pos = np.unique(np.asarray(positions, dtype=np.uint64))
    if len(pos) and int(pos[-1]) >= 1 << 63:
        raise ValueError("row positions must fit in a signed int64")
    highs = (pos >> np.uint64(32)).astype(np.uint32)
    lows = (pos & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hkeys, starts = np.unique(highs, return_index=True)
    bounds = np.append(starts, len(pos))
    out = [struct.pack("<iq", DV_MAGIC, len(hkeys))]
    for i, hk in enumerate(hkeys):
        out.append(struct.pack("<i", int(hk)))
        out.append(_serialize_rb32(lows[bounds[i] : bounds[i + 1]]))
    return b"".join(out)


def deserialize_positions(data: bytes) -> np.ndarray:
    """Delta DV bitmap bytes → sorted uint64 row positions."""
    magic, n_bitmaps = struct.unpack_from("<iq", data, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    p = 12
    parts: list[np.ndarray] = []
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<i", data, p)
        p += 4
        vals, used = _deserialize_rb32(data, p)
        p += used
        parts.append((np.uint64(key) << np.uint64(32)) | vals.astype(np.uint64))
    return (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    )


# -- DV file framing + descriptors ------------------------------------------


def dv_file_name(uuid_hex32: str) -> str:
    return f"deletion_vector_{str(_uuid.UUID(uuid_hex32))}.bin"


def write_dv_file(path: str, blobs: list[bytes]) -> tuple[str, list[tuple[int, int]]]:
    """Pack ``blobs`` (one serialized bitmap per target data file) into one
    DV file under the table root.  Returns (relative file name,
    [(offset, sizeInBytes)] aligned with ``blobs``)."""
    uid = _uuid.uuid4()
    rel = dv_file_name(uid.hex)
    spans: list[tuple[int, int]] = []
    buf = bytearray(b"\x01")  # format version
    for data in blobs:
        spans.append((len(buf), len(data)))
        buf += struct.pack(">i", len(data))
        buf += data
        buf += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    tmp = os.path.join(path, f".{rel}.{uid.hex}.tmp")
    with open(tmp, "wb") as fh:
        fh.write(bytes(buf))
    os.replace(tmp, os.path.join(path, rel))
    return rel, spans


def make_descriptor(
    rel_or_inline: str | bytes,
    offset: int | None = None,
    size: int | None = None,
    cardinality: int = 0,
) -> dict:
    """Build the add-action ``deletionVector`` descriptor.  ``bytes`` input
    → inline ("i"); a relative DV file name → "u" with its UUID z85-packed
    the way the protocol's path-derivation rule expects."""
    if isinstance(rel_or_inline, bytes):
        data = rel_or_inline
        # z85 needs 4-byte alignment: pad with zeros, record the true size
        # so the decode side can truncate the padding back off
        padded = data + b"\x00" * (-len(data) % 4)
        return {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(padded),
            "sizeInBytes": len(data),
            "cardinality": int(cardinality),
        }
    name = os.path.basename(rel_or_inline)
    uid = _uuid.UUID(name[len("deletion_vector_") : -len(".bin")])
    return {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(uid.bytes),
        "offset": int(offset),
        "sizeInBytes": int(size),
        "cardinality": int(cardinality),
    }


def load_descriptor_bytes(table_path: str, desc: dict) -> bytes:
    """Descriptor → the COMPRESSED serialized-bitmap blob, CRC-verified for
    on-disk DVs ("u"/"p") — a torn or mismatched bitmap must fail loudly,
    not silently undelete rows.  Split from position expansion so the read
    path can ship only these (small) bytes to executors and expand there:
    driver memory stays proportional to the compressed delete size, the
    same bound the write path guarantees."""
    st = desc["storageType"]
    if st == "i":
        raw = z85_decode(desc["pathOrInlineDv"])
        return raw[: desc["sizeInBytes"]]
    if st == "u":
        raw = desc["pathOrInlineDv"]
        prefix, z = raw[:-20], raw[-20:]
        uid = _uuid.UUID(bytes=z85_decode(z))
        fp = os.path.join(table_path, prefix, dv_file_name(uid.hex))
    elif st == "p":
        fp = desc["pathOrInlineDv"]
    else:
        raise ValueError(f"unknown deletionVector storageType {st!r}")
    with open(fp, "rb") as fh:
        fh.seek(desc["offset"])
        (size,) = struct.unpack(">i", fh.read(4))
        if size != desc["sizeInBytes"]:
            raise ValueError(
                f"DV size mismatch in {fp}@{desc['offset']}: "
                f"file says {size}, descriptor says {desc['sizeInBytes']}"
            )
        data = fh.read(size)
        (crc,) = struct.unpack(">I", fh.read(4))
        if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
            raise ValueError(f"DV checksum mismatch in {fp}@{desc['offset']}")
    return data


def load_descriptor(table_path: str, desc: dict) -> np.ndarray:
    """Descriptor → sorted uint64 deleted positions (driver-side expansion;
    prefer load_descriptor_bytes + executor-side deserialize_positions for
    scan-path use)."""
    return deserialize_positions(load_descriptor_bytes(table_path, desc))


def descriptor_dv_files(table_path: str, adds: dict[str, dict]) -> set[str]:
    """Absolute paths of every on-disk DV file referenced by ``adds`` —
    the vacuum keep-set contribution."""
    out: set[str] = set()
    for a in adds.values():
        desc = a.get("deletionVector")
        if not desc or desc["storageType"] == "i":
            continue
        if desc["storageType"] == "p":
            out.add(desc["pathOrInlineDv"])
        else:
            raw = desc["pathOrInlineDv"]
            prefix, z = raw[:-20], raw[-20:]
            uid = _uuid.UUID(bytes=z85_decode(z))
            out.add(os.path.join(table_path, prefix, dv_file_name(uid.hex)))
    return out
