"""Iceberg partition transforms (hidden partitioning).

The reference writes unpartitioned tables only; this module is the engine
extension that gives the Iceberg sink the spec's transform partitioning:
``year``/``month``/``day``/``hour`` over dates/timestamps, ``bucket[N]``
(Murmur3-based, spec appendix B) and ``truncate[W]`` over ints/longs/
strings, next to plain ``identity``.  A user declares partitions as
canonical expression strings — ``"day(ts)"``, ``"bucket(16, id)"``,
``"truncate(4, name)"``, or a bare column name — and the sink derives the
partition values at write time while the data files keep only the source
columns (that is what makes the partitioning "hidden").

Transform value definitions follow the Iceberg spec:

- year(v)  → years from 1970 (int)
- month(v) → months from 1970-01 (int)
- day(v)   → date (epoch days in manifests, ISO string in hive dirs)
- hour(v)  → hours from 1970-01-01 00:00 UTC (int)
- bucket[N](v) → (murmur3_x86_32(v, seed=0) & Int.MAX) % N, where ints,
  longs and dates hash as the 8-byte little-endian long and strings as
  their UTF-8 bytes (spec appendix B test vectors pinned in tests)
- truncate[W](v) → v - (v mod W) with positive mod for ints/longs; the
  first W characters for strings
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_partition_expr(expr: str) -> tuple[str, str]:
    """``'day(ts)'`` → ``('day', 'ts')``; ``'bucket(16, id)'`` →
    ``('bucket[16]', 'id')``; bare ``'ts'`` → ``('identity', 'ts')``.
    The first element is the Iceberg JSON transform string."""
    e = expr.strip()
    m = re.fullmatch(r"(year|month|day|hour)\s*\(\s*(\w+)\s*\)", e)
    if m:
        return m.group(1), m.group(2)
    m = re.fullmatch(r"(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)", e)
    if m:
        if int(m.group(2)) <= 0:
            raise ValueError(f"{m.group(1)} width must be positive: {expr!r}")
        return f"{m.group(1)}[{m.group(2)}]", m.group(3)
    if re.fullmatch(r"\w+", e):
        return "identity", e
    raise ValueError(
        f"bad partition expression {expr!r}; want COL, year/month/day/hour(COL), "
        "bucket(N, COL), or truncate(W, COL)"
    )


def expr_of(transform: str, source_name: str) -> str:
    """Inverse of ``parse_partition_expr``: spec (transform, source) →
    the canonical user-facing expression string."""
    if transform == "identity":
        return source_name
    m = re.fullmatch(r"(bucket|truncate)\[(\d+)\]", transform)
    if m:
        return f"{m.group(1)}({m.group(2)}, {source_name})"
    return f"{transform}({source_name})"


def field_name(transform: str, source_name: str) -> str:
    """Iceberg's default partition-field naming: ``ts_day``, ``id_bucket``,
    ``name_trunc``; identity keeps the column name."""
    if transform == "identity":
        return source_name
    base = transform.split("[", 1)[0]
    suffix = {"truncate": "trunc"}.get(base, base)
    return f"{source_name}_{suffix}"


def result_type(transform: str, source_ice_type: str) -> str:
    """Iceberg type of the transform VALUE (what manifests store and the
    Avro partition record is typed with)."""
    if transform == "identity" or transform.startswith("truncate["):
        return source_ice_type
    if transform == "day":
        return "date"
    return "int"  # year, month, hour, bucket[N]


# -- Murmur3 (x86 32-bit, seed 0) — the spec's bucket hash ------------------

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def _mix(h: np.ndarray, k: np.ndarray) -> np.ndarray:
    k = (k * _C1) & np.uint32(0xFFFFFFFF)
    k = ((k << np.uint32(15)) | (k >> np.uint32(17))) & np.uint32(0xFFFFFFFF)
    k = (k * _C2) & np.uint32(0xFFFFFFFF)
    h = h ^ k
    h = ((h << np.uint32(13)) | (h >> np.uint32(19))) & np.uint32(0xFFFFFFFF)
    return (h * np.uint32(5) + np.uint32(0xE6546B64)) & np.uint32(0xFFFFFFFF)


def _fmix(h: np.ndarray, n_bytes: int) -> np.ndarray:
    h = h ^ np.uint32(n_bytes)
    h = h ^ (h >> np.uint32(16))
    h = (h * np.uint32(0x85EBCA6B)) & np.uint32(0xFFFFFFFF)
    h = h ^ (h >> np.uint32(13))
    h = (h * np.uint32(0xC2B2AE35)) & np.uint32(0xFFFFFFFF)
    return h ^ (h >> np.uint32(16))


def murmur3_long(vals: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_x86_32(little_endian_8_bytes(v), seed=0) over an
    int64 array — how Iceberg hashes int/long/date/time/timestamp for the
    bucket transform (ints are hashed as longs so the families agree).
    Returns signed int32 (Java semantics)."""
    with np.errstate(over="ignore"):
        data = np.ascontiguousarray(vals, dtype="<i8").view("<u4").reshape(-1, 2)
        h = np.zeros(len(data), dtype=np.uint32)
        h = _mix(h, data[:, 0].copy())
        h = _mix(h, data[:, 1].copy())
        return _fmix(h, 8).view(np.int32)


def murmur3_bytes(b: bytes) -> int:
    """Scalar murmur3_x86_32(b, seed=0) — Iceberg's string/binary bucket
    hash (strings hash as their UTF-8 bytes).  Per-value Python is the
    documented slow path; the hot numeric path is ``murmur3_long``."""
    h = 0
    n = len(b)
    tail = n & ~3
    for i in range(0, tail, 4):
        k = int.from_bytes(b[i : i + 4], "little")
        k = (k * 0xCC9E2D51) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * 0x1B873593) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    if n & 3:
        k = int.from_bytes(b[tail:], "little")
        k = (k * 0xCC9E2D51) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * 0x1B873593) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - 0x100000000 if h >= 0x80000000 else h


def transform_column(transform: str, src: str, src_type: T.DataType) -> Column:
    """Spark Column computing the transform VALUE for each row — the
    derived (hidden) partition column the writer partitions by.  Date/
    time transforms and truncate are pure JVM expressions; bucket is an
    Arrow-batched pandas UDF around the spec's Murmur3."""
    c = F.col(src)
    if transform == "identity":
        return c
    if transform == "year":
        return (F.year(c) - F.lit(1970)).cast("int")
    if transform == "month":
        return ((F.year(c) - F.lit(1970)) * 12 + F.month(c) - F.lit(1)).cast("int")
    if transform == "day":
        return F.to_date(c)
    if transform == "hour":
        # NTZ timestamps are project-wide UTC (session tz pinned), so the
        # cast to instant is exact
        return F.floor(F.unix_timestamp(c.cast("timestamp")) / 3600).cast("int")
    m = re.fullmatch(r"truncate\[(\d+)\]", transform)
    if m:
        w = int(m.group(1))
        if isinstance(src_type, T.StringType):
            return F.substring(c, 1, w)
        return (c - F.pmod(c, F.lit(w))).cast(src_type)
    m = re.fullmatch(r"bucket\[(\d+)\]", transform)
    if m:
        n = int(m.group(1))
        if isinstance(src_type, T.StringType):

            @F.pandas_udf("int")
            def _bucket_str(v: pd.Series) -> pd.Series:
                return v.map(
                    lambda s: (murmur3_bytes(s.encode("utf-8")) & 0x7FFFFFFF) % n
                    if s is not None
                    else None
                ).astype("Int32")

            return _bucket_str(c)
        # numeric/temporal families all hash as the widened 8-byte long
        # (spec appendix B); nulls are masked JVM-side so the UDF sees a
        # non-null int64 Series — Arrow would otherwise hand back float64
        # (precision loss past 2^53)
        if isinstance(src_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            widened = c.cast("long")
        elif isinstance(src_type, T.DateType):
            widened = F.datediff(c, F.lit("1970-01-01")).cast("long")
        elif isinstance(src_type, (T.TimestampType, T.TimestampNTZType)):
            widened = F.unix_micros(c.cast("timestamp"))
        else:
            raise ValueError(f"bucket over {src_type.simpleString()} not supported")

        @F.pandas_udf("int")
        def _bucket_long(v: pd.Series) -> pd.Series:
            hashed = murmur3_long(v.to_numpy(dtype=np.int64))
            return pd.Series((hashed.astype(np.int64) & 0x7FFFFFFF) % n, dtype="int32")

        return F.when(c.isNotNull(), _bucket_long(F.coalesce(widened, F.lit(0))))
    raise ValueError(f"unknown transform {transform!r}")
