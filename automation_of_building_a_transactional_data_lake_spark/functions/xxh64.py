"""Pure-Python twin of Spark's ``xxhash64`` expression (XXH64).

Why this exists: the Python DataSource (``sources/lake_datasource``)
plans file pruning inside a Python worker with NO SparkSession — but
the bloom-filter index (``formats/parquet_cow._collect_blooms``) and
the ``bucket(N, col)`` hidden-partition layout both key on the engine's
``xxhash64``. Membership/bucket pruning from Python therefore needs a
bit-exact reimplementation of the hash, pinned by a parity test against
``F.xxhash64`` over randomized values (tests/test_lake_datasource.py).

Semantics mirrored from Spark's ``XXH64``/``XxHash64`` (public Apache
Spark source, sql/catalyst XXH64.java): int-family values hash via
``hashInt``, long-family via ``hashLong``, strings via standard XXH64
over their UTF-8 bytes; multi-argument ``xxhash64(a, b)`` chains — the
first value hashes with the default seed 42, each later value with the
running hash as its seed.

Everything is computed in unsigned 64-bit space and converted to the
signed value Spark returns at the boundary.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _u64(v: int) -> int:
    return v & _M64


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def hash_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt: 4-byte integer-family values (boolean,
    byte, short, int, date-days, float bits)."""
    h = _u64(_u64(seed) + _P5 + 4)
    h ^= (_u64(value) & 0xFFFFFFFF) * _P1 & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: 8-byte values (long, timestamp-micros,
    double bits)."""
    h = _u64(_u64(seed) + _P5 + 8)
    h ^= (_rotl(_u64(value) * _P2 & _M64, 31) * _P1) & _M64
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte string (Spark hashUnsafeBytesBlock:
    32-byte stripes, then 8-byte words, one 4-byte word, then tail
    bytes)."""
    seed = _u64(seed)
    length = len(data)
    off = 0
    if length >= 32:
        v1 = _u64(seed + _P1 + _P2)
        v2 = _u64(seed + _P2)
        v3 = seed
        v4 = _u64(seed - _P1)
        while off + 32 <= length:
            for i, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[off + 8 * i:off + 8 * i + 8], "little")
                v = (_rotl(_u64(v + k * _P2), 31) * _P1) & _M64
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            off += 32
        h = _u64(_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18))
        for v in (v1, v2, v3, v4):
            h ^= (_rotl(_u64(v * _P2), 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = _u64(seed + _P5)
    h = _u64(h + length)
    while off + 8 <= length:
        k = int.from_bytes(data[off:off + 8], "little")
        h ^= (_rotl(_u64(k * _P2), 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        off += 8
    if off + 4 <= length:
        k = int.from_bytes(data[off:off + 4], "little")
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        off += 4
    while off < length:
        h ^= (data[off] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        off += 1
    return _fmix(h)


def _hash_one(value, seed: int) -> int:
    """Hash ONE value the way Spark's XxHash64 hashes that type.
    Python ``int`` follows Spark's literal typing: values inside the
    32-bit range are IntegerType (hashInt), wider ones LongType
    (hashLong) — pass ``("long", v)`` to force 8-byte hashing for a
    column that is LongType regardless of the value's width."""
    kind = None
    if isinstance(value, tuple):
        kind, value = value
    if isinstance(value, bool):
        return hash_int(1 if value else 0, seed)
    if isinstance(value, int):
        if kind == "long" or not (-(1 << 31) <= value < (1 << 31)):
            return hash_long(value, seed)
        if kind == "int" or kind is None:
            return hash_int(value, seed)
        raise ValueError(f"unsupported int kind {kind!r}")
    if isinstance(value, str):
        return hash_bytes(value.encode("utf-8"), seed)
    if isinstance(value, (bytes, bytearray)):
        return hash_bytes(bytes(value), seed)
    raise TypeError(f"xxhash64 twin does not support {type(value).__name__}")


def xxhash64(*values, seed: int = DEFAULT_SEED) -> int:
    """Signed 64-bit result of Spark's ``xxhash64(values...)``:
    chained — each value hashes with the running hash as its seed."""
    h = seed
    for v in values:
        h = _hash_one(v, h)
    return _signed(h)
