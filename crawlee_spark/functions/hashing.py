"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` (seed 42).

The frontier key is ``xxhash64(unique_key)`` (north_rule). The reference
simulator (pure Python, no JVM) must compute the *same* 64-bit keys the Spark
engine computes, so golden URL-seen sets compare hash-for-hash. Parity with
Spark is pinned by tests/test_urls.py.

XXH64 is the public xxHash algorithm (Yann Collet, BSD-2); Spark's
``XxHash64`` expression hashes a string's UTF-8 bytes with seed 42 and
returns a *signed* 64-bit value.

Also here: the reference's request-id digest (first 15 chars of
base64(sha256(uniqueKey)) with ``+/=`` stripped,
``packages/core/src/storages/utils.ts:105-113``) for byte-compat ids.
"""

from __future__ import annotations

import base64
import hashlib

_MASK = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _MASK


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Unsigned XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Signed 64-bit hash of a string, identical to Spark ``xxhash64(col)``."""
    return _signed(xxh64(s.encode("utf-8"), seed))


def xxhash64_long(v: int, seed: int = SPARK_SEED) -> int:
    """Signed 64-bit hash of a long, identical to Spark ``xxhash64(bigint)``."""
    return _signed(xxh64(int(v).to_bytes(8, "little", signed=True), seed))


def host_bucket_py(host: str, num_buckets: int) -> int:
    """Python mirror of functions.urls.host_hash (pmod of signed xxhash64)."""
    return xxhash64_str(host) % num_buckets


def request_id_py(unique_key: str) -> str:
    """Reference request id: base64(sha256(uniqueKey)), ``+/=`` stripped, 15 chars.

    Byte-compat with ``packages/core/src/storages/utils.ts:105-113`` (and the
    duplicate impl at ``memory-storage/src/utils.ts:26-33``).
    """
    digest = hashlib.sha256(unique_key.encode("utf-8")).digest()
    b64 = base64.b64encode(digest).decode("ascii")
    cleaned = b64.replace("+", "").replace("/", "").replace("=", "")
    return cleaned[:15]
