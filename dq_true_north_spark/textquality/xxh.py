"""Pure-Python/numpy mirror of Spark's `xxhash64` — the independent scalar
spec for the MinHash/LSH oracles (round 5).

XXH64 is a public algorithm (Yann Collet, public-domain reference); Spark's
`xxhash64(col1, col2, ...)` chains per-column hashes with initial seed 42
(the hash of column k seeds column k+1, nulls skipped), hashing strings as
their UTF-8 bytes and int/long values through the specialized 4-/8-byte
paths (little-endian). That chain is reproduced here exactly — pinned
against the JVM by tests/test_dedup_similarity.py::test_xxh64_matches_spark
— which makes the whole MinHash → banding → bucket → pair → cluster
pipeline scalar-computable, so the driver's DuckDB oracle can carry
SPEC-computed VALUES for queries whose production path runs JVM hashing
(the canonical_urls / doc_fingerprints oracle pattern extended to LSH).

Vectorized variants (`hash_int_v`, `hash_long_v`) run the 4-/8-byte
specializations over uint64 numpy arrays (modular wrap-around is native),
so signature generation for a 10^4-document corpus is two scalar passes
(one UTF-8 string hash per shingle) plus flat array math — the same
batch-then-reduceat shape as langmodel.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42                          # Spark's fixed xxhash64 seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (unsigned result). Matches Spark's
    hashUnsafeBytes path for UTF-8 string columns."""
    n = len(data)
    i = 0
    seed &= _M
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
               + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            acc = (((acc ^ _round(0, v)) * _P1) + _P4) & _M
    else:
        acc = (seed + _P5) & _M
    acc = (acc + n) & _M
    while i + 8 <= n:
        acc = ((_rotl(acc ^ _round(0, int.from_bytes(data[i : i + 8],
                                                     "little")), 27)
                * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        acc = ((_rotl(acc ^ ((int.from_bytes(data[i : i + 4], "little")
                              * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        acc = ((_rotl(acc ^ ((data[i] * _P5) & _M), 11)) * _P1) & _M
        i += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M
    acc ^= acc >> 29
    acc = (acc * _P3) & _M
    acc ^= acc >> 32
    return acc


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64(vals, seed: int = SPARK_SEED) -> int:
    """Spark's xxhash64(col...) chain on scalar Python values. Accepts
    str (UTF-8 bytes), ("int", i) for IntegerType, plain int for LongType;
    None values are skipped (the seed passes through, as in Spark).
    Returns the SIGNED 64-bit result Spark's LongType column carries."""
    h = seed & _M
    for v in vals:
        if v is None:
            continue
        if isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, tuple) and v[0] == "int":
            h = xxh64_bytes((v[1] & 0xFFFFFFFF).to_bytes(4, "little"), h)
        else:
            h = xxh64_bytes((v & _M).to_bytes(8, "little"), h)
    return _signed(h)


# ------------------------------------------------ vectorized (numpy) -------

_U = np.uint64


def _rotl_v(x: np.ndarray, r: int) -> np.ndarray:
    return np.left_shift(x, _U(r)) | np.right_shift(x, _U(64 - r))


def _fmix_v(acc: np.ndarray) -> np.ndarray:
    acc = acc ^ np.right_shift(acc, _U(33))
    acc = acc * _U(_P2)
    acc = acc ^ np.right_shift(acc, _U(29))
    acc = acc * _U(_P3)
    return acc ^ np.right_shift(acc, _U(32))


def hash_int_v(values: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """Vectorized XXH64 4-byte specialization (Spark hashInt): broadcast
    uint64 `values` (already zero-extended from int32) against uint64
    `seeds`. uint64 arithmetic wraps mod 2^64 natively in numpy."""
    # np.asarray: scalar uint64 * uint64 RAISES an overflow warning where
    # the array op wraps silently — normalize so callers can pass either
    values = np.asarray(values, dtype=_U)
    acc = seeds + _U(_P5 + 4)
    acc = acc ^ (values * _U(_P1))
    acc = _rotl_v(acc, 23) * _U(_P2) + _U(_P3)
    return _fmix_v(acc)


def hash_long_v(values: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """Vectorized XXH64 8-byte specialization (Spark hashLong)."""
    values = np.asarray(values, dtype=_U)
    k1 = _rotl_v(values * _U(_P2), 31) * _U(_P1)
    acc = (seeds + _U(_P5 + 8)) ^ k1
    acc = _rotl_v(acc, 27) * _U(_P1) + _U(_P4)
    return _fmix_v(acc)


def xxh64_batch(items: list[bytes], seed: int = SPARK_SEED) -> np.ndarray:
    """Vectorized XXH64 over many byte strings (uint64 result array).
    Grouped by length — within one length the chunk structure is fixed, so
    every step is flat uint64 array math; 10^6 shingle-sized strings hash
    in well under a second vs ~30 s scalar. Matches xxh64_bytes exactly
    (property-pinned), including the >= 32-byte four-lane path."""
    out = np.empty(len(items), dtype=np.uint64)
    if not items:
        return out
    seed_u = _U(seed & _M)
    by_len: dict[int, list[int]] = {}
    for idx, b in enumerate(items):
        by_len.setdefault(len(b), []).append(idx)
    for n, idxs in by_len.items():
        mat = np.frombuffer(
            b"".join(items[i] for i in idxs), dtype=np.uint8
        ).reshape(len(idxs), n) if n else np.zeros((len(idxs), 0), np.uint8)

        def le64(off: int) -> np.ndarray:
            return np.ascontiguousarray(mat[:, off : off + 8]).view("<u8")[:, 0]

        i = 0
        if n >= 32:
            v1 = np.full(len(idxs), (int(seed_u) + _P1 + _P2) & _M, _U)
            v2 = np.full(len(idxs), (int(seed_u) + _P2) & _M, _U)
            v3 = np.full(len(idxs), int(seed_u), _U)
            v4 = np.full(len(idxs), (int(seed_u) - _P1) & _M, _U)

            def rnd(acc, inp):
                return _rotl_v(acc + inp * _U(_P2), 31) * _U(_P1)

            while i + 32 <= n:
                v1 = rnd(v1, le64(i))
                v2 = rnd(v2, le64(i + 8))
                v3 = rnd(v3, le64(i + 16))
                v4 = rnd(v4, le64(i + 24))
                i += 32
            acc = (_rotl_v(v1, 1) + _rotl_v(v2, 7) + _rotl_v(v3, 12)
                   + _rotl_v(v4, 18))
            for v in (v1, v2, v3, v4):
                acc = (acc ^ rnd(np.zeros_like(v), v)) * _U(_P1) + _U(_P4)
        else:
            acc = np.full(len(idxs), (int(seed_u) + _P5) & _M, _U)
        acc = acc + _U(n)
        while i + 8 <= n:
            k = _rotl_v(le64(i) * _U(_P2), 31) * _U(_P1)
            acc = _rotl_v(acc ^ k, 27) * _U(_P1) + _U(_P4)
            i += 8
        if i + 4 <= n:
            k32 = np.ascontiguousarray(mat[:, i : i + 4]).view("<u4")[:, 0]
            acc = (_rotl_v(acc ^ (k32.astype(_U) * _U(_P1)), 23) * _U(_P2)
                   + _U(_P3))
            i += 4
        while i < n:
            acc = _rotl_v(acc ^ (mat[:, i].astype(_U) * _U(_P5)), 11) * _U(_P1)
            i += 1
        out[np.array(idxs)] = _fmix_v(acc)
    return out
