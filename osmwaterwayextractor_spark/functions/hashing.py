"""Vectorized xxh64 (seed 0) + base62 deterministic-id kernels.

Replicates the reference id scheme exactly (osm_waterway_extractor.py):
- node id  = "n" + base62(xxh64(f"{round(lat,p)},{round(lon,p)}"))[:8]
  (IDGenerator._hash_coordinate/:1090-1105, generate_node_id/:1122-1131)
- edge id  = "e" + base62(xxh64(f"{from}-{to}-{way_id}-{seg_idx}"))[:8]
  (generate_edge_id/:1133-1150)
- base62 alphabet "0-9A-Za-z", repeated divmod, no leading zeros
  (_int_to_base62/:1107-1120)

The coordinate string uses Python's shortest float repr; NumPy's dragon4
``astype(str)`` produces identical text for float64, which keeps this fully
vectorized. Spark's builtin ``xxhash64`` hashes Spark-internal binary with
seed 42 and cannot reproduce these ids, hence the NumPy implementation
(SURVEY.md §7 hard-part 2). Hashing is vectorized across rows, grouped by
byte-length (inputs are short ASCII strings, few distinct lengths).
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(11400714785074694791)
_P2 = np.uint64(14029467366897019727)
_P3 = np.uint64(1609587929392839161)
_P4 = np.uint64(9650029242287828579)
_P5 = np.uint64(2870177450012600261)

_U64_SHIFTS = {s: np.uint64(s) for s in range(64)}

BASE62_ALPHABET = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_B62_CHARS = np.array(list(BASE62_ALPHABET), dtype="U1")


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = _U64_SHIFTS[r]
    l_ = _U64_SHIFTS[64 - r]
    return (x << r_) | (x >> l_)


def _read_u64(mat: np.ndarray, off: int) -> np.ndarray:
    """Little-endian u64 from byte matrix columns [off, off+8)."""
    out = np.zeros(mat.shape[0], dtype=np.uint64)
    for b in range(8):
        out |= mat[:, off + b].astype(np.uint64) << _U64_SHIFTS[8 * b]
    return out


def _read_u32(mat: np.ndarray, off: int) -> np.ndarray:
    out = np.zeros(mat.shape[0], dtype=np.uint64)
    for b in range(4):
        out |= mat[:, off + b].astype(np.uint64) << _U64_SHIFTS[8 * b]
    return out


def _xxh64_fixed_len(mat: np.ndarray, seed: int = 0) -> np.ndarray:
    """xxh64 of k same-length byte rows; mat is (k, n) uint8, vectorized over k."""
    k, n = mat.shape
    seed_ = np.uint64(seed)
    pos = 0
    if n >= 32:
        with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
            v1 = np.full(k, seed_ + _P1 + _P2, dtype=np.uint64)
            v2 = np.full(k, seed_ + _P2, dtype=np.uint64)
            v3 = np.full(k, seed_, dtype=np.uint64)
            v4 = np.full(k, seed_ - _P1, dtype=np.uint64)
        while pos + 32 <= n:
            v1 = _rotl(v1 + _read_u64(mat, pos) * _P2, 31) * _P1
            v2 = _rotl(v2 + _read_u64(mat, pos + 8) * _P2, 31) * _P1
            v3 = _rotl(v3 + _read_u64(mat, pos + 16) * _P2, 31) * _P1
            v4 = _rotl(v4 + _read_u64(mat, pos + 24) * _P2, 31) * _P1
            pos += 32
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h ^= _rotl(v * _P2, 31) * _P1
            h = h * _P1 + _P4
    else:
        h = np.full(k, seed_ + _P5, dtype=np.uint64)
    h = h + np.uint64(n)
    while pos + 8 <= n:
        h ^= _rotl(_read_u64(mat, pos) * _P2, 31) * _P1
        h = _rotl(h, 27) * _P1 + _P4
        pos += 8
    if pos + 4 <= n:
        h ^= _read_u32(mat, pos) * _P1
        h = _rotl(h, 23) * _P2 + _P3
        pos += 4
    while pos < n:
        h ^= mat[:, pos].astype(np.uint64) * _P5
        h = _rotl(h, 11) * _P1
        pos += 1
    h ^= h >> _U64_SHIFTS[33]
    h *= _P2
    h ^= h >> _U64_SHIFTS[29]
    h *= _P3
    h ^= h >> _U64_SHIFTS[32]
    return h


def xxh64_ascii(strings: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized xxh64 over an array of ASCII strings → uint64 array.

    Rows are grouped by length so each group runs straight-line vectorized
    code (id strings have only a handful of distinct lengths).
    """
    s = np.asarray(strings, dtype=np.str_)
    k = s.shape[0]
    if k == 0:
        return np.zeros(0, dtype=np.uint64)
    itemsize = s.dtype.itemsize // 4  # chars per row
    mat32 = s.view(np.uint32).reshape(k, itemsize)
    if mat32.size and mat32.max() > 127:
        raise ValueError("xxh64_ascii requires ASCII input")
    mat = mat32.astype(np.uint8)
    lengths = (mat32 != 0).sum(axis=1)
    out = np.zeros(k, dtype=np.uint64)
    for n in np.unique(lengths):
        idx = np.nonzero(lengths == n)[0]
        out[idx] = _xxh64_fixed_len(mat[idx, : int(n)], seed)
    return out


def base62_prefix(values: np.ndarray, length: int = 8) -> np.ndarray:
    """base62(value)[:length] for a uint64 array (reference :1107-1120).

    No leading zeros (value 0 → "0"); values whose base62 form is shorter
    than ``length`` yield the full short string, exactly like the reference's
    ``[:length]`` slice.
    """
    v = np.asarray(values, dtype=np.uint64)
    k = v.shape[0]
    ndig = 11  # 62**10 < 2**64 < 62**11
    digits = np.zeros((k, ndig), dtype=np.int64)
    rem = v.copy()
    d62 = np.uint64(62)
    for i in range(ndig - 1, -1, -1):
        digits[:, i] = (rem % d62).astype(np.int64)
        rem //= d62
    nonzero = digits != 0
    has_any = nonzero.any(axis=1)
    first = np.where(has_any, nonzero.argmax(axis=1), ndig - 1)
    # common case: at least `length` digits remain after stripping zeros
    take = first[:, None] + np.arange(length)[None, :]
    ok = take[:, -1] <= ndig - 1
    out = np.empty(k, dtype=f"U{length}")
    if ok.any():
        chars = _B62_CHARS[digits[np.nonzero(ok)[0][:, None], take[ok]]]
        out[ok] = chars.view(f"U{length}").ravel()
    short = np.nonzero(~ok)[0]
    for i in short:  # vanishingly rare: hash < 62**(length-1)
        ds = digits[i, first[i]:]
        out[i] = "".join(_B62_CHARS[d] for d in ds)
    return out


def float_repr(arr: np.ndarray) -> np.ndarray:
    """Shortest-repr text of float64 values — identical to Python ``repr``."""
    return np.asarray(arr, dtype=np.float64).astype("U32")


def node_ids(lat: np.ndarray, lon: np.ndarray, precision: int, hash_length: int = 8) -> np.ndarray:
    """Deterministic node ids for (already final) coordinates.

    Rounds to ``precision`` before hashing exactly like
    ``IDGenerator._hash_coordinate`` (reference :1090-1105); callers pass
    snapped/unrounded centroids and pre-rounded vertices alike.
    """
    from .geodesy import round_coords

    rlat = round_coords(lat, precision)
    rlon = round_coords(lon, precision)
    keys = np.char.add(np.char.add(float_repr(rlat), ","), float_repr(rlon))
    h = xxh64_ascii(keys)
    return np.char.add("n", base62_prefix(h, hash_length))


def edge_ids(
    from_ids: np.ndarray,
    to_ids: np.ndarray,
    way_ids: np.ndarray,
    seg_idx: np.ndarray,
    hash_length: int = 8,
) -> np.ndarray:
    """Deterministic edge ids (reference :1133-1150)."""
    keys = np.char.add(
        np.char.add(np.char.add(np.asarray(from_ids, dtype=np.str_), "-"), np.asarray(to_ids, dtype=np.str_)),
        np.char.add(
            np.char.add("-", np.asarray(way_ids, dtype=np.int64).astype(np.str_)),
            np.char.add("-", np.asarray(seg_idx, dtype=np.int64).astype(np.str_)),
        ),
    )
    h = xxh64_ascii(keys)
    return np.char.add("e", base62_prefix(h, hash_length))
