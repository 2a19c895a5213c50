import numpy as np
import pytest

from osmwaterwayextractor_spark.functions.hashing import (
    base62_prefix,
    edge_ids,
    float_repr,
    node_ids,
    xxh64_ascii,
)

# Published XXH64 seed-0 test vectors.
KNOWN = {
    "": 0xEF46DB3751D8E999,
    "a": 0xD24EC4F1A98C6E5B,
    "abc": 0x44BC2CF5AD770999,
}


def test_known_vectors():
    keys = np.array(list(KNOWN.keys()))
    got = xxh64_ascii(keys)
    for k, g in zip(KNOWN.keys(), got):
        assert int(g) == KNOWN[k], k


def test_matches_spark_xxhash64_seed42(spark):
    """Spark's builtin xxhash64 hashes a string's UTF-8 bytes with XXH64
    seed 42 — a JVM cross-check of every code path (short, 4/8-byte tails,
    >=32-byte stripes)."""
    rng = np.random.default_rng(7)
    alphabet = np.array(list("0123456789abcdefghijklmnopqrstuvwxyz-.,"))
    strings = []
    for n in list(range(0, 40)) + [63, 64, 65, 100, 129]:
        strings.append("".join(rng.choice(alphabet, size=n)))
    mine = xxh64_ascii(np.array(strings), seed=42).astype(np.int64)
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    from pyspark.sql import functions as F

    theirs = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert list(mine) == theirs


def test_base62_matches_reference_algorithm():
    def ref_base62(num: int) -> str:
        if num == 0:
            return "0"
        chars = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        result = ""
        while num > 0:
            result = chars[num % 62] + result
            num //= 62
        return result

    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [
            rng.integers(0, 2**64, size=200, dtype=np.uint64),
            np.array([0, 1, 61, 62, 63, 62**7 - 1, 62**7, 2**64 - 1], dtype=np.uint64),
        ]
    )
    got = base62_prefix(vals, 8)
    for v, g in zip(vals, got):
        assert g == ref_base62(int(v))[:8]


def test_float_repr_matches_python():
    vals = [52.5, 13.41, -0.000125, 52.51234, -179.99999, 0.0, -0.0, 1e-05, 123456.78901]
    got = float_repr(np.array(vals))
    for v, g in zip(vals, got):
        assert g == repr(v)


def test_node_edge_ids_reference_shape():
    """Cross-check the full id pipeline against a literal scalar port of
    IDGenerator (reference :1090-1150) using pure-Python xxh64 via the
    vectorized kernel on singleton arrays."""
    lats = np.array([52.5, 52.51, -10.123456789, 0.0])
    lons = np.array([13.4, 13.41, -75.987654321, 0.0])
    nids = node_ids(lats, lons, precision=5)
    for nid, lat, lon in zip(nids, lats, lons):
        rlat, rlon = round(float(lat), 5), round(float(lon), 5)
        key = f"{rlat},{rlon}"
        h = int(xxh64_ascii(np.array([key]))[0])
        assert nid == "n" + _b62(h)[:8]
        assert nid.startswith("n") and len(nid) == 9

    eids = edge_ids(
        np.array(["nAAAA1111", "nBBBB2222"]),
        np.array(["nCCCC3333", "nDDDD4444"]),
        np.array([17, 123456789]),
        np.array([0, 3]),
    )
    key = "nAAAA1111-nCCCC3333-17-0"
    h = int(xxh64_ascii(np.array([key]))[0])
    assert eids[0] == "e" + _b62(h)[:8]


def _b62(num: int) -> str:
    if num == 0:
        return "0"
    chars = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    out = ""
    while num > 0:
        out = chars[num % 62] + out
        num //= 62
    return out


def test_non_ascii_rejected():
    with pytest.raises(ValueError):
        xxh64_ascii(np.array(["héllo"]))
