import numpy as np

from osmwaterwayextractor_spark.functions.geodesy import geodesic_m
from osmwaterwayextractor_spark.operators.joins import distance_join, salted_equijoin


def test_distance_join_matches_bruteforce(spark):
    rng = np.random.default_rng(41)
    a = [(int(i), float(la), float(lo)) for i, (la, lo) in enumerate(
        zip(52.5 + rng.uniform(0, 0.02, 80), 13.4 + rng.uniform(0, 0.03, 80)))]
    b = [(int(i + 1000), float(la), float(lo)) for i, (la, lo) in enumerate(
        zip(52.5 + rng.uniform(0, 0.02, 60), 13.4 + rng.uniform(0, 0.03, 60)))]
    da = spark.createDataFrame(a, "id long, lat double, lon double")
    db = spark.createDataFrame(b, "id long, lat double, lon double")
    radius = 300.0
    got = {
        (r["id"], r["id_r"]) for r in distance_join(da, db, radius).collect()
    }
    want = set()
    for ia, la, lo in a:
        d = geodesic_m(
            np.full(len(b), la), np.full(len(b), lo),
            np.array([x[1] for x in b]), np.array([x[2] for x in b]),
        )
        for (ib, _, _), dd in zip(b, d):
            if dd <= radius:
                want.add((ia, ib))
    assert got == want and len(want) > 10


def test_salted_equijoin_equals_plain_join(spark):
    big = spark.range(0, 5000).selectExpr("id % 7 as k", "id as v")
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(7)], "k long, name string"
    )
    plain = {(r["k"], r["v"], r["name"]) for r in big.join(small, "k").collect()}
    salted = {
        (r["k"], r["v"], r["name"])
        for r in salted_equijoin(big, small, "k", buckets=8).collect()
    }
    assert salted == plain
