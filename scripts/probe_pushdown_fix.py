"""Probe: which hit-emission form keeps the exact test OUT of the join
condition? Prints the size of the join condition + plan shape for:
  A) current: where(hit)                     [expected: monster condition]
  B) explode(when(hit, array(struct)))       [check InferFiltersFromGenerate]
  C) where(hit & rand(42) > -1)              [nondeterministic: no pushdown]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from osmwaterwayextractor_spark.operators.geometry_ops import _intersect_catalyst

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import pandas as pd

cov = spark.createDataFrame(
    pd.DataFrame(
        {
            "cell": [1, 1, 2],
            "way_id": [1, 2, 3],
            "lat1": [0.0, 0.5, 1.0],
            "lon1": [0.0, 0.5, 1.0],
            "lat2": [1.0, 1.5, 2.0],
            "lon2": [1.0, 1.5, 2.0],
        }
    )
)

a, b = cov.alias("a"), cov.alias("b")
pairs = (
    a.join(b, F.col("a.cell") == F.col("b.cell"))
    .where(F.col("a.way_id") < F.col("b.way_id"))
    .select(
        F.col("a.way_id").alias("way_a"),
        F.col("a.lat1").alias("a_lat1"), F.col("a.lon1").alias("a_lon1"),
        F.col("a.lat2").alias("a_lat2"), F.col("a.lon2").alias("a_lon2"),
        F.col("b.way_id").alias("way_b"),
        F.col("b.lat1").alias("b_lat1"), F.col("b.lon1").alias("b_lon1"),
        F.col("b.lat2").alias("b_lat2"), F.col("b.lon2").alias("b_lon2"),
    )
    .coalesce(1 << 20)
)

tested = _intersect_catalyst(pairs)

variants = {
    "A_where_hit": tested.where(F.col("hit")).select("plat", "plon").distinct(),
    "B_explode": (
        tested.select(
            F.explode(
                F.when(
                    F.col("hit"),
                    F.array(F.struct(F.col("plat"), F.col("plon"))),
                ).otherwise(F.lit(None))
            ).alias("_pt")
        )
        .select(F.col("_pt.plat").alias("plat"), F.col("_pt.plon").alias("plon"))
        .distinct()
    ),
    "C_rand_filter": (
        tested.where(F.col("hit") & (F.rand(42) > F.lit(-1.0)))
        .select("plat", "plon")
        .distinct()
    ),
}

for name, df in variants.items():
    plan = df._jdf.queryExecution().executedPlan().toString()
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    cond_sizes = [
        len(line) for line in opt.splitlines() if "Join Inner" in line or "Join " in line
    ]
    n_filters = sum(1 for line in opt.splitlines() if "Filter" in line)
    print(f"\n=== {name}: opt plan {len(opt)} chars, join-line sizes {cond_sizes}, "
          f"filters {n_filters}")
    for line in opt.splitlines():
        s = line.strip()
        print("   ", (s[:140] + ("..." if len(s) > 140 else "")))
    rows = df.collect()
    print("    rows:", sorted([tuple(round(v, 6) for v in r) for r in rows]))

spark.stop()
