"""Skew utilities: salted aggregation/join equal their plain forms."""

from pyspark.sql import functions as F

from fhc_rco_etl_scalable_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
)


def test_salted_aggregate_equals_plain(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(500)] + [("cold", 1.0)],
        "k string, v double",
    )
    plain = {
        (r.k): (round(r.total, 6), r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    salted = {
        (r.k): (round(r.total, 6), r.n)
        for r in salted_aggregate(
            df,
            ["k"],
            partial_aggs={"total": F.sum("v"), "n": F.count("*")},
            merge_aggs={"total": F.sum("total"), "n": F.sum("n")},
        ).collect()
    }
    assert plain == salted


def test_salted_broadcast_left_equals_plain(spark):
    fact = spark.createDataFrame(
        [("hot", i) for i in range(200)] + [("cold", 0), ("orphan", 9)],
        "k string, x int",
    )
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, label string")
    plain = sorted((r.k, r.x, r.label) for r in fact.join(dim, "k", "left").collect())
    salted = sorted(
        (r.k, r.x, r.label)
        for r in salted_broadcast_left(fact, dim, ["k"], salt_buckets=4).collect()
    )
    assert plain == salted  # incl. orphan key with NULL label
