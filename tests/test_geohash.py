"""Geohash encoder (F6 analog, LogEntrySolrItem.java:283,304-314)."""

from __future__ import annotations

from pyspark.sql import functions as F

from d1_log_aggregation_spark.functions.geohash import (
    geohash9,
    geohash_encode_py,
)


def test_known_geohash():
    # canonical public test vector
    assert geohash_encode_py(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert geohash_encode_py(57.64911, 10.40744, 9) == "u4pruydqq"
    # reference golden geo point (GeoIPtest.java:95-102: Santa Barbara)
    gh = geohash_encode_py(34.4329, -119.8370, 9)
    assert len(gh) == 9
    assert gh.startswith("9q4")  # Santa Barbara cell


def test_geohash_udf(spark):
    df = spark.createDataFrame(
        [(57.64911, 10.40744), (None, None)], "lat double, lon double"
    )
    out = df.withColumn("gh", geohash9(F.col("lat"), F.col("lon"))).collect()
    assert out[0]["gh"] == "u4pruydqq"
    assert out[1]["gh"] is None
