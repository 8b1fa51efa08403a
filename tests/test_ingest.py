"""Filename-template ingest (S3/F1): parse/build round-trip, non-matching
names rejected, %Y shard routing."""

from __future__ import annotations

from pyspark.sql import functions as F

from c3s_sm_spark.sources.ingest import (
    build_filename,
    parse_filename,
    parse_listing,
    year_subdir,
)


def test_parse_reference_shaped_name(spark):
    name = (
        "img/TCDR/060_dailyImages/combined/2014/"
        "C3S-SOILMOISTURE-L3S-SSMV-COMBINED-DAILY-20140122000000-TCDR-v201801.0.0.nc"
    )
    df = spark.createDataFrame([(name,)], "path string")
    row = df.select(*parse_filename("path")).head()
    assert row["unit"] == "V"
    assert row["product"] == "COMBINED"
    assert row["freq"] == "DAILY"
    assert row["record"] == "TCDR"
    assert row["version"] == "201801.0"
    assert row["subversion"] == "0"
    assert str(row["ts"]) == "2014-01-22 00:00:00"


def test_build_parse_roundtrip(spark):
    df = spark.range(5).select(
        build_filename(
            F.lit("S"),
            F.lit("PASSIVE"),
            F.lit("MONTHLY"),
            F.to_timestamp(F.lit("2020-03-01 00:00:00")),
            F.when(F.col("id") % 2 == 0, "TCDR").otherwise("ICDR"),
            F.lit("202012.0"),
            F.lit("0"),
        ).alias("path"),
        F.col("id"),
    )
    parsed = df.select("id", *parse_filename("path"))
    for r in parsed.collect():
        assert r["product"] == "PASSIVE"
        assert r["record"] == ("TCDR" if r["id"] % 2 == 0 else "ICDR")
        assert str(r["ts"]) == "2020-03-01 00:00:00"


def test_listing_filters_nonconforming(spark):
    df = spark.createDataFrame(
        [
            ("C3S-SOILMOISTURE-L3S-SSMV-ACTIVE-DEKADAL-20190511000000-ICDR-v201912.0.0.nc",),
            ("README.txt",),
            ("C3S-SOILMOISTURE-L3S-SSMV-ACTIVE-WEEKLY-20190511000000-ICDR-v201912.0.0.nc",),
        ],
        "path string",
    )
    out = parse_listing(df)
    assert out.count() == 1
    assert out.head()["freq"] == "DEKADAL"


def test_year_subdir(spark):
    r = spark.range(1).select(
        year_subdir(F.to_timestamp(F.lit("2014-01-22"))).alias("y")
    )
    assert r.head()["y"] == "2014"
