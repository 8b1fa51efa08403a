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


def test_template_parity_with_reference_fntempl(spark):
    """Round-trip against the REFERENCE's actual template constant
    (/root/reference/src/c3s_sm/const.py:53, formatted exactly as
    interface._build_filename does): names built by the reference
    template must parse back field-for-field, and build_filename must
    emit the identical string."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    from c3s_sm.const import fntempl

    # field shapes copied from the reference's own test fixtures, e.g.
    # C3S-SOILMOISTURE-L3S-SSMV-COMBINED-DAILY-20140101000000-TCDR-
    # v201801.0.0.nc (/root/reference/tests/test_reshuffle.py)
    cases = [
        dict(unit="V", product="COMBINED", freq="DAILY",
             datetime="20140101000000", record="TCDR", version="v201801.0",
             subversion="0"),
        dict(unit="V", product="PASSIVE", freq="DEKADAL",
             datetime="20200221000000", record="ICDR", version="v202212.0",
             subversion="1"),
        dict(unit="S", product="ACTIVE", freq="MONTHLY",
             datetime="20191201000000", record="TCDR", version="v201801.0",
             subversion="12"),
    ]
    names = [fntempl.format(**c) for c in cases]
    df = spark.createDataFrame([(n,) for n in names], "path string")
    got = {r["path"]: r.asDict() for r in parse_listing(df).collect()}
    for c, n in zip(cases, names):
        r = got[n]
        assert r["product"] == c["product"] and r["freq"] == c["freq"]
        assert r["record"] == c["record"]
        assert r["dt_raw"] == c["datetime"]
        assert "v" + r["version"] == c["version"]
        assert r["subversion"] == c["subversion"]
    # build side: identical string to the reference template
    from c3s_sm_spark.sources.ingest import build_filename

    src = spark.createDataFrame(
        [("V", "COMBINED", "DAILY", "2014-01-01 00:00:00", "TCDR", "201801.0", "0")],
        "unit string, product string, freq string, ts string, record string, "
        "version string, subversion string",
    ).select(
        build_filename(
            F.col("unit"), F.col("product"), F.col("freq"),
            F.col("ts").cast("timestamp"), F.col("record"),
            F.col("version"), F.col("subversion"),
        ).alias("name")
    )
    assert src.head()["name"] == fntempl.format(
        unit="V", product="COMBINED", freq="DAILY",
        datetime="20140101000000", record="TCDR", version="v201801.0",
        subversion="0",
    )


def test_bitflag_tables_match_reference_metadata(spark):
    """The engine's bit->meaning tables must equal the reference's
    (/root/reference/src/c3s_sm/metadata.py:41-116), and decoding the
    golden monthly sensor mask 768 must yield ASCATA+ASCATB (the value
    the reference's own reshuffle test asserts,
    /root/reference/tests/test_reshuffle.py:164)."""
    import sys
    import types

    for name in ("netCDF4", "xarray", "parse", "cdsapi"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.path.insert(0, "/root/reference/src")
    from c3s_sm.metadata import C3S_SM_TS_Attrs

    from c3s_sm_spark.functions.bitflags import (
        FREQBAND_BITS,
        QUALITY_BITS,
        SENSOR_BITS,
        decode_bits_csv,
        decode_sensors,
    )

    attrs = C3S_SM_TS_Attrs.__new__(C3S_SM_TS_Attrs)  # tables need no init
    values, meanings = attrs.sensor_flag()
    ref_sensor = {
        int(v[3:]): m for v, m in zip(values, meanings) if v.startswith("Bit")
    }
    assert ref_sensor == SENSOR_BITS
    values, meanings = attrs.freqbandID_flag()
    ref_freq = {
        int(v[3:]): m for v, m in zip(values, meanings) if v.startswith("Bit")
    }
    assert ref_freq == FREQBAND_BITS
    values, meanings = attrs.flag()
    ref_q = {
        int(v[3:]): m
        for v, m in zip(values, meanings)
        if v.startswith("Bit") and m != "NaN"
    }
    assert ref_q == QUALITY_BITS

    df = spark.createDataFrame([(768,), (256,), (0,), (1 << 6,)], "mask int")
    got = {
        r["mask"]: (r["names"], r["csv"])
        for r in df.select(
            "mask",
            decode_sensors(F.col("mask")).alias("names"),
            decode_bits_csv(F.col("mask"), SENSOR_BITS).alias("csv"),
        ).collect()
    }
    assert got[768] == (["ASCATA", "ASCATB"], "ASCATA,ASCATB")
    assert got[256] == (["ASCATA"], "ASCATA")
    assert got[0] == ([], "")
    assert got[64] == (["SMOS"], "SMOS")


def test_parse_listing_invalid_datetime_and_partial_files(spark):
    """Hardening: a regex-shaped name with an impossible datetime (month
    13) must yield null ts and be FILTERED, not throw under ANSI mode;
    an in-flight '.nc.part' download must not pass the template filter
    (the reference's template match is a full-basename match)."""
    from c3s_sm_spark.sources.ingest import parse_listing

    names = [
        "C3S-SOILMOISTURE-L3S-SSMV-COMBINED-DAILY-20200101000000-TCDR-v201912.0.0.nc",
        # month 13: regex-conforming, datetime-invalid
        "C3S-SOILMOISTURE-L3S-SSMV-COMBINED-DAILY-20201399000000-TCDR-v201912.0.0.nc",
        # partial download: contains a conforming substring
        "C3S-SOILMOISTURE-L3S-SSMV-COMBINED-DAILY-20200102000000-TCDR-v201912.0.0.nc.part",
        "unrelated.txt",
    ]
    df = spark.createDataFrame([(n,) for n in names], ["path"])
    got = [r["path"] for r in parse_listing(df).collect()]
    assert got == [names[0]]
