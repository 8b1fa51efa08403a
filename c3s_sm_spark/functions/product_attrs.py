"""Product / global-attribute metadata tables (reference F6).

The reference attaches a per-product global-attribute dict to every file
it writes — ``product_full_name``, ``product``, ``temporal_sampling``,
``cdr``, ``version``, ``resolution``
(``/root/reference/src/c3s_sm/metadata.py:163-177,219-231``) — plus
per-variable attrs (units, full names). The engine keeps the same facts
in two relational forms:

- :func:`global_attrs` — the literal dict for one (freq, cdr) product,
  byte-compatible with the reference's ``global_attr``;
- :func:`product_attr_rows` — the dict as a DataFrame relation so
  attribute metadata joins/filters like any other table (the engine's
  answer to netCDF global attributes is table properties + this
  relation, not an opaque sidecar);
- :meth:`~c3s_sm_spark.sources.tableio.SnapshotTable.set_properties`
  stamps the same dict onto each tier table (Iceberg table-properties
  analog), which :meth:`~c3s_sm_spark.plans.pipeline.TierPipeline.
  table_properties` reads back relationally.

Everything here is literal + pure projection — whole-stage codegen, no
UDF, no scan beyond what the caller joins in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: reference product_datatype_str for the combined product
#: (metadata.py:30-38 via the filename grammar's SSMV unit)
PRODUCT_UNIT = "SSMV"
PRODUCT_SENSOR = "COMBINED"
RESOLUTION = "0.25 degree"
DEFAULT_VERSION = "v202312"

FREQS = ("DAILY", "DEKADAL", "MONTHLY")
CDRS = ("TCDR", "ICDR")

#: per-variable attrs of the engine's tier schema (reference ts_attributes,
#: metadata.py:140-161/205-216 — sm/units, nobs full name)
VARIABLE_ATTRS: dict[str, dict[str, str]] = {
    "v_mean": {"full_name": "Mean value over the window", "units": "unitless"},
    "v_sum": {"full_name": "Window sum (exact integer micro-units)",
              "units": "unitless"},
    "nobs": {"full_name": "Number of valid observations"},
    "flags": {"full_name": "Bitwise union of observation flags"},
    "ts": {"full_name": "Window start timestamp",
           "units": "seconds since 1970-01-01 00:00:00 UTC"},
}


def global_attrs(
    freq: str, cdr: str, version: str = DEFAULT_VERSION
) -> dict[str, str]:
    """The reference's ``global_attr`` dict for one product
    (metadata.py:163-177): full name joined from the product facets."""
    freq_, cdr_ = freq.upper(), cdr.upper()
    full = " ".join(
        ["C3S", "SOILMOISTURE", "L3S", PRODUCT_UNIT, PRODUCT_SENSOR, freq_,
         cdr_, version]
    )
    return {
        "product_full_name": full,
        "product": PRODUCT_SENSOR,
        "temporal_sampling": freq_,
        "cdr": cdr_,
        "version": version,
        "resolution": RESOLUTION,
    }


def product_attr_rows(
    spark: SparkSession, version: str = DEFAULT_VERSION
) -> DataFrame:
    """All (freq x cdr) products' global attrs as one relation:
    ``(freq, cdr, product_full_name, version, resolution)`` — tiny by
    construction (|FREQS| x |CDRS| rows), always broadcastable."""
    rows = [
        (
            a["temporal_sampling"],
            a["cdr"],
            a["product_full_name"],
            a["version"],
            a["resolution"],
        )
        for a in (global_attrs(f, c, version) for f in FREQS for c in CDRS)
    ]
    return spark.createDataFrame(
        rows,
        "freq string, cdr string, product_full_name string, "
        "version string, resolution string",
    )
