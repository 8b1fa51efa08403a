"""Bitfield meaning tables + decode expressions (reference F4).

The reference attaches flag meaning tables to every product variable —
``sensor``/``freqbandID``/``flag`` bitmasks with one meaning per bit
(``/root/reference/src/c3s_sm/metadata.py:41-116``; e.g. monthly sensor
768 = Bit8|Bit9 = ASCATA+ASCATB, asserted in
``/root/reference/tests/test_reshuffle.py:164``). The engine keeps the
same tables as plain dicts and decodes masks relationally: a decode is a
projection over literal ``when`` branches (whole-stage codegen, no UDF,
no join), so it composes with the A3 ``bit_or`` window aggregates for
free. Parity with the reference's tables is pinned in
``tests/test_ingest.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: bit -> sensor name (metadata.py:88-99, sensor_flag)
SENSOR_BITS: dict[int, str] = {
    0: "SMMR",
    1: "SSMI",
    2: "TMI",
    3: "AMSRE",
    4: "WindSat",
    5: "AMSR2",
    6: "SMOS",
    7: "AMIWS",
    8: "ASCATA",
    9: "ASCATB",
}

#: bit -> frequency band (metadata.py:69-79, freqbandID_flag)
FREQBAND_BITS: dict[int, str] = {
    0: "L14",
    1: "C53",
    2: "C66",
    3: "C68",
    4: "C69",
    5: "C73",
    6: "X107",
    7: "K194",
}

#: bit -> quality-flag meaning (metadata.py:53-61, flag)
QUALITY_BITS: dict[int, str] = {
    0: "snow_coverage_or_temperature_below_zero",
    1: "dense_vegetation",
    2: "others_no_convergence_in_the_model_thus_no_valid_sm_estimates",
    3: "soil_moisture_value_exceeds_physical_boundary",
    4: "weight_of_measurement_below_threshold",
    5: "all_datasets_deemed_unreliable",
}


def _branches(mask: Column, table: dict[int, str]) -> list[Column]:
    return [
        F.when(mask.bitwiseAND(F.lit(1 << bit)) != 0, F.lit(name))
        for bit, name in sorted(table.items())
    ]


def decode_bits(mask: Column, table: dict[int, str]) -> Column:
    """Array of meanings for the set bits of ``mask`` (bit order)."""
    return F.array_compact(F.array(*_branches(mask, table)))


def decode_bits_csv(mask: Column, table: dict[int, str]) -> Column:
    """Comma-joined meanings for the set bits — ``concat_ws`` skips the
    NULL branches identically in Spark and DuckDB, so this form is usable
    in oracle-checked driver queries."""
    return F.concat_ws(",", *_branches(mask, table))


def decode_sensors(mask: Column) -> Column:
    return decode_bits(mask, SENSOR_BITS)


def decode_freqbands(mask: Column) -> Column:
    return decode_bits(mask, FREQBAND_BITS)
