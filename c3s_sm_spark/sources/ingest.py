"""Filename-template ingest: parse archive file names into columns (S3/F1).

Reference semantics: the image stack models a directory of files whose
names follow ``C3S-SOILMOISTURE-L3S-SSM{unit}-{product}-{freq}-{datetime}-
{record}-{version}.{subversion}.nc`` (``/root/reference/src/c3s_sm/
const.py:53``), parsed with the `parse` library per file
(``/root/reference/src/c3s_sm/interface.py:307-313,363-389``) and matched
by sorted directory walks (``/root/reference/src/c3s_sm/misc.py:64-91``).

Spark-first: names are DATA — one ``regexp_extract`` projection at ingest
turns the whole listing into a relation with typed partition columns
(product, freq, ts, record, version), after which everything downstream is
ordinary pruned scans. No per-file Python, no directory walking in the
engine; ``input_file_name()`` supplies the name when ingesting the files
themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: regex equivalent of the reference's parse template (const.py:53).
#: Anchored: the reference's template match is a FULL basename match, so
#: a merely-containing name (an in-flight '....nc.part' download) must
#: not pass the conforming-files filter.
FILENAME_RE = (
    r"^C3S-SOILMOISTURE-L3S-SSM([A-Z]+)-([A-Z]+)-(DAILY|DEKADAL|MONTHLY)-"
    r"(\d{14})-(TCDR|ICDR)-v(\d+\.\d+)\.(\d+)\.nc$"
)

_FIELDS = (
    ("unit", 1, "string"),
    ("product", 2, "string"),
    ("freq", 3, "string"),
    ("dt_raw", 4, "string"),
    ("record", 5, "string"),
    ("version", 6, "string"),
    ("subversion", 7, "string"),
)


def parse_filename(name: Column | str) -> list[Column]:
    """Columns extracted from a template-conforming file name.

    Non-matching names yield empty strings / null ts — filter on
    ``ts IS NOT NULL`` to keep only conforming files (the reference's
    template-match directory filter, ``interface.py:323-361``).
    """
    c = F.col(name) if isinstance(name, str) else name
    base = F.element_at(F.split(c, "/"), -1)
    cols = [
        F.regexp_extract(base, FILENAME_RE, idx).alias(field)
        for field, idx, _t in _FIELDS
    ]
    cols.append(
        # try_to_timestamp, not to_timestamp: under ANSI mode (Spark 4
        # default) a regex-conforming name with an invalid datetime
        # (month 13) must yield null ts — the documented filter contract
        # — instead of throwing and killing the whole listing job
        F.try_to_timestamp(
            F.nullif(F.regexp_extract(base, FILENAME_RE, 4), F.lit("")),
            F.lit("yyyyMMddHHmmss"),
        ).alias("ts")
    )
    return cols


def parse_listing(df: DataFrame, name_col: str = "path") -> DataFrame:
    """Relation of parsed fields for a file-listing DataFrame."""
    return df.select(F.col(name_col), *parse_filename(name_col)).where(
        F.col("ts").isNotNull()
    )


def build_filename(
    unit: Column,
    product: Column,
    freq: Column,
    ts: Column,
    record: Column,
    version: Column,
    subversion: Column,
) -> Column:
    """Inverse of :func:`parse_filename` (reference ``_build_filename``,
    ``interface.py:363-389``) — pure ``format_string``."""
    return F.format_string(
        "C3S-SOILMOISTURE-L3S-SSM%s-%s-%s-%s-%s-v%s.%s.nc",
        unit,
        product,
        freq,
        F.date_format(ts, "yyyyMMddHHmmss"),
        record,
        version,
        subversion,
    )


def year_subdir(ts: Column) -> Column:
    """The reference's ``%Y`` shard routing (``interface.py:291-293``) —
    in the engine this is just a partition column."""
    return F.date_format(ts, "yyyy")
