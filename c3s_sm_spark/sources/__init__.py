"""Sources & sinks: snapshot table layer + ingest helpers."""

from c3s_sm_spark.sources.tableio import SnapshotTable

__all__ = ["SnapshotTable"]
