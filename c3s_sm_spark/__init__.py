"""c3s_sm_spark — a from-scratch, PySpark-native time-series rollup +
downsample + retention engine with the query/data-processing capabilities
of the reference ``wpreimes/c3s_sm`` (see ``SURVEY.md``).

Architecture (Spark-first, not a port):

- ``session``    — SparkSession builder (Arrow on, AQE on, UTC).
- ``synth``      — deterministic synthetic source tables (the ``input_hint``
                   sequences table and the derived raw points table), built
                   entirely from JVM-side expressions (no driver loops).
- ``operators``  — calendar/dekad grids, gap-fill, keep-latest dedup,
                   cascading tier rollups, salted repartition, text dedup,
                   similarity search, text stats, multimodal plumbing.
- ``functions``  — packed-series codecs (delta-of-delta timestamps +
                   Gorilla-XOR values, vectorized numpy in pandas UDFs),
                   bitflag helpers.
- ``sources``    — TableIO: snapshot-manifest Parquet tables with atomic
                   append / overwrite-partition semantics (Iceberg-style;
                   the Iceberg runtime jar is not available offline, so the
                   same contract is provided over Parquet + JSON manifests).
- ``plans``      — the rollup pipeline (raw -> daily -> dekadal -> monthly)
                   with lineage + metrics tables and resumable extend.
"""

__version__ = "0.1.0"
