"""Structured Streaming surfaces: continuous tier refresh."""

from c3s_sm_spark.streaming.refresh import stream_pipeline_refresh, stream_daily_rollup

__all__ = ["stream_pipeline_refresh", "stream_daily_rollup"]
