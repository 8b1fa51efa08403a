"""Structured Streaming surfaces: continuous tier refresh + stateful ops."""

from c3s_sm_spark.streaming.frontier import track_frontier_gaps
from c3s_sm_spark.streaming.refresh import stream_pipeline_refresh, stream_daily_rollup

__all__ = ["stream_pipeline_refresh", "stream_daily_rollup", "track_frontier_gaps"]
