"""Structured Streaming surfaces: continuous tier refresh + stateful ops."""

from c3s_sm_spark.streaming.frontier import track_frontier_gaps
from c3s_sm_spark.streaming.refresh import (
    stream_daily_rollup,
    stream_dedup,
    stream_pipeline_refresh,
    stream_sessionize,
)

__all__ = [
    "stream_daily_rollup",
    "stream_dedup",
    "stream_pipeline_refresh",
    "stream_sessionize",
    "track_frontier_gaps",
]
