"""Structured Streaming surfaces: continuous tier refresh + stateful ops."""

from c3s_sm_spark.streaming.frontier import track_frontier_gaps
from c3s_sm_spark.streaming.refresh import (
    stream_daily_rollup,
    stream_dedup,
    stream_pipeline_refresh,
    stream_sessionize,
    stream_sliding_rollup,
)
from c3s_sm_spark.streaming.stateful import stream_ewma

__all__ = [
    "stream_daily_rollup",
    "stream_dedup",
    "stream_ewma",
    "stream_pipeline_refresh",
    "stream_sessionize",
    "stream_sliding_rollup",
    "track_frontier_gaps",
]
