"""Structured Streaming surface: the streaming twin of the reference's
Lambda handler (decode → normalize → dual-sink fan-out), plus
event-time windowing/watermark operators the reference lacks."""

from .pipeline import (
    dual_sink_fanout,
    hourly_counts,
    replay_dedup,
    session_window_counts,
    sliding_counts,
)

__all__ = [
    "dual_sink_fanout",
    "hourly_counts",
    "replay_dedup",
    "session_window_counts",
    "sliding_counts",
]
