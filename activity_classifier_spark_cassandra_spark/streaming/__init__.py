"""Structured Streaming analogue of the batch feature pipeline
(SURVEY.md §2.12): watermarked session windows / tumbling windows with
the same feature expressions as operators/features.py."""

from .sessions import (  # noqa: F401
    STREAM_FEATURE_AGGS,
    session_stream_features,
    sliding_stream_features,
    windowed_stream_features,
)
from .stateful import stateful_running_totals  # noqa: F401
