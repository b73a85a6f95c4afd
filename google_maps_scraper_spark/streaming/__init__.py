"""Structured Streaming variants of the engine's dataflows."""

from .stream import (  # noqa: F401
    stream_extract_places,
    stream_windowed_events,
)

__all__ = ["stream_extract_places", "stream_windowed_events"]
