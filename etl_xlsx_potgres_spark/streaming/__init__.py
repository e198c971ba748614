from .events_stream import read_events_stream, run_streaming_query

__all__ = ["read_events_stream", "run_streaming_query"]
