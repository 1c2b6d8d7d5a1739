from .sessionize_stream import streaming_runtime_per_day, streaming_sessionize

__all__ = ["streaming_sessionize", "streaming_runtime_per_day"]
