from .incremental import (
    ParquetIncrementalSink,
    lookback_start,
)

__all__ = ["ParquetIncrementalSink", "lookback_start"]
