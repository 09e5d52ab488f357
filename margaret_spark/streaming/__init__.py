from margaret_spark.streaming.live import (
    LiveTail,
    stream_changes,
    stream_build_index,
)

__all__ = ["LiveTail", "stream_changes", "stream_build_index"]
