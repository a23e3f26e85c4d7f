from .events import (  # noqa: F401
    hourly_rollup_stream,
    stream_events_from_parquet,
    streaming_dedup,
)
