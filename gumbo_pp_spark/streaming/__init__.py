from .ingest import stream_extract, stream_hourly_counts  # noqa: F401
