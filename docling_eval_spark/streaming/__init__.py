from .ingest import start_ingest, streaming_extract, windowed_throughput  # noqa: F401
