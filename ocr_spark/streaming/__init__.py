"""Structured Streaming ingest of pages (readStream -> extract -> sink)."""

from ocr_spark.streaming.extract_stream import run_stream_once  # noqa: F401
