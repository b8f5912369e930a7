"""Structured Streaming variant of the epoch pipeline (see crawl_stream)."""
