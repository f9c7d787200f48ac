"""Structured Streaming variant of the crawl round (foreachBatch)."""
