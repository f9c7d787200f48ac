"""Query plans: the per-round DataFrame pipeline + multi-round crawl driver."""
