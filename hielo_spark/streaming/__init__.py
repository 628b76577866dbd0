"""Structured Streaming ingestion (SURVEY §1.4/§2.7 [EXT]): the reference
is batch-only; this layer shows the same event-time computations running
incrementally with watermarks."""
