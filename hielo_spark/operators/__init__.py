"""[EXT] LLM-data-pipeline operators (SURVEY §2.8 X1-X5): dedup,
similarity search, text analysis, multimodal column plumbing. Designed for
100 TB inputs: no driver-side collects, broadcast/bucket joins instead of
cross joins, built-in functions over Python UDFs wherever possible."""
