"""hielo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference Iceberg-metadata tool
(atcol/hielo, surveyed in SURVEY.md), plus large-scale LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Layers (SURVEY.md §7):
  session   — SparkSession factory / configuration
  io        — fixture/table loaders (parquet)
  catalog   — connection profiles (S1-S4, S9) + browse/search (F2-F4, F9)
  metadata  — snapshot/schema/partition-spec DataFrames (S7-S8, J1-J3, F1, O1, O6)
  analytics — table-health suite (A1-A12)
  functions — scalar column helpers (C1-C8)
  operators — [EXT] dedup / similarity / text / multimodal (X1-X5)
  streaming — structured-streaming ingestion of the events feed

Everything compiles to Spark DataFrame plans; no custom execution engine.
"""

__version__ = "0.1.0"
