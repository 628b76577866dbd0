"""Query registry: every implemented operator from SURVEY.md §2 exposed as
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB
oracle string over the same parquet tables.

Conventions (driver contract, __spark_entry__.py):
  * every computed column is aliased identically in Spark and SQL;
  * no raw timestamp columns in outputs — formatted strings instead
    (dtype-stable across engines);
  * sums/avgs of doubles are rounded (2/6 dp) so partial-aggregation
    ordering noise can't flip the value hash;
  * integer outputs are BIGINT on both sides (DuckDB sum() yields HUGEINT —
    always cast).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import ext, meta, relational

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for mod in (relational, meta, ext):
    QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)
