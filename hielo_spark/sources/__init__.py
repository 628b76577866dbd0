"""Python DataSource surfaces (Spark 4 ``pyspark.sql.datasource``)."""

from .iceberg_source import HieloIcebergDataSource, register

__all__ = ["HieloIcebergDataSource", "register"]
