"""S11/S12 — executable maintenance + time travel (SURVEY §2.1).

The reference only *recommends* maintenance (MaintenanceActionType,
data.rs:315-321; analytics.rs:442-507); Spark's Iceberg integration makes
the recommendations executable via stored procedures. This module turns a
recommendation row into the corresponding `CALL catalog.system.*`
statement and runs it when an Iceberg catalog is attached.

Environment note: the iceberg-spark runtime jar is not present in this
build sandbox, so `execute(...)` raises a clear error unless the catalog
plugin resolves; SQL generation (the logic under test) is pure.

No-jar alternative (r4): for Hadoop-catalog table DIRECTORIES,
``metadata/commit.py`` executes append / delete_equality /
rewrite_data_files (compaction as a REPLACE snapshot) /
rollback_to_snapshot / set_current_snapshot / expire_snapshots for real
— own Avro manifests + metadata.json version bump with the
optimistic-concurrency rename protocol — and ``ops/analysis.py``
executes remove_orphan_files (distributed sweep with the modification-
time safety window), so the full recommendation → action loop closes
without the jar in the no-service catalog mode."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def _q(v: str | int | float | bool) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


@dataclass
class MaintenanceOp:
    catalog: str
    table: str  # namespace.table

    def _call(self, proc: str, raw: dict[str, str] | None = None, **kwargs) -> str:
        parts = [f"table => {_q(self.table)}"]
        parts += [f"{k} => {_q(v)}" for k, v in kwargs.items()]
        parts += [f"{k} => {v}" for k, v in (raw or {}).items()]  # pre-rendered exprs (maps)
        return f"CALL {self.catalog}.system.{proc}({', '.join(parts)})"

    # --- the actions behind analytics recommendations (A11 → executable) ---
    def rewrite_data_files(self, strategy: str = "binpack", target_file_size_bytes: int | None = None) -> str:
        """Compaction — answers 'small_files' / 'compaction_needed'."""
        raw = None
        if target_file_size_bytes is not None:
            raw = {"options": f"map('target-file-size-bytes', '{target_file_size_bytes}')"}
        return self._call("rewrite_data_files", raw=raw, strategy=strategy)

    def expire_snapshots(self, older_than: str, retain_last: int = 1) -> str:
        """Retention — answers 'retention_policy' (storage growth)."""
        return self._call("expire_snapshots", older_than=older_than, retain_last=retain_last)

    def remove_orphan_files(self, older_than: str) -> str:
        return self._call("remove_orphan_files", older_than=older_than)

    def rewrite_manifests(self) -> str:
        return self._call("rewrite_manifests")

    def add_files(self, source_table: str, check_duplicate_files: bool = True) -> str:
        """Metadata-only import of an existing hive/parquet table's files
        (no rewrite) - the onboarding procedure; the no-jar half is
        metadata.commit.add_files."""
        return self._call(
            "add_files", source_table=source_table,
            check_duplicate_files=check_duplicate_files,
        )

    def snapshot(self, source_table: str, location: str | None = None) -> str:
        """Iceberg snapshot procedure: a TEMPORARY Iceberg table over an
        existing hive table's files (testing a migration without
        touching the source). Table arg is the NEW table name."""
        kwargs = {"source_table": source_table}
        if location is not None:
            kwargs["location"] = location
        return self._call("snapshot", **kwargs)

    def migrate(self) -> str:
        """Iceberg migrate procedure: replace a hive table with an
        Iceberg table over the same files (in-place, metadata-only -
        add_files' whole-table sibling)."""
        return self._call("migrate")

    def rollback_to_snapshot(self, snapshot_id: int) -> str:
        return self._call("rollback_to_snapshot", snapshot_id=snapshot_id)

    def set_current_snapshot(self, snapshot_id: int) -> str:
        return self._call("set_current_snapshot", snapshot_id=snapshot_id)

    def execute(self, spark: SparkSession, sql: str) -> DataFrame:
        try:
            return spark.sql(sql)
        except Exception as e:  # pragma: no cover - needs the Iceberg jar
            raise RuntimeError(
                f"Iceberg procedure failed (is the iceberg-spark runtime on the classpath?): {sql}"
            ) from e


# --- S12: time travel ------------------------------------------------------

def read_snapshot(spark: SparkSession, table: str, snapshot_id: int) -> DataFrame:
    """VERSION AS OF — read the table as of a snapshot id."""
    return spark.read.option("snapshot-id", str(snapshot_id)).table(table)


def read_as_of(spark: SparkSession, table: str, timestamp: str) -> DataFrame:
    """TIMESTAMP AS OF — read the table as of a wall-clock instant."""
    return spark.read.option("as-of-timestamp", timestamp).table(table)


def time_travel_sql(table: str, *, snapshot_id: int | None = None, timestamp: str | None = None) -> str:
    if (snapshot_id is None) == (timestamp is None):
        raise ValueError("exactly one of snapshot_id / timestamp")
    if snapshot_id is not None:
        return f"SELECT * FROM {table} VERSION AS OF {snapshot_id}"
    return f"SELECT * FROM {table} TIMESTAMP AS OF '{timestamp}'"
