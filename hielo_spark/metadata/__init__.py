"""Metadata plane: snapshot / schema / partition-spec DataFrames.

Mirrors the reference's table-metadata model (data.rs:6-148) re-expressed
as Spark DataFrames. With a live Iceberg catalog these frames come from the
``t.snapshots`` / ``t.metadata_log_entries`` metadata tables; in this repo
they come from deterministic fixtures (fixtures.py) so the operators are
testable without a catalog service.

The table WRITE plane (commit.py) and executable read plane (manifests.py)
are re-exported here as the engine's stable API: ``append`` /
``delete_where`` / ``merge_into`` / ``rewrite_data_files`` for data
commits, ``update_schema`` / ``update_partition_spec`` /
``update_sort_order`` for metadata-only evolution commits
(reference ``data.rs:21-33``, ``components.rs:533-597``), and
``read_data_at_snapshot`` for time travel.
"""

from .commit import (  # noqa: F401
    add_files,
    append,
    overwrite_partitions,
    update_where,
    cherrypick_snapshot,
    create_ref,
    current_metadata_path,
    delete_equality,
    delete_where,
    drop_ref,
    expire_snapshots,
    fast_forward,
    merge_into,
    rewrite_data_files,
    rewrite_deletion_vectors,
    rewrite_manifests,
    rewrite_position_deletes,
    set_current_snapshot,
    set_table_properties,
    update_partition_spec,
    update_schema,
    update_sort_order,
    upgrade_format_version,
)
from .manifests import read_data_at_snapshot  # noqa: F401
from .partition_stats import (  # noqa: F401
    partition_skew_report,
    read_partition_statistics,
    write_partition_statistics,
)
from .puffin import ndv_of, write_statistics  # noqa: F401

__all__ = [
    "add_files",
    "append",
    "overwrite_partitions",
    "update_where",
    "cherrypick_snapshot",
    "create_ref",
    "current_metadata_path",
    "delete_equality",
    "delete_where",
    "drop_ref",
    "expire_snapshots",
    "fast_forward",
    "merge_into",
    "ndv_of",
    "partition_skew_report",
    "read_data_at_snapshot",
    "read_partition_statistics",
    "rewrite_data_files",
    "rewrite_deletion_vectors",
    "rewrite_manifests",
    "rewrite_position_deletes",
    "set_current_snapshot",
    "set_table_properties",
    "update_partition_spec",
    "update_schema",
    "update_sort_order",
    "upgrade_format_version",
    "write_partition_statistics",
    "write_statistics",
]
