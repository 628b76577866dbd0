"""Metadata plane: snapshot / schema / partition-spec DataFrames.

Mirrors the reference's table-metadata model (data.rs:6-148) re-expressed
as Spark DataFrames. With a live Iceberg catalog these frames come from the
``t.snapshots`` / ``t.metadata_log_entries`` metadata tables; in this repo
they come from deterministic fixtures (fixtures.py) so the operators are
testable without a catalog service.
"""
