"""Shared snapshot-lineage helpers (pure Python — usable from the JVM
read plane, the commit plane, AND DataSource worker processes). One
implementation of the walk-parent-ids-from-current loop that timestamp
travel, ref-aware expiration, and the DataSource planner all depend on,
so branch-lineage semantics can never diverge between planes (r5
review finding: four hand-rolled copies)."""

from __future__ import annotations


def main_line_ids(doc: dict) -> set[int]:
    """Snapshot ids on the MAIN branch: ancestors of
    ``current-snapshot-id`` via ``parent-snapshot-id`` lineage. Empty
    when the table has no current pointer (legacy/synthetic) — callers
    treat that as 'no lineage information', not 'no snapshots'."""
    by_id = {int(s["snapshot-id"]): s for s in doc.get("snapshots", [])}
    cur = doc.get("current-snapshot-id")
    out: set[int] = set()
    if cur is None:
        return out
    walk = int(cur)
    while walk in by_id and walk not in out:
        out.add(walk)
        parent = by_id[walk].get("parent-snapshot-id")
        if parent is None:
            break
        walk = int(parent)
    return out


def ancestor_ids(doc: dict, head_id: int, stop_at: set[int] | None = None) -> set[int]:
    """Ids reachable from ``head_id`` via parent lineage, stopping
    (exclusive) at any id in ``stop_at`` — the branch-only-ancestry set
    when ``stop_at`` is the main line."""
    by_id = {int(s["snapshot-id"]): s for s in doc.get("snapshots", [])}
    out: set[int] = set()
    walk = int(head_id)
    stop = stop_at or set()
    while walk in by_id and walk not in out and walk not in stop:
        out.add(walk)
        parent = by_id[walk].get("parent-snapshot-id")
        if parent is None:
            break
        walk = int(parent)
    return out
