"""Streaming deduplication over the events feed.

`dropDuplicatesWithinWatermark`: exact-once filtering of replayed /
at-least-once-delivered records. State holds one entry per id seen within
the watermark horizon and is evicted once the watermark passes — bounded
memory on an unbounded stream, unlike plain `dropDuplicates`, whose state
grows forever. The id can be a real event id or a content fingerprint
(`operators/text.fingerprint`) for streaming *content* dedup — the same
X1 exact-dedup semantics, applied at ingest instead of in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop records whose `id_cols` were already seen within the
    watermark horizon. Shuffle keyed on the id columns; state bounded by
    ids-per-horizon."""
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )
