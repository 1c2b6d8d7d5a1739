"""Streaming exact deduplication: watermarked ``dropDuplicates`` —
the continuous-ingest twin of the batch ``exact_dedup`` operator
(a training-data pipeline dedups its crawl feed on arrival, not in a
nightly batch).

Semantics + scale contract:

- ``dropDuplicatesWithinWatermark(keys)`` keeps the FIRST arrival of
  each key and holds per-key state only until the watermark passes
  (first-arrival event time + delay) — state is O(keys per watermark
  window), not O(all keys ever), and the dedup key does NOT have to
  contain the event-time column (plain streaming ``dropDuplicates``
  only bounds state when it does, which would change the key).
- Consequence the caller must own: a duplicate arriving later than the
  watermark delay after its first occurrence is NOT deduplicated (its
  state is gone). Choose the delay >= the key recurrence window. The
  harness entry keys on (user_id, event_type, day), whose recurrence
  window is the day itself, with a 7-day delay — so the streamed
  result provably equals batch SELECT DISTINCT.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def streaming_exact_dedup(
    events: DataFrame,
    keys: Sequence[str],
    event_time: str = "ts",
    delay: str = "7 days",
) -> DataFrame:
    """First-arrival-wins dedup on ``keys`` with bounded state.

    Returns only the key columns (the deterministic projection — the
    non-key columns of the first arrival depend on arrival order,
    which a distributed source does not guarantee).
    """
    keys = list(keys)
    deduped = events.withWatermark(event_time, delay).dropDuplicatesWithinWatermark(
        keys
    )
    return deduped.select(*keys)
