"""Streaming deduplication: bounded-state exact dedup over a document/event
stream.

The batch dedup operators (operators/dedup.py) assume the corpus is at rest;
an ingest pipeline also needs dedup ON THE WAY IN — e.g. a crawler re-emits
the same document, or an at-least-once bus redelivers an event. Spark's
``dropDuplicatesWithinWatermark`` is exactly this operator: state holds one
entry per key only until the watermark passes, so memory is bounded by the
redelivery horizon instead of the stream's lifetime (a plain
``dropDuplicates`` on an unbounded stream would grow state forever — the
classic 100 TB footgun).

Two surfaces:

* ``dedup_stream`` — key-exact dedup (first arrival wins) within a
  watermark horizon; keys are arbitrary columns (event_id, or a content
  sha for document streams).
* ``content_dedup_stream`` — convenience wrapper deduping documents by
  ``sha2(content)`` (the X9 invariant hash), the streaming twin of
  ``operators.dedup.exact_duplicates``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(events: DataFrame, keys: list[str], *,
                 ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """First-arrival-wins exact dedup within the watermark horizon.

    State per key is evicted once the watermark passes its event time, so a
    duplicate arriving within ``watermark`` of the original is dropped and
    one arriving later is treated as new — pick the horizon from the bus's
    redelivery bound (the reference's at-least-once window, docs/details.md:33).
    Works on batch DataFrames too (falls back to plain dropDuplicates
    semantics over the whole input).
    """
    wm = events.withWatermark(ts_col, watermark)
    if events.isStreaming:
        return wm.dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def content_dedup_stream(docs: DataFrame, *, content_col: str = "content",
                         ts_col: str = "ts",
                         watermark: str = "1 hour") -> DataFrame:
    """Dedup a document stream by content hash (sha256 of the payload —
    the engine's X9 parity invariant), first arrival wins."""
    hashed = docs.withColumn("_content_sha", F.sha2(F.col(content_col), 256))
    return dedup_stream(hashed, ["_content_sha"], ts_col=ts_col,
                        watermark=watermark).drop("_content_sha")
