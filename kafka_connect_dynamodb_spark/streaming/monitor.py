"""Stream-health monitoring: watermarked tumbling-window event rates.

The reference has no windowed operators (SURVEY §2.9 T3) and the CDC apply
path deliberately avoids watermarks (LWW + resync is its late-data policy,
T2). Operations still needs per-window ingest rates — lag dashboards, shard
imbalance — so this module provides the engine's windowed-aggregation +
watermark surface: tumbling windows over event time, late events beyond the
watermark dropped, per-shard breakdown optional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_rate_stream(events: DataFrame, *, window: str = "5 minutes",
                      watermark: str = "10 minutes",
                      by_shard: bool = False) -> DataFrame:
    """events (streaming or batch) -> per-window counts + seq-no span.

    Watermark bounds state: windows older than max(event time) - watermark
    finalize and evict; events arriving later than that are dropped (the
    monitoring-appropriate policy — the CDC apply path itself never drops
    late events, LWW absorbs them).
    """
    keys = [F.window("ts", window).alias("win")]
    if by_shard:
        keys.append(F.col("shard_id"))
    out = (events.withWatermark("ts", watermark)
                 .groupBy(*keys)
                 .agg(F.count(F.lit(1)).alias("n_events"),
                      F.min("seq_no").alias("min_seq"),
                      F.max("seq_no").alias("max_seq")))
    cols = [F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end")]
    if by_shard:
        cols.append(F.col("shard_id"))
    return out.select(*cols, "n_events", "min_seq", "max_seq")


def session_stream(events: DataFrame, key: str = "user_id", *,
                   gap: str = "30 minutes", ts_col: str = "ts",
                   watermark: str = "1 hour") -> DataFrame:
    """Streaming gap-based sessionization: Spark's built-in
    ``session_window`` under a watermark — sessions finalize (and their
    state evicts) once the watermark passes last-event-time + gap, so state
    is bounded by the active-session population, not history. The batch
    twin is the oracle-checked ``user_sessions`` driver query."""
    sw = F.session_window(F.col(ts_col), gap)
    return (events.withWatermark(ts_col, watermark)
                  .groupBy(F.col(key), sw)
                  .agg(F.count(F.lit(1)).alias("n_events"))
                  .select(key,
                          F.col("session_window.start").alias("session_start"),
                          F.col("session_window.end").alias("session_end"),
                          "n_events"))
