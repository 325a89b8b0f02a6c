"""Change-feed mirroring: the table -> event -> table composition as a
first-class operator.

The reference's output is a Kafka topic that downstream consumers replay
into their own stores (README.md:21-27); here the analog is a second
LakeTable fed solely by the primary's published change feed. Exactly-once
end-to-end comes from two idempotence layers composed: the Structured
Streaming checkpoint WAL pins which feed files belong to each micro-batch,
and ``LakeTable.merge``'s ``committed[source]=batch_id`` guard makes a
redelivered batch a no-op — so a consumer killed mid-batch and restarted
converges to sha-parity with the primary (pinned by
tests/test_change_feed.py::test_downstream_table_exactly_once_via_feed).

Scale note: the feed carries per-commit compacted deltas (LWW winners,
~|changed keys| rows), so a mirror's work is proportional to churn, not
table size — the whole point of CDC composition at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from kafka_connect_dynamodb_spark.lake.table import LakeTable


def mirror_changes(spark: SparkSession, primary: LakeTable,
                   downstream: LakeTable, *, checkpoint_dir: str,
                   source: str = "feed",
                   available_now: bool = True,
                   processing_time: str | None = None) -> StreamingQuery:
    """Apply the primary's change feed to ``downstream`` with exactly-once
    semantics. Bootstrap the downstream from a snapshot of the primary
    first (``downstream.create(spark, primary.read(spark), ...)``); the
    feed then keeps it converged incrementally.

    ``available_now=True`` drains the published feed and stops (catch-up
    mode); ``processing_time`` runs a continuous mirror.
    """

    def _apply(batch_df, batch_id: int):
        downstream.merge(batch_df.sparkSession, batch_df,
                         batch_id=batch_id, source=source)

    writer = (primary.stream_changes(spark)
              .writeStream.foreachBatch(_apply)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
