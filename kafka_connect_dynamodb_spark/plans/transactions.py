"""Cross-table transaction-consistent CDC apply (Debezium tx metadata).

The reference streams each DynamoDB table independently — DynamoDB CDC has
no cross-table transactions, so per-table apply is all the connector needs
(``DynamoDBSourceTask.java``, one task per table by design). Relational
CDC sources — the Debezium envelopes this engine already speaks
(``sources/debezium.py``) — DO emit multi-table transactions: every data
event carries ``transaction.id`` and the transaction's END boundary event
declares its total event count. This module closes that gap Spark-side:

* **boundary completeness** — a transaction is applicable only when every
  one of its declared events has arrived (count received == count
  declared by the END marker);
* **contiguous watermark** — transactions apply strictly in tx-id order:
  the apply stops at the FIRST incomplete transaction, i.e. the watermark
  ``W`` is the largest id such that every transaction with id <= W is
  complete. No later transaction can surface before an earlier one, which
  is what makes the resulting view a transaction-consistent prefix of the
  source history;
* **idempotent group apply** — each table's merge is guarded by
  ``batch_id = W`` under a shared source name, so crash-redelivery skips
  tables already at W and completes the rest (heal-forward, the same
  exactly-once discipline as ``streaming/tail.py``);
* **coordinated snapshot** — after the group apply, ONE atomic
  ``put_if_absent`` publishes ``{watermark, table -> version}``. Readers
  resolve cross-table views from the snapshot record, never from "current
  version", so a half-applied group (crash between two table commits) is
  never observable: the record for W only exists after every table
  reached W.

Scale shape: completeness is one map-side-combined count per tx joined to
the boundary table (broadcast when small); the watermark is two bounded
scalar aggregates; the per-table slices reuse the bucket-pruned LWW MERGE.
Nothing driver-side grows with data volume — only with the number of
distinct tables in the batch.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.commitio import CommitConflict, CommitIO, RenameCommitIO
from ..lake.table import LakeTable
from ..operators.lww import latest_per_key


def tx_watermark(events: DataFrame, boundaries: DataFrame) -> int:
    """Largest tx id whose every predecessor (itself included) is
    complete; one less than the first open tx id when the prefix is
    broken, -1 on an entirely empty log.

    ``events``: data events with a ``tx_id`` column. ``boundaries``: one
    row per transaction — ``(tx_id, event_count)`` from the END markers.
    A transaction with a boundary but no/partial events is incomplete; a
    transaction with events but no boundary row yet is incomplete too
    (its END marker has not arrived)."""
    counts = events.groupBy("tx_id").agg(F.count("*").alias("_got"))
    st = (boundaries.select("tx_id", "event_count")
          .join(counts, "tx_id", "full")
          .select("tx_id",
                  (F.coalesce("_got", F.lit(0)) == F.col("event_count"))
                  .alias("_ok")))
    row = st.agg(
        F.min(F.when(~F.coalesce("_ok", F.lit(False)), F.col("tx_id")))
         .alias("first_bad"),
        F.max("tx_id").alias("last")).collect()[0]
    if row.last is None:
        return -1
    if row.first_bad is None:
        return int(row.last)
    return int(row.first_bad) - 1


class TxCoordinator:
    """Group-apply a multi-table CDC transaction log into per-table lake
    tables with a cross-table consistent snapshot record per watermark.

    Layout: ``root/<table>/`` per lake table, ``root/_tx/snap-<W>.json``
    per coordinated snapshot."""

    SOURCE = "txcoord"

    def __init__(self, spark: SparkSession, root: str, *,
                 key_cols: list[str], n_buckets: int = 8,
                 io: CommitIO | None = None):
        self.spark = spark
        self.root = root.rstrip("/")
        self.key_cols = list(key_cols)
        self.n_buckets = n_buckets
        self.io = io or RenameCommitIO()
        self._snap_dir = f"{self.root}/_tx"

    # ------------------------------------------------------------- tables
    def table(self, name: str) -> LakeTable:
        return LakeTable(f"{self.root}/{name}", io=self.io)

    # ---------------------------------------------------------- snapshots
    def snapshot(self) -> dict[str, Any] | None:
        """The latest coordinated snapshot record, or None before the
        first group apply. ``{"watermark": W, "tables": {name: version}}``
        — every version in it was committed BEFORE the record was
        published, so reading those versions is cross-table consistent."""
        if not self.io.is_dir(self._snap_dir):
            return None
        best = -1
        for name in self.io.list_dir(self._snap_dir):
            if name.startswith("snap-") and name.endswith(".json"):
                try:
                    best = max(best, int(name[5:-5]))
                except ValueError:
                    continue
        if best < 0:
            return None
        return json.loads(
            self.io.read_text(f"{self._snap_dir}/snap-{best}.json"))

    def read_consistent(self, spark: SparkSession, name: str,
                        **kw) -> DataFrame:
        """Read ``name`` at the version pinned by the latest coordinated
        snapshot (NOT the current version — a concurrent group apply must
        not tear a multi-table read)."""
        snap = self.snapshot()
        if snap is None or name not in snap["tables"]:
            raise FileNotFoundError(
                f"no coordinated snapshot covers table {name!r}")
        return self.table(name).read(spark, version=snap["tables"][name],
                                     **kw)

    # -------------------------------------------------------------- apply
    def apply(self, events: DataFrame,
              boundaries: DataFrame) -> dict[str, Any]:
        """Apply the maximal contiguous prefix of complete transactions.

        ``events`` columns: ``tx_id`` (long), ``table`` (string), the key
        columns, payload columns, ``_op`` ('c'/'u'/'d'/'r'), ``_seq``
        (total per-key order, e.g. the Debezium adapter's decimal).
        ``boundaries``: ``(tx_id, event_count)`` END markers.

        Idempotent and incremental: re-invoking on a grown log applies
        only transactions past the previous watermark (per-table batch-id
        guard); re-invoking after a crash mid-group completes the
        stragglers and then publishes the snapshot record."""
        w = tx_watermark(events, boundaries)
        prev = self.snapshot()
        prev_w = prev["watermark"] if prev else -1
        if w < 0 and prev_w >= 0:
            # an entirely empty log after applied transactions were pruned
            # from pending storage (streaming/txingest.py) — nothing to do
            return {"watermark": prev_w, "applied_tables": [], "stats": {}}
        if w < prev_w:
            raise ValueError(
                f"watermark moved backwards: {w} < committed {prev_w} "
                "(the un-pruned event log must be append-only)")
        applicable = events.filter(F.col("tx_id") <= F.lit(w))
        names = sorted(r[0] for r in
                       applicable.select("table").distinct().collect())
        versions: dict[str, int] = dict(prev["tables"]) if prev else {}
        stats: dict[str, Any] = {}
        for name in names:
            t = self.table(name)
            part = applicable.filter(F.col("table") == name).drop("table")
            winners = latest_per_key(part.drop("tx_id"),
                                     self.key_cols, ["_seq"])
            if not t.exists():
                # keys + payload only: create() adds _seq/_deleted itself
                t.create_empty(self.spark, winners.drop("_op", "_seq").schema,
                               self.key_cols, self.n_buckets, table=name)
            stats[name] = t.merge(self.spark, winners, batch_id=w,
                                  source=self.SOURCE)
            versions[name] = t.current_version()
        if w > prev_w:
            self.io.ensure_dir(self._snap_dir)
            rec = json.dumps({"watermark": w, "tables": versions},
                             sort_keys=True)
            try:
                self.io.put_if_absent(f"{self._snap_dir}/snap-{w}.json",
                                      rec)
            except CommitConflict:
                pass        # crash-redelivery republishing the same record
        return {"watermark": w, "applied_tables": names, "stats": stats}
