"""Incrementally maintained grouped aggregates over the CDC change feed.

The reference connector's whole purpose is feeding downstream consumers a
change stream (README.md:21-27); the canonical consumer at 100 TB is a
materialized aggregate that is maintained from the per-commit deltas and
NEVER rescans the table. With pre-image deltas (``LakeTable(change_feed=
True, feed_preimages=True)`` — the Delta-CDF shape), self-maintainable
aggregates (COUNT / SUM, hence AVG) need no keyed state at all:

    delta(group) = sum over feed rows of  sign * contribution
    sign = +1 for applied post-images ('c'/'u'/'r'), -1 for pre-images
    ('pu'/'pd'); tombstone post rows ('d', null payload) contribute 0 —
    the removal rides their 'pd' pre-image.

A refresh is therefore: one scan of the NEW feed window (bounded by churn,
not table size) -> one small groupBy -> a |groups|-sized combine with the
previous view. Group membership changes (a key's group column moving) work
because the pre-image carries the OLD group and the post-image the NEW one.

Exactness: contributions must be exact-additive types (integral/decimal).
Floating sums are order-sensitive, so an incrementally-built double sum
would drift from a batch recompute; ``feed_agg_delta`` refuses
float/double columns unless ``allow_inexact=True``.

MIN/MAX are NOT self-maintainable under deletes (removing the current max
needs the runner-up, i.e. keyed state) and are deliberately absent.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_dynamodb_spark.lake.table import LakeTable

POST_OPS = ("c", "u", "r")
PRE_OPS = ("pu", "pd")

_INEXACT = (T.FloatType, T.DoubleType)


def _check_exact(df: DataFrame, cols: Sequence[str], allow_inexact: bool) -> None:
    for c in cols:
        if isinstance(df.schema[c].dataType, _INEXACT) and not allow_inexact:
            raise ValueError(
                f"sum column {c!r} is {df.schema[c].dataType.simpleString()}: "
                "floating sums are order-sensitive, so the incremental view "
                "would drift from a batch recompute; cast to decimal/long, "
                "or pass allow_inexact=True if drift is acceptable")


def feed_agg_delta(feed: DataFrame, group_cols: Sequence[str],
                   sum_cols: Sequence[str] = (), *, op_col: str = "_op",
                   post_ops: Sequence[str] = POST_OPS,
                   pre_ops: Sequence[str] = PRE_OPS,
                   allow_inexact: bool = False) -> DataFrame:
    """Per-group additive delta of one feed window: columns = group_cols +
    ``n_rows`` (live-row count delta) + ``sum_<c>`` per sum column.

    One pushable op filter + one map-side-combined groupBy; output is
    |touched groups| rows. Rows whose op is neither post nor pre (the 'd'
    tombstone post rows, unknown ops) are filtered BEFORE the shuffle —
    they contribute nothing and their null group would otherwise emit an
    all-zero null-group row."""
    group_cols, sum_cols = list(group_cols), list(sum_cols)
    _check_exact(feed, sum_cols, allow_inexact)
    sign = (F.when(F.col(op_col).isin(*post_ops), F.lit(1))
             .when(F.col(op_col).isin(*pre_ops), F.lit(-1))).cast("long")
    return (feed.withColumn("_sign", sign)
                .filter(F.col("_sign").isNotNull())
                .groupBy(*group_cols)
                .agg(F.sum("_sign").alias("n_rows"),
                     *[F.sum(F.col("_sign") * F.col(c))
                        .cast(_sum_type(feed.schema[c].dataType))
                        .alias(f"sum_{c}")
                       for c in sum_cols]))


def _sum_type(dt: T.DataType) -> T.DataType:
    """Stable accumulator type across refreshes (Spark widens sum(decimal)
    by +10 digits per aggregation level — left alone, the view's schema
    would creep toward 38 over successive refreshes)."""
    if isinstance(dt, T.DecimalType):
        return T.DecimalType(38, dt.scale)
    if isinstance(dt, _INEXACT):
        return T.DoubleType()
    return T.LongType()


def merge_agg_delta(view: DataFrame, delta: DataFrame,
                    group_cols: Sequence[str]) -> DataFrame:
    """view ⊕ delta: null-safe grouped addition, groups whose live-row
    count reaches 0 leave the view. Both inputs carry the same columns
    (group_cols + n_rows + sum_*); cost is |view| + |delta| rows through
    one groupBy — never a table scan."""
    group_cols = list(group_cols)
    val_cols = [c for c in view.columns if c not in group_cols]
    combined = view.unionByName(delta.select(*view.columns))
    out = combined.groupBy(*group_cols).agg(
        *[F.sum(c).alias(c) for c in val_cols])
    return out.filter(F.col("n_rows") != 0)


def lww_apply_with_feed(state: DataFrame, winners: DataFrame,
                        keys: Sequence[str]) -> tuple[DataFrame, DataFrame]:
    """Pure-DataFrame twin of ``LakeTable.merge`` + pre-image feed emission
    (no lakehouse I/O) — the algebra the gate row and property tests pin.

    ``state``: keys + payload + _seq + _deleted (the tombstone column —
    durable tombstones are what keep a stale update arriving AFTER a delete
    dead, exactly as the lake table does). ``winners``: one row per key,
    keys + payload + _op + _seq (op 'd' = delete, payload null). Returns
    ``(new_state, feed)`` where feed carries applied post rows with the
    batch op plus 'pu'/'pd' pre-images of overwritten LIVE rows — exactly
    the deltas a ``feed_preimages`` table publishes
    (lake/table.py::_merge_once). Live rows = ``new_state.filter(~_deleted)``."""
    keys = list(keys)
    payload = [c for c in state.columns
               if c not in keys and c not in ("_seq", "_deleted")]
    t, s = state.alias("t"), winners.alias("s")
    joined = t.join(s, on=keys, how="full_outer")
    take_src = F.col("s._seq").isNotNull() & (
        F.col("t._seq").isNull() | (F.col("s._seq") > F.col("t._seq")))
    new_state = joined.select(
        *keys,
        *[F.when(take_src, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
          for c in payload],
        F.when(take_src, F.col("s._seq")).otherwise(F.col("t._seq")).alias("_seq"),
        F.when(take_src, F.col("s._op") == "d")
         .otherwise(F.coalesce(F.col("t._deleted"), F.lit(False)))
         .alias("_deleted"))
    applied = joined.filter(take_src)
    post = applied.select(
        *keys, *[F.col(f"s.{c}").alias(c) for c in payload],
        F.col("s._op").alias("_op"), F.col("s._seq").alias("_seq"))
    had_live = (F.col("t._seq").isNotNull()
                & ~F.coalesce(F.col("t._deleted"), F.lit(False)))
    pre = applied.filter(had_live).select(
        *keys, *[F.col(f"t.{c}").alias(c) for c in payload],
        F.when(F.col("s._op") == "d", F.lit("pd")).otherwise(F.lit("pu")).alias("_op"),
        F.col("t._seq").alias("_seq"))
    return new_state, post.unionByName(pre)


class IncrementalAggView:
    """A materialized grouped aggregate maintained from a source table's
    pre-image change feed. The view itself is a LakeTable keyed by the
    group columns — versioned, atomic, time-travelable like any table.

    The FIRST ``refresh()`` bootstraps with one full aggregate of the
    source read at a pinned version — the unavoidable one-time scan; a
    table created from an INIT_SYNC snapshot publishes no feed rows for
    its base (only :meth:`LakeTable.replace` re-publishes), and early feed
    commits may have been vacuumed, so bootstrapping from the feed would
    silently under-count. Every later ``refresh()`` is idempotent and
    incremental: it reads ONLY feed commits after the view's recorded
    ``view.from_version`` (a no-op when already current, so
    crash/redelivery converges), folds them into the previous view state,
    and commits atomically with the new watermark. A resync epoch in the
    window ('r' rows from :meth:`LakeTable.replace`) resets the base to
    empty and folds from the epoch's snapshot rows — mirroring
    streaming/feed.py's truncate-to-epoch rule. Single maintainer assumed
    (concurrent refreshes stay self-consistent — watermark and content
    commit together — but the last commit wins)."""

    def __init__(self, source: LakeTable, view: LakeTable,
                 group_cols: Sequence[str], sum_cols: Sequence[str] = (), *,
                 allow_inexact: bool = False, view_buckets: int = 16):
        if not source.feed_preimages:
            raise ValueError(
                "IncrementalAggView needs a feed_preimages=True source "
                "(post-only deltas can't retract a row's old contribution)")
        self.source, self.view = source, view
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.allow_inexact = allow_inexact
        self.view_buckets = view_buckets

    def _empty_view(self, spark: SparkSession) -> DataFrame:
        src = T.StructType([f for f in self.source.manifest().schema().fields])
        fields = [src[c] for c in self.group_cols]
        fields += [T.StructField("n_rows", T.LongType(), True)]
        for c in self.sum_cols:
            fields.append(T.StructField(f"sum_{c}", _sum_type(src[c].dataType),
                                        True))
        return spark.createDataFrame([], T.StructType(fields))

    def _full_agg(self, spark: SparkSession, version: int) -> DataFrame:
        """Bootstrap aggregate over the source pinned at ``version`` —
        accumulator types forced to match the incremental path so later
        replace() commits never flip the view schema."""
        src = self.source.read(spark, version=version)
        _check_exact(src, self.sum_cols, self.allow_inexact)
        return src.groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            *[F.sum(c).cast(_sum_type(src.schema[c].dataType))
               .alias(f"sum_{c}") for c in self.sum_cols])

    def read(self, spark: SparkSession) -> DataFrame:
        return self.view.read(spark)

    def refresh(self, spark: SparkSession) -> dict[str, Any]:
        cur = self.source.manifest().version
        if not self.view.exists():
            self.view.create(spark, self._full_agg(spark, cur),
                             self.group_cols, n_buckets=self.view_buckets,
                             properties={"view.from_version": str(cur)})
            return {"skipped": False, "bootstrap": True, "to_version": cur}
        vm = self.view.manifest()
        last = int(vm.properties.get("view.from_version", 0))
        base = self.view.read(spark)
        if cur <= last:
            return {"skipped": True, "at_version": last}
        feed = self.source.changes(spark, from_version=last + 1,
                                   to_version=cur)
        # one 1-row probe: latest resync epoch in the window, if any
        epoch = feed.agg(F.max(F.when(F.col("_op") == "r",
                                      F.col("_commit")))).first()[0]
        if epoch is not None:
            base = self._empty_view(spark)
            feed = feed.filter(F.col("_commit") >= epoch)
        delta = feed_agg_delta(feed, self.group_cols, self.sum_cols,
                               allow_inexact=self.allow_inexact)
        new_view = merge_agg_delta(base, delta, self.group_cols)
        self.view.replace(spark, new_view, key_cols=self.group_cols,
                          properties={"view.from_version": str(cur)})
        return {"skipped": False, "from_version": last + 1,
                "to_version": cur, "resync_epoch": epoch}
