"""Minimal ACID lake table: versioned parquet + atomic manifest log + COW MERGE.

No Iceberg/Delta jars ship in this image, so the engine carries its own small
lakehouse layer with the same properties the design needs (SURVEY §4 "custom
work" items 1-3):

* **Versioned manifests** — ``_log/v{N}.json`` lists every live data file with
  its hash bucket. Commit = write-temp + ``os.link`` (fails if the version
  exists → optimistic concurrency, single-winner). Readers see the max
  committed version; crashes leave only unreferenced temp files.
* **Hash-bucket layout** — every data file belongs to one bucket
  ``pmod(xxhash64(repo,path), n_buckets)``. A MERGE touches only the buckets
  its batch keys hash to (partition pruning for upserts): at 100 TB / 4096
  buckets a small batch rewrites a handful of ~25 GB buckets, not the table.
* **Copy-on-write MERGE** with last-writer-wins guard: the update wins only if
  ``_seq`` is strictly greater than the stored row's — a strictly stronger
  guard than the reference's in-memory monotonic shard register
  (DynamoDBSourceTask.java:419-426) because it survives restarts.
* **Tombstones** — REMOVE keeps ``(key, _seq, _deleted=true)`` so a late,
  lower-seq MODIFY arriving in a later batch stays dead (SURVEY §7.4.3, the
  durable analog of Kafka tombstones, DynamoDBSourceTask.java:353-361).
  ``compact()`` purges them once no older events can arrive.
* **Idempotent exactly-once commits** — each manifest records the last applied
  ``batch_id`` per source/stream; re-delivered micro-batches (foreachBatch
  retries after crash) are skipped. This upgrades the reference's documented
  at-least-once contract (docs/details.md:33) to exactly-once.
* **Additive schema evolution** — MERGE unions the batch schema into the table
  schema; old files are read with the evolved schema (missing columns → null),
  mirroring Iceberg ``mergeSchema`` / ``ALTER TABLE ADD COLUMNS``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_dynamodb_spark.lake.commitio import (
    CommitConflict, CommitIO, PosixCommitIO)

__all__ = ["LakeTable", "Manifest", "CommitConflict"]

META_COLS = ("_seq", "_deleted")
SEQ_TYPE = "decimal(38,0)"  # 26-digit DynamoDB seq-nos fit (tests use 26 digits)


_MAX_STRING_STAT = 256


_INT_WIDEN_ORDER = ("byte", "short", "integer", "long")


def _widened_type(old_dt, new_dt):
    """The wider type when new_dt is a LOSSLESS widening of old_dt
    (byte<short<int<long, float<double, {byte,short,int}<double — every
    int32 is exact in a float64), else None. long->double is lossy and
    excluded; decimals are out of scope (SEQ_TYPE is fixed)."""
    a, b = old_dt.typeName(), new_dt.typeName()
    if a == b:
        return None
    if a in _INT_WIDEN_ORDER and b in _INT_WIDEN_ORDER \
            and _INT_WIDEN_ORDER.index(b) > _INT_WIDEN_ORDER.index(a):
        return new_dt
    if b == "double" and a in ("float", "byte", "short", "integer"):
        return new_dt
    return None


def _json_stat(v):
    """Normalize a parquet footer stat to a JSON-safe, totally-ordered value;
    None = type not usable for pruning (timestamps, exotic logicals).

    Long string stats are rejected outright: parquet writers may TRUNCATE
    min/max for wide binary values, and a truncated max is a lexicographic
    PREFIX (smaller than the true max) — pruning on it would wrongly skip
    files. Short strings (keys, enums, shas) are stored exactly."""
    from decimal import Decimal
    if isinstance(v, bytes):
        try:
            v = v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, str):
        return v if len(v) < _MAX_STRING_STAT else None
    if isinstance(v, (bool, int, float)):
        return v
    if isinstance(v, Decimal):
        return int(v) if v == v.to_integral_value() else float(v)
    return None


def _footer_stats(path: str) -> dict[str, list]:
    """Per-file min/max column stats from the parquet FOOTER the write just
    produced (pyarrow metadata read — no data pass). Iceberg collects the
    same stats into its manifests; here they ride the LakeTable manifest
    entry so :meth:`LakeTable.scan` can skip files at planning time. Only
    top-level atomic columns with stats in EVERY row group qualify —
    anything else is simply not prunable (never wrong, just unpruned)."""
    try:
        import pyarrow.parquet as pq
        md = pq.ParquetFile(path).metadata
    except Exception:
        return {}
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:                       # nested leaf: skip
                bad.add(name.split(".")[0])
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                bad.add(name)
                continue
            lo, hi = _json_stat(st.min), _json_stat(st.max)
            if lo is None or hi is None:
                bad.add(name)
                continue
            if name in mins:
                mins[name] = min(mins[name], lo)
                maxs[name] = max(maxs[name], hi)
            else:
                mins[name], maxs[name] = lo, hi
    out = {c: [mins[c], maxs[c]] for c in mins if c not in bad}
    # file row count under a reserved key no real column can shadow (only
    # set if no column claimed the name): drives metadata-only COUNTs
    if "#rows" not in out:
        out["#rows"] = md.num_rows
    return out


def _footer_stats_rows(iterator):
    """mapInPandas worker for the distributed stats job: each Arrow batch of
    staged paths yields (path, json-encoded stats) — footer metadata reads
    run ON THE EXECUTORS, next to the files their tasks just wrote."""
    import pandas as pd
    for pdf in iterator:
        yield pd.DataFrame({
            "path": pdf["path"],
            "stats": [json.dumps(_footer_stats(p)) for p in pdf["path"]],
        })


def _file_may_match(stats: dict[str, list], col: str, op: str, val) -> bool:
    """Can a file with these stats contain a row satisfying ``col op val``?
    Missing stats (evolved/unpruned column) => must keep the file."""
    rng = stats.get(col)
    if not rng:
        return True
    lo, hi = rng
    try:
        if op == "==":
            return lo <= val <= hi
        if op == "<":
            return lo < val
        if op == "<=":
            return lo <= val
        if op == ">":
            return hi > val
        if op == ">=":
            return hi >= val
    except TypeError:
        return True          # incomparable predicate value: don't prune
    raise ValueError(f"unsupported op {op!r}")


@dataclass
class Manifest:
    version: int
    table: str
    key_cols: list[str]
    n_buckets: int
    schema_json: str                       # StructType.json() of stored columns
    files: list[dict[str, Any]] = field(default_factory=list)   # {path, bucket}
    committed: dict[str, int] = field(default_factory=dict)     # source -> last batch_id
    properties: dict[str, Any] = field(default_factory=dict)    # free-form (state doc etc.)
    lineage: list[dict[str, Any]] = field(default_factory=list) # recent commit metrics
    change_files: list[dict[str, Any]] = field(default_factory=list)  # {version, path}
    committed_at_ms: int = 0               # wall-clock commit stamp (AS OF reads)

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        return Manifest(**json.loads(s))


class LakeTable:
    """A bucketed, versioned parquet table with atomic commits and COW merge.

    All driver-side metadata I/O goes through ``io`` (commitio.CommitIO) —
    swap in a rename-based (HDFS) or conditional-put (S3) implementation to
    run the same commit protocol on an object store; see commitio.py for the
    per-store atomicity contract.
    """

    def __init__(self, root: str, io: CommitIO | None = None, *,
                 change_feed: bool = False, feed_preimages: bool = False,
                 file_stats: bool = True,
                 stats_driver_max_files: int = 64):
        """``change_feed=True`` makes every MERGE also publish its compacted
        per-commit delta (the LWW winners it applied) under ``changes/`` —
        the engine's CDC-OUT surface, mirroring the reference's table->event
        emission direction; read back with :meth:`changes`.

        ``feed_preimages=True`` (requires ``change_feed``) upgrades the
        delta to Delta-CDF-shaped changes: only APPLIED post-image rows are
        published (submitted winners that lose the seq guard against the
        table are omitted — they are no-ops for replay and would corrupt
        additive consumers), and every applied row that overwrote or
        deleted a LIVE row is accompanied by that row's pre-image with
        ``_op='pu'`` (update pre-image) / ``'pd'`` (delete pre-image) and
        the OLD ``_seq``. Pre-images make grouped aggregates incrementally
        maintainable with NO keyed state (delta = post - pre; see
        operators/incremental.py) — at 100 TB the view refresh cost is
        proportional to churn, never to table size. Costs one extra
        bucket-pruned join per merge, hence opt-in.

        ``file_stats=True`` (default) records per-file min/max column stats
        in the manifest at commit time (read from the parquet footers the
        write already produced — metadata-only, no data re-read), enabling
        :meth:`scan` to skip files by predicate — the Iceberg/Delta
        data-skipping analog, and the non-key-column complement to the hash
        bucket pruning MERGE and read_key already use."""
        if feed_preimages and not change_feed:
            raise ValueError("feed_preimages requires change_feed=True")
        self.root = root
        self.log_dir = os.path.join(root, "_log")
        self.io = io if io is not None else PosixCommitIO()
        self.change_feed = change_feed
        self.feed_preimages = feed_preimages
        self.file_stats = file_stats
        self.stats_driver_max_files = stats_driver_max_files

    # ------------------------------------------------------------------ log

    def exists(self) -> bool:
        return bool(self._versions())

    def _versions(self) -> list[int]:
        out = []
        for f in self.io.list_dir(self.log_dir):
            if f.startswith("v") and f.endswith(".json"):
                try:
                    out.append(int(f[1:-5]))
                except ValueError:
                    pass
        return sorted(out)

    def current_version(self) -> int:
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no committed version in {self.log_dir}")
        return vs[-1]

    def manifest(self, version: int | None = None) -> Manifest:
        v = self.current_version() if version is None else version
        return Manifest.from_json(
            self.io.read_text(os.path.join(self.log_dir, f"v{v:012d}.json")))

    def _commit(self, m: Manifest, parent: Manifest | None = None) -> None:
        """Atomic single-winner commit (CommitIO.put_if_absent contract).

        The AS-OF stamp is clamped to the parent's so ``committed_at_ms`` is
        monotone across versions even when committers' wall clocks skew
        (merge job vs maintenance job on different drivers): without the
        clamp, version_as_of could resolve a timestamp to a version that
        excludes an earlier-stamped but later-committed change."""
        import time
        if not m.committed_at_ms:
            m.committed_at_ms = int(time.time() * 1000)
        if parent is not None:
            m.committed_at_ms = max(m.committed_at_ms, parent.committed_at_ms)
        self.io.put_if_absent(
            os.path.join(self.log_dir, f"v{m.version:012d}.json"), m.to_json())

    # ---------------------------------------------------------------- layout

    def _bucket_expr(self, key_cols: list[str], n_buckets: int):
        return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")

    def _write_bucketed(self, df: DataFrame, version: int,
                        sort_cols: list[str] | None = None,
                        zval_col: str | None = None,
                        n_range_parts: int | None = None) -> list[dict[str, Any]]:
        """Write df (with _bucket col) partitioned by bucket; return file entries.

        repartition("_bucket") co-locates each bucket in one task so
        partitionBy emits ~one file per bucket per commit (no small-file
        explosion); AQE coalesces near-empty partitions.

        With ``zval_col`` (Z-order compaction) the layout goal inverts:
        SPLIT each bucket into ``n_range_parts``-ish files, each covering a
        contiguous z-range, via repartitionByRange(bucket, z) + a within-
        partition sort — every output file then spans a tight hyper-
        rectangle of the z-columns and its manifest min/max stats prune on
        any of them. The z column itself is dropped before writing (layout
        metadata, not data).

        The staging dir carries a unique suffix: a writer that crashed
        AFTER staging but BEFORE the manifest commit leaves an orphan that
        must not collide with the redelivered batch's errorifexists write
        (same next-version number). Manifest entries reference exact file
        paths, so the suffix is invisible to readers; orphans are
        vacuum-reclaimed.
        """
        import uuid
        staged = os.path.join(self.root, "data",
                              f"c{version:012d}-{uuid.uuid4().hex[:8]}")
        if zval_col is not None:
            out = (df.repartitionByRange(n_range_parts or 8,
                                         F.col("_bucket"), F.col(zval_col))
                     .sortWithinPartitions("_bucket", zval_col)
                     .drop(zval_col))
        else:
            out = df.repartition(F.col("_bucket"))
            if sort_cols:
                # cluster rows inside each file (compaction-time sort order):
                # parquet row-group min/max on the sort keys become tight, so
                # point lookups and range scans inside a bucket skip row
                # groups — maintenance-time cost, read-time win (Iceberg
                # sort orders)
                out = out.sortWithinPartitions("_bucket", *sort_cols)
        (out.write.mode("errorifexists").partitionBy("_bucket").parquet(staged))
        entries = []
        for d in self.io.list_dir(staged):
            if not d.startswith("_bucket="):
                continue
            b = int(d.split("=")[1])
            for f in self.io.list_dir(os.path.join(staged, d)):
                if f.endswith(".parquet"):
                    abs_path = os.path.join(staged, d, f)
                    rel = os.path.relpath(abs_path, self.root)
                    entries.append({"path": rel, "bucket": b})
        if self.file_stats and entries:
            # Footer-stats collection must not scale driver I/O with files
            # touched (VERDICT r3: a 4096-bucket full-table commit = 4096
            # driver-side object-store reads on the commit critical path).
            # Hybrid, A/B-measured (BENCH/BASELINE.md r4): up to
            # ``stats_driver_max_files`` files the driver reads footers via
            # a thread pool (bounded O(1) work wrt table size, ~no
            # latency); above it ONE distributed mapInPandas job reads
            # footers executor-side (~0.5 s job overhead — noise on a big
            # commit, a 10% regression if paid on every small one) and the
            # driver only assembles the returned (path, stats) rows.
            paths = [os.path.join(self.root, e["path"]) for e in entries]
            if len(paths) <= self.stats_driver_max_files:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(
                        max_workers=min(16, len(paths))) as pool:
                    all_stats = list(pool.map(_footer_stats, paths))
                by_path = dict(zip(paths, all_stats))
            else:
                spark = df.sparkSession
                n_tasks = max(1, min(len(paths),
                                     spark.sparkContext.defaultParallelism))
                rows = (spark.createDataFrame([(p,) for p in paths],
                                              "path string")
                        .repartition(n_tasks)
                        .mapInPandas(_footer_stats_rows,
                                     "path string, stats string")
                        .collect())
                by_path = {r["path"]: json.loads(r["stats"]) for r in rows}
            for e in entries:
                stats = by_path.get(os.path.join(self.root, e["path"]))
                if stats:
                    e["stats"] = stats
        return entries

    def _read_files(self, spark: SparkSession, schema: T.StructType,
                    entries: list[dict[str, Any]]) -> DataFrame:
        if not entries:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.root, e["path"]) for e in entries]
        # Explicit schema => missing (newly-evolved) columns read as null.
        return spark.read.schema(schema).parquet(*paths)

    # ---------------------------------------------------------------- create

    def create(self, spark: SparkSession, df: DataFrame, key_cols: list[str],
               n_buckets: int = 64, table: str = "table",
               seq_col: str | None = None,
               properties: dict[str, Any] | None = None) -> Manifest:
        """Initialize the table from a snapshot (INIT_SYNC result).

        Snapshot rows get ``_seq`` (0 unless ``seq_col`` given) and
        ``_deleted=false`` — op 'r' rows in envelope terms (Envelope.java:21).
        """
        if self.exists():
            raise FileExistsError(f"table already exists at {self.root}")
        stored = df
        if seq_col is None:
            stored = stored.withColumn("_seq", F.lit(0).cast(SEQ_TYPE))
        else:
            stored = stored.withColumn("_seq", F.col(seq_col).cast(SEQ_TYPE))
            if seq_col != "_seq":
                stored = stored.drop(seq_col)
        stored = stored.withColumn("_deleted", F.lit(False))
        data_schema = stored.schema
        stored = stored.withColumn("_bucket", self._bucket_expr(key_cols, n_buckets))
        entries = self._write_bucketed(stored, 1)
        m = Manifest(version=1, table=table, key_cols=list(key_cols),
                     n_buckets=n_buckets, schema_json=json.dumps(data_schema.jsonValue()),
                     files=entries, committed={}, properties=properties or {},
                     lineage=[{"commit": 1, "op": "create", "files": len(entries)}])
        self._commit(m)
        return m

    def create_empty(self, spark: SparkSession, schema: T.StructType,
                     key_cols: list[str], n_buckets: int = 64,
                     table: str = "table") -> Manifest:
        empty = spark.createDataFrame([], schema)
        return self.create(spark, empty, key_cols, n_buckets, table)

    def replace(self, spark: SparkSession, df: DataFrame,
                key_cols: list[str] | None = None, *,
                n_buckets: int | None = None,
                seq_col: str | None = None,
                properties: dict[str, Any] | None = None,
                conflict_retries: int = 4) -> Manifest:
        """Truncate-and-reload in ONE atomic manifest commit — the
        danger-zone re-snapshot path (the reference treats resync as a
        first-class recovery, DynamoDBSourceTask.java:318-331).

        No tree deletion anywhere: the new snapshot's files are staged like
        any commit, and the manifest swap makes them the entire table in one
        ``put_if_absent`` — the storage-agnostic move (an S3 prefix has no
        rmtree). Old files stay readable for retained versions until
        expire+vacuum reclaims them. Committed batch markers and properties
        reset (a resync restarts the stream's exactly-once lineage from
        scratch); the change-feed history is preserved for late consumers.

        On a ``change_feed`` table the new snapshot is ALSO published as a
        feed delta of op-'r' rows — the reference re-publishes INIT_SYNC
        records to the topic on resync (DynamoDBSourceTask.java:246-249,318-331),
        and without it a downstream mirror would silently diverge after a
        danger-zone re-snapshot. ``streaming.feed.mirror_changes`` detects
        the 'r' epoch and truncates its table to it.

        Losing a commit race (a maintenance job landing mid-resync) retries
        with the SAME staged files under the next version number. The staged
        dirs are first RE-HOMED to names embedding the new version: vacuum's
        in-flight guard only protects staging dirs whose embedded version is
        ahead of the current version, and after the lost race the original
        number is <= current — without the re-home a concurrent vacuum could
        reclaim staged files the retried commit is about to reference."""
        m = self.manifest()
        key_cols = list(key_cols) if key_cols is not None else m.key_cols
        n_buckets = n_buckets if n_buckets is not None else m.n_buckets
        stored = df
        if seq_col is None:
            stored = stored.withColumn("_seq", F.lit(0).cast(SEQ_TYPE))
        else:
            stored = stored.withColumn("_seq", F.col(seq_col).cast(SEQ_TYPE))
            if seq_col != "_seq":
                stored = stored.drop(seq_col)
        stored = stored.withColumn("_deleted", F.lit(False))
        data_schema = stored.schema
        stored = stored.withColumn("_bucket",
                                   self._bucket_expr(key_cols, n_buckets))
        version = m.version + 1
        entries = self._write_bucketed(stored, version)
        change_entry: list[dict[str, Any]] = []
        staged_rel: str | None = None
        if self.change_feed:
            import uuid as _uuid
            uid = _uuid.uuid4().hex[:8]
            rel = os.path.join("changes", f"c{version:012d}-{uid}.parquet")
            staged_rel = os.path.join("changes", f".stage-c{version:012d}-{uid}")
            (stored.drop("_bucket", "_deleted")
                   .withColumn("_op", F.lit("r"))
                   .write.mode("errorifexists")
                   .parquet(os.path.join(self.root, staged_rel)))
            change_entry = [{"version": version, "path": rel,
                             "staged": staged_rel, "replace": True}]
        attempt = 0
        while True:
            new_m = Manifest(
                version=version, table=m.table, key_cols=key_cols,
                n_buckets=n_buckets,
                schema_json=json.dumps(data_schema.jsonValue()),
                files=entries, committed={}, properties=properties or {},
                lineage=(m.lineage + [{"commit": version,
                                       "op": "replace",
                                       "files": len(entries)}])[-50:],
                change_files=m.change_files + change_entry)
            try:
                self._commit(new_m, parent=m)
                break
            except CommitConflict:
                if attempt >= conflict_retries:
                    if staged_rel is not None:
                        self.io.remove_tree(os.path.join(self.root, staged_rel))
                    raise
                attempt += 1
                m = self.manifest()
                version = m.version + 1
                entries, staged_rel = self._restage(entries, staged_rel,
                                                    version)
                if change_entry:
                    rel = os.path.join(
                        "changes",
                        f"c{version:012d}-{_uuid.uuid4().hex[:8]}.parquet")
                    change_entry = [{"version": version, "path": rel,
                                     "staged": staged_rel, "replace": True}]
        if staged_rel is not None:
            self._heal_changes(new_m)
        return new_m

    def _restage(self, entries: list[dict[str, Any]], staged_rel: str | None,
                 version: int) -> tuple[list[dict[str, Any]], str | None]:
        """Move staged data/delta dirs under names embedding ``version`` and
        rewrite the entry paths accordingly — keeps a retried replace()'s
        staging AHEAD of the current version so vacuum's in-flight guard
        still covers it. One dir rename per retry on POSIX/HDFS (the data
        is not rewritten); on an object store move_dir is copy+delete, paid
        only on the rare resync-loses-its-commit-race path, and vacuum's
        mtime grace window independently protects the staging either way."""
        import uuid as _uuid
        if entries:
            # all entries share one staging top dir: data/c{old:012d}-{uid};
            # verify that invariant for EVERY entry before rewriting paths —
            # a stray entry outside the moved dir would otherwise be silently
            # pointed at a location nothing was moved to (r4 ADVICE low; a
            # ValueError, not assert, so -O cannot strip the guard)
            old_top = entries[0]["path"].split(os.sep)[:2]
            if len(old_top) < 2 or old_top[0] != "data":
                raise ValueError(
                    f"restage: unexpected staged path layout: {entries[0]['path']!r}")
            old_rel = os.path.join(*old_top)
            stray = [e["path"] for e in entries
                     if not e["path"].startswith(old_rel + os.sep)]
            if stray:
                raise ValueError(
                    f"restage: entries span multiple staging dirs "
                    f"(expected all under {old_rel!r}): {stray[:3]}")
            new_rel = os.path.join(
                "data", f"c{version:012d}-{_uuid.uuid4().hex[:8]}")
            self.io.move_dir(os.path.join(self.root, old_rel),
                             os.path.join(self.root, new_rel))
            entries = [{**e, "path": new_rel + e["path"][len(old_rel):]}
                       for e in entries]
        if staged_rel is not None:
            new_staged = os.path.join(
                "changes", f".stage-c{version:012d}-{_uuid.uuid4().hex[:8]}")
            self.io.move_dir(os.path.join(self.root, staged_rel),
                             os.path.join(self.root, new_staged))
            staged_rel = new_staged
        return entries, staged_rel

    # ------------------------------------------------------------------ read

    def read(self, spark: SparkSession, *, include_meta: bool = False,
             include_deleted: bool = False, version: int | None = None,
             columns: list[str] | None = None) -> DataFrame:
        """Current (or time-traveled) live rows; tombstones filtered unless
        ``include_deleted`` (maintenance/inspection). ``columns`` projects
        early so column pruning reaches the parquet scan (ReadSchema carries
        only the requested columns + the meta cols the filter needs)."""
        m = self.manifest(version)
        df = self._read_files(spark, m.schema(), m.files)
        if columns is not None:
            # a caller naming a meta column (e.g. "_seq") must not duplicate
            # it against the META_COLS the filter needs; include_meta governs
            # whether it survives the final drop
            df = df.select(*[c for c in columns if c not in META_COLS],
                           *META_COLS)
        if not include_deleted:
            df = df.filter(~F.col("_deleted"))
        if not include_meta:
            df = df.drop(*META_COLS)
        return df

    def history(self, spark: SparkSession) -> DataFrame:
        """Commit history as a DataFrame (Iceberg ``table.history`` analog):
        one row per retained version with its stamp, op, source/batch
        lineage and per-commit metrics — driver-side metadata only, no data
        files touched."""
        rows = []
        for v in self._versions():
            m = self.manifest(v)
            last = m.lineage[-1] if m.lineage else {}
            rows.append({
                "version": v,
                "committed_at_ms": m.committed_at_ms,
                "op": str(last.get("op", "")),
                "source": str(last.get("source") or ""),
                "batch_id": last.get("batch_id"),
                "rows_in": last.get("rows_in"),
                "buckets_touched": last.get("buckets_touched"),
                "n_files": len(m.files),
            })
        schema = ("version long, committed_at_ms long, op string, "
                  "source string, batch_id long, rows_in long, "
                  "buckets_touched long, n_files long")
        return spark.createDataFrame(rows, schema)

    def version_as_of(self, ts_ms: int) -> int:
        """Latest version committed at or before ``ts_ms`` (AS OF reads)."""
        best = None
        for v in self._versions():
            if self.manifest(v).committed_at_ms <= ts_ms:
                best = v
        if best is None:
            raise FileNotFoundError(
                f"no version committed at or before {ts_ms} in {self.log_dir}")
        return best

    def read_as_of(self, spark: SparkSession, ts_ms: int, **kw) -> DataFrame:
        """Time travel by wall-clock: read the table as it was at ``ts_ms``."""
        return self.read(spark, version=self.version_as_of(ts_ms), **kw)

    def count_live(self, spark: SparkSession, *,
                   version: int | None = None) -> int:
        """Exact live-row count, answered from manifest stats wherever
        possible (Iceberg/Delta's metadata-only COUNT(*)): a file whose
        footer ``_deleted`` min/max is [false,false] contributes its row
        count with no I/O; [true,true] (all tombstones) contributes zero;
        only MIXED files — buckets touched by deletes since their last
        compaction — are scanned, and the scan reads the one boolean
        column. At 100 TB steady state the untouched majority of buckets
        resolves driver-side; cost ∝ tombstone churn, not table size."""
        m = self.manifest(version)
        total = 0
        residual = []
        for e in m.files:
            st = e.get("stats") or {}
            nr = st.get("#rows")
            dmm = st.get("_deleted")
            if nr is not None and dmm == [False, False]:
                total += int(nr)
            elif nr is not None and dmm == [True, True]:
                continue
            else:
                residual.append(e)
        if residual:
            sch = T.StructType([m.schema()["_deleted"]])
            total += (self._read_files(spark, sch, residual)
                          .filter(~F.col("_deleted")).count())
        return total

    def diff(self, spark: SparkSession, *, from_version: int,
             to_version: int | None = None) -> DataFrame:
        """Semantic row diff between two committed versions (Delta
        ``table_changes``' NET effect, computed from state, not the feed):
        one row per key whose LIVE CONTENT differs — ``_change`` is
        'insert' (key live only in ``to``), 'delete' (only in ``from``) or
        'update' (both live, payload content differs), with the full old
        and new payload structs and both ``_seq`` stamps.

        Content-true: rows are compared with a null-safe struct equality
        on the data columns, NOT by ``_seq`` — so the diff is correct
        across a ``replace()`` resync (which resets seqs) and reports
        nothing for an LWW winner that rewrote identical content.

        Scale shape — cost ∝ churn, not table size: a bucket whose
        manifest file set is IDENTICAL in both versions cannot contain a
        difference (COW never mutates a file in place), so only changed
        buckets are read on either side. At 100 TB / 4096 buckets a
        10-bucket commit diff scans ~0.25% of the table; both sides of
        the full-outer join arrive bucket-aligned on the same key hash.
        Compaction/z-order rewrites re-file unchanged buckets, so those
        diffs degrade to reading the rewritten buckets (and still emit
        nothing) — pruning resumes on the next data commit."""
        m_from = self.manifest(from_version)
        m_to = self.manifest(to_version)
        if m_from.key_cols != m_to.key_cols:
            raise ValueError("key columns changed between versions")
        key_cols = list(m_to.key_cols)

        by_bucket: dict[int, list[set[str]]] = {}
        for e in m_from.files:
            by_bucket.setdefault(e["bucket"], [set(), set()])[0].add(e["path"])
        for e in m_to.files:
            by_bucket.setdefault(e["bucket"], [set(), set()])[1].add(e["path"])
        changed = {b for b, (f, t) in by_bucket.items() if f != t}

        sch_to = m_to.schema()
        data_cols = [f.name for f in sch_to.fields
                     if f.name not in META_COLS and f.name not in key_cols]

        def side(m, alias):
            ents = [e for e in m.files if e["bucket"] in changed]
            df = self._read_files(spark, m.schema(), ents) \
                     .filter(~F.col("_deleted"))
            # evolved columns null-fill on the narrow side (same
            # convention as every multi-version read here)
            have = set(df.columns)
            cols = [*key_cols,
                    *[F.col(c) if c in have
                      else F.lit(None).cast(sch_to[c].dataType).alias(c)
                      for c in data_cols], "_seq"]
            return df.select(*cols).alias(alias)

        o, n = side(m_from, "o"), side(m_to, "n")
        pay = lambda a: F.struct(  # noqa: E731
            *[F.col(f"{a}.{c}") for c in data_cols])
        j = o.join(n, key_cols, "full_outer")
        change = (F.when(F.col("o._seq").isNull(), F.lit("insert"))
                   .when(F.col("n._seq").isNull(), F.lit("delete"))
                   .when(~pay("o").eqNullSafe(pay("n")), F.lit("update")))
        return (j.withColumn("_change", change)
                 .filter(F.col("_change").isNotNull())
                 .select(*key_cols, "_change",
                         F.when(F.col("o._seq").isNotNull(), pay("o"))
                          .alias("old"),
                         F.when(F.col("n._seq").isNotNull(), pay("n"))
                          .alias("new"),
                         F.col("o._seq").alias("_seq_old"),
                         F.col("n._seq").alias("_seq_new")))

    def read_key(self, spark: SparkSession, key_values: dict[str, Any], *,
                 include_meta: bool = False) -> DataFrame:
        """Bucket-pruned point lookup: compute the key's hash bucket on the
        driver (one 1-row job) and scan ONLY that bucket's files —
        1/n_buckets of the table instead of a full scan; at 100 TB / 4096
        buckets a lookup touches ~25 GB of files, further cut by parquet
        row-group stats on the key columns inside the bucket."""
        m = self.manifest()
        if set(key_values) != set(m.key_cols):
            raise ValueError(f"need exactly keys {m.key_cols}")
        sch = m.schema()
        bucket = self._bucket_of(spark, m, key_values)
        lits = {c: F.lit(key_values[c]).cast(sch[c].dataType)
                for c in m.key_cols}
        entries = [e for e in m.files if e["bucket"] == bucket]
        # stats-prune WITHIN the bucket too: hash-scattered keys leave
        # min/max wide on freshly-merged files (no skip, never wrong), but
        # a bucket compacted with sort_cols/zorder on the key has tight
        # per-file ranges — the lookup then opens a single file
        entries = [e for e in entries
                   if all(_file_may_match(e.get("stats") or {}, c, "==",
                                          key_values[c])
                          for c in m.key_cols)]
        df = self._read_files(spark, sch, entries)
        for c in m.key_cols:
            df = df.filter(F.col(c) == lits[c])
        df = df.filter(~F.col("_deleted"))
        if not include_meta:
            df = df.drop(*META_COLS)
        return df

    def _bucket_of(self, spark: SparkSession, m: Manifest,
                   key_values: dict[str, Any]) -> int:
        """Hash bucket of a concrete key (one 1-row job). xxhash64 is
        input-TYPE-sensitive (an int literal defaults to IntegerType and
        hashes differently from a stored LongType column), so each literal
        is cast to the table's key dtype before hashing — the exact
        expression _bucket_expr evaluated at write time."""
        sch = m.schema()
        lits = [F.lit(key_values[c]).cast(sch[c].dataType)
                for c in m.key_cols]
        return spark.range(1).select(
            F.pmod(F.xxhash64(*lits),
                   F.lit(m.n_buckets)).cast("int").alias("b")
        ).collect()[0]["b"]

    def pruned_entries(self, predicates: list[tuple[str, str, Any]],
                       version: int | None = None) -> list[dict[str, Any]]:
        """File entries that MAY satisfy every predicate, judged purely from
        the manifest's per-file stats — the planning-time skip set for
        :meth:`scan` (exposed for tests/inspection)."""
        m = self.manifest(version)
        return [e for e in m.files
                if all(_file_may_match(e.get("stats") or {}, c, op, v)
                       for (c, op, v) in predicates)]

    def scan(self, spark: SparkSession,
             predicates: list[tuple[str, str, Any]], *,
             include_meta: bool = False,
             version: int | None = None) -> DataFrame:
        """Stats-pruned read: ``predicates`` are ``(col, op, value)`` with op
        in {'==','<','<=','>','>='}, ANDed. Files whose footer-collected
        [min,max] cannot satisfy a predicate are dropped at PLANNING time
        from the manifest alone — no listing job, no footer reads at query
        time; at 100 TB a selective range over a sorted-ish column (commit
        seq-no, ingest day) turns a full-table scan into a handful of files,
        on top of parquet row-group pruning inside the survivors. The same
        predicates are re-applied to the DataFrame, so results are exact
        (skipping is a superset filter, never wrong).

        When every key column carries an equality predicate, the key's hash
        bucket prunes as well (stats ∩ bucket) — scan() then subsumes
        read_key with extra predicates on top."""
        m = self.manifest(version)
        entries = self.pruned_entries(predicates, version)
        eq = {c: v for (c, op, v) in predicates if op == "=="}
        if all(k in eq for k in m.key_cols):
            b = self._bucket_of(spark, m, {k: eq[k] for k in m.key_cols})
            entries = [e for e in entries if e["bucket"] == b]
        df = self._read_files(spark, m.schema(), entries)
        df = df.filter(~F.col("_deleted"))
        for c, op, v in predicates:
            col = F.col(c)
            df = df.filter({"==": col == v, "<": col < v, "<=": col <= v,
                            ">": col > v, ">=": col >= v}[op])
        if not include_meta:
            df = df.drop(*META_COLS)
        return df

    # ----------------------------------------------------------------- merge

    def last_committed(self, source: str) -> int:
        try:
            return self.manifest().committed.get(source, -1)
        except FileNotFoundError:
            return -1

    def merge(self, spark: SparkSession, updates: DataFrame, *,
              batch_id: int | None = None, source: str = "default",
              op_col: str = "_op", seq_col: str = "_seq",
              conflict_retries: int = 2) -> dict[str, Any]:
        """Apply a batch of LWW-deduped changes (one row per key, columns:
        keys + payload + op_col + seq_col).

        Physical plan: prune to touched buckets → full-outer hash join on the
        key (both sides shuffled on the key; AQE splits skewed keys) → winner
        selection per row → rewrite only touched buckets → atomic manifest
        commit referencing untouched files unchanged.

        Exactly-once: if ``batch_id <= committed[source]`` the call is a no-op
        (foreachBatch redelivery after crash).

        Multi-writer liveness: if another committer (a maintenance job, a
        concurrent stream) wins the optimistic commit race, the merge
        re-reads the new manifest and recomputes against it, up to
        ``conflict_retries`` times — the standard lakehouse
        read-check-recompute-commit loop. Orphaned staging from lost
        attempts is invisible to readers and reclaimed by :meth:`vacuum`.
        """
        attempt = 0
        while True:
            m = self.manifest()
            if batch_id is not None and batch_id <= m.committed.get(source, -1):
                return {"skipped": True, "batch_id": batch_id}
            try:
                return self._merge_once(spark, updates, m,
                                        batch_id=batch_id, source=source,
                                        op_col=op_col, seq_col=seq_col)
            except CommitConflict:
                if attempt >= conflict_retries:
                    raise
                attempt += 1

    def _merge_once(self, spark: SparkSession, updates: DataFrame,
                    m: Manifest, *, batch_id: int | None, source: str,
                    op_col: str, seq_col: str) -> dict[str, Any]:
        keys = m.key_cols
        upd = updates.withColumn("_seq", F.col(seq_col).cast(SEQ_TYPE))
        if op_col != "_op":
            upd = upd.withColumnRenamed(op_col, "_op")
        upd = upd.withColumn("_deleted", F.col("_op") == F.lit("d"))
        # payload columns of the incoming batch (may carry evolved columns)
        upd_payload = [c for c in upd.columns if c not in keys
                       and c not in ("_op", "_seq", "_deleted")]
        # null-out payload on tombstones (keys + _seq survive)
        for c in upd_payload:
            upd = upd.withColumn(c, F.when(F.col("_deleted"), F.lit(None)).otherwise(F.col(c)))

        # --- additive schema evolution (SURVEY §7.2 stage 7)
        old_schema = m.schema()
        old_names = [f.name for f in old_schema.fields]
        upd_fields = {f.name: f for f in upd.schema.fields}
        new_fields = [upd_fields[c] for c in upd_payload if c not in old_names]
        # --- type-widening evolution (Delta "type widening"): an update
        # column arriving with a LOSSLESSLY wider type than the table's
        # (byte<short<int<long, float<double, {byte,short,int}<double)
        # widens the TABLE schema; old files read through Spark's parquet
        # type promotion, exactly like additive columns null-fill. Without
        # this the full-outer when() would coerce the merged column wider
        # while the manifest stayed narrow — new files unreadable under the
        # recorded schema. Narrower update columns are cast UP to the
        # table's type instead. KEY columns must match exactly: the bucket
        # hash is type-sensitive (hash(int 5) != hash(bigint 5)), so a
        # widened key would silently scatter existing keys across buckets.
        widened: dict[str, T.DataType] = {}
        for f in old_schema.fields:
            uf = upd_fields.get(f.name)
            if uf is None or f.name in META_COLS:
                continue
            if f.name in keys:
                if uf.dataType != f.dataType:
                    raise ValueError(
                        f"key column {f.name!r} type change "
                        f"{f.dataType.simpleString()} -> "
                        f"{uf.dataType.simpleString()} is not supported "
                        "(bucket hashing is type-sensitive); cast updates "
                        "to the table's key type")
                continue
            w = _widened_type(f.dataType, uf.dataType)
            if w is not None:
                widened[f.name] = w
        evolved = T.StructType(
            [T.StructField(f.name, widened.get(f.name, f.dataType),
                           f.nullable) for f in old_schema.fields]
            + new_fields)
        evolved_names = [f.name for f in evolved.fields]

        upd = upd.withColumn("_bucket", self._bucket_expr(keys, m.n_buckets)).persist()
        try:
            # one partial-agg job yields both the touched-bucket set (pruning)
            # and the batch row count (metrics) — ≤ n_buckets rows collected
            bucket_counts = upd.groupBy("_bucket").count().collect()
            n_upd = sum(r["count"] for r in bucket_counts)
            if n_upd == 0:
                new_m = self._advance(m, m.files, batch_id, source,
                                      {"op": "merge", "rows_in": 0})
                return {"skipped": False, "batch_id": batch_id, "rows_in": 0,
                        "version": new_m.version}

            # --- bucket pruning: only buckets the batch touches are rewritten
            touched = sorted(r["_bucket"] for r in bucket_counts)
            touched_set = set(touched)
            tgt_entries = [e for e in m.files if e["bucket"] in touched_set]
            keep_entries = [e for e in m.files if e["bucket"] not in touched_set]

            tgt = self._read_files(spark, evolved, tgt_entries).alias("t")
            # align update columns to evolved schema (missing old columns -> null)
            data_cols = [c for c in evolved_names if c not in META_COLS]
            for c in data_cols:
                if c not in upd.columns:
                    upd = upd.withColumn(c, F.lit(None).cast(evolved[c].dataType))
                elif upd.schema[c].dataType != evolved[c].dataType:
                    # narrower update column -> cast UP to the table type
                    # (or to the just-widened type) — but ONLY when the
                    # table's type is a recognized LOSSLESS widening of the
                    # batch's (the inverse of the evolution rule above). A
                    # blind cast here would silently truncate (double sent
                    # for a long column) or null out (string for numeric)
                    # under non-ANSI Spark — silent data loss (ADVICE r6).
                    if _widened_type(upd.schema[c].dataType,
                                     evolved[c].dataType) != evolved[c].dataType:
                        raise ValueError(
                            f"column {c!r}: update type "
                            f"{upd.schema[c].dataType.simpleString()} is not a "
                            f"lossless narrowing of the table type "
                            f"{evolved[c].dataType.simpleString()}; cast the "
                            "batch explicitly if the loss is intended")
                    upd = upd.withColumn(c, F.col(c).cast(evolved[c].dataType))
            s_cols = [*data_cols, "_seq", "_deleted"]
            if self.change_feed and self.feed_preimages:
                s_cols.append("_op")     # feed post-rows keep the batch op
            s = upd.select(*s_cols).alias("s")

            joined = tgt.join(s, on=keys, how="full_outer")
            take_src = F.col("s._seq").isNotNull() & (
                F.col("t._seq").isNull() | (F.col("s._seq") > F.col("t._seq")))
            payload_cols = [c for c in data_cols if c not in keys]
            merged = joined.select(
                *keys,
                *[F.when(take_src, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
                  for c in payload_cols],
                F.when(take_src, F.col("s._seq")).otherwise(F.col("t._seq")).alias("_seq"),
                F.when(take_src, F.col("s._deleted")).otherwise(F.col("t._deleted")).alias("_deleted"),
            ).withColumn("_bucket", self._bucket_expr(keys, m.n_buckets))

            version = m.version + 1
            change_entry: list[dict[str, Any]] = []
            staged_rel: str | None = None
            if self.change_feed:
                # CDC-OUT: this commit's compacted delta (the LWW winners as
                # submitted, deletes as _op='d' tombstone rows). Cost is one
                # extra write of ~|keys| rows — the winners are already
                # cached by apply_batch, no extra source pass.
                # The delta is STAGED under a hidden prefix (dot-dirs are
                # invisible to stream_changes' file listing) and published
                # to its final path only after the manifest commit wins —
                # a lost commit attempt or crash can therefore never leak a
                # phantom/duplicate micro-batch to streaming consumers.
                import uuid as _uuid
                uid = _uuid.uuid4().hex[:8]
                rel = os.path.join("changes", f"c{version:012d}-{uid}.parquet")
                staged_rel = os.path.join("changes",
                                          f".stage-c{version:012d}-{uid}")
                if self.feed_preimages:
                    # Delta-CDF-shaped delta: APPLIED winners only, plus the
                    # pre-image of every live row they overwrote/deleted
                    # ('pu'/'pd', OLD _seq). Submitted winners that lose the
                    # seq guard are omitted — replay-neutral, and required
                    # for additive consumers (a losing 'u' row would add a
                    # contribution whose pre-image never existed). Costs one
                    # extra evaluation of the bucket-pruned join.
                    applied = joined.filter(take_src)
                    post = applied.select(
                        *keys,
                        *[F.col(f"s.{c}").alias(c) for c in payload_cols],
                        F.col("s._op").alias("_op"),
                        F.col("s._seq").alias("_seq"))
                    had_live = (F.col("t._seq").isNotNull()
                                & ~F.coalesce(F.col("t._deleted"),
                                              F.lit(False)))
                    pre = applied.filter(had_live).select(
                        *keys,
                        *[F.col(f"t.{c}").alias(c) for c in payload_cols],
                        F.when(F.col("s._deleted"), F.lit("pd"))
                         .otherwise(F.lit("pu")).alias("_op"),
                        F.col("t._seq").alias("_seq"))
                    feed_df = post.unionByName(pre)
                else:
                    feed_df = upd.drop("_bucket", "_deleted")
                (feed_df
                    .write.mode("errorifexists")
                    .parquet(os.path.join(self.root, staged_rel)))
                change_entry = [{"version": version, "path": rel,
                                 "staged": staged_rel}]
            new_entries = self._write_bucketed(merged, version)
            try:
                new_m = self._advance(
                    m, keep_entries + new_entries, batch_id, source,
                    {"op": "merge", "rows_in": n_upd, "buckets_touched": len(touched),
                     "files_rewritten": len(tgt_entries), "files_written": len(new_entries)},
                    evolved if (new_fields or widened) else None, version,
                    change_files=change_entry)
            except CommitConflict:
                if staged_rel is not None:
                    # lost the commit race: the staged delta belongs to no
                    # committed manifest — drop it before the retry re-stages
                    self.io.remove_tree(os.path.join(self.root, staged_rel))
                raise
            if staged_rel is not None:
                self._heal_changes(new_m)
            return {"skipped": False, "batch_id": batch_id, "rows_in": n_upd,
                    "buckets_touched": len(touched), "version": new_m.version}
        finally:
            upd.unpersist()

    def _advance(self, m: Manifest, files, batch_id, source,
                 lineage_entry: dict[str, Any], evolved: T.StructType | None = None,
                 version: int | None = None,
                 change_files: list[dict[str, Any]] | None = None) -> Manifest:
        version = version if version is not None else m.version + 1
        committed = dict(m.committed)
        if batch_id is not None:
            committed[source] = batch_id
        lineage_entry = {"commit": version, "batch_id": batch_id, "source": source,
                         **lineage_entry}
        new_m = Manifest(
            version=version, table=m.table, key_cols=m.key_cols,
            n_buckets=m.n_buckets,
            schema_json=json.dumps(evolved.jsonValue()) if evolved is not None else m.schema_json,
            files=files, committed=committed, properties=m.properties,
            lineage=(m.lineage + [lineage_entry])[-50:],
            change_files=m.change_files + (change_files or []))
        self._commit(new_m, parent=m)
        return new_m

    # ------------------------------------------------------------ change feed

    def _heal_changes(self, m: Manifest) -> None:
        """Publish committed-but-unpublished change deltas. A delta is
        staged hidden and moved to its final path only after the manifest
        commit wins; a crash between commit and publish leaves the staged
        dir, which ANY later reader/writer/vacuum heals idempotently here
        (losing a concurrent heal race is fine — the move tolerates a
        missing source / existing destination)."""
        for e in m.change_files:
            staged = e.get("staged")
            if not staged:
                continue          # pre-staging manifest entry (old layout)
            final = os.path.join(self.root, e["path"])
            staged_abs = os.path.join(self.root, staged)
            if self.io.is_dir(staged_abs) and not self.io.is_dir(final):
                try:
                    self.io.move_dir(staged_abs, final)
                except FileNotFoundError:
                    pass

    def changes(self, spark: SparkSession, *, from_version: int = 1,
                to_version: int | None = None) -> DataFrame:
        """Read the change feed: one row per applied LWW winner per commit
        (columns: keys + payload + _op + _seq + _commit), commits in
        [from_version, to_version]. Downstream incremental consumers replay
        it with max-seq-per-key LWW; replay(snapshot + feed) reproduces
        ``read()`` exactly (pinned by tests) — the engine's table->event
        direction, mirroring the reference connector's Kafka emission.

        On a ``feed_preimages`` table, deltas additionally carry 'pu'/'pd'
        pre-image rows (the overwritten/deleted live row, OLD ``_seq``) and
        post rows are restricted to APPLIED winners — the Delta-CDF shape
        consumed by operators/incremental.py. Pre-image rows carry old seqs,
        so LWW replayers (mirror_changes) are unaffected by construction."""
        m = self.manifest(to_version)
        self._heal_changes(m)
        sel = [e for e in m.change_files if e["version"] >= from_version]
        if not sel:
            return spark.createDataFrame([], self._feed_schema(m))
        # ONE scan over all selected delta dirs (a per-file union loop would
        # grow the plan linearly with commit count — a 10k-commit feed must
        # stay a single FileScan). The commit version is recovered from the
        # delta dir name (c{version:012d}-{uid}.parquet) via input_file_name;
        # the explicit CURRENT feed schema null-fills evolved columns in
        # older files, like every other multi-version read here.
        schema = self._feed_schema(m, with_commit=False)
        paths = [os.path.join(self.root, e["path"]) for e in sel]
        return (spark.read.schema(schema).parquet(*paths)
                .withColumn("_commit", F.regexp_extract(
                    F.input_file_name(),
                    r"/c(\d{12})-[0-9a-f]+\.parquet/", 1).cast("long")))

    def _feed_schema(self, m: Manifest, *, with_commit: bool = True) -> T.StructType:
        fields = [f for f in m.schema().fields if f.name != "_deleted"]
        fields = fields + [T.StructField("_op", T.StringType(), True)]
        if with_commit:
            fields.append(T.StructField("_commit", T.LongType(), True))
        return T.StructType(fields)

    def stream_changes(self, spark: SparkSession,
                       **reader_options: str) -> DataFrame:
        """Subscribe to the change feed as a Structured Streaming source:
        every future merge commit's delta file becomes a micro-batch for
        downstream incremental consumers (the subscription analog of the
        reference's Kafka topic). Schema is the CURRENT evolved feed schema;
        older files read missing columns as null. Pair with a checkpoint on
        the consumer side for exactly-once downstream processing.

        Only PUBLISHED deltas are visible: merge stages each delta under a
        hidden ``.stage-*`` prefix (Spark's file listing skips dot-paths)
        and publishes it after its manifest commit wins, so the stream never
        ingests a phantom delta from a lost commit attempt."""
        cur = self.manifest()
        self._heal_changes(cur)
        # a consumer may subscribe BEFORE the first delta is published
        self.io.ensure_dir(os.path.join(self.root, "changes"))
        reader = (spark.readStream
                  .schema(self._feed_schema(cur, with_commit=False))
                  # each commit's delta is a c{version}.parquet directory
                  .option("recursiveFileLookup", "true"))
        for k, v in reader_options.items():
            reader = reader.option(k, v)
        # _commit recovered from the delta dir name, as in changes() — lets
        # consumers order deltas and detect resync ('r') epochs
        return (reader.parquet(os.path.join(self.root, "changes"))
                .withColumn("_commit", F.regexp_extract(
                    F.input_file_name(),
                    r"/c(\d{12})-[0-9a-f]+\.parquet/", 1).cast("long")))

    # ------------------------------------------------------------- properties

    def update_properties(self, props: dict[str, Any], *,
                          conflict_retries: int = 4) -> Manifest:
        """Commit a metadata-only version carrying updated properties
        (state-doc persistence — SourceInfo.java:107-125 analog). Metadata
        commits are cheap, so losing a race just re-reads and re-applies."""
        attempt = 0
        while True:
            m = self.manifest()
            new_m = Manifest(version=m.version + 1, table=m.table, key_cols=m.key_cols,
                             n_buckets=m.n_buckets, schema_json=m.schema_json,
                             files=m.files, committed=m.committed,
                             properties={**m.properties, **props},
                             lineage=(m.lineage + [{"commit": m.version + 1, "op": "props"}])[-50:],
                             change_files=m.change_files)
            try:
                self._commit(new_m, parent=m)
                return new_m
            except CommitConflict:
                if attempt >= conflict_retries:
                    raise
                attempt += 1

    # ------------------------------------------------------------ maintenance

    def compact(self, spark: SparkSession, *, drop_tombstones_below_seq: int | None = None,
                target_buckets: list[int] | None = None,
                zorder_cols: list[str] | None = None,
                zorder_files_per_bucket: int = 4,
                conflict_retries: int = 1) -> Manifest:
        """Rewrite buckets to one file each; optionally purge tombstones whose
        _seq is below a watermark (no older event can still arrive).
        Losing a commit race to a concurrent merge re-reads the new manifest
        and recompacts (bounded by ``conflict_retries``).

        ``zorder_cols`` switches the rewrite from linear key clustering to
        Z-ORDER layout (``lake/zorder.py``): each bucket is split into
        ~``zorder_files_per_bucket`` files, each covering a contiguous
        Morton-curve range of the z-columns (numeric directly; strings
        rank through an order-preserving 8-byte-prefix key), so the per-file
        min/max stats in the manifest become tight on EVERY z-column and
        :meth:`scan` skips files for predicates on any of them — the
        multi-column data-skipping layout (Delta OSS ZORDER BY). One extra
        quantile job at compaction time; read paths are unchanged."""
        try:
            return self._compact_once(spark, drop_tombstones_below_seq,
                                      target_buckets, zorder_cols,
                                      zorder_files_per_bucket)
        except CommitConflict:
            if conflict_retries <= 0:
                raise
            return self.compact(spark,
                                drop_tombstones_below_seq=drop_tombstones_below_seq,
                                target_buckets=target_buckets,
                                zorder_cols=zorder_cols,
                                zorder_files_per_bucket=zorder_files_per_bucket,
                                conflict_retries=conflict_retries - 1)

    def _compact_once(self, spark: SparkSession,
                      drop_tombstones_below_seq: int | None,
                      target_buckets: list[int] | None,
                      zorder_cols: list[str] | None = None,
                      zorder_files_per_bucket: int = 4) -> Manifest:
        m = self.manifest()
        buckets = sorted({e["bucket"] for e in m.files}) if target_buckets is None else target_buckets
        bset = set(buckets)
        tgt_entries = [e for e in m.files if e["bucket"] in bset]
        keep_entries = [e for e in m.files if e["bucket"] not in bset]
        df = self._read_files(spark, m.schema(), tgt_entries)
        if drop_tombstones_below_seq is not None:
            df = df.filter(~(F.col("_deleted") &
                             (F.col("_seq") < F.lit(drop_tombstones_below_seq))))
        df = df.withColumn("_bucket", self._bucket_expr(m.key_cols, m.n_buckets))
        version = m.version + 1
        if zorder_cols:
            from .zorder import with_zvalue
            df = with_zvalue(df, zorder_cols)
            new_entries = self._write_bucketed(
                df, version, sort_cols=m.key_cols, zval_col="_zval",
                n_range_parts=max(1, len(buckets)) * zorder_files_per_bucket)
            op = {"op": "compact", "zorder": list(zorder_cols),
                  "files_rewritten": len(tgt_entries)}
        else:
            new_entries = self._write_bucketed(df, version,
                                               sort_cols=m.key_cols)
            op = {"op": "compact", "files_rewritten": len(tgt_entries)}
        return self._advance(m, keep_entries + new_entries, None, "compact",
                             op, None, version)

    def compact_small_files(self, spark: SparkSession, *,
                            max_files_per_bucket: int = 4) -> Manifest | None:
        """Compact only the buckets whose file count exceeds the threshold.

        Note the COW MERGE is already self-compacting for the buckets it
        touches (it rewrites them whole, one file per bucket per commit), so
        under a pure tail this is a no-op; it exists for tables populated by
        external appenders or after raising ``n_buckets``. Returns the new
        manifest, or None if no bucket crossed the threshold."""
        m = self.manifest()
        counts: dict[int, int] = {}
        for e in m.files:
            counts[e["bucket"]] = counts.get(e["bucket"], 0) + 1
        targets = sorted(b for b, n in counts.items() if n > max_files_per_bucket)
        if not targets:
            return None
        return self.compact(spark, target_buckets=targets)

    def expire_versions(self, *, keep_last: int = 10) -> int:
        """Snapshot expiry: drop manifest files older than the newest
        ``keep_last`` versions (time travel to them stops working — an AS OF
        read of an expired version fails with FileNotFoundError on the
        MANIFEST, a clear retention error, never a missing-parquet crash,
        because :meth:`vacuum` only reclaims files no retained manifest
        references). Returns the number of manifests removed. The CURRENT
        version is never touched."""
        vs = self._versions()
        victims = vs[:-keep_last] if keep_last > 0 else vs[:-1]
        for v in victims:
            self.io.delete_file(os.path.join(self.log_dir, f"v{v:012d}.json"))
        return len(victims)

    def expire_change_feed(self, *, below_version: int,
                           conflict_retries: int = 4) -> int:
        """Change-feed retention: commit a metadata-only version whose
        ``change_files`` drops entries below ``below_version``. Without this
        the feed list (and its delta dirs) grows with commit count forever.
        The dropped deltas stay on disk until every retained manifest that
        still lists them expires, then :meth:`vacuum` reclaims them —
        downstream consumers get the full retention window to catch up, and
        a consumer needing older history must re-bootstrap from a snapshot
        (exactly Kafka's compacted-topic contract). Returns entries dropped.
        """
        attempt = 0
        while True:
            m = self.manifest()
            kept = [e for e in m.change_files if e["version"] >= below_version]
            dropped = len(m.change_files) - len(kept)
            if dropped == 0:
                return 0
            new_m = Manifest(
                version=m.version + 1, table=m.table, key_cols=m.key_cols,
                n_buckets=m.n_buckets, schema_json=m.schema_json,
                files=m.files, committed=m.committed, properties=m.properties,
                lineage=(m.lineage + [{"commit": m.version + 1,
                                       "op": "expire_change_feed",
                                       "dropped": dropped}])[-50:],
                change_files=kept)
            try:
                self._commit(new_m, parent=m)
                return dropped
            except CommitConflict:
                if attempt >= conflict_retries:
                    raise
                attempt += 1

    @staticmethod
    def _staging_version(name: str) -> int:
        """Commit version embedded in a staging dir name
        (``c{v:012d}[-uid]`` / ``.stage-c{v:012d}-uid``); 0 if unparseable
        (legacy junk — reclaimable when unreferenced)."""
        s = name[len(".stage-"):] if name.startswith(".stage-") else name
        if s.startswith("c"):
            digits = s[1:13]
            if len(digits) == 12 and digits.isdigit():
                return int(digits)
        return 0

    def vacuum(self, *, grace_s: float = 3600.0) -> int:
        """Delete data/feed files no RETAINED manifest references. Returns
        count removed.

        Retention coupling (standard lakehouse semantics): the live set is
        the union over every manifest still in the log — a concurrent
        time-travel reader of any retained version never loses a file under
        it; run :meth:`expire_versions` first to make old files reclaimable.
        In-flight protection is TWO independent guards:

        * a staging dir whose embedded version is AHEAD of the current
          version may belong to a writer racing toward its commit and is
          left alone (if that writer loses, the dir's version becomes
          <= current and a later vacuum reclaims it);
        * any unreferenced file modified within ``grace_s`` is spared — the
          modification-time retention Delta's VACUUM uses. The version guard
          alone is insufficient: a committer that loses its optimistic race
          holds staging whose embedded version is momentarily <= current
          until its retry re-homes it (ADVICE r3), and a slow snapshot write
          can be overtaken by many commits before it ever reaches commit.
          ``grace_s=0`` reclaims immediately (tests / known-dead writers).
        """
        import time as _time
        now = _time.time()
        cur = self.manifest()
        self._heal_changes(cur)
        live: set[str] = set()
        live_change_dirs: set[str] = set()
        for v in self._versions():
            m = self.manifest(v)
            live |= {os.path.join(self.root, e["path"]) for e in m.files}
            # a feed "file" is a parquet dir (part files + _SUCCESS inside)
            live_change_dirs |= {os.path.join(self.root, e["path"])
                                 for e in m.change_files}
        removed = 0
        for sub in ("data", "changes"):
            root = os.path.join(self.root, sub)
            if not self.io.is_dir(root):
                continue
            for d in self.io.list_dir(root):
                top = os.path.join(root, d)
                if not self.io.is_dir(top):
                    continue
                if top in live_change_dirs:
                    continue
                if self._staging_version(d) > cur.version:
                    continue                      # possibly in-flight writer
                for dirpath, files in self.io.walk_files(top):
                    for f in files:
                        p = os.path.join(dirpath, f)
                        if p not in live and (f.endswith(".parquet")
                                              or f.startswith(".")
                                              or f.startswith("_")):
                            if grace_s > 0:
                                try:
                                    if now - self.io.file_mtime(p) < grace_s:
                                        continue
                                except FileNotFoundError:
                                    continue
                            self.io.delete_file(p)
                            removed += 1
                    self.io.remove_dir_if_empty(dirpath)
        return removed
