"""Hashing helpers: sha256 parity invariant + deterministic pseudo-randoms.

The per-row invariant vs the reference replay is ``sha256(content)`` equality
(BASELINE.json input_hint) — computed JVM-side with ``sha2``.

``hash_unit`` gives a partition-layout-independent uniform in [0,1): unlike
``F.rand(seed)`` (which depends on partition index), ``xxhash64`` of the row id
is a pure function of its inputs, so generated data is bit-identical at any
parallelism — required for the N-vs-4N scaling runs to see the same input.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_M = 1 << 31


def content_sha256(col: str | Column = "content") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def hash_unit(*cols: Column | str, salt: int = 0) -> Column:
    """Deterministic uniform [0,1) from arbitrary columns (partition-independent)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return (F.pmod(F.xxhash64(F.lit(salt), *cs), F.lit(_M)) / F.lit(float(_M)))


def bucket_of(key_cols: list[str], n_buckets: int) -> Column:
    """Hash bucket of a composite key — the lake table's partitioning function."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")
