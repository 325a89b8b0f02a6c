"""SourceInfo-style task state: the two-phase protocol's durable state doc.

Mirrors the reference's offset payload exactly (SourceInfo.java:107-147;
fixture values SourceInfoTests.java:76-122, FIXTURES.md §4): version,
table_name, init_sync_state ∈ {UNDEFINED, RUNNING, FINISHED}
(InitSyncStatus.java:3-7), init_sync_start/end (epoch millis),
init_sync_count, exclusive_start_key.

Persistence differs by design: the reference round-trips this through Kafka
Connect's offset topic; we commit it into the lake table's manifest
``properties`` (atomic with data commits) — plus Structured Streaming's own
checkpoint handles the stream position, making ``exclusive_start_key``
informational (kept for parity and for mid-snapshot resume of the batch job).
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass, field


class InitSyncStatus:
    UNDEFINED = "UNDEFINED"
    RUNNING = "RUNNING"
    FINISHED = "FINISHED"


@dataclass
class SourceInfo:
    table_name: str
    version: str = "1.0"
    init_sync_state: str = InitSyncStatus.UNDEFINED
    init_sync_start: int | None = None   # epoch millis (SourceInfo.java:82)
    init_sync_end: int | None = None
    init_sync_count: int = 0
    exclusive_start_key: str | None = None  # JSON string (SourceInfo.java:115)
    properties: dict = field(default_factory=dict)

    # -- transitions (SourceInfo.java:61-105) --------------------------------
    def start_init_sync(self, now_ms: int | None = None) -> None:
        self.init_sync_state = InitSyncStatus.RUNNING
        self.init_sync_start = now_ms if now_ms is not None else int(time.time() * 1000)
        self.init_sync_end = None
        self.init_sync_count = 0
        self.exclusive_start_key = None

    def end_init_sync(self, count: int, now_ms: int | None = None) -> None:
        self.init_sync_state = InitSyncStatus.FINISHED
        self.init_sync_end = now_ms if now_ms is not None else int(time.time() * 1000)
        self.init_sync_count = count
        self.exclusive_start_key = None

    # -- offset round-trip (SourceInfo.java:107-147) -------------------------
    def to_offset(self) -> dict:
        d = asdict(self)
        d.pop("properties")
        return d

    @staticmethod
    def from_offset(d: dict) -> "SourceInfo":
        return SourceInfo(
            table_name=d["table_name"], version=d.get("version", "1.0"),
            init_sync_state=d.get("init_sync_state", InitSyncStatus.UNDEFINED),
            init_sync_start=d.get("init_sync_start"),
            init_sync_end=d.get("init_sync_end"),
            init_sync_count=d.get("init_sync_count", 0),
            exclusive_start_key=d.get("exclusive_start_key"))

    def to_json(self) -> str:
        return json.dumps(self.to_offset(), sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "SourceInfo":
        return SourceInfo.from_offset(json.loads(s))
