"""Naive single-threaded reference replay — the parity oracle (FIXTURES.md §3).

Semantics mirror the reference connector's downstream effect (event log +
Kafka log compaction => last state per key, tombstone removes the key,
DynamoDBSourceTask.java:353-361, docs/data.md:47-66) applied in per-key
sequence order with the pre-init-sync drop window (DynamoDBSourceTask.java:373-377).
Pure python dicts; deliberately shares no code with the engine.
"""

from __future__ import annotations

import hashlib
import json
from datetime import timedelta


def _plain(envelope_json):
    if envelope_json is None:
        return None
    out = {}
    for k, v in json.loads(envelope_json).items():
        out[k] = v.get("s", v.get("n"))
    return out


def replay(base_rows, event_rows, init_sync_start=None, window_hours=1):
    """base_rows: dicts (repo,path,commit,lang,content); event_rows: dicts
    (shard_id, seq_no, event_name, ts, keys, new_image). Returns
    {(repo,path): row_dict} of the final live state."""
    state = {}
    seqs = {}
    for r in base_rows:
        state[(r["repo"], r["path"])] = dict(r)
        seqs[(r["repo"], r["path"])] = -1

    events = []
    for e in event_rows:
        if init_sync_start is not None:
            ts = e["ts"]
            if ts + timedelta(hours=window_hours) <= init_sync_start:
                continue
        events.append(e)
    events.sort(key=lambda e: int(e["seq_no"]))

    for e in events:
        keys = _plain(e["keys"])
        k = (keys["repo"], keys["path"])
        seq = int(e["seq_no"])
        if seq <= seqs.get(k, -1):
            continue  # duplicate delivery or out-of-order stale event
        seqs[k] = seq
        if e["event_name"] == "REMOVE":
            state.pop(k, None)
        else:
            img = _plain(e["new_image"])
            state[k] = img
    return state


def final_hashes(state):
    """{(repo,path): sha256(content)} — the per-row parity invariant."""
    return {k: hashlib.sha256((v.get("content") or "").encode()).hexdigest()
            for k, v in state.items()}
