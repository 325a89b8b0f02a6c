"""Kafka-Connect / Avro wire-schema export — the schema surface a
reference consumer actually subscribes to.

The reference publishes two schemas per table through Kafka Connect
(``utils/RecordConverter.java:50-56, getKeySchema``):

* the KEY schema — a struct named ``<topic>.Key`` whose fields are the
  table's (sanitized) key attribute names, every one a STRING (DynamoDB
  keys serialize as strings regardless of N/S/B type);
* the ENVELOPE value schema — a struct named
  ``<namespace>.envelope`` with fields, in order: ``version`` STRING,
  ``document`` (the Debezium JSON logical string type,
  ``com.trustpilot.connector.dynamodb.json`` v1 —
  ``utils/DynamoDbJson.java:19-31``), ``source`` (the SourceInfo struct:
  version STRING, table_name STRING, init_sync BOOLEAN, init_sync_state
  STRING, init_sync_start INT64, init_sync_end OPTIONAL_INT64,
  init_sync_count OPTIONAL_INT64 — ``SourceInfo.java:78-84``), ``op``
  STRING, ``ts_ms`` INT64 (``Envelope.java:53-75``).

This module renders both as plain dicts in Kafka Connect's JSON schema
shape, plus an Avro translation following the public Confluent AvroData
conventions (struct → record, optional field → ``["null", T]`` union
with ``default: null``, logical/semantic names carried as
``connect.name``/``connect.version``) so a consumer can register them in
a schema registry without running the connector. Driver-side metadata
only — nothing here touches data paths.
"""

from __future__ import annotations

import json

from .names import adjust_schema_name, sanitize_attribute_name

JSON_LOGICAL_NAME = "com.trustpilot.connector.dynamodb.json"
ENVELOPE_NAMESPACE = "com.trustpilot.connector.dynamodb"


def _field(name: str, ftype, optional: bool = False) -> dict:
    return {"field": name, "type": ftype, "optional": optional}


def source_info_schema() -> dict:
    """SourceInfo.structSchema() field-for-field (SourceInfo.java:78-84)."""
    return {
        "type": "struct",
        "name": adjust_schema_name(ENVELOPE_NAMESPACE + ".source"),
        "fields": [
            _field("version", "string"),
            _field("table_name", "string"),
            _field("init_sync", "boolean"),
            _field("init_sync_state", "string"),
            _field("init_sync_start", "int64"),
            _field("init_sync_end", "int64", optional=True),
            _field("init_sync_count", "int64", optional=True),
        ],
    }


def envelope_schema() -> dict:
    """The value schema (RecordConverter.java:50-56): version / document /
    source / op / ts_ms, with ``document`` the JSON logical string."""
    doc = {"field": "document", "type": "string", "optional": False,
           "name": JSON_LOGICAL_NAME, "version": 1}
    return {
        "type": "struct",
        "name": adjust_schema_name(ENVELOPE_NAMESPACE + ".envelope"),
        "fields": [
            _field("version", "string"),
            doc,
            {"field": "source", "optional": False,
             **{"type": source_info_schema()}},
            _field("op", "string"),
            _field("ts_ms", "int64"),
        ],
    }


def key_schema(topic: str, key_names: list[str]) -> dict:
    """getKeySchema(): struct named ``<topic>.Key``, every (sanitized)
    key attribute a required STRING."""
    return {
        "type": "struct",
        "name": adjust_schema_name(f"{topic}.Key"),
        "fields": [_field(sanitize_attribute_name(k), "string")
                   for k in key_names],
    }


# ------------------------------------------------------------------ Avro

_PRIMITIVES = {
    "string": "string", "boolean": "boolean",
    "int8": "int", "int16": "int", "int32": "int", "int64": "long",
    "float32": "float", "float64": "double", "bytes": "bytes",
}


def _avro_type(connect_type, extra: dict | None = None):
    if isinstance(connect_type, dict):       # nested struct
        return to_avro_schema(connect_type)
    t = _PRIMITIVES[connect_type]
    props = {k: v for k, v in (extra or {}).items()
             if k in ("name", "version")}
    if props:
        out = {"type": t, "connect.name": props.get("name")}
        if "version" in props:
            out["connect.version"] = props["version"]
        return out
    return t


def to_avro_schema(connect_schema: dict) -> dict:
    """Avro record translation of a Connect struct schema (Confluent
    AvroData conventions: record per struct, nullable union + null
    default for optional fields, ``connect.name``/``connect.version``
    carried for logical types). The record name is the last dotted
    segment, the namespace the rest."""
    full = connect_schema["name"]
    ns, _, rec = full.rpartition(".")
    fields = []
    for f in connect_schema["fields"]:
        at = _avro_type(f["type"], f)
        if f.get("optional"):
            fields.append({"name": f["field"], "type": ["null", at],
                           "default": None})
        else:
            fields.append({"name": f["field"], "type": at})
    out = {"type": "record", "name": rec or full, "fields": fields,
           "connect.name": full}
    if ns:
        out["namespace"] = ns
    return out


def export_table_schemas(topic: str, key_names: list[str]) -> dict:
    """Everything a consumer registers for one table's topic: the Connect
    key/value schemas and their Avro translations, JSON-serializable and
    deterministic (stable field order, sorted JSON keys on dump)."""
    ks, vs = key_schema(topic, key_names), envelope_schema()
    return {
        "topic": topic,
        "connect": {"key": ks, "value": vs},
        "avro": {"key": to_avro_schema(ks), "value": to_avro_schema(vs)},
    }


def export_json(topic: str, key_names: list[str]) -> str:
    return json.dumps(export_table_schemas(topic, key_names),
                      sort_keys=True)
