"""Wire-schema export parity with the reference's Kafka Connect schemas
(RecordConverter.java:50-56, SourceInfo.java:78-84, DynamoDbJson.java,
getKeySchema) plus the Avro translation rules."""

import json

from kafka_connect_dynamodb_spark.functions.schema_export import (
    JSON_LOGICAL_NAME, envelope_schema, export_json, key_schema,
    source_info_schema, to_avro_schema)


def test_envelope_schema_field_for_field():
    env = envelope_schema()
    assert env["name"] == "com.trustpilot.connector.dynamodb.envelope"
    names = [f["field"] for f in env["fields"]]
    # Envelope.FieldName order as built in RecordConverter.java:50-56
    assert names == ["version", "document", "source", "op", "ts_ms"]
    doc = env["fields"][1]
    assert doc["type"] == "string"
    assert doc["name"] == JSON_LOGICAL_NAME and doc["version"] == 1
    assert all(not f["optional"] for f in env["fields"])


def test_source_info_schema_matches_reference():
    src = source_info_schema()
    got = [(f["field"], f["type"], f["optional"]) for f in src["fields"]]
    # SourceInfo.java:78-84, including which fields are OPTIONAL_*
    assert got == [
        ("version", "string", False),
        ("table_name", "string", False),
        ("init_sync", "boolean", False),
        ("init_sync_state", "string", False),
        ("init_sync_start", "int64", False),
        ("init_sync_end", "int64", True),
        ("init_sync_count", "int64", True),
    ]


def test_key_schema_all_string_and_sanitized():
    ks = key_schema("my-topic.orders", ["user id", "1sort*key"])
    assert ks["name"] == "my_topic.orders.Key"      # Avro fullname adjust
    assert all(f["type"] == "string" and not f["optional"]
               for f in ks["fields"])               # DynamoDB keys: STRING
    # field names go through the module's own sanitizer rule
    from kafka_connect_dynamodb_spark.functions.names import (
        sanitize_attribute_name)
    assert [f["field"] for f in ks["fields"]] == [
        sanitize_attribute_name("user id"),
        sanitize_attribute_name("1sort*key")]


def test_avro_translation_rules():
    av = to_avro_schema(envelope_schema())
    assert av["type"] == "record" and av["name"] == "envelope"
    assert av["namespace"] == "com.trustpilot.connector.dynamodb"
    by_name = {f["name"]: f for f in av["fields"]}
    # required primitive
    assert by_name["op"]["type"] == "string"
    assert by_name["ts_ms"]["type"] == "long"
    # logical json string carries connect.name
    assert by_name["document"]["type"]["connect.name"] == JSON_LOGICAL_NAME
    # nested struct -> nested record; its optional fields are null unions
    src = by_name["source"]["type"]
    assert src["type"] == "record"
    sfields = {f["name"]: f for f in src["fields"]}
    assert sfields["init_sync_end"]["type"] == ["null", "long"]
    assert sfields["init_sync_end"]["default"] is None
    assert sfields["table_name"]["type"] == "string"


def test_export_json_deterministic():
    a = export_json("t.orders", ["repo", "path"])
    b = export_json("t.orders", ["repo", "path"])
    assert a == b
    d = json.loads(a)
    assert set(d) == {"topic", "connect", "avro"}
    assert d["connect"]["key"]["fields"][0]["field"] == "repo"
