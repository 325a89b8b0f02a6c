"""Record-mapper contract tests — the RecordConverterTests analog
(utils/RecordConverterTests.java: golden documents :186-204, sanitization
:206-279, op codes via Envelope)."""

import json

from pyspark.sql import functions as F

from kafka_connect_dynamodb_spark.functions import envelope as env
from kafka_connect_dynamodb_spark.functions.names import (
    adjust_schema_name, sanitize_attribute_name)
from kafka_connect_dynamodb_spark.operators.filters import decode_op, project_image
import pytest


def test_decode_payload_fast_path(spark):
    raw = json.dumps({"repo": {"s": "r1"}, "path": {"s": "a/b.py"},
                      "commit": {"s": "c" * 40}, "lang": {"s": "py"},
                      "content": {"s": "print(1)\n"}})
    df = spark.createDataFrame([(raw,)], "new_image string")
    out = env.decode_payload(df).select(*env.PAYLOAD_FIELDS).collect()[0]
    assert out.repo == "r1" and out.path == "a/b.py"
    assert out.content == "print(1)\n" and out.lang == "py"


def test_decode_stringifies_n_keys(spark):
    # N-typed keys arrive stringified, like RecordConverterTests.java:181-183
    raw = json.dumps({"repo": {"n": "2"}, "path": {"s": "t"}})
    df = spark.createDataFrame([(raw,)], "new_image string")
    out = env.decode_payload(df, fields=["repo", "path"]).collect()[0]
    assert out.repo == "2" and isinstance(out.repo, str)


def test_fast_path_tolerates_exotic_typed_neighbors(spark):
    """An attribute typed m/l/ss (reference keeps these only inside the
    document JSON text, never as schema) must decode to NULL on the fast
    path WITHOUT corrupting sibling attributes — the columnar analog of the
    reference's permissive per-record skip (F5)."""
    raw = json.dumps({"repo": {"s": "r1"}, "path": {"s": "p"},
                      "commit": {"m": {"x": {"n": "1"}}},   # exotic: map-typed
                      "lang": {"ss": ["a", "b"]},           # exotic: string set
                      "content": {"s": "body"}})
    df = spark.createDataFrame([(raw,)], "new_image string")
    out = df
    out = env.decode_payload(out).select(*env.PAYLOAD_FIELDS).collect()[0]
    assert out.repo == "r1" and out.path == "p" and out.content == "body"
    assert out.commit is None and out.lang is None


def test_encode_roundtrip(spark):
    df = spark.createDataFrame(
        [("r1", "p1", "abc", "py", "x=1")],
        "repo string, path string, commit string, lang string, content string")
    enc = df.select(env.encode_attr_json(env.PAYLOAD_FIELDS).alias("j"))
    back = env.decode_payload(enc, col="j").select(*env.PAYLOAD_FIELDS).collect()[0]
    assert back.repo == "r1" and back.content == "x=1"


def test_general_decoder_nested_types(spark):
    # nested m/l/ss/ns/bool/null per docs/data.md:16
    raw = json.dumps({
        "k": {"s": "v"},
        "num": {"n": "1.5"},
        "flag": {"bool": True},
        "none": {"null": True},
        "m": {"m": {"inner": {"n": "7"}}},
        "tags": {"ss": ["a", "b"]},
        "nums": {"ns": ["1", "2"]},
        "lst": {"l": [{"s": "x"}, {"n": "9"}]},
    })
    df = spark.createDataFrame([(raw,)], "doc string")
    out = df.select(env.attr_envelope_to_plain_json("doc").alias("p")).collect()[0]
    plain = json.loads(out.p)
    assert plain["k"] == "v" and plain["num"] == "1.5"
    assert plain["flag"] is True and plain["none"] is None
    assert plain["m"] == {"inner": "7"}
    assert plain["tags"] == ["a", "b"] and plain["nums"] == ["1", "2"]
    assert plain["lst"] == ["x", "9"]


def test_envelope_value_struct(spark):
    df = spark.createDataFrame(
        [("r1", "p1", "abc", "py", "x=1", "c", "2024-06-01 00:00:00")],
        "repo string, path string, commit string, lang string, content string,"
        "op string, ts string").withColumn("ts", F.to_timestamp("ts"))
    out = env.encode_envelope(df, table_name="t").collect()[0]
    assert out.version == "1.0" and out.op == "c"
    assert out.ts_ms == 1717200000000  # epoch millis (RecordConverter.java:107)
    assert json.loads(out.document)["repo"]["s"] == "r1"
    assert out.source.table_name == "t"


def test_op_decode(spark):
    # INSERT->c MODIFY->u REMOVE->d (DynamoDBSourceTask.java:383-394)
    df = spark.createDataFrame([("INSERT",), ("MODIFY",), ("REMOVE",), ("JUNK",)],
                               "event_name string")
    out = [r.op for r in df.select(decode_op(strict=False).alias("op")).collect()]
    assert out == ["c", "u", "d", None]


def test_op_decode_strict_raises(spark):
    df = spark.createDataFrame([("JUNK",)], "event_name string")
    with pytest.raises(Exception):
        df.select(decode_op(strict=True).alias("op")).collect()


def test_image_projection(spark):
    # F1: NewImage else Keys (DynamoDBSourceTask.java:338-343)
    df = spark.createDataFrame([("img", "keys"), (None, "keys2")],
                               "new_image string, keys string")
    out = [r.i for r in df.select(project_image().alias("i")).collect()]
    assert out == ["img", "keys2"]


def test_sanitize_attribute_name():
    # goldens from RecordConverterTests.java:259-279
    assert sanitize_attribute_name("test-1234") == "test1234"
    assert sanitize_attribute_name("1-starts-with-number") == "startswithnumber"
    assert sanitize_attribute_name("_starts_with_underscore") == "_starts_with_underscore"
    assert sanitize_attribute_name("test!@£$%^") == "test"
    # java replaceAll is single-pass: only the ^-anchored char strips
    assert sanitize_attribute_name("1234") == "234"
    with pytest.raises(ValueError):
        sanitize_attribute_name("!@#")


def test_adjust_schema_name():
    # SchemaNameAdjuster rules: invalid chars -> '_'
    assert adjust_schema_name("a-b.1c") == "a_b._c"
    assert adjust_schema_name("ok_name.Ok2") == "ok_name.Ok2"
