from kafka_connect_dynamodb_spark.lake.table import LakeTable  # noqa: F401
