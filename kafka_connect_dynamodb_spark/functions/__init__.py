from kafka_connect_dynamodb_spark.functions import envelope, hashing, names  # noqa: F401
