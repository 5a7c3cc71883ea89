from dativo_ingest_spark.functions import coercion, hashing, text, vectors  # noqa: F401
