from dativo_ingest_spark.config.contracts import (  # noqa: F401
    AssetDefinition,
    Field,
    JobConfig,
    SourceConfig,
    TargetConfig,
)
