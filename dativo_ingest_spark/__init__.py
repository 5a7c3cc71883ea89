"""dativo_ingest_spark — a PySpark-native ingestion + analytics engine.

A from-scratch rebuild of the capabilities of dativo-io/dativo-ingest
(config-driven EL(T): extract → validate/coerce per ODCS contract →
partitioned columnar write → catalog commit → incremental state), re-expressed
on Spark DataFrame / SQL / Structured Streaming primitives, plus the
large-scale training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) such an engine needs at 100 TB.

Design stance (see SURVEY.md §7): keep the reference's *contract surface*
(job YAML, connector recipes, ODCS assets, validation modes, incremental
strategies, tag hierarchy) and replace the row-batch generator execution
engine with declarative DataFrame plans that Catalyst/Tungsten optimize.
"""

__version__ = "0.1.0"

from dativo_ingest_spark.session import get_spark  # noqa: F401
