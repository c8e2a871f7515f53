"""npm_mirror_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of adeepbiswas/NPM-Mirror.

The reference (/root/reference) is a streaming ETL pipeline that mirrors the
NPM registry's CouchDB ``_changes`` feed through Kafka into a document store,
artifact files and monitoring topics. This package re-expresses its dataflow
semantics — JSON-document projection, routing filters, dedup/checkpointing,
arg-max-per-group, top-N retention, multi-sink fan-out, operational metrics —
as idiomatic PySpark DataFrame / Structured Streaming code, plus
scale-oriented extension operators (exact/fuzzy dedup, vector similarity
search, text analytics, multimodal column plumbing) for 100 TB-class
training-data pipelines.

Layout:
  session     — SparkSession factory (AQE, Arrow, tuned shuffle partitions)
  tables      — parquet table loaders for the driver's testdata star schema
  schema      — explicit StructType for the NPM change document (schema-on-write)
  operators/  — pure DataFrame -> DataFrame operator library
  sources/    — change-stream fixture generation + batch/stream readers
  streaming/  — Structured Streaming pipeline shell (sinks, metrics, dedup)
  plans/      — plan-inspection helpers (pushdown / codegen / broadcast checks)
"""

from npm_mirror_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
