"""bigdata_project_hust_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the query and
data-processing capabilities of the reference system
(tue09/Bigdata-project-HUST, surveyed in /root/repo/SURVEY.md), plus the
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) that a 100 TB deployment needs.

Design stance (SURVEY §7.0):
- DataFrame / Spark SQL only; no RDD API.
- Explicit StructType schemas (schemas.py); schema-on-read everywhere.
- Catalyst does the optimizing: declare plans, verify pushdown/broadcast
  with .explain(), never hand-schedule.
- Structured Streaming for the speed layer; foreachBatch for upsert sinks.
- Pandas UDFs only where built-ins genuinely can't express the op.
"""

__version__ = "0.1.0"
