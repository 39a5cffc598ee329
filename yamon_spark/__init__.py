"""yamon_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference system (b1naryth1ef/yamon).

The reference is a metrics/logs/events ingestion pipeline (agent ->
forward server -> ClickHouse) whose analytical surface is delegated to
ClickHouse SQL over four MergeTree tables (reference: res/schema.sql).
This package re-expresses BOTH halves Spark-first:

- the ingestion dataflow as Structured Streaming (``yamon_spark.streaming``,
  ``yamon_spark.sources``),
- the analytical query surface as Spark SQL / DataFrame plans
  (``yamon_spark.queries``), letting Catalyst + Tungsten pick physical
  strategies (broadcast joins for dims, partial aggregation, whole-stage
  codegen, AQE skew handling),
- plus large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) in ``yamon_spark.operators``.

Nothing here is a translation of the reference's Go code; the reference
defines WHAT to compute, Spark idioms define HOW.
"""

__version__ = "0.1.0"

from yamon_spark.session import get_spark  # noqa: F401
