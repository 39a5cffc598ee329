"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``yamon_spark`` package; this module adapts
its declared-query registry (SURVEY.md §2.5 + beyond-reference operators)
to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> SparkSession:
    # event-time determinism: the oracle (DuckDB) treats timestamps as
    # naive UTC; pin the session the same way.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:  # noqa: BLE001 - conf may be restricted; defaults are fine
        pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's gauge
    rollup MV (res/schema.sql:39-50) re-expressed as a tumbling event-time
    window over the events stream (SURVEY §7.2 minimum slice)."""
    from yamon_spark.queries import all_queries

    _configure(spark)
    return all_queries()["q25_gauge_rollup_mv"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from yamon_spark.queries import all_queries

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in all_queries().items():
        def make(build):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                return build(_configure(spark), sf_dir)

            return run

        out[name] = make(q.build)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted -> rows-only)."""
    from yamon_spark.queries import all_queries

    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
