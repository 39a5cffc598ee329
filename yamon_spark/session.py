"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` but every knob here is
chosen for the 1000-executor / 100 TB case and merely *also* works locally:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting,
  broadcast demotion/promotion based on observed sizes),
- session timezone pinned to UTC so event-time semantics are
  deployment-independent (the reference stores DateTime64 wall-UTC,
  reference res/schema.sql:3),
- Arrow enabled for the pandas-UDF surface (the reference's script
  extension point, reference script.go:120-240, maps to vectorized UDFs),
- zstd parquet output matching the reference's CODEC(ZSTD) columns.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(app_name: str = "yamon-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to $SPARK_GRAFT_CPUS (local) — on a real
    cluster you'd leave AQE's coalescing to right-size this from
    ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    # SPARK_GRAFT_MASTER lets measurement harnesses swap the single-JVM
    # local[N] for e.g. local-cluster[2,16,24576] — same session knobs,
    # heap split across worker JVMs (used to de-confound GC effects in
    # scale sweeps; see scripts/split_jvm_knee.py). Default unchanged.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # shuffles START wide and AQE merges small partitions by observed
        # size — partitions track data volume instead of a fixed count.
        # Measured (SCALE_CURVE.json partition_knee): halves the posting-
        # list pair kernel's wall at 300x corpus (dedup_jaccard 299->140 s,
        # segment exponent 1.09) because per-task shuffle volume stays
        # bounded; at sf0.1 verification scale the coalescer collapses the
        # extra width for free (probe: 9.2 vs 9.0 s over 6 queries, noise).
        # On a real cluster this is the standard sizing (start wide,
        # coalesce down) — a fixed 32 would be the deployment bug.
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # dims (region/nation/supplier) are tiny: let Catalyst broadcast
        # them; 64MB is safe with 128GiB local, and typical for big clusters
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master.startswith("local-cluster"):
        # worker JVMs need an explicit executor heap; the memory-per-worker
        # field in local-cluster[n,cores,mem] is the worker's budget, the
        # executor must fit inside it
        builder = builder.config(
            "spark.executor.memory", os.environ.get("SPARK_EXECUTOR_MEMORY", "20g")
        )
    return builder.getOrCreate()
