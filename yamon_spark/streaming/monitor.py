"""Pipeline self-metrics (SURVEY §2.6; reference clickhouse/
internal_metrics.go:8-23 — prometheus counters
``yamon_ingested_{metrics,logs,events}{result=written|dropped}``).

Spark-native shape: a ``StreamingQueryListener`` accumulates per-query
input/written row counts from the engine's own progress events — no
instrumentation inside the data path. ``snapshot_metrics`` renders the
counters as metric rows (name ``yamon.ingested.<table>``, tag
``result``) so the pipeline can observe itself through its own metrics
stream, exactly as the reference agent scrapes its own /metrics
endpoint (agent/http.go:28).

Delivery nuance: the reference counts ``dropped`` for batches ClickHouse
rejected (at-most-once); our sinks are at-least-once via checkpoint
replay, so ``dropped`` stays 0 by construction. The counter accumulates
``numInputRows`` from progress events, so a replayed epoch is counted
on EVERY attempt — the tag is therefore ``result=read`` (rows the
engine read for processing), an upper bound on rows durably written,
not an exactly-once write count. A companion ``yamon.batches.<query>``
counter exposes the attempt count the retries show up in.
"""

from __future__ import annotations

import threading
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


class IngestCounters(StreamingQueryListener):
    """Accumulates rows-processed per streaming query name."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.rows_in: dict[str, int] = defaultdict(int)
        self.batches: dict[str, int] = defaultdict(int)
        # stateful-operator health (the TTL-sizing observables for
        # neardup triage / sessionization): latest state-store row count
        # per query (gauge) and cumulative evictions (counter) from the
        # engine's own StateOperatorProgress — numRowsRemoved counts
        # rows dropped by timeout/eviction each micro-batch
        self.state_rows: dict[str, int] = defaultdict(int)
        self.state_evicted: dict[str, int] = defaultdict(int)
        # media-ingest health (decode-at-the-door observables): claim/
        # content mismatches and dead-lettered payloads per query —
        # reported by the media foreachBatch itself (the engine's
        # progress events can't see inside the decode), same
        # at-least-once counter semantics as rows_in
        self.media_mismatch: dict[str, int] = defaultdict(int)
        self.media_rejects: dict[str, int] = defaultdict(int)

    def record_media(self, query_name: str, n_mismatch: int, n_rejects: int) -> None:
        """Accumulate one media epoch's claim-mismatch / dead-letter
        counts (called from the media ingest's foreachBatch)."""
        with self._lock:
            self.media_mismatch[str(query_name)] += int(n_mismatch)
            self.media_rejects[str(query_name)] += int(n_rejects)

    # StreamingQueryListener interface -----------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        name = p.name or p.id
        ops = p.stateOperators or []
        total = sum(int(op.numRowsTotal) for op in ops)
        removed = sum(int(op.numRowsRemoved) for op in ops)
        with self._lock:
            self.rows_in[str(name)] += int(p.numInputRows)
            self.batches[str(name)] += 1
            if ops:
                self.state_rows[str(name)] = total
                self.state_evicted[str(name)] += removed

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # rendering -----------------------------------------------------------
    def snapshot_metrics(self, spark: SparkSession) -> DataFrame:
        """Current counters as metric rows (gauge snapshot of counters)."""
        with self._lock:
            rows = [
                (name, float(n), float(self.batches.get(name, 0)))
                for name, n in sorted(self.rows_in.items())
            ]
            state = [
                (name, float(self.state_rows.get(name, 0)), float(n))
                for name, n in sorted(self.state_evicted.items())
            ]
            media = [
                (name, float(self.media_mismatch.get(name, 0)), float(self.media_rejects.get(name, 0)))
                for name in sorted(set(self.media_mismatch) | set(self.media_rejects))
            ]
        df = spark.createDataFrame(rows, "query string, rows_in double, batches double")
        sdf = spark.createDataFrame(
            state, "query string, state_rows double, state_evicted double"
        )
        mdf = spark.createDataFrame(
            media, "query string, media_mismatch double, media_rejects double"
        )

        def shape(name_prefix: str, value_col: str, tags, frame=None, mtype="counter"):
            return (df if frame is None else frame).select(
                F.current_timestamp().alias("when"),
                F.lit(mtype).alias("type"),
                F.lit("").alias("host"),
                F.concat(F.lit(name_prefix), F.col("query")).alias("name"),
                F.col(value_col).alias("value"),
                tags.alias("tags"),
            )

        no_tags = F.create_map().cast("map<string,string>")
        return (
            shape("yamon.ingested.", "rows_in", F.create_map(F.lit("result"), F.lit("read")))
            .unionByName(shape("yamon.batches.", "batches", no_tags))
            .unionByName(
                # latest numRowsTotal per query is a level, not an
                # accumulation — downstream rate/delta math must not
                # treat it as a counter
                shape("yamon.state.rows.", "state_rows", no_tags, frame=sdf, mtype="gauge")
            )
            .unionByName(shape("yamon.state.evicted.", "state_evicted", no_tags, frame=sdf))
            .unionByName(shape("yamon.media.mismatch.", "media_mismatch", no_tags, frame=mdf))
            .unionByName(shape("yamon.media.rejects.", "media_rejects", no_tags, frame=mdf))
        )


def attach(spark: SparkSession) -> IngestCounters:
    listener = IngestCounters()
    spark.streams.addListener(listener)
    return listener
