"""Audit-log reassembly (SURVEY §2.2 T10; reference tail.go:17-44,62-87).

Linux audit logs emit one kernel record per line; records belonging to
one logical event share an id in ``msg=audit(<unix_ts>:<serial>):``.
The reference coalesces them with go-libaudit's reassembler (100-msg /
5 s window) into a single ``audit.<TYPE>`` event whose data is the
merged JSON. Re-expressed Spark-first:

- batch / backfill: a plain groupBy on the audit id — full-shuffle
  sessionization, no state needed;
- streaming: ``applyInPandasWithState`` keyed by audit id with a
  processing-time timeout as the reassembly window — the state is one
  small buffer per in-flight audit event, evicted on timeout, so state
  size is bounded by (events in flight x window), not stream length.

The event type is the FIRST record's ``type=`` (aucoalesce uses the
primary record; first-by-timestamp-then-line-order is our deterministic
stand-in) and ``data`` is a JSON object {type_i: [line texts]} in
arrival order — a deterministic, library-free stand-in for aucoalesce's
normalized schema.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

AUDIT_ID_RE = r"msg=audit\((\d+\.\d+):(\d+)\)"
AUDIT_TYPE_RE = r"^type=(\S+)"

AUDIT_EVENT_SCHEMA = StructType(
    [
        StructField("when", TimestampType()),
        StructField("host", StringType()),
        StructField("type", StringType()),
        StructField("data", StringType()),
        StructField("tags", MapType(StringType(), StringType())),
    ]
)


def parse_audit_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """Line -> (audit_id, when, rec_type, text); non-audit lines dropped
    (the reference's auparse error path, tail.go:80-84)."""
    ts = F.regexp_extract(col, AUDIT_ID_RE, 1)
    serial = F.regexp_extract(col, AUDIT_ID_RE, 2)
    return (
        lines.select(
            F.concat_ws(":", ts, serial).alias("audit_id"),
            F.timestamp_seconds(ts.cast("double")).alias("when"),
            F.regexp_extract(col, AUDIT_TYPE_RE, 1).alias("rec_type"),
            F.col(col).alias("text"),
            # primary-record priority: aucoalesce types syscall events by
            # their SYSCALL record; deterministic and streaming-safe
            # (monotonically_increasing_id is banned on streams)
            F.when(F.regexp_extract(col, AUDIT_TYPE_RE, 1) == "SYSCALL", F.lit(0))
            .otherwise(F.lit(1))
            .alias("seq"),
        )
        # guard on the EXTRACTED ts: concat_ws(":", "", "") yields ":"
        # (never ""), so testing audit_id would keep id-less lines and
        # collapse them into one cross-host garbage group keyed ":"
        .where((ts != "") & (F.col("rec_type") != ""))
    )


def _coalesce_records(pdf: pd.DataFrame) -> dict[str, Any]:
    pdf = pdf.reset_index(drop=True)
    merged: dict[str, list[str]] = {}
    for rt, tx in zip(pdf["rec_type"], pdf["text"]):
        merged.setdefault(rt, []).append(tx)
    return {
        "when": pdf["when"].min(),
        "type": f"audit.{pdf['rec_type'].iloc[0]}",
        "data": json.dumps(merged, sort_keys=True),
    }


def coalesce_audit_batch(parsed: DataFrame) -> DataFrame:
    """Batch sessionization: one event per audit id."""

    def per_id(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ev = _coalesce_records(pdf.sort_values(["when", "seq", "text"]))
        return pd.DataFrame(
            {
                "when": [ev["when"]],
                "host": [""],
                "type": [ev["type"]],
                "data": [ev["data"]],
                "tags": [{}],
            }
        )

    return parsed.groupBy("audit_id").applyInPandas(per_id, AUDIT_EVENT_SCHEMA)


def coalesce_audit_stream(parsed: DataFrame, window_ms: int = 5000) -> DataFrame:
    """Streaming sessionization with per-id buffered state and a
    processing-time reassembly window (reference: 5 s / 100 msgs)."""

    buf_schema = (
        "whens array<timestamp>, rec_types array<string>, "
        "texts array<string>, seqs array<long>, first_ms long"
    )

    def _emit(whens: list, rec_types: list, texts: list, seqs: list) -> pd.DataFrame:
        pdf = pd.DataFrame({"when": whens, "rec_type": rec_types, "text": texts, "seq": seqs})
        ev = _coalesce_records(pdf.sort_values(["when", "seq", "text"]))
        return pd.DataFrame(
            {"when": [ev["when"]], "host": [""], "type": [ev["type"]], "data": [ev["data"]], "tags": [{}]}
        )

    def reassemble(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import time as _time

        if state.hasTimedOut:
            whens, rec_types, texts, seqs, _first = state.get
            state.remove()
            yield _emit(whens, rec_types, texts, seqs)
            return
        whens: list = []
        rec_types: list = []
        texts: list = []
        seqs: list = []
        first_ms = int(_time.time() * 1000)
        if state.exists:
            w, r, t, s, first_ms = state.get
            whens, rec_types, texts, seqs = list(w), list(r), list(t), list(s)
        for pdf in pdfs:
            whens.extend(pdf["when"])
            rec_types.extend(pdf["rec_type"])
            texts.extend(pdf["text"])
            seqs.extend(pdf["seq"])
        if len(texts) >= 100:  # reference reassembler maxInFlight=100
            state.remove()
            yield _emit(whens, rec_types, texts, seqs)
            return
        state.update((whens, rec_types, texts, seqs, int(first_ms)))
        # the window runs from the FIRST record of the event (reference
        # reassembler semantics), not from the latest batch: Spark clears
        # a pending timeout whenever the function runs for the key, so
        # re-arm with the REMAINING duration, not the full window — a
        # record trickle must not postpone the flush indefinitely
        elapsed = int(_time.time() * 1000) - int(first_ms)
        state.setTimeoutDuration(max(1, window_ms - elapsed))
        yield pd.DataFrame({"when": [], "host": [], "type": [], "data": [], "tags": []})

    return parsed.groupBy("audit_id").applyInPandasWithState(
        reassemble,
        outputStructType=AUDIT_EVENT_SCHEMA,
        stateStructType=buf_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
