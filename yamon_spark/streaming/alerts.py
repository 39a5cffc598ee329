"""Live alerting on metric streams: the streaming twin of the scheduled
deadman query (q82_deadman).

The reference's 5 s agent cadence makes silence a first-class failure
signal, but its stack only supports the scheduled form (a ClickHouse
query over last-seen times). The Spark-native upgrade is an event-time
stateful operator: ``applyInPandasWithState`` keyed by series, with an
event-time timeout at ``last_seen + horizon`` — the alert FIRES ITSELF
when the watermark passes the deadline, no polling query needed.

Scale shape: state is one (last_us, n) pair per live series — bounded by
series cardinality, not stream length; the group-by key is the series
key (host, name), hash-uniform like the rollup shuffle. Alerts emit
once per silence (state removed on fire; a series that resumes starts a
fresh window).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEADMAN_ALERT_SCHEMA = "host string, name string, last_when timestamp, n_events bigint"
_STATE_SCHEMA = "last_us long, n long"


def deadman_alerts(
    metrics: DataFrame, horizon_s: int = 3600, watermark: str = "10 seconds"
) -> DataFrame:
    """Per-series deadman: emit one alert row when a (host, name) series
    has produced no rows for ``horizon_s`` of EVENT time (q82_deadman's
    staleness predicate, self-firing). Input: the typed metrics stream
    (``when``/``host``/``name``/...). Output: alert rows carrying the
    last-seen timestamp and lifetime row count at silence.

    Timezone contract: setTimeoutTimestamp compares against the
    watermark, which is TRUE UTC epoch — but pandas receives ``when``
    rendered naive in the SESSION timezone. The session tz is captured
    here (driver side) and every naive<->epoch conversion goes through
    it, so the horizon is correct under any session tz (under a non-UTC
    session the naive int64 view would shift the deadline by the tz
    offset — hours-late alerts, or a rejected before-watermark
    timeout)."""
    tz = metrics.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            last_us, n = state.get
            state.remove()
            # symmetric conversion: epoch-µs -> session-naive timestamp
            last_naive = (
                pd.Timestamp(last_us, unit="us", tz="UTC").tz_convert(tz).tz_localize(None)
            )
            yield pd.DataFrame(
                {
                    "host": [key[0]],
                    "name": [key[1]],
                    "last_when": [last_naive],
                    "n_events": [n],
                }
            )
            return
        last_us, n = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf):
                # session-naive -> TRUE epoch-µs via the captured tz
                # (pandas timestamps are ns-backed; integer DIV to µs)
                epoch_ns = (
                    pdf["when"].dt.tz_localize(tz, ambiguous=True, nonexistent="shift_forward")
                    .astype("int64")
                )
                last_us = max(last_us, int(epoch_ns.max()) // 1000)
                n += len(pdf)
        state.update((last_us, n))
        # event-time timeout: fires when the WATERMARK passes the
        # deadline, i.e. the stream as a whole moved on and this series
        # stayed silent — late stragglers inside the watermark still
        # reset the clock on their next batch
        state.setTimeoutTimestamp(last_us // 1000 + horizon_s * 1000)
        yield pd.DataFrame({"host": [], "name": [], "last_when": [], "n_events": []})

    return (
        metrics.withWatermark("when", watermark)
        .groupBy("host", "name")
        .applyInPandasWithState(
            track,
            outputStructType=DEADMAN_ALERT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
