"""Live EWMA smoothing: the streaming twin of q89_ewma.

The batch form (queries/analytics_ext4.q89) truncates the kernel to 8
taps because lag() needs a fixed window; the STREAMING form carries the
exact recursion instead — state per series is ONE (ewma, n) pair and
each event folds in as `ewma' = alpha*v + (1-alpha)*ewma`. Online, the
recursive form is both cheaper and exact: no truncation error, state
size O(1) per series regardless of stream length.

Scale shape: the groupBy key is the same (host, name) series key the
rollups shuffle on (hash-uniform); state is two scalars per live
series; emission is one row per touched series per micro-batch (update
mode). Event-time order is imposed within each batch (stable sort on
(`when`, `value`) — the deterministic tie rule); cross-batch
reordering is bounded by the watermark: the query runs with
EventTimeTimeout, the ONE timeout mode in which Spark's stateful
operator actually filters later-than-watermark rows before they reach
the function (with NoTimeout it does not — verified against the
FlatMapGroupsWithState late-event predicate), so a straggler can never
fold into the recursion out of order. No timeout timestamps are ever
registered, so no timeout invocations occur.

Reference analogue: the reference delegates smoothing to dashboards
over ClickHouse rollups (res/schema.sql); this is the engine-side
continuous version.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_SCHEMA = "host string, name string, when timestamp, value double, ewma double, n bigint"
_STATE_SCHEMA = "ewma double, n long"


def ewma_live(metrics: DataFrame, alpha: float = 0.25, watermark: str = "10 seconds") -> DataFrame:
    """Per-(host, name) recursive EWMA over the typed metrics stream.
    Emits each series' latest (when, value, ewma, n) after every touched
    micro-batch; the first observation seeds the filter (ewma = v)."""

    def smooth(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ewma, n = state.get if state.exists else (0.0, 0)
        frames = list(pdfs)
        if not frames:  # defensive: only reachable via a timeout invocation
            return
        # stable mergesort on (when, value): equal-timestamp rows fold in a
        # deterministic order (pandas' default quicksort is unstable)
        batch = pd.concat(frames, ignore_index=True).sort_values(
            ["when", "value"], kind="mergesort"
        )
        last_when = None
        last_v = None
        for when, v in zip(batch["when"], batch["value"]):
            v = float(v)
            ewma = v if n == 0 else alpha * v + (1.0 - alpha) * ewma
            n += 1
            last_when, last_v = when, v
        state.update((float(ewma), int(n)))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "name": [key[1]],
                "when": [last_when],
                "value": [last_v],
                "ewma": [ewma],
                "n": [n],
            }
        )

    return (
        metrics.withWatermark("when", watermark)
        .groupBy("host", "name")
        .applyInPandasWithState(
            smooth,
            outputStructType=EWMA_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            # EventTimeTimeout (with no timeouts registered) is what turns
            # on the operator's late-row filter; see module docstring
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
