"""Live heavy hitters: the streaming twin of q29_heavy_hitters.

The batch form is an exact groupBy + top-k; on an unbounded stream the
exact form needs unbounded state (one counter per distinct key ever
seen). The streaming-native answer is the SPACE-SAVING sketch (Metwally
et al. 2005): a fixed-capacity counter table per group where an unseen
key evicts the current minimum and inherits its count as an
overestimate bound (`err`). Guarantees, regardless of stream length:

- `cnt` is an upper bound on the true count and `cnt - err` a lower
  bound;
- any key whose true frequency exceeds n/capacity is IN the table.

Scale shape: state is exactly `capacity` (host, cnt, err) triples per
metric name — bounded by construction, independent of stream length and
host cardinality; the groupBy key (name) is the same hash-uniform
series key the rollups shuffle on. Emission is the group's current
top-k after each touched batch (update-mode semantics: downstream reads
the latest emission per name).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOPK_SCHEMA = "name string, host string, cnt bigint, err bigint, rank int"
_STATE_SCHEMA = "hosts array<string>, cnts array<long>, errs array<long>"


def heavy_hitters_live(metrics: DataFrame, capacity: int = 8) -> DataFrame:
    """Per-name space-saving top hosts over the metrics stream. Input:
    typed metrics (``when``/``host``/``name``/...). Output after each
    touched micro-batch: the group's current counter table ranked by
    (cnt desc, host) — `cnt` an upper bound, `cnt - err` a lower bound
    on the true count."""

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hosts, cnts, errs = state.get
            table = {h: [c, e] for h, c, e in zip(hosts, cnts, errs)}
        else:
            table = {}
        for pdf in pdfs:
            for h in pdf["host"]:
                h = str(h)
                if h in table:
                    table[h][0] += 1
                elif len(table) < capacity:
                    table[h] = [1, 0]
                else:
                    # evict the minimum counter (deterministic host tiebreak);
                    # the newcomer inherits its count as the error bound
                    evict = min(table.items(), key=lambda kv: (kv[1][0], kv[0]))[0]
                    m = table.pop(evict)[0]
                    table[h] = [m + 1, m]
        items = sorted(table.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update((
            [h for h, _ in items],
            [v[0] for _, v in items],
            [v[1] for _, v in items],
        ))
        yield pd.DataFrame(
            {
                "name": [key[0]] * len(items),
                "host": [h for h, _ in items],
                "cnt": [v[0] for _, v in items],
                "err": [v[1] for _, v in items],
                "rank": list(range(1, len(items) + 1)),
            }
        )

    # no withWatermark: the sketch keeps no event-time state and
    # NoTimeout performs no late-row filtering anyway (only
    # EventTimeTimeout does — pinned by the ewma straggler test), so a
    # watermark here would be pure dead weight; EVERY row counts, late
    # or not, which is exactly the upper-bound contract
    return (
        metrics.groupBy("name")
        .applyInPandasWithState(
            track,
            outputStructType=TOPK_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
