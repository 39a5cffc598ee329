"""Live lag-1 autocorrelation: the streaming twin of q88_autocorr.

The batch form (queries/analytics_ext4.q88) materializes the lagged
series with a window function; the streaming form needs neither the lag
column nor the history — the Pearson moments over (v_t, v_{t-1}) pairs
are all MERGEABLE sums, so per-series state is eight numbers: the
previous value plus (n, sx, sy, sxx, syy, sxy). Each event extends the
pair set by one and the state by O(1); the emitted autocorrelation is
exact over the stream so far (same integer-cents quantization as the
batch twin, so the sums stay exact integers).

Scale shape: groupBy on the series key (hash-uniform), state O(1) per
live series, emission one row per touched series per micro-batch.
Event-time order is imposed within each batch (stable sort with a
(`when`, `value`) tie rule); autocorr_live runs with EventTimeTimeout —
the one timeout mode in which Spark's stateful operator filters
later-than-watermark rows before they reach the function — so a
straggler cannot corrupt the order-dependent prev-chain. quantile_live
keeps NoTimeout (and no watermark) deliberately: bucket counts are
order-independent, so a late-but-valid value is better counted than
dropped.
"""

from __future__ import annotations

from collections.abc import Iterator
from math import sqrt

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

AUTOCORR_SCHEMA = "name string, n_pairs bigint, autocorr_1 double"
# moments live in DECIMAL(38,0) state, not long: squared cents of
# |v| ~ 1e9 are ~1e22 per PAIR, far past int64 — the exact overflow the
# batch twin q88 moved to DECIMAL accumulation to avoid. Python-side the
# arithmetic is unbounded int; the state column just has to hold it.
_STATE_SCHEMA = (
    "prev long, has_prev boolean, n long, "
    "sx decimal(38,0), sy decimal(38,0), sxx decimal(38,0), "
    "syy decimal(38,0), sxy decimal(38,0)"
)


def autocorr_live(metrics: DataFrame, watermark: str = "10 seconds") -> DataFrame:
    """Per-name running lag-1 autocorrelation over the metrics stream.
    Values quantize to integer cents (floor(v*100 + 0.5), matching q88)
    so every moment is an exact integer sum; the Pearson assembly runs
    once per emission. Emits NULL autocorr until the series has >= 2
    pairs and nonzero variance on both sides."""

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            prev, has_prev, n, sx, sy, sxx, syy, sxy = state.get
            sx, sy, sxx, syy, sxy = (int(x) for x in (sx, sy, sxx, syy, sxy))
        else:
            prev, has_prev, n, sx, sy, sxx, syy, sxy = 0, False, 0, 0, 0, 0, 0, 0
        frames = list(pdfs)
        if not frames:  # defensive: only reachable via a timeout invocation
            return
        batch = pd.concat(frames, ignore_index=True).sort_values(
            ["when", "value"], kind="mergesort"
        )
        for v in batch["value"]:
            vc = int((float(v) * 100 + 0.5) // 1)
            if has_prev:
                n += 1
                sx += vc
                sy += prev
                sxx += vc * vc
                syy += prev * prev
                sxy += vc * prev
            prev, has_prev = vc, True
        from decimal import Decimal

        state.update((
            int(prev), bool(has_prev), int(n),
            Decimal(sx), Decimal(sy), Decimal(sxx), Decimal(syy), Decimal(sxy),
        ))
        ac = None
        if n >= 2:
            den = sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)
            if den > 0:
                ac = (n * sxy - sx * sy) / den
        yield pd.DataFrame({"name": [key[0]], "n_pairs": [n], "autocorr_1": [ac]})

    return (
        metrics.withWatermark("when", watermark)
        .groupBy("name")
        .applyInPandasWithState(
            track,
            outputStructType=AUTOCORR_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            # EventTimeTimeout (no timeouts registered) enables the
            # operator's late-row filter; see module docstring
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


QUANTILE_SCHEMA = "name string, total bigint, p50 double, p95 double"
_Q_STATE_SCHEMA = "bkts array<long>, cnts array<long>"


def quantile_live(metrics: DataFrame, width: float = 5.0) -> DataFrame:
    """Live histogram quantiles: the streaming twin of
    q85_histogram_quantile. Same mergeable-bucket-count design — state
    per series is a sparse (bucket -> count) table with fixed
    `width`-unit bins; each batch increments counts and re-emits
    p50/p95 by linear interpolation inside the bucket where the
    cumulative count crosses q*total, exactly like the batch form.

    Scale shape: state grows with the VALUE RANGE (|buckets|), not the
    stream length; the groupBy key is the series name. This is why the
    monitoring-native quantile beats a value-buffer sketch online: the
    state is already an aggregate and two emissions merge by addition."""

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bkts, cnts = state.get
            table = dict(zip(bkts, cnts))
        else:
            table = {}
        for pdf in pdfs:
            for v in pdf["value"]:
                b = int(float(v) // width)
                table[b] = table.get(b, 0) + 1
        items = sorted(table.items())
        state.update(([b for b, _ in items], [c for _, c in items]))
        total = sum(c for _, c in items)

        def interp(q: float) -> float:
            thresh = q * total
            cum = 0
            for b, c in items:
                if cum + c >= thresh:
                    return b * width + width * (thresh - cum) / c
                cum += c
            return items[-1][0] * width + width  # numeric-noise fallback

        yield pd.DataFrame(
            {
                "name": [key[0]],
                "total": [total],
                "p50": [interp(0.5)],
                "p95": [interp(0.95)],
            }
        )

    # no withWatermark: bucket counts are order-independent and
    # NoTimeout performs no late filtering anyway — a late-but-valid
    # value is counted, matching the mergeable-histogram semantics
    return (
        metrics.groupBy("name")
        .applyInPandasWithState(
            track,
            outputStructType=QUANTILE_SCHEMA,
            stateStructType=_Q_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
