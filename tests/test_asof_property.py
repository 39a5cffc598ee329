"""Property-based as-of join invariants (hypothesis): the Spark
union+window formulation must agree with a direct per-row reference
implementation on arbitrary event sets — ordering, ties (same
timestamp, different event_id), tolerance cutoffs, and users with no
prior right-side event. This is the regression depth the q81 family
(operators/asof.py) deserves after round 3's type-shift crash."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from yamon_spark.operators.asof import asof_join_events, asof_join_events_tolerance

BASE = dt.datetime(2024, 5, 1, 10, 0, 0)

_event = st.tuples(
    st.integers(min_value=0, max_value=3),  # user_id
    st.integers(min_value=0, max_value=120_000_000),  # µs offset from BASE
    st.sampled_from(["purchase", "error", "view"]),
)


def _mkdf(spark, events):
    rows = [
        (i + 1, BASE + dt.timedelta(microseconds=us), uid, etype, 0.0, "{}")
        for i, (uid, us, etype) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )


def _reference(events, tolerance_us=None):
    """Direct O(n²) as-of: for each error event, the latest prior
    purchase for the same user in (ts, event_id) order, optionally
    within tolerance_us."""
    rows = [
        (i + 1, BASE + dt.timedelta(microseconds=us), uid, etype)
        for i, (uid, us, etype) in enumerate(events)
    ]
    out = {}
    for eid, ts, uid, etype in rows:
        if etype != "error":
            continue
        prior = [
            (pts, pid)
            for pid, pts, puid, ptype in rows
            if ptype == "purchase" and puid == uid and (pts, pid) < (ts, eid)
        ]
        best = max(prior) if prior else None
        if best is not None and tolerance_us is not None:
            if (ts - best[0]) > dt.timedelta(microseconds=tolerance_us):
                best = None
        out[eid] = best[1] if best else None
    return out


@settings(max_examples=12, deadline=None)
@given(events=st.lists(_event, min_size=0, max_size=25))
def test_asof_matches_reference(spark, events):
    got = {
        r.event_id: r.asof_event_id
        for r in asof_join_events(_mkdf(spark, events), "error", "purchase").collect()
    }
    assert got == _reference(events)


@settings(max_examples=12, deadline=None)
@given(
    events=st.lists(_event, min_size=0, max_size=25),
    tol_ms=st.sampled_from([0, 1, 1_000, 60_000]),
)
def test_asof_tolerance_matches_reference(spark, events, tol_ms):
    tol_us = tol_ms * 1000
    got = {
        r.event_id: r.asof_event_id
        for r in asof_join_events_tolerance(
            _mkdf(spark, events), "error", "purchase", tol_us
        ).collect()
    }
    assert got == _reference(events, tolerance_us=tol_us)
