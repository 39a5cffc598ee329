"""Property-based wire-parser round-trip (hypothesis): arbitrary metric
records — unicode names/hosts, extreme doubles, arbitrary tag maps —
JSON-encoded in the reference's exact wire shape must come back
row-exact through parse_batch. One Spark job per example set (examples
are batched into a single DataFrame so the suite stays fast)."""

from __future__ import annotations

import datetime as dt
import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from yamon_spark.sources import wire

# printable text without JSON-hostile NUL; keys non-empty
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    min_size=0,
    max_size=20,
)
_key = _text.filter(lambda s: len(s) > 0)
_value = st.floats(
    allow_nan=False, allow_infinity=False, width=64, min_value=-1e12, max_value=1e12
)

_metric = st.fixed_dictionaries(
    {
        "t": st.integers(min_value=0, max_value=2**31 - 1).map(
            lambda s: dt.datetime.fromtimestamp(s, dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        ),
        "m": st.sampled_from(["gauge", "counter"]),
        "h": _text,
        "n": _key,
        "v": _value,
        "g": st.dictionaries(_key, _text, max_size=4),
    }
)


@settings(max_examples=12, deadline=None)
@given(st.lists(_metric, min_size=1, max_size=8))
def test_batch_metric_roundtrip(spark, metrics):
    body = json.dumps({"m": metrics})
    lines = spark.createDataFrame([(body,)], "value string")
    rows = wire.parse_batch(lines)["metrics"].collect()
    assert len(rows) == len(metrics)
    for got, want in zip(rows, metrics):
        assert got.name == want["n"]
        assert got.host == want["h"]
        assert got.type == want["m"]
        assert math.isclose(got.value, want["v"], rel_tol=1e-12, abs_tol=1e-12)
        assert got.tags == want["g"]
        assert got.when == dt.datetime.strptime(want["t"], "%Y-%m-%dT%H:%M:%SZ")
