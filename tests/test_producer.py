"""Producer tick + snapshot routing (SURVEY §2.1 S1): real /proc reads
landed as JSON lines, fanned through the collector parsers."""

from __future__ import annotations

import json

from yamon_spark.sources import producer as P


def test_snapshot_once_and_parse(spark, tmp_path):
    landing = tmp_path / "landing"
    path = P.snapshot_once(str(landing))
    assert path is not None
    recs = [json.loads(l) for l in open(path)]
    assert {r["source"] for r in recs} >= {"cpu", "load", "uptime", "memory"}

    metrics = P.parse_snapshots(spark.read.text(str(landing)))
    rows = metrics.collect()
    names = {r.name for r in rows}
    assert any(n.startswith("cpu.") for n in names)
    assert {"load.1", "load.5", "load.15", "uptime"} <= names
    assert any(n.startswith("memory.") for n in names)
    # vmstat/net/tcp/diskstats parse from the same tick when present
    assert all(r.type in ("gauge", "counter") for r in rows)
    assert all(r.value is not None for r in rows)


def test_snapshot_missing_sources_noop(tmp_path):
    # absent subsystems no-op (the reference's ZFS behavior)
    assert P.snapshot_once(str(tmp_path / "x"), {"zfs": "/proc/does-not-exist"}) is None


def test_multi_tick_snapshots_stay_separate(spark, tmp_path):
    """Two collection ticks in one batch must parse as two independent
    snapshot sets: per-tick memory rows (a keyless pivot would collapse
    every tick into one mixed row), netstat counters paired within their
    own tick only, and `when` recovered from each landing file's
    embedded publish millis — not parse time."""
    import time

    landing = tmp_path / "landing"
    p1 = P.snapshot_once(str(landing))
    time.sleep(0.01)
    p2 = P.snapshot_once(str(landing))
    assert p1 is not None and p2 is not None and p1 != p2

    metrics = P.parse_snapshots(spark.read.text(str(landing))).collect()
    mem_total = [r for r in metrics if r.name == "memory.total"]
    assert len(mem_total) == 2  # one per tick, not one global mixed row

    # when = the tick's publish millis from the filename (two distinct
    # stamps, both matching their landing files)
    import os
    import re

    stamps = sorted(
        int(re.search(r"snap-(\d+)-", os.path.basename(p)).group(1)) for p in (p1, p2)
    )
    whens = sorted({int(r.when.timestamp() * 1000) for r in mem_total})
    assert whens == stamps

    # tcp counters (when /proc/net/netstat is readable) pair within one
    # tick: every (name, when) appears at most once per tick
    tcp = [(r.name, r.when) for r in metrics if r.name.startswith(("tcp.", "ip."))]
    assert len(tcp) == len(set(tcp)), "cross-tick header/value pairing detected"
