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
