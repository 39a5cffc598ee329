"""Exec/follow landing shims (script.go, journalctl.go, tail.go): the
subprocess -> landing -> parse path, end-to-end with real children."""

from __future__ import annotations

import json

from yamon_spark.sources import exec_source as E
from yamon_spark.streaming.pipeline import read_landing

SCRIPT_DOC = json.dumps(
    {"metric": {"type": "gauge", "name": "disk.free", "value": 42.0, "tags": {"mount": "/"}}}
)


def test_exec_once_lands_and_parses(spark, tmp_path):
    landing = str(tmp_path / "landing")
    path = E.exec_once(["echo", SCRIPT_DOC], landing)
    assert path and path.endswith(".jsonl")

    metrics = read_landing(spark, landing, fmt="script")["metrics"].collect()
    assert len(metrics) == 1
    assert (metrics[0].name, metrics[0].value, metrics[0].tags["mount"]) == ("disk.free", 42.0, "/")


def test_exec_once_timeout_and_failure_skip(tmp_path):
    landing = str(tmp_path / "landing")
    assert E.exec_once(["sleep", "5"], landing, timeout_s=0.2) is None
    assert E.exec_once(["false"], landing) is None  # non-zero exit
    assert E.exec_once(["/nonexistent-cmd-xyz"], landing) is None
    assert not (tmp_path / "landing").exists()  # nothing landed


def test_exec_interval_ticks(tmp_path):
    landing = str(tmp_path / "landing")
    paths = E.exec_interval(["echo", SCRIPT_DOC], landing, ticks=3)
    assert len(paths) == len(set(paths)) == 3


def test_follow_rolls_and_preserves_lines(spark, tmp_path):
    """Streaming child: 7 JSON lines, rolled every 3 -> >=3 landing
    files, every line present exactly once, stream-parseable."""
    landing = str(tmp_path / "landing")
    script = ";".join(
        "echo " + json.dumps(json.dumps({"metric": {"type": "counter", "name": f"c{i}", "value": float(i)}}))
        for i in range(7)
    )
    landed = E.follow_to_landing(["sh", "-c", script], landing, roll_lines=3, roll_secs=60)
    assert landed == 7
    assert len(list((tmp_path / "landing").glob("*.jsonl"))) >= 3

    rows = read_landing(spark, landing, fmt="script")["metrics"].collect()
    assert sorted(r.name for r in rows) == [f"c{i}" for i in range(7)]
    assert all(r.type == "counter" for r in rows)


def test_follow_max_lines_kills_child(tmp_path):
    """A never-ending child (tail -F shape) is bounded by max_lines and
    killed on exit; the partial buffer is flushed."""
    landing = str(tmp_path / "landing")
    cmd = ["sh", "-c", "while true; do echo line; done"]
    landed = E.follow_to_landing(cmd, landing, roll_lines=5, roll_secs=60, max_lines=12)
    assert landed >= 12
    files = list((tmp_path / "landing").glob("*.jsonl"))
    assert files and sum(len(f.read_text().splitlines()) for f in files) == landed
