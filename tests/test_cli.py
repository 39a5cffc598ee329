"""CLI entry points (python -m yamon_spark ...): argument wiring and the
agent/scrape/maintain one-shots. serve's composition is covered by
tests/test_http_server.py; here we drive main() in-process."""

from __future__ import annotations

import json

from yamon_spark.__main__ import main


def test_agent_ticks_land_snapshots(tmp_path):
    assert main(["agent", "--landing-dir", str(tmp_path / "l"), "--ticks", "2", "--interval", "0"]) == 0
    files = list((tmp_path / "l").iterdir())
    assert len(files) == 2
    first = json.loads(files[0].read_text().splitlines()[0])
    assert {"source", "captured_at", "text"} <= set(first)


def test_scrape_cli_dead_target_exits_nonzero(tmp_path):
    assert main(["scrape", "http://127.0.0.1:1/metrics", "--landing-dir", str(tmp_path / "p"), "--ticks", "1"]) == 1


def test_maintain_cli_runs_on_empty_dir(tmp_path, capsys):
    (tmp_path / "data").mkdir()
    assert main(["maintain", "--data-dir", str(tmp_path / "data")]) == 0
    out = json.loads(capsys.readouterr().out)
    assert set(out) == {"dropped", "compacted"}
