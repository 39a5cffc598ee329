"""Exec/follow acquisition shims: subprocess stdout -> landing zone.

The reference drives three long-lived acquisition loops on the agent
host: the script runner (one-shot with timeout on an interval, or a
streaming child emitting JSON lines — script.go:169-240), the
journald follower (``journalctl --output json --follow`` stdout pipe —
journal/journalctl/journalctl.go:32-90), and the log tail
(``tail -F``-style follow-with-reopen — tail.go:46-60).

The Spark restatement keeps acquisition OUT of the cluster: these shims
run wherever the agent runs, write raw stdout lines into the landing
zone (atomic rename publish, same contract as producer.snapshot_once),
and the Structured Streaming pipeline picks the files up via
``stream_landing(fmt='script'|'journald'|...)``. This completes the
agent story end-to-end: exec -> landing file -> readStream -> parse ->
sinks. Reopen semantics for rotated logs belong to the child process
itself (``tail -F``); the shim only follows its stdout.
"""

from __future__ import annotations

import os
import subprocess
import time
import uuid
from collections.abc import Iterable


def _publish(landing_dir: str, lines: Iterable[str]) -> str | None:
    """Atomically publish lines as one landing file (tmp + rename, so the
    file stream source never sees a partial file)."""
    lines = [ln for ln in lines if ln]
    if not lines:
        return None
    os.makedirs(landing_dir, exist_ok=True)
    path = os.path.join(landing_dir, f"exec-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}.jsonl")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.rename(tmp, path)
    return path


def exec_once(
    cmd: list[str],
    landing_dir: str,
    timeout_s: float = 15.0,
    env: dict[str, str] | None = None,
) -> str | None:
    """One-shot script execution (script.go:192-198, 15 s default
    timeout): run the command, land its stdout. Failures and timeouts
    are skipped-not-fatal (the reference logs and continues its ticker,
    script.go:225-230). Returns the landing path, or None."""
    try:
        out = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            timeout=timeout_s,
            env={**os.environ, **env} if env else None,
            check=True,
        ).stdout
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError, OSError):
        return None
    return _publish(landing_dir, out.splitlines())


def exec_interval(
    cmd: list[str],
    landing_dir: str,
    ticks: int,
    interval_s: float = 0.0,
    timeout_s: float = 15.0,
) -> list[str]:
    """The script ticker (script.go:231-240, default 1 m interval):
    N one-shot executions, each landing its own file."""
    paths = []
    for i in range(ticks):
        p = exec_once(cmd, landing_dir, timeout_s)
        if p:
            paths.append(p)
        if interval_s and i + 1 < ticks:
            time.sleep(interval_s)
    return paths


def follow_to_landing(
    cmd: list[str],
    landing_dir: str,
    roll_lines: int = 1000,
    roll_secs: float = 5.0,
    max_lines: int | None = None,
) -> int:
    """Follow a long-lived child's stdout (journalctl --follow / tail -F
    / streaming script) and roll its lines into landing files every
    ``roll_lines`` lines or ``roll_secs`` seconds — the micro-batching
    hop between a line-at-a-time pipe and a file-based stream source.

    Blocks until the child exits (the reference treats a streaming
    script exiting as an error and logs it, script.go:205-210) or
    ``max_lines`` lines have landed (tests / bounded drains). Returns
    the number of lines landed; the tail buffer is always flushed."""
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True)
    buf: list[str] = []
    landed = 0
    last_roll = time.monotonic()
    try:
        assert proc.stdout is not None
        for line in proc.stdout:
            buf.append(line.rstrip("\n"))
            now = time.monotonic()
            if len(buf) >= roll_lines or (buf and now - last_roll >= roll_secs):
                _publish(landing_dir, buf)
                landed += len(buf)
                buf, last_roll = [], now
            if max_lines is not None and landed + len(buf) >= max_lines:
                break
    finally:
        if buf:
            _publish(landing_dir, buf)
            landed += len(buf)
        if proc.poll() is None:
            proc.kill()  # Close() kills the child (journalctl.go:88-90)
        proc.wait()
    return landed
