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


def _publish(landing_dir: str, lines: Iterable[str], prefix: str = "exec") -> str | None:
    """Atomically publish lines as one landing file (tmp + rename, so the
    file stream source never sees a partial file). The file name embeds
    the publish millis — consumers may recover it as the acquisition
    timestamp (collectors._metric does)."""
    lines = [ln for ln in lines if ln]
    if not lines:
        return None
    os.makedirs(landing_dir, exist_ok=True)
    path = os.path.join(landing_dir, f"{prefix}-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}.jsonl")
    # DOT-prefixed tmp name: Spark's file listing ignores names starting
    # with '.' or '_', but NOT a '.tmp' suffix — a suffix-only tmp in the
    # watched dir is visible mid-write, defeating the atomic publish
    tmp = os.path.join(landing_dir, "." + os.path.basename(path) + ".tmp")
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
    import threading

    # errors="replace": one invalid byte in a tailed log must not kill the
    # follower (the reference treats acquisition errors as skipped-not-fatal)
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True, errors="replace")
    buf: list[str] = []
    landed = 0
    lock = threading.Lock()
    stop = threading.Event()

    def count_nonblank(lines: list[str]) -> int:
        # _publish drops blank lines; the landed count must agree
        return sum(1 for ln in lines if ln)

    def flush_locked() -> None:
        nonlocal buf, landed
        if buf:
            _publish(landing_dir, buf)
            landed += count_nonblank(buf)
            buf = []

    def idle_flusher() -> None:
        # the read loop blocks on a quiet child, so the time-based roll
        # must run on its own clock — otherwise a burst followed by
        # silence sits unpublished until the next line or child exit
        while not stop.wait(roll_secs):
            with lock:
                flush_locked()

    flusher = threading.Thread(target=idle_flusher, daemon=True)
    flusher.start()
    try:
        assert proc.stdout is not None
        for line in proc.stdout:
            with lock:
                buf.append(line.rstrip("\n"))
                if len(buf) >= roll_lines:
                    flush_locked()
                if max_lines is not None and landed + count_nonblank(buf) >= max_lines:
                    break
    finally:
        stop.set()
        with lock:
            flush_locked()
        if proc.poll() is None:
            proc.kill()  # Close() kills the child (journalctl.go:88-90)
        proc.wait()
        flusher.join(timeout=roll_secs + 1)
    return landed
