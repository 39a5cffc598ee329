"""Prometheus pull-mode acquisition shim: periodic HTTP GET -> landing zone.

The reference's scraper (prom/scrape.go:45-101) runs `Run(MetricSink)`:
an endless GET-parse-sink loop with a per-request timeout (default 5 s)
and skipped-not-fatal error handling. The Spark restatement splits that
loop at the landing-zone seam, like every other acquisition path here
(exec_source, http_server): the shim GETs the expfmt text and lands it
atomically; `wire.parse_prom_text` turns landed lines into typed metric
rows inside the streaming pipeline (type-comment join, NaN drop, labels
-> tags — the parse half of scrape.go:66-101).

Keeping the puller out of the cluster means N scrape targets cost N tiny
edge processes writing to object storage, not N long-lived streaming
sources — receiver-side scaling, identical to the push path.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request

from yamon_spark.sources.exec_source import _publish


def scrape_once(url: str, landing_dir: str, timeout_s: float = 5.0) -> str | None:
    """One scrape: GET the expfmt text and land it as one file. Errors
    (connect/timeout/HTTP status) are skipped-not-fatal exactly like the
    reference's scrape() (prom/scrape.go:53-57: log and return). Returns
    the landing path, or None."""
    try:
        with urllib.request.urlopen(url, timeout=timeout_s) as resp:
            body = resp.read().decode("utf-8", errors="replace")
    except (urllib.error.URLError, OSError, ValueError):
        return None
    # split on newline only: splitlines() also breaks on U+2028/U+2029,
    # which may appear raw inside expfmt label values
    return _publish(landing_dir, [ln.rstrip("\r") for ln in body.split("\n")])


def scrape_interval(
    url: str,
    landing_dir: str,
    ticks: int,
    interval_s: float = 0.0,
    timeout_s: float = 5.0,
) -> list[str]:
    """The Run() loop (prom/scrape.go:45-50), bounded to ``ticks``
    iterations so tests and one-shot CLIs can drain it: scrape, sleep,
    repeat; each successful scrape lands its own file."""
    paths = []
    for i in range(ticks):
        p = scrape_once(url, landing_dir, timeout_s)
        if p:
            paths.append(p)
        if interval_s and i + 1 < ticks:
            time.sleep(interval_s)
    return paths
