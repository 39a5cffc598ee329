"""Collector-parser goldens (SURVEY §2.1 S2-S10): fixture /proc text ->
asserted metric rows, replacing the reference's manual yamon-debug
single-collector runs (cmd/yamon-debug/main.go:78-93)."""

from __future__ import annotations

from yamon_spark.sources import collectors as C


def _lines(spark, text: str):
    return spark.createDataFrame([(l,) for l in text.splitlines()], "value string")


def _by_name(rows):
    out = {}
    for r in rows:
        out.setdefault(r.name, []).append(r)
    return out


def test_parse_proc_stat(spark):
    text = (
        "cpu  100 2 30 400 5 6 7 0 0 0\n"
        "cpu0 60 1 20 200 3 4 5 0 0 0\n"
        "cpu1 40 1 10 200 2 2 2 0 0 0\n"
        "intr 12345 0 0\n"
        "ctxt 987654\n"
    )
    rows = C.parse_proc_stat(_lines(spark, text)).collect()
    by = _by_name(rows)
    # aggregate 'cpu' line skipped; 7 keys x 2 cpus + ctxt
    assert len(rows) == 15
    u = sorted(by["cpu.user"], key=lambda r: r.tags["cpu"])
    assert [(r.tags["cpu"], r.value) for r in u] == [("0", 60.0), ("1", 40.0)]
    assert by["cpu.ctxt"][0].value == 987654.0
    assert all(r.type == "counter" for r in rows)


def test_parse_loadavg_uptime(spark):
    rows = C.parse_loadavg(_lines(spark, "0.52 0.58 0.59 1/467 12345")).collect()
    assert {r.name: r.value for r in rows} == {"load.1": 0.52, "load.5": 0.58, "load.15": 0.59}
    assert all(r.type == "gauge" for r in rows)
    up = C.parse_uptime(_lines(spark, "35435.80 136718.15")).collect()
    assert up[0].name == "uptime" and up[0].value == 35435.80


def test_parse_meminfo(spark):
    text = (
        "MemTotal:       16000000 kB\n"
        "MemFree:         4000000 kB\n"
        "MemAvailable:   10000000 kB\n"
        "Buffers:          500000 kB\n"
        "Cached:          3000000 kB\n"
        "SReclaimable:     500000 kB\n"
        "SwapTotal:       2000000 kB\n"
    )
    got = {r.name: r.value for r in C.parse_meminfo(_lines(spark, text)).collect()}
    kb = 1024
    assert got["memory.total"] == 16000000 * kb
    assert got["memory.free"] == 4000000 * kb
    assert got["memory.available"] == 10000000 * kb
    assert got["memory.cached"] == (3000000 + 500000) * kb  # Cached + SReclaimable
    assert got["memory.used"] == (16000000 - 4000000 - 500000 - 3000000 - 500000) * kb


def test_parse_diskstats(spark):
    text = (
        "   8       0 sda 5439 1445 385000 12000 20000 30000 800000 45000 0 35000 60000 0 0 0 0 100 2000\n"
        "   7       0 loop0 100 0 800 50 0 0 0 0 0 8 50 0 0 0 0 0 0\n"
    )
    rows = C.parse_diskstats(_lines(spark, text)).collect()
    assert len(rows) == 17  # loop skipped, 17 keys for sda
    by = {r.name: r for r in rows}
    assert by["disk.reads_completed"].value == 5439.0
    assert by["disk.time_spent_flushing"].value == 2000.0
    assert all(r.tags == {"device": "sda"} for r in rows)


def test_parse_df_output(spark):
    text = (
        "Filesystem     Mounted on Type  File itotal iavail iused ipcent 1K-blocks Avail Used Use%\n"
        "/dev/sda1      /          ext4  -    100000 90000  10000 10%    500000    300000 200000 40%\n"
        "tmpfs          /tmp       tmpfs -    1000   900    100   10%    1000      900    100    10%\n"
        "overlay        /var/lib/docker/overlay2/x ext4 - 100 90 10 10% 100 90 10 10%\n"
    )
    rows = C.parse_df_output(_lines(spark, text)).collect()
    by = {r.name: r for r in rows}
    assert len(rows) == 2  # tmpfs + overlay2 filtered
    assert by["disk.free"].value == 300000.0
    assert by["disk.used"].value == 200000.0
    assert by["disk.free"].tags == {"path": "/dev/sda1", "mount": "/", "type": "ext4"}


def test_parse_net_dev(spark):
    text = (
        "Inter-|   Receive                                                |  Transmit\n"
        " face |bytes    packets errs drop fifo frame compressed multicast|bytes    packets errs drop fifo colls carrier compressed\n"
        "  eth0: 1000 10 0 0 0 0 0 0 2000 20 0 0 0 0 0 0\n"
        "  veth12ab: 1 1 0 0 0 0 0 0 1 1 0 0 0 0 0 0\n"
        "  br-99: 1 1 0 0 0 0 0 0 1 1 0 0 0 0 0 0\n"
    )
    rows = C.parse_net_dev(_lines(spark, text)).collect()
    assert len(rows) == 4  # veth/br- skipped
    got = {r.name: r.value for r in rows}
    assert got == {"net.rx.bytes": 1000.0, "net.rx.packets": 10.0, "net.tx.bytes": 2000.0, "net.tx.packets": 20.0}
    assert all(r.tags == {"iface": "eth0"} for r in rows)


def test_parse_netstat(spark):
    text = (
        "TcpExt: SyncookiesSent SyncookiesRecv\n"
        "TcpExt: 3 7\n"
        "IpExt: InNoRoutes InTruncatedPkts\n"
        "IpExt: 1 2\n"
    )
    rows = C.parse_netstat(_lines(spark, text)).collect()
    got = {r.name: r.value for r in rows}
    # reference strips 'Ext' and lowercases (collector/tcp.go:40)
    assert got == {"tcp.SyncookiesSent": 3.0, "tcp.SyncookiesRecv": 7.0, "ip.InNoRoutes": 1.0, "ip.InTruncatedPkts": 2.0}


def test_parse_vmstat(spark):
    text = "nr_free_pages 1000\nnr_zone_inactive_anon 2000\nbad line here\n"
    got = {r.name: r.value for r in C.parse_vmstat(_lines(spark, text)).collect()}
    assert got == {"vmstat.nr_free_pages": 1000.0, "vmstat.nr_zone_inactive_anon": 2000.0}


def test_meminfo_empty_input_emits_nothing(spark):
    """A host without a meminfo snapshot must contribute zero memory
    rows — the global pivot's all-null row must not leak a spurious
    memory.cached=0 gauge through the coalesce sums."""
    from yamon_spark.sources.collectors import parse_meminfo

    empty = spark.createDataFrame([], "value string")
    assert parse_meminfo(empty).count() == 0
    junk = spark.createDataFrame([("notameminfoline",)], "value string")
    assert parse_meminfo(junk).count() == 0


def test_snapshot_ts_recovers_any_publish_prefix(spark, tmp_path):
    """_snapshot_ts must recover the embedded publish millis for EVERY
    _publish prefix (snap/exec/batch/...), anchored to the basename so a
    digit-bearing directory name (e.g. .../run-55-x/) can't match first."""
    import os

    from pyspark.sql import functions as F

    from yamon_spark.sources.collectors import _snapshot_ts

    d = tmp_path / "run-55-x"  # adversarial: dir itself matches [a-z]+-\d+-
    os.makedirs(d)
    (d / "exec-1714550400123-abcd.jsonl").write_text("hello\n")
    df = spark.read.text(str(d)).select(_snapshot_ts().alias("ts"))
    (ts,) = df.collect()[0]
    assert ts.year == 2024 and ts.month == 5  # 1714550400123 = 2024-05-01 UTC
