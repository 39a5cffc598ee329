"""Extended collector goldens (SURVEY §2.1 S11-S16): sensors JSON,
fscache/zfs kstat, apt counts, nvidia-smi CSV, cgroup file trees."""

from __future__ import annotations

from yamon_spark.sources import collectors_ext as X


def _lines(spark, *rows: str):
    return spark.createDataFrame([(r,) for r in rows], "value string")


def _files(spark, *pairs):
    return spark.createDataFrame(list(pairs), "path string, content string")


def test_parse_sensors_json(spark):
    doc = (
        '{"coretemp-isa-0000": {"Core 0": {"temp2_input": 45.0, "temp2_max": 100.0},'
        ' "Core 1": {"temp3_input": 47.5}},'
        ' "nvme-pci-0100": {"Composite": {"temp1_input": 38.9}}}'
    )
    rows = X.parse_sensors_json(_lines(spark, doc)).collect()
    by = {(r.name, r.tags["chip"], r.tags["feature"]): r.value for r in rows}
    assert by[("sensors.temp2.input", "coretemp-isa-0000", "core_0")] == 45.0
    assert by[("sensors.temp2.max", "coretemp-isa-0000", "core_0")] == 100.0
    assert by[("sensors.temp3.input", "coretemp-isa-0000", "core_1")] == 47.5
    assert by[("sensors.temp1.input", "nvme-pci-0100", "composite")] == 38.9
    assert all(r.type == "gauge" for r in rows)


def test_parse_fscache(spark):
    text = [
        "FS-Cache statistics",
        "Cookies: idx=3 dat=4 spc=0",
        "Acquire: n=10 ok=8",
    ]
    rows = {r.name: r.value for r in X.parse_fscache(_lines(spark, *text)).collect()}
    assert rows == {
        "fscache.cookies.idx": 3.0,
        "fscache.cookies.dat": 4.0,
        "fscache.cookies.spc": 0.0,
        "fscache.acquire.n": 10.0,
        "fscache.acquire.ok": 8.0,
    }


def test_parse_apt(spark):
    upgradable = _lines(
        spark,
        "Listing... Done",
        "bash/noble-updates 5.2 amd64 [upgradable from: 5.1]",
        "openssl/noble-security 3.0 amd64 [upgradable from: 2.9]",
        "vim/noble-updates 9.1 amd64 [upgradable from: 9.0]",
    )
    installed = _lines(spark, *(["Listing... Done"] + [f"pkg{i}/noble 1.0 amd64 [installed]" for i in range(10)]))
    rows = X.parse_apt(upgradable, installed).collect()
    by = {(r.tags["security"], r.tags["upgradable"]): r.value for r in rows}
    # 11 installed lines total (incl. header, as the reference counts raw lines)
    assert by[("true", "true")] == 1.0  # security
    assert by[("false", "true")] == 2.0  # upgradable non-security
    assert by[("false", "false")] == 11.0 - 1.0 - 2.0
    assert all(r.name == "apt.packages" and r.type == "gauge" for r in rows)


def test_parse_nvidia_smi(spark):
    rows = X.parse_nvidia_smi(
        _lines(
            spark,
            "0, NVIDIA A100, 45, 20000, 40000, 87, 250.5",
            "1, NVIDIA A100, 47, 100, 40000, 12, [N/A]",
        )
    ).collect()
    by = {r.name: r for r in rows}
    assert by["gpu.nvidia.0.temperature"].value == 45.0
    assert by["gpu.nvidia.0.powerdraw"].value == 250.5
    assert by["gpu.nvidia.0.memory.used"].tags == {"device": "NVIDIA A100"}
    assert "gpu.nvidia.1.powerdraw" not in by  # unparseable field skipped
    assert by["gpu.nvidia.1.utilization"].value == 12.0


def test_parse_rocm_smi(spark):
    doc = (
        '{"card0": {"GUID": "34756", "Card series": "Radeon PRO W6800",'
        ' "Temperature (Sensor edge) (C)": "41.0",'
        ' "VRAM Total Used Memory (B)": "2048274432",'
        ' "VRAM Total Memory (B)": "34342961152",'
        ' "GPU use (%)": "12",'
        ' "Current Socket Graphics Package Power (W)": "37.0"},'
        ' "card1": {"GUID": "9931", "Card series": "Radeon PRO W6800",'
        ' "Temperature (Sensor edge) (C)": "N/A",'
        ' "VRAM Total Used Memory (B)": "4096",'
        ' "VRAM Total Memory (B)": "34342961152",'
        ' "GPU use (%)": "0"}}'
    )
    rows = X.parse_rocm_smi(_lines(spark, doc)).collect()
    by = {r.name: r for r in rows}
    assert by["gpu.amd.card0.temperature"].value == 41.0
    assert by["gpu.amd.card0.memory.used"].value == 2048274432.0
    assert by["gpu.amd.card0.utilization"].value == 12.0
    assert by["gpu.amd.card0.powerdraw"].value == 37.0
    assert by["gpu.amd.card0.powerdraw"].tags == {"guid": "34756", "device": "Radeon PRO W6800"}
    # per-field skip: N/A temperature and the absent power key land nothing
    assert "gpu.amd.card1.temperature" not in by
    assert "gpu.amd.card1.powerdraw" not in by
    assert by["gpu.amd.card1.memory.used"].value == 4096.0
    assert all(r.type == "gauge" for r in rows)


_KSTAT_HDR = "13 1 0x01 92 24704 8577919736 73922490464\nname                            type data\n"


def test_parse_zfs(spark):
    files = _files(
        spark,
        ("/proc/spl/kstat/zfs/zfetchstats", _KSTAT_HDR + "hits                            4    634\nmisses                          4    10\n"),
        ("/proc/spl/kstat/zfs/arcstats", _KSTAT_HDR + "size                            4    999\n"),
        (
            "/proc/spl/kstat/zfs/tank/objset-0x36",
            _KSTAT_HDR
            + "dataset_name                    7    tank/data\n"
            + "writes                          4    123\n"
            + "nread                           4    456\n",
        ),
    )
    rows = X.parse_zfs(files).collect()
    by = {r.name: r for r in rows}
    assert by["zfs.zfetch.hits"].value == 634.0
    assert by["zfs.zfetch.misses"].value == 10.0
    assert by["zfs.arcstats.size"].value == 999.0
    assert by["zfs.dataset.writes"].value == 123.0
    assert by["zfs.dataset.writes"].tags == {"dataset": "tank/data"}
    assert len(rows) == 5  # dataset_name row itself is not a metric


def test_parse_cgroup(spark):
    files = _files(
        spark,
        ("/sys/fs/cgroup/system.slice/cpu.stat", "usage_usec 1000\nuser_usec 600\n"),
        ("/sys/fs/cgroup/system.slice/memory.current", "4096\n"),
        ("/sys/fs/cgroup/system.slice/io.stat", "8:0 rbytes=100 wbytes=200\n"),
    )
    uevents = _files(spark, ("/sys/dev/block/8:0/uevent", "MAJOR=8\nMINOR=0\nDEVNAME=sda\nDEVTYPE=disk\n"))
    rows = X.parse_cgroup(files, uevents).collect()
    by = {r.name: r for r in rows}
    assert by["cgroup.cpu.usage_usec"].value == 1000.0
    assert by["cgroup.cpu.usage_usec"].tags == {"cgroup_path": "system.slice", "cgroup_name": "system.slice"}
    assert by["cgroup.cpu.usage_usec"].type == "counter"
    assert by["cgroup.memory.current"].value == 4096.0 and by["cgroup.memory.current"].type == "gauge"
    assert by["cgroup.iostat.rbytes"].value == 100.0
    assert by["cgroup.iostat.rbytes"].tags["device_name"] == "sda"
    assert by["cgroup.iostat.wbytes"].tags["device_type"] == "disk"
