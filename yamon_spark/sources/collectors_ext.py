"""Extended collector parsers (SURVEY §2.1 S11-S16): exec-output and
fs-walk collectors — sensors JSON, fscache/zfs kstat grids, apt package
counts, nvidia-smi CSV, cgroup file trees.

Same split as `collectors.py`: the agent host lands raw text (command
stdout, walked file contents as (path, content) rows); parsing fans out
distributed with built-ins. Absent subsystems simply land nothing —
the reference's silent no-op (collector/zfs.go:48-52).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, MapType, StringType

from yamon_spark.sources.collectors import _empty_tags, _fields, _metric

# ---------------------------------------------------------------------------
# S12 sensors: `sensors -j -A` JSON — chip -> feature -> subfeature -> value
# (collector/sensors.go:22-60)
# ---------------------------------------------------------------------------

_SENSORS_SCHEMA = MapType(StringType(), MapType(StringType(), MapType(StringType(), DoubleType())))


def _sensor_str(c: Column) -> Column:
    """lower, spaces->_, ':'->'_' (collector/sensors.go:18-20)."""
    return F.lower(F.regexp_replace(F.regexp_replace(c, " ", "_"), ":", "_"))


def parse_sensors_json(lines: DataFrame, col: str = "value") -> DataFrame:
    """One `sensors -j -A` document per row -> gauges
    ``sensors.<subfeature-prefix>.<rest>`` tagged {chip, feature}."""
    chips = lines.select(F.explode(F.from_json(F.col(col), _SENSORS_SCHEMA)).alias("chip", "features"))
    feats = chips.select("chip", F.explode("features").alias("feature", "subs"))
    subs = feats.select("chip", "feature", F.explode("subs").alias("sub", "v"))
    # subfeature 'temp1_input' -> name 'sensors.temp1.input'
    prefix = F.substring_index("sub", "_", 1)
    rest = F.expr("substring(sub, length(substring_index(sub, '_', 1)) + 2)")
    return subs.select(
        *_metric(
            F.concat(F.lit("sensors."), prefix, F.lit("."), rest),
            "gauge",
            F.col("v"),
            F.create_map(
                F.lit("chip"), F.col("chip"), F.lit("feature"), _sensor_str(F.col("feature"))
            ),
        )
    )


# ---------------------------------------------------------------------------
# S13 fscache: `RootKey: a=1 b=2` grid -> counters fscache.<rootkey>.<k>
# (collector/fscache.go:16-48)
# ---------------------------------------------------------------------------


def parse_fscache(lines: DataFrame, col: str = "value") -> DataFrame:
    with_key = (
        lines.where(F.col(col).contains(":"))
        .select(
            F.lower(F.trim(F.substring_index(F.col(col), ":", 1))).alias("rootkey"),
            F.explode(F.split(F.substring_index(F.col(col), ":", -1), " ")).alias("kv"),
        )
        .where(F.col("kv").contains("="))
    )
    k = F.lower(F.substring_index("kv", "=", 1))
    v = F.substring_index("kv", "=", -1).try_cast("double")
    return with_key.where(v.isNotNull()).select(
        *_metric(F.concat(F.lit("fscache."), F.col("rootkey"), F.lit("."), k), "counter", v)
    )


# ---------------------------------------------------------------------------
# S14 apt: upgradable/installed listings -> 3 apt.packages gauges
# (collector/apt.go:15-81)
# ---------------------------------------------------------------------------


def parse_apt(upgradable: DataFrame, installed: DataFrame, col: str = "value") -> DataFrame:
    """``apt list --upgradable`` + ``apt list --installed`` stdout ->
    gauges tagged {security, upgradable}. Counting is a conditional agg
    (sum(when(...))) — the SURVEY S14 mapping."""
    pkg = F.split(F.col(col), " ")[0]
    repo = F.substring_index(pkg, "/", -1)
    is_pkg = pkg.contains("/")
    counts = upgradable.select(
        F.sum(F.when(is_pkg & repo.contains("-security"), 1).otherwise(0)).alias("security"),
        F.sum(F.when(is_pkg & ~repo.contains("-security"), 1).otherwise(0)).alias("upgradable"),
    ).crossJoin(installed.select(F.count(F.lit(1)).alias("total")))
    rows = counts.select(
        F.explode(
            F.array(
                F.struct(
                    (F.col("total") - F.col("security") - F.col("upgradable")).cast("double").alias("v"),
                    F.lit("false").alias("sec"),
                    F.lit("false").alias("upg"),
                ),
                F.struct(F.col("upgradable").cast("double").alias("v"), F.lit("false").alias("sec"), F.lit("true").alias("upg")),
                F.struct(F.col("security").cast("double").alias("v"), F.lit("true").alias("sec"), F.lit("true").alias("upg")),
            )
        ).alias("r")
    )
    return rows.select(
        *_metric(
            F.lit("apt.packages"),
            "gauge",
            F.col("r.v"),
            F.create_map(F.lit("security"), F.col("r.sec"), F.lit("upgradable"), F.col("r.upg")),
        )
    )


# ---------------------------------------------------------------------------
# S15 gpu: nvidia-smi CSV (collector/gpu.go:30-112) and rocm-smi JSON
# (collector/gpu.go:114-198) -> 5 gauges per GPU
# ---------------------------------------------------------------------------

_NVIDIA_FIELDS = (
    ("temperature", 2),
    ("memory.used", 3),
    ("memory.total", 4),
    ("utilization", 5),
    ("powerdraw", 6),
)


def parse_nvidia_smi(lines: DataFrame, col: str = "value") -> DataFrame:
    """CSV rows ``index, name, temp, mem.used, mem.total, util, power``
    -> gauges ``gpu.nvidia.<index>.<field>`` tagged {device: name};
    unparseable fields are skipped, not zeroed (gpu.go's per-field
    error handling)."""
    p = F.split(F.col(col), ", ")
    rows = lines.select(p.alias("p")).where(F.size("p") >= 7)
    out = rows.select(
        F.col("p")[0].alias("idx"),
        F.col("p")[1].alias("device"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(name).alias("n"), F.col("p")[i].try_cast("double").alias("v"))
                    for name, i in _NVIDIA_FIELDS
                ]
            )
        ).alias("kv"),
    ).where(F.col("kv.v").isNotNull())
    return out.select(
        *_metric(
            F.concat(F.lit("gpu.nvidia."), F.col("idx"), F.lit("."), F.col("kv.n")),
            "gauge",
            F.col("kv.v"),
            F.create_map(F.lit("device"), F.col("device")),
        )
    )


# rocm-smi --json emits one object keyed by card id; every field value is a
# string (gpu.go's rocmSmiJson struct, :19-28)
_ROCM_SCHEMA = MapType(StringType(), MapType(StringType(), StringType()))

_ROCM_FIELDS = (
    ("temperature", "Temperature (Sensor edge) (C)"),
    ("memory.used", "VRAM Total Used Memory (B)"),
    ("memory.total", "VRAM Total Memory (B)"),
    ("utilization", "GPU use (%)"),
    ("powerdraw", "Current Socket Graphics Package Power (W)"),
)


def parse_rocm_smi(lines: DataFrame, col: str = "value") -> DataFrame:
    """One ``rocm-smi --showid --showtemp --showuse --showpower
    --showproductname --showmeminfo vram --json`` document per row ->
    gauges ``gpu.amd.<cardId>.<field>`` tagged {guid, device}
    (collector/gpu.go:114-198). Unparseable fields are skipped per-field,
    like the NVIDIA path; missing tags land as empty strings (Go's zero
    value for an absent JSON key)."""
    cards = lines.select(F.explode(F.from_json(F.col(col), _ROCM_SCHEMA)).alias("card", "f"))
    out = cards.select(
        "card",
        F.coalesce(F.col("f")["GUID"], F.lit("")).alias("guid"),
        F.coalesce(F.col("f")["Card series"], F.lit("")).alias("device"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(name).alias("n"), F.col("f")[key].try_cast("double").alias("v"))
                    for name, key in _ROCM_FIELDS
                ]
            )
        ).alias("kv"),
    ).where(F.col("kv.v").isNotNull())
    return out.select(
        *_metric(
            F.concat(F.lit("gpu.amd."), F.col("card"), F.lit("."), F.col("kv.n")),
            "gauge",
            F.col("kv.v"),
            F.create_map(
                F.lit("guid"), F.col("guid"), F.lit("device"), F.col("device")
            ),
        )
    )


# ---------------------------------------------------------------------------
# S11 zfs: kstat grids from /proc/spl/kstat/zfs — (path, content) rows
# (collector/zfs.go:25-120)
# ---------------------------------------------------------------------------


def _kstat_rows(files: DataFrame) -> DataFrame:
    """(path, content) -> (path, name, type_id, data): 3-field kstat rows,
    headers dropped (the 'name type data' line and the leading summary
    line never have exactly 3 fields with a numeric type)."""
    line = files.select("path", F.explode(F.split("content", "\n")).alias("value"))
    p = _fields("value")
    return (
        line.select("path", p.alias("p"))
        .where((F.size("p") == 3) & F.col("p")[1].rlike(r"^\d+$"))
        .select(
            "path",
            F.col("p")[0].alias("name"),
            F.col("p")[1].alias("type_id"),
            F.col("p")[2].alias("data"),
        )
    )


def parse_zfs(files: DataFrame) -> DataFrame:
    """files: (path, content) from the agent's kstat walk. zfetchstats ->
    ``zfs.zfetch.*``, arcstats -> ``zfs.arcstats.*``, pool objset-* files
    -> ``zfs.dataset.*`` counters tagged {dataset} (type-4 stats only;
    dataset_name rides as the tag)."""
    ks = _kstat_rows(files)
    base = F.element_at(F.split("path", "/"), -1)
    zfetch = ks.where(base == "zfetchstats").select(
        *_metric(F.concat(F.lit("zfs.zfetch."), F.col("name")), "counter", F.col("data"))
    )
    arc = ks.where(base == "arcstats").select(
        *_metric(F.concat(F.lit("zfs.arcstats."), F.col("name")), "counter", F.col("data"))
    )
    objset = ks.where(base.startswith("objset-"))
    ds_names = objset.where(F.col("name") == "dataset_name").select(
        "path", F.col("data").alias("dataset")
    )
    ds = (
        objset.where((F.col("type_id") == "4") & (F.col("name") != "dataset_name"))
        .join(F.broadcast(ds_names), "path", "left")
        .select(
            *_metric(
                F.concat(F.lit("zfs.dataset."), F.col("name")),
                "counter",
                F.col("data"),
                F.create_map(F.lit("dataset"), F.coalesce("dataset", F.lit(""))),
            )
        )
    )
    return zfetch.unionByName(arc).unionByName(ds).where(F.col("value").isNotNull())


# ---------------------------------------------------------------------------
# S16 cgroup: walked /sys/fs/cgroup tree — (path, content) rows
# (collector/cgroup/cgroup.go:32-189)
# ---------------------------------------------------------------------------


def parse_cgroup(files: DataFrame, uevents: DataFrame | None = None) -> DataFrame:
    """files: (path, content) for cpu.stat / memory.stat /
    memory.current / memory.swap.current / io.stat under /sys/fs/cgroup.
    uevents: optional (path, content) for /sys/dev/block/<maj:min>/uevent
    (DEVNAME/DEVTYPE) — broadcast-joined onto io.stat device ids, the
    SURVEY S16 'tiny device table' join.

    Tags: {cgroup_path, cgroup_name} from the file's directory; io.stat
    adds {device_name, device_type}.
    """
    fname = F.element_at(F.split("path", "/"), -1)
    cgp = F.regexp_replace(
        F.expr("substring(path, 1, length(path) - length(element_at(split(path, '/'), -1)) - 1)"),
        r"^/sys/fs/cgroup/?",
        "",
    )
    cgname = F.element_at(F.split(cgp, "/"), -1)
    base = files.select(
        "path",
        "content",
        fname.alias("fname"),
        cgp.alias("cgroup_path"),
        F.coalesce(cgname, F.lit("")).alias("cgroup_name"),
    )
    tags = F.create_map(
        F.lit("cgroup_path"), F.col("cgroup_path"), F.lit("cgroup_name"), F.col("cgroup_name")
    )

    # cpu.stat / memory.stat: `key value` lines -> counters
    stat_files = base.where(F.col("fname").isin("cpu.stat", "memory.stat")).select(
        "path",
        "cgroup_path",
        "cgroup_name",
        F.when(F.col("fname") == "cpu.stat", "cgroup.cpu").otherwise("cgroup.memory").alias("prefix"),
        F.explode(F.split("content", "\n")).alias("line"),
    )
    kv = F.split(F.trim("line"), r"\s+")
    stats = (
        stat_files.where(F.size(kv) == 2)
        .select(
            "cgroup_path",
            "cgroup_name",
            F.concat(F.col("prefix"), F.lit("."), kv[0]).alias("mname"),
            kv[1].try_cast("double").alias("v"),
        )
        .where(F.col("v").isNotNull())
        .select(*_metric(F.col("mname"), "counter", F.col("v"), tags))
    )

    # memory.current / memory.swap.current: single-value gauges
    cur = (
        base.where(F.col("fname").isin("memory.current", "memory.swap.current"))
        .select(
            "cgroup_path",
            "cgroup_name",
            F.concat(F.lit("cgroup."), F.col("fname")).alias("mname"),
            F.trim("content").try_cast("double").alias("v"),
        )
        .where(F.col("v").isNotNull())
        .select(*_metric(F.col("mname"), "gauge", F.col("v"), tags))
    )

    # io.stat: `maj:min [maj:min ...] k=v k=v ...` -> per-device counters
    io_lines = base.where(F.col("fname") == "io.stat").select(
        "cgroup_path", "cgroup_name", F.explode(F.split("content", "\n")).alias("line")
    )
    toks = F.split(F.trim("line"), r"\s+")
    io = io_lines.where(F.size(toks) >= 2).select(
        "cgroup_path",
        "cgroup_name",
        F.filter(toks, lambda t: ~t.contains("=")).alias("devs"),
        F.filter(toks, lambda t: t.contains("=")).alias("kvs"),
    )
    io = io.select(
        "cgroup_path",
        "cgroup_name",
        F.explode("devs").alias("dev_id"),
        F.col("kvs"),
    ).select("cgroup_path", "cgroup_name", "dev_id", F.explode("kvs").alias("kv"))
    io = io.select(
        "cgroup_path",
        "cgroup_name",
        "dev_id",
        F.substring_index("kv", "=", 1).alias("k"),
        F.substring_index("kv", "=", -1).try_cast("double").alias("v"),
    ).where(F.col("v").isNotNull())
    if uevents is not None:
        dev_id_from_path = F.element_at(F.split("path", "/"), -2)
        dev_lines = uevents.select(
            dev_id_from_path.alias("dev_id"), F.explode(F.split("content", "\n")).alias("l")
        )
        devs = (
            dev_lines.select(
                "dev_id",
                F.substring_index("l", "=", 1).alias("k"),
                F.substring_index("l", "=", -1).alias("val"),
            )
            .groupBy("dev_id")
            .agg(
                F.max(F.when(F.col("k") == "DEVNAME", F.col("val"))).alias("device_name"),
                F.max(F.when(F.col("k") == "DEVTYPE", F.col("val"))).alias("device_type"),
            )
        )
        io = io.join(F.broadcast(devs), "dev_id", "left")
    else:
        io = io.withColumn("device_name", F.lit(None).cast("string")).withColumn(
            "device_type", F.lit(None).cast("string")
        )
    io_tags = F.create_map(
        F.lit("cgroup_path"), F.col("cgroup_path"),
        F.lit("cgroup_name"), F.col("cgroup_name"),
        F.lit("device_name"), F.coalesce("device_name", F.lit("")),
        F.lit("device_type"), F.coalesce("device_type", F.lit("")),
    )
    io_metrics = io.select(
        *_metric(F.concat(F.lit("cgroup.iostat."), F.col("k")), "counter", F.col("v"), io_tags)
    )

    return stats.unionByName(cur).unionByName(io_metrics)
