"""Input-sized AQE wide start (yamon_spark.session).

The r13 fresh-JVM probe (scripts/minhash_probe.py) measured the fixed
512-wide start costing the minhash shuffle chain 1.43-1.98x at sf0.1
(17 MB input), while the r12 partition-knee measurement shows the same
width HALVING the posting-list kernel at a ~700 MB corpus. The rule that
holds across scales is bytes-per-initial-partition; these tests pin the
sizing function and its clamps (no SparkSession needed).
"""

import os

from yamon_spark.session import (
    _INPUT_BYTES_PER_INITIAL_PARTITION,
    _MAX_INITIAL_PARTITIONS,
    _sized_initial_partitions,
)


def _mkdata(tmp_path, n_bytes: int) -> str:
    d = tmp_path / "data"
    d.mkdir()
    # sparse file: the sizing only reads st_size, never the content
    # (a literal bytes object at the clamp test's 23 GB would OOM)
    path = d / "part.parquet"
    path.touch()
    os.truncate(path, n_bytes)
    return str(d)


def test_small_input_floors_at_shuffle_partitions(tmp_path):
    # sf0.1 is ~17 MB -> ~13 partitions raw, floored to the session width
    d = _mkdata(tmp_path, 17_500_000)
    assert _sized_initial_partitions(d, floor=32) == 32


def test_knee_scale_recovers_the_measured_good_width(tmp_path):
    # ~700 MB (the r12 300x slice where 512-wide was measured optimal)
    # must land in the same regime the knee probe validated
    d = _mkdata(tmp_path, 700_000_000)
    width = _sized_initial_partitions(d, floor=32)
    assert 400 <= width <= 640


def test_huge_input_clamps_at_max(tmp_path):
    d = _mkdata(tmp_path, 200 * _INPUT_BYTES_PER_INITIAL_PARTITION * _MAX_INITIAL_PARTITIONS // 100)
    assert _sized_initial_partitions(d, floor=32) == _MAX_INITIAL_PARTITIONS


def test_walk_is_recursive(tmp_path):
    d = tmp_path / "data"
    (d / "documents.parquet").mkdir(parents=True)
    (d / "documents.parquet" / "part-0.parquet").write_bytes(b"\0" * _INPUT_BYTES_PER_INITIAL_PARTITION * 50)
    assert _sized_initial_partitions(str(d), floor=8) == 51


def test_env_override_beats_data_dir(tmp_path, monkeypatch):
    # harnesses pin widths via SPARK_GRAFT_INIT_PARTITIONS; the sizing
    # must never preempt an explicit measurement config. get_spark's
    # resolution order is env > data_dir > fixed 512 — assert the env
    # read happens first by checking the code path's observable: with
    # env set, _sized_initial_partitions must not even be consulted.
    import yamon_spark.session as sess

    monkeypatch.setenv("SPARK_GRAFT_INIT_PARTITIONS", "64")
    called = []
    monkeypatch.setattr(sess, "_sized_initial_partitions", lambda *a: called.append(a) or 1)
    # build the builder chain without starting a JVM: getOrCreate is the
    # only JVM-touching call, so stub it out via a builder probe
    real = sess.SparkSession.builder.__class__.getOrCreate
    confs = {}

    def fake_get_or_create(self):
        confs.update(self._options)
        return None

    monkeypatch.setattr(sess.SparkSession.builder.__class__, "getOrCreate", fake_get_or_create)
    try:
        sess.get_spark("sizing-test", data_dir=_mkdata(tmp_path, 10))
    finally:
        monkeypatch.setattr(sess.SparkSession.builder.__class__, "getOrCreate", real)
    assert confs["spark.sql.adaptive.coalescePartitions.initialPartitionNum"] == "64"
    assert not called
