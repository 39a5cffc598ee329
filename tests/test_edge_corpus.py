"""Testdata-drift shield: every registered query must EXECUTE against an
edge-case variant of the testdata without raising.

Round 3's failure mode was exactly this class — the driver's testdata
changed shape between rounds (ts physical encoding) and three
ledger-green queries started crashing. The oracle harness can't catch a
crash-on-future-data ahead of time; this test can, for the value-shaped
drift axis: it clones sf0.001 and appends adversarial rows (empty /
whitespace-only / single-char / unicode / very long token documents,
zero and extreme event values, empty-JSON props), then builds and
executes all 150+ queries against the clone.

Only no-crash is asserted (plus sane row counts) — semantic correctness
on normal data is the oracle gate's job. ANSI mode stays ON (the driver
runs a plain session), so divide-by-zero/overflow paths that would abort
the driver abort here first.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("edge_sf")
    import os
    import shutil

    for name in os.listdir(SRC):
        if name not in ("documents.parquet", "events.parquet", "embeddings.parquet"):
            # unchanged tables: copy through (symlinks confuse some readers)
            shutil.copytree(os.path.join(SRC, name), os.path.join(out, name)) if os.path.isdir(
                os.path.join(SRC, name)
            ) else shutil.copy(os.path.join(SRC, name), os.path.join(out, name))

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    base_id = docs.agg(F.max("doc_id")).first()[0] + 1
    edge_rows = [
        (base_id + 0, "", "en", "edge", 0),  # empty text
        (base_id + 1, "   ", "en", "edge", 3),  # whitespace only
        (base_id + 2, "x", "en", "edge", 1),  # single char
        (base_id + 3, "一 二 三 的 的 的", "zh", "edge", 11),  # non-latin
        (base_id + 4, "a" * 5000, "en", "edge", 5000),  # one huge token
        (base_id + 5, ("tok " * 2000).strip(), "en", "edge", 7999),  # many tokens
        (base_id + 6, "the the the the the", "en", "edge", 19),  # degenerate repeat
    ]
    edge = spark.createDataFrame(edge_rows, schema=docs.schema)
    docs.unionByName(edge).repartition(4).write.parquet(f"{out}/documents.parquet")

    from yamon_spark.queries import table

    ev = table(spark, SRC, "events")
    ebase = ev.agg(F.max("event_id")).first()[0] + 1
    emax_ts = ev.agg(F.max("ts")).first()[0]
    eedge = spark.createDataFrame(
        [
            (ebase + 0, emax_ts, 999_999, "edge_type", 0.0, "{}"),
            (ebase + 1, emax_ts, 999_999, "edge_type", 1e9, "{}"),
            (ebase + 2, emax_ts, 999_998, "click", -1e9, '{"k": null}'),
        ],
        schema=ev.schema,
    )
    ev.unionByName(eedge).repartition(4).write.parquet(f"{out}/events.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    vbase = emb.agg(F.max("vec_id")).first()[0] + 1
    eedge_v = spark.createDataFrame(
        [
            (vbase + 0, [0.0] * 64, 0),  # zero norm: cosine undefined -> NULL, never a crash
            (vbase + 1, [1e-30] * 64, 1),  # denormal-scale norm
            (vbase + 2, [1e30] * 64, 2),  # huge magnitudes (norm overflow-adjacent)
            (vbase + 3, [-1e30] + [0.0] * 63, 3),
        ],
        schema=emb.schema,
    )
    emb.unionByName(eedge_v).repartition(4).write.parquet(f"{out}/embeddings.parquet")
    return str(out)


def test_every_query_survives_edge_corpus(spark, edge_dir):
    from yamon_spark.queries import all_queries

    failures = {}
    for name, dq in sorted(all_queries().items()):
        try:
            dq.build(spark, edge_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {e}"[:160]
    assert not failures, f"queries crash on edge-shaped testdata: {failures}"
