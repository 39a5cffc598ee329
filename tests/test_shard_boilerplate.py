"""Round-11 surface: boilerplate_report (cross-doc segment frequency),
source_dup_matrix (cross-source near-dup rollup), shard_balance
(training-shard placement audit). Oracle parity runs in test_oracle.py
via the registry; these pin the semantics an oracle diff can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yamon_spark.operators.curation import shard_balance
from yamon_spark.operators.dedup import source_dup_matrix
from yamon_spark.operators.text import boilerplate_report

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)], DOC_SCHEMA
    )


BANNER = "all rights reserved contact us terms of service"  # 8 words


def test_boilerplate_shared_segment_flags_both_docs(spark):
    # two docs share the banner segment; each also has a unique segment
    uniq_a = "alpha beta gamma delta epsilon zeta eta theta"
    uniq_b = "one two three four five six seven eight"
    docs = _docs(
        spark,
        [
            (f"{BANNER} {uniq_a}", "en", "s"),
            (f"{BANNER} {uniq_b}", "en", "s"),
            (uniq_a + " extra", "en", "s"),  # 9 words -> ONE segment (tail dropped)
        ],
    )
    out = {r["doc_id"]: r for r in boilerplate_report(docs, seg_words=8, min_docs=2).collect()}
    assert out[0]["n_segments"] == 2 and out[1]["n_segments"] == 2
    # the banner is in docs 0+1; uniq_a's segment is ALSO shared (docs 0 and 2)
    assert out[0]["n_boiler"] == 2 and out[0]["boiler_frac"] == 1.0
    assert out[1]["n_boiler"] == 1 and out[1]["boiler_frac"] == 0.5
    assert out[2]["n_segments"] == 1 and out[2]["n_boiler"] == 1


def test_boilerplate_repeated_segment_counts_per_occurrence(spark):
    # doc 0 repeats the banner twice: both occurrences count toward its
    # fraction (the doc IS 100% boilerplate), while doc-frequency uses
    # DISTINCT docs (2, not 3)
    docs = _docs(
        spark,
        [
            (f"{BANNER} {BANNER}", "en", "s"),
            (f"{BANNER} x y z q w e r t", "en", "s"),
        ],
    )
    out = {r["doc_id"]: r for r in boilerplate_report(docs).collect()}
    assert out[0]["n_segments"] == 2 and out[0]["n_boiler"] == 2
    assert out[1]["n_boiler"] == 1


def test_boilerplate_short_docs_excluded(spark):
    docs = _docs(spark, [("too short", "en", "s"), (BANNER, "en", "s")])
    rows = boilerplate_report(docs).collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["n_boiler"] == 0  # single doc: nothing cross-doc


def test_source_dup_matrix_unordered_pairs_and_diagonal(spark):
    dup = "spark shuffle partition broadcast join agg scan filter " * 4
    docs = _docs(
        spark,
        [
            (dup, "en", "web"),
            (dup, "en", "wiki"),  # cross-source near-dup (exact dup here)
            (dup, "en", "web"),  # intra-source dup -> diagonal entry
            ("totally unrelated words nothing shared here at all", "en", "web"),
        ],
    )
    out = {(r["src_a"], r["src_b"]): r for r in source_dup_matrix(docs).collect()}
    assert out[("web", "wiki")]["n_pairs"] == 2  # (0,1) and (1,2)
    assert out[("web", "web")]["n_pairs"] == 1  # (0,2)
    assert out[("web", "wiki")]["avg_jaccard"] == 1.0
    assert ("wiki", "web") not in out  # normalized to unordered


def test_shard_balance_partition_of_corpus_and_ideal_ratio(spark):
    docs = _docs(spark, [(f"word{i} " * (i + 1), "en", "s") for i in range(200)])
    rows = shard_balance(docs, n_shards=16).collect()
    assert sum(r["n_docs"] for r in rows) == 200  # every doc placed exactly once
    total = sum(r["n_tokens"] for r in rows)
    # load_ratio is n_tokens scaled so the ideal share is 1.0
    for r in rows:
        assert abs(r["load_ratio"] - r["n_tokens"] * 16 / total) < 1e-3
    assert {r["shard"] for r in rows} <= set(range(16))


def test_shard_balance_salt_redeal_changes_placement_not_totals(spark):
    docs = _docs(spark, [(f"word{i} " * 5, "en", "s") for i in range(100)])
    a = shard_balance(docs, n_shards=8, salt="a").collect()
    b = shard_balance(docs, n_shards=8, salt="b").collect()
    assert sum(r["n_docs"] for r in a) == sum(r["n_docs"] for r in b) == 100
    assert [r["n_docs"] for r in a] != [r["n_docs"] for r in b]


def test_new_ops_have_no_data_sized_single_partition_plans(spark):
    docs = _docs(spark, [(f"{BANNER} doc{i}", "en", f"s{i % 3}") for i in range(30)])
    for df in (boilerplate_report(docs), source_dup_matrix(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        # unpartitioned-window coverage for the registered forms lives in
        # scripts/plan_audit.py (hard gate); here pin the cheaper-to-read
        # invariant that nothing funnels data through one partition
        assert plan.count("Exchange SinglePartition") == 0, plan
    # shard_balance's only SinglePartition is the 1-row total reduced from
    # the ALREADY-AGGREGATED n_shards-row frame (bounded by construction,
    # not data-sized): the global agg must sit above the shard groupBy
    plan = shard_balance(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") == 1, plan
    single_input = plan.split("Exchange SinglePartition", 1)[1]
    assert "HashAggregate(keys=[shard" in single_input, plan


def test_burn_rate_alert_requires_both_windows(spark, tmp_path):
    # hour 0: 100% errors inside an otherwise-quiet 6h block -> burn_1h
    # fires, burn_6h stays under budget -> NO alert (the flap the slow
    # window exists to stop). hours 6-11: sustained 50% errors -> both
    # windows over the 25% budget -> alert on each of those 1h rows.
    import datetime

    from yamon_spark.queries import all_queries

    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    eid = 0

    def add(hour, minute, etype):
        nonlocal eid
        rows.append((eid, t0 + datetime.timedelta(hours=hour, minutes=minute), 1, etype, 1.0, "{}"))
        eid += 1

    for m in range(10):
        add(0, m, "error")  # hour 0: all errors
    for h in range(1, 6):
        for m in range(20):
            add(h, m, "view")  # hours 1-5: quiet -> 6h ratio 10/110 < 0.25
    for h in range(6, 12):
        for m in range(10):
            add(h, m, "error" if m % 2 == 0 else "view")  # sustained 50%
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    path = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(path)
    out = {r["ws"].hour: r for r in all_queries()["q90_burn_rate"].build(spark, str(tmp_path)).collect()}
    assert out[0]["burn_1h"] == 4.0 and out[0]["alert"] == 0
    assert all(out[h]["alert"] == 1 for h in range(6, 12))
    assert abs(out[6]["err_ratio_6h"] - 0.5) < 1e-12


def test_dedup_survivors_policy_and_impact(spark):
    # docs 0,1,2 form one near-dup cluster (0 and 2 are the longest at
    # equal length -> min doc_id 0 survives); doc 3 is unrelated
    base = "spark shuffle partition broadcast join agg scan filter " * 4
    docs = _docs(
        spark,
        [
            (base + "tail words", "en", "s"),
            (base, "en", "s"),
            (base + "tail extra", "en", "s"),
            ("nothing in common with the cluster at all here", "en", "s"),
        ],
    )
    from yamon_spark.operators.curation import dedup_survivors

    rows = dedup_survivors(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["cluster_id"] == 0 and r["survivor_doc_id"] == 0
    assert r["n_members"] == 3 and r["n_dropped"] == 2
    total = sum(len(t) for t, _, _ in [
        (base + "tail words", 0, 0), (base, 0, 0), (base + "tail extra", 0, 0)
    ])
    assert r["chars_dropped"] == total - len(base + "tail words")
