"""Bucketed co-located joins (SURVEY §4): pre-bucketing both sides of a
recurring join key removes the shuffle entirely — the physical plan has
NO Exchange on the bucketed key. This is the 100 TB play for the
pipeline's standing joins (metrics ⋈ host-dimension, events ⋈ user
cohorts): pay one bucketed write, then every subsequent join is
shuffle-free and stays node-local."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse_tables(spark):
    # warehouse.dir is a static conf — tables land in the session default
    # (./spark-warehouse, gitignored) and are dropped on teardown
    n_buckets = 8
    facts = spark.range(10000).select(
        (F.col("id") % 500).alias("user_id"), F.col("id").cast("double").alias("value")
    )
    dims = spark.range(500).select(
        F.col("id").alias("user_id"), F.concat(F.lit("cohort-"), (F.col("id") % 5).cast("string")).alias("cohort")
    )
    facts.write.bucketBy(n_buckets, "user_id").sortBy("user_id").mode("overwrite").saveAsTable(
        "b_facts"
    )
    dims.write.bucketBy(n_buckets, "user_id").sortBy("user_id").mode("overwrite").saveAsTable("b_dims")
    yield
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")


def test_bucketed_join_has_no_shuffle(spark, warehouse_tables):
    # broadcast would hide the point: force the sort-merge path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_facts")
            .join(spark.table("b_dims"), "user_id")
            .groupBy("cohort")
            .agg(F.sum("value").alias("sv"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_part = plan[plan.find("SortMergeJoin") :]
        # no Exchange below the join: both sides read pre-bucketed
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(user_id" not in join_part
        assert joined.count() == 5
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain(spark, warehouse_tables):
    bucketed = sorted(
        (r.cohort, r.sv)
        for r in spark.table("b_facts")
        .join(spark.table("b_dims"), "user_id")
        .groupBy("cohort")
        .agg(F.sum("value").alias("sv"))
        .collect()
    )
    facts = spark.range(10000).select(
        (F.col("id") % 500).alias("user_id"), F.col("id").cast("double").alias("value")
    )
    dims = spark.range(500).select(
        F.col("id").alias("user_id"), F.concat(F.lit("cohort-"), (F.col("id") % 5).cast("string")).alias("cohort")
    )
    plain = sorted(
        (r.cohort, r.sv)
        for r in facts.join(dims, "user_id").groupBy("cohort").agg(F.sum("value").alias("sv")).collect()
    )
    assert bucketed == plain


def test_snapshot_diff_is_shuffle_free_over_bucketed_store(spark):
    """The registry's one big-big join (corpus_snapshot_diff's full-outer
    unique-key join) runs with ZERO exchange on the join key when the
    snapshot store is bucketed on doc_id — the operator is UNCHANGED
    (its shuffle-hash hint is satisfied by the bucketed distribution
    instead of an exchange). This is the 100 TB shape for a release
    audit that runs on every snapshot pair: pay the bucketed write once
    per snapshot, diff for free forever."""
    from pyspark.sql import functions as F

    from yamon_spark.operators.dedup import corpus_snapshot_diff

    docs = spark.range(5000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("w"), F.col("id")).alias("text")
    )
    old = docs.where("doc_id % 10 != 7")
    new = docs.where("doc_id % 10 != 3")
    try:
        for name, df in (("b_snap_old", old), ("b_snap_new", new)):
            df.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable(name)
        out = corpus_snapshot_diff(spark.table("b_snap_old"), spark.table("b_snap_new"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ShuffledHashJoin" in plan and "SortMergeJoin" not in plan
        # the ONLY exchanges are the 4-row status aggregate + output sort;
        # nothing repartitions on the join key
        assert "Exchange hashpartitioning(doc_id" not in plan
        got = {r.status: r.n_docs for r in out.collect()}
        # parity with the unbucketed frames
        want = {r.status: r.n_docs for r in corpus_snapshot_diff(old, new).collect()}
        assert got == want and got["unchanged"] > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_snap_old")
        spark.sql("DROP TABLE IF EXISTS b_snap_new")


def test_near_dup_blocking_is_shuffle_free_over_label_bucketed_store(spark):
    """The near-dup pair family's standing shuffle is the groupBy on the
    block column; a label-bucketed embeddings store satisfies the
    grouped-map's hashpartitioning requirement from the READ, so the
    100 TB play is: pay one bucketed write, then every near-dup /
    threshold-sweep pass over the store is shuffle-free on the block
    key (below the sub-bucketing knee, where the group key is the label
    alone)."""
    from yamon_spark.operators.similarity import embedding_near_dup_pairs

    emb = spark.range(400).select(
        F.col("id").alias("vec_id"),
        F.array(*[((F.col("id") + i) % 7).cast("float") + 1.0 for i in range(4)]).alias(
            "embedding"
        ),
        (F.col("id") % 8).cast("int").alias("label"),
    )
    emb.write.bucketBy(8, "label").mode("overwrite").saveAsTable("b_embeddings")
    try:
        store = spark.table("b_embeddings")
        pairs = embedding_near_dup_pairs(store, threshold=0.999)  # avg block 50 < 512
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        grouped = plan[plan.find("FlatMapGroupsInPandas") :]
        assert "FlatMapGroupsInPandas" in plan
        assert "Exchange hashpartitioning(label" not in grouped
        # same pairs as the plain (shuffled) path over the raw frame
        plain = sorted(
            (r.vec_a, r.vec_b, r.cos_sim)
            for r in embedding_near_dup_pairs(emb, threshold=0.999).collect()
        )
        assert sorted((r.vec_a, r.vec_b, r.cos_sim) for r in pairs.collect()) == plain
        assert len(plain) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_embeddings")
