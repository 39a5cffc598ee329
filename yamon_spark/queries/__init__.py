"""Declared-query registry — the testable relational surface (SURVEY §2.5).

The reference executes no queries itself; its ClickHouse schema implies a
query surface (time-range scans, tag filtering, windowed rollups, rate/
delta, log search, joins across streams — reference res/schema.sql). Each
entry here is one declared query: a Spark-first builder plus an equivalent
ANSI-SQL oracle string that DuckDB runs on the same parquet tables.

Determinism contract (FIXTURES.md): total ORDER BY on all output columns,
ROUND(x, 4) on double outputs, µs timestamps, aliases identical on both
sides so the driver's column-sorted value hash matches.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> rows-only check (non-SQL-expressible)
    doc: str = ""


REGISTRY: dict[str, DeclaredQuery] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a declared query builder."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = DeclaredQuery(name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table.

    events.parquet carries TIMESTAMP(NANOS) (the reference's DateTime64(9),
    res/schema.sql:3); Spark has no ns timestamp, so it is read with the
    nanosAsLong legacy mapping and truncated to µs (integer DIV — exact,
    no double round-trip), matching the oracle's µs comparison contract.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:  # noqa: BLE001
            pass
        df = spark.read.parquet(path)
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(path)


# Names already hash-verified green by the driver (CORRECTNESS_r01 + r02).
# External verification budgets cover a prefix of the registry, so these sort
# last: every not-yet-driver-verified entry gets a window slot first. Update
# this set from CORRECTNESS_r{N} each round to rotate fresh entries in.
_DRIVER_GREEN: frozenset[str] = frozenset({
    # round 1 (49 green; q34 re-verified green in round 2)
    "dedup_exact", "q10_inner_join_dims", "q11_left_outer_count",
    "q12_semi_join", "q13_anti_join", "q14_range_join", "q15_asof_join",
    "q16_cross_join_pairs", "q20_hash_agg", "q21_distinct_agg",
    "q22_approx_distinct", "q23_grouping_sets", "q24_rollup",
    "q25_gauge_rollup_mv", "q26_counter_rollup_mv", "q27_pivot",
    "q28_percentiles", "q29_heavy_hitters", "q35_gap_fill",
    "q36_dist_windows", "q37_histogram", "q38_approx_quantile",
    "q39_cond_aggs", "q44_union_all", "q45_scalar_subquery",
    "q46_in_subquery", "q47_exists_correlated", "q48_cte_reuse",
    "q49_first_last_window", "q50_string_funcs", "q51_datetime_funcs",
    "q52_math_funcs", "q53_json_extract", "q54_map_tag_ops",
    "q55_array_funcs", "q56_struct_ops", "q57_conditionals",
    "q58_regex_funcs", "q65_interval_join", "q69_time_range_window",
    "q73_unpivot", "q74_lateral_explode", "q75_bitmap_distinct",
    "q76_zip_with", "q77_cube_grouping", "q78_median_stats",
    "q79_fuzzy_match", "text_bigrams", "text_search",
    # round 2 (50/50 green, CORRECTNESS_r02)
    "dedup_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "sim_cosine_topk", "sim_ivf_topk", "sim_lsh_topk", "sim_near_dup_pairs",
    "text_stats", "text_lang_id", "text_token_count", "text_fingerprint",
    "multimodal_meta", "multimodal_frames", "multimodal_features",
    "q01_filter_project", "q02_pushdown_predicates", "q03_distinct",
    "q30_topk_per_group", "q31_counter_delta", "q32_moving_avg",
    "q33_running_sum", "q34_counter_rate", "q40_global_topk",
    "q41_union_distinct", "q42_intersect", "q43_except",
    "q60_tumbling_window", "q61_sliding_window", "q62_session_window",
    "q63_watermark_late_drop", "q64_stateful_dedup",
    "q66_hll_rollup_merge", "q67_funnel", "q68_cohort_retention",
    "q70_scalar_pandas_udf", "q71_grouped_map_zscore", "q72_grouped_agg_udaf",
    "text_quality_filter", "text_repetition", "contamination_ngram",
    "sample_stratified", "pack_sequences", "domain_mix",
    "dedup_canonical", "dedup_clusters", "vocab_coverage",
    "embed_centroids", "embed_norm_stats", "ann_range_search", "pq_codes",
})


def all_queries() -> dict[str, DeclaredQuery]:
    """Import all query modules (side-effect: registration) and return registry.

    Returned order is deliberate: entries without a green driver-verification
    row yet come first (in module registration order), already-verified ones
    last, so a prefix-bounded verification budget always lands on fresh work.
    """
    from yamon_spark.queries import (  # noqa: F401
        pipeline_ops,
        scans,
        window_funcs,
        streaming_batch,
        udf_surface,
        product_analytics,
        sketches,
        curation_ops,
        analytics_ext,
        ann_ext,
        aggregation,
        analytics_ext2,
        analytics_ext3,
        functions_scalar,
        joins,
    )

    fresh = {k: v for k, v in REGISTRY.items() if k not in _DRIVER_GREEN}
    seen = {k: v for k, v in REGISTRY.items() if k in _DRIVER_GREEN}
    return {**fresh, **seen}
