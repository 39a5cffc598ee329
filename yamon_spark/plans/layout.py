"""Tag-index layout helpers (SURVEY §2.4 D7, §4 optional rewrite).

The reference puts bloom-filter skip indexes on ``mapKeys(tags)`` /
``mapValues(tags)`` (res/schema.sql:9-10) so ``tags['k']='v'``
predicates can skip granules. The Spark-native restatement has two
layers, by what parquet can physically index:

1. **Hot-key scalar columns** (:func:`with_hot_tag_cols`): for the
   handful of tag keys that queries actually filter on (env, dc, ...),
   materialize ``tag_<key>`` STRING columns. Equality on a scalar
   column is a fully-pushed parquet filter — row-group min/max stats,
   dictionary filtering, AND bloom filters all arm, and `.explain`
   shows it in PushedFilters. This is the layer that skips IO, and the
   honest equivalent of ClickHouse's per-map-key bloom granule index.
2. **Flattened array columns** (:func:`with_tag_index_cols`): sorted
   ``tag_keys``/``tag_values`` arrays beside the map, with
   :func:`tag_predicate` rewriting a tag lookup to lead with cheap
   array membership before the map probe. Row-level and vectorized,
   but NOT an IO skip: measured on Spark 4.1.2 / parquet-mr, bloom
   options on repeated (array) leaves write no bloom at any
   cardinality, and array_contains is not a pushed filter — the bloom
   options stay armed only for forward compatibility
   (tests/test_bucketing.py pins the current behavior either way).

This is the one optimizer-shaped piece of the whole port and it needs
no Catalyst rule — helper functions suffice (SURVEY §4 conclusion).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.readwriter import DataFrameWriter


def with_tag_index_cols(df: DataFrame) -> DataFrame:
    """Materialize sorted tag_keys / tag_values arrays next to ``tags``."""
    return df.withColumn("tag_keys", F.array_sort(F.map_keys("tags"))).withColumn(
        "tag_values", F.array_sort(F.map_values("tags"))
    )


def hot_tag_col(key: str) -> str:
    """Column name for a materialized hot tag key ('env' -> 'tag_env')."""
    return "tag_" + re.sub(r"[^A-Za-z0-9_]", "_", key)


def with_hot_tag_cols(df: DataFrame, keys: tuple[str, ...]) -> DataFrame:
    """Materialize ``tag_<key>`` scalar columns for the declared hot tag
    keys (null when the row lacks the tag). Scalar equality on these is
    a fully-pushed parquet predicate — the IO-skipping tag index."""
    for k in keys:
        df = df.withColumn(hot_tag_col(k), F.element_at("tags", k))
    return df


def with_tag_blooms(
    writer: DataFrameWriter,
    fpp: float = 0.01,
    ndv: int = 100_000,
    hot_keys: tuple[str, ...] = (),
) -> DataFrameWriter:
    """Enable parquet bloom filters on the tag index columns.

    Blooms physically arm on the scalar hot-key columns (and skip
    row-groups at read time once cardinality defeats the dictionary —
    parquet-mr omits the bloom while a column stays fully
    dictionary-encoded, because the dictionary is already an exact
    filter). The array-column options are retained for forward
    compatibility; current parquet-mr writes no blooms for repeated
    leaves (see module docstring)."""
    for col in ("tag_keys", "tag_values", *(hot_tag_col(k) for k in hot_keys)):
        writer = (
            writer.option(f"parquet.bloom.filter.enabled#{col}", "true")
            .option(f"parquet.bloom.filter.fpp#{col}", str(fpp))
            .option(f"parquet.bloom.filter.expected.ndv#{col}", str(ndv))
        )
    return writer


def tag_predicate(key: str, value: str | None = None, df: DataFrame | None = None) -> Column:
    """``tags[key] [= value]`` rewritten against the best available
    layout: a materialized hot-key scalar column when the frame carries
    one (fully-pushed equality — IO skip), else the flattened array
    membership lead-in before the exact map probe (row-level
    short-circuit).

    Semantics are identical across layouts by definition: "has tag"
    means the key maps to a NON-NULL value (a hot scalar column cannot
    distinguish a null-valued entry from an absent key, so the array
    layout applies the same rule — one logical query, one row set,
    whichever table it runs against)."""
    hot = hot_tag_col(key)
    if df is not None and hot in df.columns:
        if value is None:
            return F.col(hot).isNotNull()
        return F.col(hot) == value
    has_key = F.array_contains("tag_keys", key)
    if value is None:
        return has_key & F.element_at("tags", key).isNotNull()
    return has_key & F.array_contains("tag_values", value) & (F.element_at("tags", key) == value)
