"""Tag-index layout helpers (SURVEY §2.4 D7, §4 optional rewrite).

The reference puts bloom-filter skip indexes on ``mapKeys(tags)`` /
``mapValues(tags)`` (res/schema.sql:9-10,...) so ``tags['k']='v'``
predicates can skip granules. Parquet blooms can't index map columns,
so at write time we materialize flattened ``tag_keys``/``tag_values``
array columns and enable parquet blooms on them; at read time
:func:`tag_predicate` rewrites a tag lookup into
``array_contains(tag_keys,k) AND element_at(tags,k)=v`` so the scan can
use the bloom + row-group stats before the exact map probe runs.

This is the one optimizer-shaped piece of the whole port and it needs
no Catalyst rule — a helper function suffices (SURVEY §4 conclusion).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.readwriter import DataFrameWriter


def with_tag_index_cols(df: DataFrame) -> DataFrame:
    """Materialize sorted tag_keys / tag_values arrays next to ``tags``."""
    return df.withColumn("tag_keys", F.array_sort(F.map_keys("tags"))).withColumn(
        "tag_values", F.array_sort(F.map_values("tags"))
    )


def with_tag_blooms(writer: DataFrameWriter, fpp: float = 0.01, ndv: int = 100_000) -> DataFrameWriter:
    """Enable parquet bloom filters on the flattened tag columns."""
    return (
        writer.option("parquet.bloom.filter.enabled#tag_keys", "true")
        .option("parquet.bloom.filter.enabled#tag_values", "true")
        .option("parquet.bloom.filter.fpp#tag_keys", str(fpp))
        .option("parquet.bloom.filter.fpp#tag_values", str(fpp))
        .option("parquet.bloom.filter.expected.ndv#tag_keys", str(ndv))
        .option("parquet.bloom.filter.expected.ndv#tag_values", str(ndv))
    )


def tag_predicate(key: str, value: str | None = None) -> Column:
    """``tags[key] [= value]`` rewritten to lead with the indexable
    array membership tests (bloom/stats-skippable) before the map probe."""
    has_key = F.array_contains("tag_keys", key)
    if value is None:
        return has_key
    return has_key & F.array_contains("tag_values", value) & (F.element_at("tags", key) == value)
