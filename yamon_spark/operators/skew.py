"""Skew mitigation for hot-key joins (SURVEY §4 optimizer notes).

At 100 TB a handful of hot keys (one chatty host, one dominant metric
name) can pin a shuffle join's largest task. Two tools:

1. AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
   on in ``session.get_spark``) — handles sort-merge joins transparently
   by splitting oversized partitions. Prefer it; it needs no code.
2. ``salted_join`` below — explicit salting for the cases AQE can't
   reach (aggregation-free broadcast-ineligible joins, or engines/modes
   where AQE is off): the probe side gets a deterministic per-row salt,
   the build side is replicated once per salt bucket, and the hot key's
   rows spread across ``salt`` reducers. Replication factor is bounded
   by ``salt`` × |build side| — use with dimension-sized build sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_yamon_salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the probe side salted across ``salt`` buckets.

    Probe rows get ``xxhash64(hashable columns) % salt`` (deterministic,
    no rand() — re-executable under task retry, which nondeterministic
    salting is NOT: a retried task re-rolling different salts silently
    drops/duplicates rows). Map-typed columns are excluded from the hash:
    Spark forbids xxhash64 on MapType (map iteration order is undefined),
    and every yamon stream schema carries a ``tags`` map — hashing all
    columns blindly would make the operator crash on the project's own
    data model. Build rows are replicated to every bucket via a sequence
    explode. Output equals ``probe.join(build, on, how)`` for ``inner``
    and ``left`` joins.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    def contains_map(dt) -> bool:
        # Spark rejects hash functions on any type RECURSIVELY containing
        # a map — one nested in a struct/array fails analysis the same as
        # a top-level MapType — so walk the whole type tree.
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return contains_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(contains_map(f.dataType) for f in dt.fields)
        return False

    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins (build side is replicated)")
    hashable = [f.name for f in probe.schema.fields if not contains_map(f.dataType)]
    if not hashable:
        raise ValueError("salted_join needs at least one non-map column to derive the salt")
    probe_salted = probe.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in hashable]), F.lit(salt))
    )
    build_salted = build.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return probe_salted.join(build_salted, on=[*on, _SALT], how=how).drop(_SALT)
