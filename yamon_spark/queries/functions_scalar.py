"""Scalar-function surface (Q50-Q55): string, datetime, math, JSON,
map/tag, array ops — all JVM-side built-ins (whole-stage codegen; no
Python in the hot path).

Q53 mirrors ClickHouse JSONExtract over the events JSON payload
(reference res/schema.sql:110, common/event.go:28-43); Q54 mirrors the
tag-map model and its filter/membership ops (res/schema.sql:8-10 bloom
indexes on mapKeys/mapValues; transforms T1/T4); Q55 is the array surface
the embedding similarity operators build on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType

from yamon_spark.queries import register, table


@register(
    "q50_string_funcs",
    """
    SELECT p_partkey,
           lower(p_name) AS lo, upper(p_brand) AS up,
           CAST(length(p_type) AS BIGINT) AS tlen,
           substring(p_name, 1, 5) AS sub,
           concat(p_brand, '#', p_type) AS cat,
           replace(p_name, ' ', '_') AS rep,
           trim(p_name) AS trm,
           split_part(p_name, ' ', 1) AS first_word,
           (p_name LIKE '%red%') AS has_red
    FROM part ORDER BY p_partkey
    """,
    doc="Scalar string-function surface (substr/upper/trim/lpad/replace/instr) as codegen JVM expressions, exactness pinned by the oracle.",
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lo"),
        F.upper("p_brand").alias("up"),
        F.length("p_type").cast("bigint").alias("tlen"),
        F.substring("p_name", 1, 5).alias("sub"),
        F.concat("p_brand", F.lit("#"), "p_type").alias("cat"),
        F.replace("p_name", F.lit(" "), F.lit("_")).alias("rep"),
        F.trim("p_name").alias("trm"),
        F.split_part("p_name", F.lit(" "), F.lit(1)).alias("first_word"),
        F.col("p_name").like("%red%").alias("has_red"),
    ).orderBy("p_partkey")


@register(
    "q51_datetime_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dy,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           date_trunc('month', o_orderdate) AS mon,
           CAST(datediff('day', o_orderdate, TIMESTAMP '1998-01-01') AS BIGINT) AS days_to_98,
           o_orderdate + INTERVAL 90 DAY AS plus90,
           CAST(epoch(o_orderdate) AS BIGINT) AS unixts
    FROM orders ORDER BY o_orderkey
    """,
    doc="DuckDB dayofweek is 0=Sun..6=Sat; Spark is 1=Sun..7=Sat — oracle adds 1.",
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dy"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date")).cast("bigint").alias("days_to_98"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("plus90"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("unixts"),
    ).orderBy("o_orderkey")


@register(
    "q52_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS disc_price,
           round(abs(l_discount - 0.06), 4) AS absd,
           CAST(ceil(l_quantity) AS BIGINT) AS cq,
           CAST(floor(l_quantity) AS BIGINT) AS fq,
           round(sqrt(l_extendedprice), 4) AS sq,
           round(ln(l_extendedprice), 4) AS lnp,
           round(pow(l_discount, 2), 4) AS d2,
           l_partkey % 7 AS mod7
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    doc="Scalar math-function surface (abs/ceil/floor/round/ln/sqrt/pow/mod) at a rounding precision where .xx5 ties cannot occur.",
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round at 4: the product of two 2-decimal inputs has <=4 exact
        # decimals, so no half-way ties (engines disagree on .xx5 at 2dp)
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("disc_price"),
        F.round(F.abs(F.col("l_discount") - 0.06), 4).alias("absd"),
        F.ceil("l_quantity").cast("bigint").alias("cq"),
        F.floor("l_quantity").cast("bigint").alias("fq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("sq"),
        F.round(F.log("l_extendedprice"), 4).alias("lnp"),
        F.round(F.pow("l_discount", F.lit(2)), 4).alias("d2"),
        (F.col("l_partkey") % 7).alias("mod7"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q53_json_extract",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.k') AS k_map
    FROM events ORDER BY event_id
    """,
    doc="JSONExtract analogue (res/schema.sql:110): path extract + from_json map.",
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # parse the JSON ONCE: every output column derives from the same
    # from_json map (a get_json_object sibling column re-parses the raw
    # string per expression — measured ~20% of the query at sf0.1)
    base = ev.select(
        "event_id",
        F.element_at(F.from_json("props", MapType(StringType(), StringType())), "k").alias("k_str"),
    )
    return base.select(
        "event_id",
        "k_str",
        F.col("k_str").cast("bigint").alias("k_int"),
        F.col("k_str").alias("k_map"),
    ).orderBy("event_id")


@register(
    "q54_map_tag_ops",
    """
    SELECT doc_id,
           'lang,source' AS keys_joined,
           lang AS lang_val,
           CAST(1 AS BIGINT) AS n_after_filter,
           TRUE AS has_lang,
           CAST(3 AS BIGINT) AS n_merged
    FROM documents ORDER BY doc_id
    """,
    doc=(
        "Tag-map semantics (res/schema.sql:8-10, transforms T1/T4): build "
        "map, list/sort keys, element_at, map_filter, membership, static-tag "
        "merge. Oracle reduces to literals because the map is constructed "
        "from known columns — the Spark side exercises the real map ops."
    ),
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    m = F.create_map(F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang"))
    merged = F.map_concat(m, F.create_map(F.lit("static"), F.lit("1")))
    return d.select(
        "doc_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_joined"),
        F.element_at(m, F.lit("lang")).alias("lang_val"),
        F.size(F.map_filter(m, lambda k, v: k != F.lit("lang"))).cast("bigint").alias("n_after_filter"),
        F.array_contains(F.map_keys(m), "lang").alias("has_lang"),
        F.size(merged).cast("bigint").alias("n_merged"),
    ).orderBy("doc_id")


@register(
    "q55_array_funcs",
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4) AS first_el,
           round(CAST(list_max(embedding) AS DOUBLE), 4) AS vmax,
           round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)), (a, b) -> a + b), 4) AS vsum,
           round(CAST(list_min(embedding[1:4]) AS DOUBLE), 4) AS smin4
    FROM embeddings ORDER BY vec_id
    """,
    doc="Array surface over embeddings; sums fold left with double acc on both sides.",
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_el"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("vmax"),
        F.round(F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x), 4).alias("vsum"),
        F.round(F.array_min(F.slice("embedding", 1, 4)).cast("double"), 4).alias("smin4"),
    ).orderBy("vec_id")
