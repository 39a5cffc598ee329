"""Product-analytics operators: funnel depth and cohort retention —
ClickHouse's ``windowFunnel``/``retention`` aggregate functions
re-expressed Spark-first (the reference's events table is exactly the
input these ClickHouse functions are applied to; res/schema.sql:103-118).

Funnel: per user, fold the ts-ordered event sequence through the stage
chain signup→click→purchase; a stage counts only after all previous
stages matched (strictly ordered, like windowFunnel without the time
bound). One groupBy(user) to build sequences (partial collect_list) +
one tiny groupBy(depth) — the sequence fold is a codegen'd-input HOF
over an already-materialized array, never a Python UDF.

Retention: per user, cohort = first active day; count distinct users
active at each (cohort, day-offset). Two shuffles on user_id/cohort —
both uniform keys.

Scale: sequences are bounded per user; funnels over 100 TB shuffle
(user_id, ts, stage) triples once — the same cost as any per-entity
sessionization. Hot users bound collect_list memory by their own event
count, the standard funnel cost model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yamon_spark.queries import register, table

_STAGES = ("signup", "click", "purchase")


@register(
    "q67_funnel",
    f"""
    WITH u AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type IN ('{_STAGES[0]}', '{_STAGES[1]}', '{_STAGES[2]}')),
    a AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = '{_STAGES[0]}' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN a USING (user_id)
      WHERE e.event_type = '{_STAGES[1]}'
        AND e.ts >= a.t0 AND e.ts <= a.t0 + INTERVAL 1 DAY
      GROUP BY e.user_id),
    p AS (
      SELECT DISTINCT e.user_id FROM events e
      JOIN a USING (user_id) JOIN c USING (user_id)
      WHERE e.event_type = '{_STAGES[2]}'
        AND e.ts >= c.t1 AND e.ts <= a.t0 + INTERVAL 1 DAY),
    d AS (
      SELECT u.user_id,
             CASE WHEN p.user_id IS NOT NULL THEN 3
                  WHEN c.user_id IS NOT NULL THEN 2
                  WHEN a.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS depth
      FROM u LEFT JOIN a USING (user_id) LEFT JOIN c USING (user_id)
             LEFT JOIN p USING (user_id))
    SELECT depth, count(*) AS n_users FROM d GROUP BY depth ORDER BY depth
    """,
    doc="Funnel depth per user (windowFunnel semantics: strictly-ordered "
    "stages signup->click->purchase, all within 1 day of the first "
    "matched stage); histogram of users by depth. The oracle is the "
    "SET-BASED equivalent of the Spark fold: anchor = first signup, "
    "depth 2 iff a click lands in [anchor, anchor+1d], depth 3 iff a "
    "purchase lands in [first qualifying click, anchor+1d]. The original "
    "list_reduce struct-accumulator oracle hit DuckDB's inconsistent "
    "cross-field struct-fold evaluation at sf0.1 (the documented "
    "adpcm-roundtrip hazard): many users' depths flipped 1<->2 while the "
    "histogram moved by only one — never host a state machine in a "
    "DuckDB lambda fold. Equivalence of the two forms: stage events at "
    "the same timestamp sort (t, st)-lexicographically in the fold, so "
    "the boundary >= comparisons here match the fold's tie behavior.",
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").where(F.col("event_type").isin(*_STAGES))
    stage = (
        F.when(F.col("event_type") == _STAGES[0], 1)
        .when(F.col("event_type") == _STAGES[1], 2)
        .otherwise(3)
    )
    seqs = (
        ev.select("user_id", F.struct(F.col("ts").alias("t"), stage.alias("st")).alias("e"))
        .groupBy("user_id")
        # the sorted array is the agg output — materialized before the
        # fold touches it (interpreted-HOF re-eval gotcha)
        .agg(F.array_sort(F.collect_list("e")).alias("seq"))
    )
    init = F.struct(F.to_timestamp(F.lit("1970-01-01")).alias("t"), F.lit(0).alias("st"))
    advance = lambda acc, x: F.when(  # noqa: E731
        (x["st"] == acc["st"] + 1)
        & ((acc["st"] == 0) | (x["t"] <= acc["t"] + F.expr("INTERVAL 1 DAY"))),
        F.struct(
            F.when(acc["st"] == 0, x["t"]).otherwise(acc["t"]).alias("t"),
            (acc["st"] + 1).alias("st"),
        ),
    ).otherwise(acc)
    depth = F.aggregate("seq", init, advance, lambda acc: acc["st"])
    return (
        seqs.select(depth.alias("depth"))
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("depth")
    )


@register(
    "q68_cohort_retention",
    """
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day
      FROM events),
    coh AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY user_id)
    SELECT c.cohort, datediff('day', c.cohort, a.day) AS day_offset,
           count(*) AS n_users
    FROM act a JOIN coh c ON a.user_id = c.user_id
    WHERE datediff('day', c.cohort, a.day) <= 7
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Cohort retention (ClickHouse retention() shape): users active "
    "N days after their first active day, first week.",
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # day stays TIMESTAMP on both sides: date-typed outputs reach pandas
    # as python objects from Spark but datetime64 from DuckDB
    act = ev.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    coh = act.groupBy("user_id").agg(F.min("day").alias("cohort"))
    off = F.datediff(F.col("day"), F.col("cohort"))
    return (
        act.join(coh, "user_id")
        .where(off <= 7)
        .groupBy("cohort", off.alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort", "day_offset")
    )
