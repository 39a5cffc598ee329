"""Fourth extension batch: the remaining scheduled-alerting queries a
monitoring engine runs over its event tables — seasonal (hour-of-day)
baseline deviation and change-point (level-shift) detection. Both are
the batch twins of alert rules the reference delegates to dashboards on
top of ClickHouse (res/schema.sql's rollup tables exist to make exactly
these queries cheap).

Scale shapes: q86 is two partial-agg groupBys over (type, hour) cells
(bounded by |types|*24) + one 1-row horizon broadcast; q87 is two
partial-agg groupBys over |types| rows with an equi-join between them.
Determinism: values quantize to integer cents (floor(v*100 + 0.5), the
engine-portable half-up) BEFORE aggregation, so the cross-partition sums
are exact integers (order-independent) and the derived means are
bit-identical on both engines — a float-sum average here measurably
straddles a round-4 tie at sf0.01, and the tie itself (an EXACT .00005
mean: 359518 cents / 80 rows) splits Spark's BigDecimal HALF_UP from
DuckDB's float-scaling round. So means are emitted UNROUNDED (exact
integer sum / count: one IEEE division, identical on both engines), and
ratios/differences/flags derive from those identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yamon_spark.queries import register, table


@register(
    "q86_seasonal_baseline",
    """
    WITH d AS (
      SELECT event_type, CAST(hour(ts) AS INT) AS hr, CAST(ts AS DATE) AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events
    ),
    m AS (SELECT max(day) AS last_day FROM d),
    base AS (
      SELECT event_type, hr, sum(vc) / (100.0 * count(*)) AS baseline_avg
      FROM d CROSS JOIN m WHERE d.day < m.last_day GROUP BY event_type, hr
    ),
    cur AS (
      SELECT event_type, hr, sum(vc) / (100.0 * count(*)) AS current_avg
      FROM d CROSS JOIN m WHERE d.day = m.last_day GROUP BY event_type, hr
    )
    SELECT c.event_type, c.hr, b.baseline_avg, c.current_avg,
           c.current_avg / b.baseline_avg AS ratio,
           CAST(CASE WHEN abs(c.current_avg / b.baseline_avg - 1.0) > 0.2
                THEN 1 ELSE 0 END AS INT) AS anomalous
    FROM cur c JOIN base b ON c.event_type = b.event_type AND c.hr = b.hr
    ORDER BY c.event_type, c.hr
    """,
    doc=(
        "Seasonal baseline deviation: the last day's per-(type, hour) "
        "average vs the hour-of-day baseline learned from all prior days "
        "— the 'is today abnormal for 3am' alert every monitoring stack "
        "schedules. Baseline cells bounded by |types|*24; assignment is "
        "one equi-join."
    ),
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        F.hour("ts").cast("int").alias("hr"),
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
    )
    m = d.agg(F.max("day").alias("last_day"))
    j = d.crossJoin(F.broadcast(m))

    def cents_avg(alias: str):
        # UNROUNDED: exact integer sum / (100*count) is one IEEE division,
        # bit-identical on both engines (rounding it can hit exact ties)
        return (F.sum("vc") / (F.lit(100.0) * F.count(F.lit(1)))).alias(alias)

    base = (
        j.where(F.col("day") < F.col("last_day"))
        .groupBy("event_type", "hr")
        .agg(cents_avg("baseline_avg"))
    )
    cur = (
        j.where(F.col("day") == F.col("last_day"))
        .groupBy("event_type", "hr")
        .agg(cents_avg("current_avg"))
    )
    ratio = F.col("current_avg") / F.col("baseline_avg")
    return (
        cur.join(base, ["event_type", "hr"])
        .select(
            "event_type",
            "hr",
            "baseline_avg",
            "current_avg",
            ratio.alias("ratio"),
            F.when(F.abs(ratio - F.lit(1.0)) > 0.2, 1).otherwise(0).alias("anomalous"),
        )
        .orderBy("event_type", "hr")
    )


@register(
    "q87_level_shift",
    """
    WITH s AS (
      SELECT event_type, epoch_us(ts) AS us,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events
    ),
    rng AS (
      SELECT event_type, (min(us) + max(us)) // 2 AS mid_us FROM s GROUP BY event_type
    ),
    h AS (
      SELECT s.event_type,
             sum(CASE WHEN s.us <= rng.mid_us THEN vc ELSE 0 END)
                   / (100.0 * sum(CASE WHEN s.us <= rng.mid_us THEN 1 ELSE 0 END)) AS mean_before,
             CASE WHEN sum(CASE WHEN s.us > rng.mid_us THEN 1 ELSE 0 END) = 0 THEN NULL
                  ELSE sum(CASE WHEN s.us > rng.mid_us THEN vc ELSE 0 END)
                       / (100.0 * sum(CASE WHEN s.us > rng.mid_us THEN 1 ELSE 0 END)) END AS mean_after,
             CAST(sum(CASE WHEN s.us <= rng.mid_us THEN 1 ELSE 0 END) AS BIGINT) AS n_before,
             CAST(sum(CASE WHEN s.us > rng.mid_us THEN 1 ELSE 0 END) AS BIGINT) AS n_after
      FROM s JOIN rng ON s.event_type = rng.event_type
      GROUP BY s.event_type
    )
    SELECT event_type, n_before, n_after, mean_before, mean_after,
           mean_after - mean_before AS shift,
           CAST(CASE WHEN abs(mean_after - mean_before) > 1.0
                THEN 1 ELSE 0 END AS INT) AS shifted
    FROM h ORDER BY event_type
    """,
    doc=(
        "Change-point (level-shift) detection per series: mean value in "
        "the first vs second half of each series' time range (midpoint = "
        "exact integer-µs halfway), flagged past a shift threshold — the "
        "CUSUM-style 'did this metric move' scheduled check. Two "
        "partial-agg groupBys to |types| rows + one equi-join."
    ),
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
    )
    rng = s.groupBy("event_type").agg(
        F.expr("(min(us) + max(us)) DIV 2").alias("mid_us")
    )
    is_before = F.col("us") <= F.col("mid_us")
    n_before = F.sum(is_before.cast("long"))
    n_after = F.sum((~is_before).cast("long"))
    h = (
        s.join(rng, "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.sum(F.when(is_before, F.col("vc")).otherwise(F.lit(0)))
                / (F.lit(100.0) * n_before)
            ).alias("mean_before"),
            F.when(
                n_after > 0,
                F.sum(F.when(~is_before, F.col("vc")).otherwise(F.lit(0)))
                / (F.lit(100.0) * n_after),
            ).alias("mean_after"),
            n_before.cast("bigint").alias("n_before"),
            n_after.cast("bigint").alias("n_after"),
        )
    )
    shift = F.col("mean_after") - F.col("mean_before")
    return h.select(
        "event_type",
        "n_before",
        "n_after",
        "mean_before",
        "mean_after",
        shift.alias("shift"),
        F.when(F.abs(shift) > 1.0, 1).otherwise(0).alias("shifted"),
    ).orderBy("event_type")


# q88: lag-1 autocorrelation from exact-integer moments, accumulated in
# DECIMAL(38,0) (squared cents of extreme values — |v| ~ 1e9 -> ~1e22 —
# overflow a BIGINT), each cast to DOUBLE once; the Pearson formula then
# runs on bit-identical doubles in the same order on both engines, so the
# output needs no rounding contract (same policy as q86's unrounded means).
@register(
    "q88_autocorr",
    """
    WITH s AS (
      SELECT event_type, epoch_us(ts) AS us, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events
    ),
    l AS (
      SELECT event_type, vc,
             lag(vc) OVER (PARTITION BY event_type ORDER BY us, event_id) AS vl
      FROM s
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(vc AS DECIMAL(18,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(vl AS DECIMAL(18,0))) AS DOUBLE) AS sy,
             CAST(sum(CAST(vc AS DECIMAL(18,0)) * CAST(vc AS DECIMAL(18,0))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(vl AS DECIMAL(18,0)) * CAST(vl AS DECIMAL(18,0))) AS DOUBLE) AS syy,
             CAST(sum(CAST(vc AS DECIMAL(18,0)) * CAST(vl AS DECIMAL(18,0))) AS DOUBLE) AS sxy,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM l WHERE vl IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n_pairs,
           CASE WHEN sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy) > 0
                THEN (n * sxy - sx * sy)
                     / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                ELSE NULL END AS autocorr_1
    FROM g ORDER BY event_type
    """,
    doc=(
        "Lag-1 autocorrelation per series: is this metric momentum-y or "
        "white noise — the statistic that calibrates alert debouncing "
        "(an autocorrelated series needs sustained-breach rules; a noisy "
        "one needs wider bands). One window shuffle on the series key + "
        "one partial-agg groupBy to |types| rows of exact-integer "
        "moments; Pearson assembled from identical doubles."
    ),
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
    )
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    lagged = s.withColumn("vl", F.lag("vc").over(w)).where(F.col("vl").isNotNull())
    # moments accumulate in DECIMAL, not BIGINT: squares of extreme values
    # (|v| ~ 1e9 -> cents^2 ~ 1e22) overflow a long, which under ANSI
    # aborts the job. DECIMAL keeps the sums exact (the determinism
    # contract) with 38 digits of headroom on both engines.
    vcd = F.col("vc").cast("decimal(18,0)")
    vld = F.col("vl").cast("decimal(18,0)")
    g = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(vcd).cast("double").alias("sx"),
        F.sum(vld).cast("double").alias("sy"),
        F.sum(vcd * vcd).cast("double").alias("sxx"),
        F.sum(vld * vld).cast("double").alias("syy"),
        F.sum(vcd * vld).cast("double").alias("sxy"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    # zero variance on either side (single pair / constant series) has no
    # defined correlation: NULL, not a divide-by-zero abort
    return (
        g.select("event_type", "n_pairs", F.when(den > 0, num / den).alias("autocorr_1"))
        .orderBy("event_type")
    )


# q89: EWMA smoothing, alpha=0.25 over an 8-tap truncated kernel. The
# weighted sum is generated ONCE as a SQL fragment over lag columns
# l0..l7 (BIGINT cents) and evaluated verbatim by both engines — same
# literals, same left-associative fold order, so the per-row double
# arithmetic is bit-identical and the output ships unrounded.
_EWMA_ALPHA = 0.25
_EWMA_TAPS = 8
_EWMA_WEIGHTS = [_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** j for j in range(_EWMA_TAPS)]
_EWMA_NORM = sum(_EWMA_WEIGHTS)
_EWMA_NUM = " + ".join(
    f"CAST({w!r} AS DOUBLE) * l{j}" for j, w in enumerate(_EWMA_WEIGHTS)
)
_EWMA_EXPR = f"({_EWMA_NUM}) / (CAST(100.0 AS DOUBLE) * CAST({_EWMA_NORM!r} AS DOUBLE))"


@register(
    "q89_ewma",
    f"""
    WITH s AS (
      SELECT event_type, epoch_us(ts) AS us, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events
    ),
    l AS (
      SELECT event_type, event_id, vc,
             {", ".join(f"lag(vc, {j}) OVER (PARTITION BY event_type ORDER BY us, event_id) AS l{j}" for j in range(_EWMA_TAPS))}
      FROM s
    )
    SELECT event_type, event_id,
           CAST(vc AS DOUBLE) / 100.0 AS cur,
           {_EWMA_EXPR} AS ewma
    FROM l
    WHERE l{_EWMA_TAPS - 1} IS NOT NULL AND event_id % 101 = 0
    ORDER BY event_type, event_id
    """,
    doc=(
        "EWMA smoothing (alpha=0.25, 8-tap truncated kernel) per series "
        "— the smoothed line every dashboard draws and the baseline "
        "EWMA-band alerts compare against. One window shuffle on the "
        "series key; the kernel is a fixed-order per-row projection "
        "shared verbatim between engines (truncation error < (1-a)^8 = "
        "10% of mass, renormalized away)."
    ),
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
    )
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    lagged = s.select(
        "event_type",
        "event_id",
        "vc",
        *[F.lag("vc", j).over(w).alias(f"l{j}") for j in range(_EWMA_TAPS)],
    )
    return (
        lagged.where(
            F.col(f"l{_EWMA_TAPS - 1}").isNotNull() & (F.col("event_id") % 101 == 0)
        )
        .select(
            "event_type",
            "event_id",
            (F.col("vc").cast("double") / 100.0).alias("cur"),
            F.expr(_EWMA_EXPR).alias("ewma"),
        )
        .orderBy("event_type", "event_id")
    )


# shared by q90 (the alert surface) and q91 (its episode rollup)
_Q90_SQL = """
    WITH s AS (
      SELECT date_trunc('hour', ts) AS ws,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
      FROM events GROUP BY 1),
    l AS (
      SELECT date_trunc('day', ts)
               + CAST(floor(extract(hour FROM ts) / 6) * 6 AS INT) * INTERVAL 1 HOUR AS wl,
             CAST(count(*) AS BIGINT) AS nl,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS el
      FROM events GROUP BY 1)
    SELECT ws, n_events,
           CAST(n_errors AS DOUBLE) / n_events AS err_ratio_1h,
           CAST(el AS DOUBLE) / nl AS err_ratio_6h,
           CAST(n_errors AS DOUBLE) / n_events / 0.25 AS burn_1h,
           CAST(el AS DOUBLE) / nl / 0.25 AS burn_6h,
           CAST(CASE WHEN CAST(n_errors AS DOUBLE) / n_events / 0.25 > 1
                      AND CAST(el AS DOUBLE) / nl / 0.25 > 1
                     THEN 1 ELSE 0 END AS INT) AS alert
    FROM s JOIN l
      ON l.wl = date_trunc('day', ws)
              + CAST(floor(extract(hour FROM ws) / 6) * 6 AS INT) * INTERVAL 1 HOUR
    ORDER BY ws
    """


@register(
    "q90_burn_rate",
    _Q90_SQL,
    doc=(
        "Multiwindow SLO burn-rate alert (SRE workbook): error-budget "
        "burn over a 1 h and an enclosing 6 h window, firing only when "
        "BOTH exceed 1x budget (budget = 25% error ratio here) — fast "
        "windows catch onset, slow windows stop flapping. Two partial-agg "
        "window groupBys; the 6 h side is time-range-sized (~4/day), so "
        "it broadcasts to the 1 h rows. Ratios are int/int divisions and "
        "an exact /0.25 rescale: bit-identical cross-engine, unrounded."
    ),
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    return burn_rate_frame(table(spark, sf_dir, "events"))


def burn_rate_frame(ev: DataFrame) -> DataFrame:
    """The q90 computation over any events frame — shared with the live
    monitor (streaming/health.py), which re-runs it per landed epoch over
    the touched 6 h blocks so the batch and streaming alert surfaces are
    bit-identical by construction."""
    is_err = (F.col("event_type") == "error").cast("long")
    short = ev.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(is_err).cast("bigint").alias("n_errors"),
    ).select(F.col("w.start").alias("ws"), "n_events", "n_errors")
    long = ev.groupBy(F.window("ts", "6 hours").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nl"),
        F.sum(is_err).cast("bigint").alias("el"),
    ).select(F.col("w.start").alias("wl"), "nl", "el")
    # 6 h windows are epoch-aligned (21600 s multiples), so the 1 h row's
    # enclosing window start is a pure projection of ws
    wl_of_ws = F.timestamp_seconds(
        (F.unix_timestamp("ws") / 21600).cast("bigint") * 21600
    )
    ratio_s = F.col("n_errors").cast("double") / F.col("n_events")
    ratio_l = F.col("el").cast("double") / F.col("nl")
    return (
        short.join(F.broadcast(long), wl_of_ws == F.col("wl"))
        .select(
            "ws",
            "n_events",
            ratio_s.alias("err_ratio_1h"),
            ratio_l.alias("err_ratio_6h"),
            (ratio_s / 0.25).alias("burn_1h"),
            (ratio_l / 0.25).alias("burn_6h"),
            ((ratio_s / 0.25 > 1) & (ratio_l / 0.25 > 1)).cast("int").alias("alert"),
        )
        .orderBy("ws")
    )


@register(
    "q91_alert_episodes",
    f"""
    WITH br AS ({_Q90_SQL}),
    a AS (
      SELECT ws, burn_1h, n_events,
             -- integer division: the grouping key is integral by
             -- construction, not by fixture alignment (float / would be
             -- exact only because ws is hour-truncated)
             CAST(epoch(ws) AS BIGINT) // 3600 AS hi
      FROM br WHERE alert = 1),
    g AS (
      SELECT ws, burn_1h, n_events,
             hi - row_number() OVER (ORDER BY hi) AS grp
      FROM a)
    SELECT min(ws) AS episode_start, max(ws) AS episode_end,
           CAST(count(*) AS BIGINT) AS n_hours,
           max(burn_1h) AS peak_burn_1h,
           CAST(sum(n_events) AS BIGINT) AS n_events
    FROM g GROUP BY grp ORDER BY episode_start
    """,
    doc=(
        "Gaps-and-islands rollup of the burn-rate alert surface: maximal "
        "runs of consecutive alerting hours become incident episodes "
        "(start, end, duration, peak burn, event volume) — what a pager "
        "shows instead of 45 hourly rows. The row_number window runs "
        "over the ALERTING-HOURS table, which is time-range-sized "
        "(<= hours in retention, ~8.8k/year) and corpus-size-independent "
        "— bounded by calendar, whitelisted in plan_audit."
    ),
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    return alert_episodes_frame(q90(spark, sf_dir))


def alert_episodes_frame(br: DataFrame) -> DataFrame:
    """The q91 computation over any burn-rate frame — shared with the
    live monitor (streaming/health.py), which recomputes the episodes
    table from the refreshed burn table per epoch so the batch and
    streaming incident surfaces are bit-identical by construction."""
    from pyspark.sql import Window

    a = br.where(F.col("alert") == 1).select(
        "ws",
        "burn_1h",
        "n_events",
        F.floor(F.unix_timestamp("ws") / 3600).cast("bigint").alias("hi"),
    )
    grp = F.col("hi") - F.row_number().over(Window.orderBy("hi"))
    return (
        a.select("ws", "burn_1h", "n_events", grp.alias("grp"))
        .groupBy("grp")
        .agg(
            F.min("ws").alias("episode_start"),
            F.max("ws").alias("episode_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.max("burn_1h").alias("peak_burn_1h"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
        .drop("grp")
        .orderBy("episode_start")
    )
