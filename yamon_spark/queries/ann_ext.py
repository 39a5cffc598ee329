"""Declared queries for product-quantization ANN (SURVEY §2.7 extension):
pq_codes (corpus compression) and pq_topk (asymmetric-distance search).

The md5-derived codebook is embedded in BOTH the Spark plan and the
generated DuckDB oracle as literals (same trick as the LSH hyperplanes
and minhash coefficients), so code assignment and distances reproduce
bit-for-bit: every squared-difference fold walks the same element order
on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from yamon_spark.operators.similarity import pq_codebook
from yamon_spark.queries import register, table

_M, _K, _SUB = 8, 16, 8
_CB = pq_codebook(_M, _K, _SUB)


def _cb_sql(j: int) -> str:
    return (
        "[" + ", ".join("[" + ", ".join(f"{x:g}" for x in c) + "]" for c in _CB[j]) + "]::DOUBLE[][]"
    )


def _dists_sql(j: int) -> str:
    """Distances from subvector j to all centroids of codebook j."""
    term = f"(c[i] - CAST(embedding[{j * _SUB} + i] AS DOUBLE))"
    return (
        f"list_transform({_cb_sql(j)}, c -> list_reduce(list_transform("
        f"range(1, {_SUB + 1}), i -> {term} * {term}), (a, b) -> a + b))"
    )


_CODES_CTE = (
    "WITH d AS (SELECT vec_id, "
    + ", ".join(f"{_dists_sql(j)} AS d{j}" for j in range(_M))
    + " FROM embeddings), codes AS (SELECT vec_id, "
    + ", ".join(f"CAST(list_position(d{j}, list_min(d{j})) - 1 AS INT) AS c{j}" for j in range(_M))
    + " FROM d)"
)


@register(
    "pq_codes",
    _CODES_CTE + " SELECT * FROM codes ORDER BY vec_id",
    doc=(
        "Product-quantization encoding: m=8 subspaces x 16 centroids -> "
        "8 small ints per vector (the compressed-index scale path)."
    ),
)
def pq_codes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import pq_encode

    return pq_encode(table(spark, sf_dir, "embeddings"), m=_M, k=_K, sub_dim=_SUB)


def _pq_dist_sql() -> str:
    parts = []
    for j in range(_M):
        cent = f"(({_cb_sql(j)})[c{j} + 1])"
        term = f"({cent}[i] - CAST(q.q_emb[{j * _SUB} + i] AS DOUBLE))"
        parts.append(
            f"list_reduce(list_transform(range(1, {_SUB + 1}), i -> {term} * {term}), (a, b) -> a + b)"
        )
    return " + ".join(parts)


@register(
    "pq_topk",
    _CODES_CTE
    + f"""
    , q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, round({_pq_dist_sql()}, 4) AS pq_dist
    FROM codes CROSS JOIN q WHERE vec_id <> 0
    ORDER BY pq_dist, vec_id LIMIT 10
    """,
    doc=(
        "PQ asymmetric-distance top-10: uncompressed query vs coded "
        "corpus — sum of per-subspace distances to the selected centroid."
    ),
)
def pq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import pq_topk

    return pq_topk(table(spark, sf_dir, "embeddings"), query_vec_id=0, topk=10, m=_M, k=_K, sub_dim=_SUB)


_L2_EXPR = (
    "round(list_reduce(list_transform(range(1, len(e.embedding) + 1),"
    " i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(q.q_emb[i] AS DOUBLE))"
    " * (CAST(e.embedding[i] AS DOUBLE) - CAST(q.q_emb[i] AS DOUBLE))), (a, b) -> a + b), 4)"
)


@register(
    "sim_pq_recall",
    _CODES_CTE
    + f"""
    , q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    pqr AS (
      SELECT vec_id FROM codes CROSS JOIN q WHERE vec_id <> 0
      ORDER BY round({_pq_dist_sql()}, 4), vec_id LIMIT 10
    ),
    ex AS (
      SELECT vec_id FROM (
        SELECT e.vec_id, {_L2_EXPR} AS d
        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0) t
      ORDER BY d, vec_id LIMIT 10
    )
    SELECT CAST((SELECT count(*) FROM ex WHERE vec_id IN (SELECT vec_id FROM pqr))
                AS DOUBLE) / 10.0 AS recall_at_10
    """,
    doc=(
        "Compressed-index self-evaluation: recall@10 of the PQ "
        "asymmetric-distance ranking against the exact squared-L2 "
        "ground truth for the same query — the same measure-don't-guess "
        "gate sim_ivf_recall gives the IVF path, so BOTH ANN shapes ship "
        "with their accuracy measured, not assumed."
    ),
)
def pq_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from yamon_spark.operators.similarity import l2_topk, pq_topk

    emb = table(spark, sf_dir, "embeddings")
    pq = pq_topk(emb, query_vec_id=0, topk=10, m=_M, k=_K, sub_dim=_SUB).select("vec_id")
    exact = l2_topk(emb, query_vec_id=0, k=10).select("vec_id")
    return exact.join(pq, "vec_id", "left_semi").agg(
        (F.count(F.lit(1)).cast("double") / 10.0).alias("recall_at_10")
    )


from yamon_spark.queries.pipeline_ops import lsh_bucket_sql as _bucket_sql


@register(
    "sim_near_dup_lsh",
    f"""
    WITH b AS (SELECT vec_id, embedding, {_bucket_sql()} AS bucket FROM embeddings),
    s AS (
      SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
      list_reduce(list_transform(range(1, len(a.embedding) + 1),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b2.embedding[i] AS DOUBLE)), (x, y) -> x + y) AS dot,
      list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y) AS na,
      list_reduce(list_transform(b2.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y) AS nb
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    )
    SELECT vec_a, vec_b, cos_sim FROM (
      SELECT vec_a, vec_b, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim FROM s) t
    WHERE cos_sim >= 0.35 ORDER BY vec_a, vec_b
    """,
    doc=(
        "Embedding near-dup pairs blocked by LSH bucket (no-metadata "
        "blocking): hyperplane buckets bound the pair space, one BLAS "
        "matmul per bucket. CORPUS-SIZE-SAFE BY DEFAULT since r10: the "
        "plane count scales as max(4, ceil(log2(N / 512))), holding "
        "bucket size ~512 at any corpus size — total work O(N x 512), "
        "linear in data (the fixed 4-plane form measured 274x wall at "
        "100x; the scaled form 3.71x). At the driver's verification "
        "sizes the floor keeps planes at 4, so the oracle is exact. "
        "(r9's separate sim_near_dup_lsh_auto entry was retired in r10 "
        "when its recipe became this query's default.)"
    ),
)
def near_dup_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import embedding_near_dup_lsh

    return embedding_near_dup_lsh(table(spark, sf_dir, "embeddings"), threshold=0.35)


# deterministic synthetic PII appended to each doc so the scrub has real
# matches to find (the corpus itself is clean lowercase words)
_PII_SUFFIX_SPARK = (
    "concat(text, ' contact user', CAST(doc_id AS STRING), '@example.com from 10.0.',"
    " CAST(doc_id % 256 AS STRING), '.7 call +1 555 867 53', lpad(CAST(doc_id % 100 AS STRING), 2, '0'),"
    " ' sid 9', lpad(CAST(doc_id AS STRING), 8, '0'))"
)
_PII_SUFFIX_DUCK = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.7 call +1 555 867 53' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')"
    " || ' sid 9' || lpad(CAST(doc_id AS VARCHAR), 8, '0')"
)


def _pii_oracle() -> str:
    from yamon_spark.operators.curation import PII_PATTERNS

    stages = [f"s AS (SELECT doc_id, {_PII_SUFFIX_DUCK} AS t0 FROM documents)"]
    sel = []
    for n, (token, pat) in enumerate(PII_PATTERNS):
        name = token.strip("<>").lower()
        # DuckDB string literals: escape via doubled backslash not needed
        # (no quotes in patterns); count on the pre-scrub text of stage n
        stages.append(
            f"p{n} AS (SELECT doc_id, CAST(len(regexp_split_to_array(t{n}, '{pat}')) - 1 AS BIGINT)"
            f" AS n_{name}, regexp_replace(t{n}, '{pat}', '{token}', 'g') AS t{n + 1}"
            f" FROM {'s' if n == 0 else f'p{n - 1}'})"
        )
        sel.append(f"n_{name}")
    joins = " ".join(f"JOIN p{n} USING (doc_id)" for n in range(1, len(PII_PATTERNS)))
    return (
        "WITH " + ", ".join(stages) + f" SELECT p0.doc_id, t{len(PII_PATTERNS)} AS text_scrubbed, "
        + ", ".join(sel) + f" FROM p0 {joins} ORDER BY p0.doc_id"
    )


@register(
    "text_pii_scrub",
    _pii_oracle(),
    doc="PII redaction with typed placeholders + per-category counts.",
)
def pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from yamon_spark.operators.curation import pii_scrub

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PII_SUFFIX_SPARK).alias("text")
    )
    return pii_scrub(docs)


@register(
    "text_winnow",
    r"""
    WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
    h AS (
      SELECT doc_id, list_transform(range(1, greatest(len(w) - 3, 1) + 1),
               i -> md5(array_to_string(w[i:i+3], ' '))) AS hl
      FROM t
    ),
    m AS (
      SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(hl) - 3, 1) + 1),
               i -> list_min(hl[i:i+3]))) AS fps
      FROM h
    )
    SELECT doc_id, unnest(fps) AS fingerprint FROM m ORDER BY doc_id, fingerprint
    """,
    doc=(
        "Winnowing fingerprint sets (MOSS): per-window min of rolling "
        "4-gram hashes — any shared 7-word run shares a fingerprint."
    ),
)
def winnow_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import winnow_fingerprints

    return winnow_fingerprints(table(spark, sf_dir, "documents"), ngram=4, window=4)


@register(
    "q80_runtime_filter",
    """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc=(
        "Runtime-filter-accelerated semi join: a hash-bucket membership "
        "set (Bloom analogue: false positives possible, false negatives "
        "impossible) built from the selective customer subset pre-filters "
        "the orders scan before the exact semi join, killing most "
        "non-matching rows before any shuffle — the explicit, mergeable "
        "form of the runtime filters AQE injects into shuffle joins. "
        "Result stays exact; the oracle is the plain IN-subquery."
    ),
)
def runtime_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    rich = table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000).select("c_custkey")
    orders = table(spark, sf_dir, "orders")
    buckets = rich.agg(
        F.collect_set(F.xxhash64("c_custkey") % 8192).alias("bkt")
    )
    pre = orders.join(F.broadcast(buckets)).where(
        F.array_contains(F.col("bkt"), F.xxhash64("o_custkey") % 8192)
    )
    exact = pre.join(F.broadcast(rich), pre["o_custkey"] == rich["c_custkey"], "semi")
    return (
        exact.groupBy("o_orderstatus")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .orderBy("o_orderstatus")
    )


@register(
    "corpus_profile",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars // 4 + 1) AS BIGINT) AS total_tokens,
           round(quantile_cont(n_chars // 4 + 1, 0.50), 4) AS p50_tokens,
           round(quantile_cont(n_chars // 4 + 1, 0.90), 4) AS p90_tokens,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc=(
        "One-stop corpus profile per language: volume, token mass, token "
        "percentiles (single array-form sort buffer), source diversity."
    ),
)
def corpus_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    tokens = F.expr("n_chars DIV 4 + 1")
    ps = F.expr("percentile(n_chars DIV 4 + 1, array(0.50D, 0.90D))")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(tokens).cast("bigint").alias("total_tokens"),
            ps.alias("ps"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            F.round(F.element_at("ps", 1), 4).alias("p50_tokens"),
            F.round(F.element_at("ps", 2), 4).alias("p90_tokens"),
            "n_sources",
        )
        .orderBy("lang")
    )


@register(
    "sample_rebalanced",
    """
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars // 4 + 1) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    sh AS (
      SELECT source,
        CAST(tokens AS DOUBLE) / CAST(sum(tokens) OVER () AS DOUBLE) AS natural_share,
        CAST(1.0 AS DOUBLE) / count(*) OVER () AS target_share
      FROM s
    ),
    p AS (
      SELECT source, round(least(CAST(1.0 AS DOUBLE), target_share / natural_share), 4) AS sample_prob
      FROM sh
    ),
    r AS (SELECT doc_id, lang, source, ((doc_id % 2147483647) * 2654435761 + 104729) % 1000 AS h FROM documents)
    SELECT doc_id, lang, source FROM r JOIN p USING (source)
    WHERE h < sample_prob * 1000 ORDER BY doc_id
    """,
    doc=(
        "Composed mixture rebalancing: domain_mix probabilities applied "
        "via the deterministic doc hash (agg -> broadcast join -> filter)."
    ),
)
def rebalanced_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import rebalanced_sample

    return rebalanced_sample(table(spark, sf_dir, "documents"))


@register(
    "q81_asof_tolerance",
    """
    WITH u AS (
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_type = 'purchase' THEN event_id END AS dep_id,
             CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END AS dep_us
      FROM events WHERE event_type IN ('error', 'purchase')
    ), w AS (
      SELECT event_id, ts, user_id, event_type,
             last_value(dep_id IGNORE NULLS) OVER wdef AS a_id,
             last_value(dep_us IGNORE NULLS) OVER wdef AS a_us
      FROM u
      WINDOW wdef AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           CASE WHEN epoch_us(ts) - a_us <= 3600000000 THEN a_id END AS asof_event_id
    FROM w WHERE event_type = 'error' ORDER BY event_id
    """,
    doc=(
        "As-of join with a 1-hour staleness bound: latest prior purchase "
        "per user counts only within tolerance — one union+window pass, "
        "the bound is a projection, never a join."
    ),
)
def asof_tolerance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.asof import asof_join_events_tolerance

    return asof_join_events_tolerance(
        table(spark, sf_dir, "events"), left_type="error", right_type="purchase",
        tolerance_us=3_600_000_000,
    )


@register(
    "domain_mix_temperature",
    """
    WITH s AS (
      SELECT source, CAST(sum(n_chars // 4 + 1) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    sh AS (
      SELECT source, tokens,
        CAST(tokens AS DOUBLE) / CAST(sum(tokens) OVER () AS DOUBLE) AS natural_share
      FROM s
    )
    SELECT source, tokens, round(natural_share, 4) AS natural_share,
           round(pow(natural_share, 0.7)
                 / sum(pow(natural_share, 0.7)) OVER (), 4) AS temp_share
    FROM sh ORDER BY source
    """,
    doc=(
        "Temperature-scaled mixture weights (tau=0.7): w_i = share^tau / "
        "sum(share^tau) — the standard pretraining upsampling knob for "
        "low-resource domains; aggregates to |sources| rows first."
    ),
)
def domain_mix_temp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(F.expr("n_chars DIV 4 + 1")).cast("bigint").alias("tokens")
    )
    wall = Window.partitionBy()
    share = F.col("tokens").cast("double") / F.sum("tokens").over(wall)
    shared = per_src.select("source", "tokens", share.alias("natural_share"))
    powed = F.pow("natural_share", 0.7)
    return shared.select(
        "source",
        "tokens",
        F.round("natural_share", 4).alias("natural_share"),
        F.round(powed / F.sum(powed).over(wall), 4).alias("temp_share"),
    ).orderBy("source")


@register(
    "sim_ivfpq_topk",
    _CODES_CTE
    + f"""
    , q AS (SELECT embedding AS q_emb, label AS q_label FROM embeddings WHERE vec_id = 0)
    SELECT c.vec_id, round({_pq_dist_sql()}, 4) AS pq_dist
    FROM codes c JOIN embeddings e ON c.vec_id = e.vec_id CROSS JOIN q
    WHERE c.vec_id <> 0 AND e.label = q.q_label
    ORDER BY pq_dist, c.vec_id LIMIT 10
    """,
    doc=(
        "IVF+PQ composed index (the billion-scale ANN layout): coarse "
        "cell probe prunes the corpus to the query's cell, PQ "
        "asymmetric distance ranks inside it — at scale the cell is the "
        "partition key (partition-pruned read) and the scan touches m "
        "code bytes per vector; the two compressions multiply."
    ),
)
def ivfpq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import ivfpq_topk

    return ivfpq_topk(table(spark, sf_dir, "embeddings"), query_vec_id=0, topk=10, m=_M, k=_K, sub_dim=_SUB)


@register(
    "sim_ivfpq_recall",
    _CODES_CTE
    + f"""
    , q AS (SELECT embedding AS q_emb, label AS q_label FROM embeddings WHERE vec_id = 0),
    ipq AS (
      SELECT c.vec_id FROM codes c JOIN embeddings e ON c.vec_id = e.vec_id CROSS JOIN q
      WHERE c.vec_id <> 0 AND e.label = q.q_label
      ORDER BY round({_pq_dist_sql()}, 4), c.vec_id LIMIT 10
    ),
    ex AS (
      SELECT vec_id FROM (
        SELECT e.vec_id, {_L2_EXPR} AS d
        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0) t
      ORDER BY d, vec_id LIMIT 10
    )
    SELECT CAST((SELECT count(*) FROM ex WHERE vec_id IN (SELECT vec_id FROM ipq))
                AS DOUBLE) / 10.0 AS recall_at_10
    """,
    doc=(
        "recall@10 of IVF+PQ vs exact squared-L2 over the WHOLE corpus "
        "— charges cell-miss and quantization error together, the "
        "honest gate for the composed index (completes the measured "
        "shelf: brute/IVF/LSH/PQ/SQ8/Hamming/cascade/IVF+PQ)."
    ),
)
def ivfpq_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import ivfpq_recall

    return ivfpq_recall(table(spark, sf_dir, "embeddings"), query_vec_id=0, k_at=10, m=_M, k=_K, sub_dim=_SUB)


@register(
    "sim_ivf_pareto",
    """
    WITH e AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    cent AS (
      SELECT label, list(c ORDER BY dim) AS carr FROM (
        SELECT label, d AS dim, round(avg(e[d]), 4) AS c
        FROM e, range(1, 65) t(d) GROUP BY label, d
      ) GROUP BY label
    ),
    q AS (
      SELECT vec_id AS q_id, e AS q_emb FROM e
      WHERE vec_id % 97 = 0 ORDER BY vec_id LIMIT 16
    ),
    lr AS (
      SELECT q_id, label,
             row_number() OVER (PARTITION BY q_id ORDER BY d, label) AS lrank
      FROM (
        SELECT q.q_id, c.label,
          round(list_reduce(list_transform(range(1, 65),
            i -> (q.q_emb[i] - c.carr[i]) * (q.q_emb[i] - c.carr[i])),
            (a, b) -> a + b), 4) AS d
        FROM q, cent c
      )
    ),
    s AS (
      SELECT q.q_id, x.vec_id, x.label,
        round(
          list_reduce(list_transform(range(1, 65), i -> x.e[i] * q.q_emb[i]), (a, b) -> a + b)
          / (sqrt(list_reduce(list_transform(x.e, v -> v * v), (a, b) -> a + b))
             * sqrt(list_reduce(list_transform(q.q_emb, v -> v * v), (a, b) -> a + b))),
          4) AS cs
      FROM e x CROSS JOIN q WHERE x.vec_id <> q.q_id
    ),
    truth AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rk
        FROM s
      ) WHERE rk <= 10
    ),
    p(n_probe) AS (VALUES (1), (2), (4)),
    cand AS (
      SELECT s.q_id, s.vec_id, s.cs, p.n_probe
      FROM s JOIN lr ON s.q_id = lr.q_id AND s.label = lr.label
             JOIN p ON lr.lrank <= p.n_probe
    ),
    topk AS (
      SELECT q_id, n_probe, vec_id FROM (
        SELECT q_id, n_probe, vec_id,
               row_number() OVER (PARTITION BY q_id, n_probe ORDER BY cs DESC, vec_id) AS rk
        FROM cand
      ) WHERE rk <= 10
    ),
    rec AS (
      SELECT t.q_id, t.n_probe,
             CAST(count(tr.vec_id) AS DOUBLE) / 10.0 AS r
      FROM topk t LEFT JOIN truth tr ON t.q_id = tr.q_id AND t.vec_id = tr.vec_id
      GROUP BY t.q_id, t.n_probe
    ),
    sc AS (SELECT q_id, n_probe, count(*) AS n_sc FROM cand GROUP BY q_id, n_probe),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
    uni AS (SELECT q.q_id, p.n_probe FROM q, p)
    SELECT CAST(u.n_probe AS INT) AS n_probe,
           round(avg(coalesce(sc.n_sc, 0) / (tot.n - 1.0)), 4) AS scan_frac,
           round(avg(coalesce(rec.r, 0.0)), 4) AS recall
    FROM uni u
    LEFT JOIN rec ON u.q_id = rec.q_id AND u.n_probe = rec.n_probe
    LEFT JOIN sc ON u.q_id = sc.q_id AND u.n_probe = sc.n_probe
    CROSS JOIN tot
    GROUP BY u.n_probe ORDER BY n_probe
    """,
    doc=(
        "IVF tuning report — the recall-vs-cost pareto curve that "
        "completes the index lifecycle (build -> append -> recall gate "
        "-> rebuild -> TUNE): per probe budget (1/2/4 cells), mean "
        "recall@10 against brute-force truth AND the mean corpus "
        "fraction scanned. Hard-capped query batch broadcasts once; "
        "truth and candidates share ONE scored scan; budgets explode "
        "over the bounded candidate frame; empty probe cells report 0 "
        "via the (query x budget) universe."
    ),
)
def ivf_pareto_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import ivf_pareto

    return ivf_pareto(table(spark, sf_dir, "embeddings"), query_mod=97, k=10, probes=(1, 2, 4), max_queries=16)
