"""Training-data batch three: binary-sign Hamming ANN (+ its recall
gate), contrastive hard-negative mining, sliding-window chunking,
asymmetric containment dedup, and the iterative BPE merge step.

These extend the 'beyond the reference' pipeline inventory (SURVEY §2.7
/ the LLM-data-pipeline suite); the reference's query surface is
ClickHouse-delegated (res/schema.sql) and has no vector or corpus
operators, so parity citations are to the sibling operators here.

Determinism: the Hamming family is INTEGER-exact end-to-end (the one
index in the suite needing no rounding contract); cosine scores round
to 4dp before ranking (FIXTURES.md contract); chunk hashes are md5
prefixes, identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from yamon_spark.queries import register, table
from yamon_spark.queries.pipeline_ops import _COS_EXPRS, _WORDS, _shingle_cte

_WORDS_LC = r"regexp_split_to_array(trim(lower(text)), '\s+')"

# sign-bit packing: dims 1-32 -> lo word, 33-64 -> hi word; embeds the
# same bit layout as operators.similarity._sign_word
_BITS_CTE = """
    bits AS (
      SELECT vec_id,
        list_reduce(list_transform(range(1, 33),
          i -> CASE WHEN embedding[i] > 0 THEN (1::BIGINT << (i - 1))
                    ELSE 0::BIGINT END), (a, b) -> a | b) AS lo,
        list_reduce(list_transform(range(33, 65),
          i -> CASE WHEN embedding[i] > 0 THEN (1::BIGINT << (i - 33))
                    ELSE 0::BIGINT END), (a, b) -> a | b) AS hi
      FROM embeddings
    )
"""

_HAMMING = "CAST(bit_count(xor(b.lo, q.q_lo)) + bit_count(xor(b.hi, q.q_hi)) AS INTEGER)"


@register(
    "sim_hamming_topk",
    f"""
    WITH {_BITS_CTE},
    q AS (SELECT lo AS q_lo, hi AS q_hi FROM bits WHERE vec_id = 0)
    SELECT vec_id, {_HAMMING} AS hamming
    FROM bits b CROSS JOIN q WHERE vec_id <> 0
    ORDER BY hamming, vec_id LIMIT 10
    """,
    doc=(
        "1-bit-per-dimension sign sketch top-10 by Hamming distance: two "
        "BIGINT words per vector (32x smaller than float32), popcount-of-"
        "XOR scoring, TakeOrderedAndProject — the candidate-generation "
        "tier of a cascade retrieval, and the only index whose ranking "
        "is integer-exact (no rounding contract needed)."
    ),
)
def hamming_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import hamming_topk

    return hamming_topk(table(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


@register(
    "sim_hamming_recall",
    f"""
    WITH {_BITS_CTE},
    q AS (SELECT lo AS q_lo, hi AS q_hi FROM bits WHERE vec_id = 0),
    hr AS (
      SELECT vec_id FROM bits b CROSS JOIN q WHERE vec_id <> 0
      ORDER BY {_HAMMING}, vec_id LIMIT 10
    ),
    qe AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    sx AS (
      SELECT e.vec_id, {_COS_EXPRS}
      FROM embeddings e CROSS JOIN qe q WHERE e.vec_id <> 0
    ),
    ex AS (
      SELECT vec_id FROM (
        SELECT vec_id, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim FROM sx) t
      ORDER BY cos_sim DESC, vec_id LIMIT 10
    )
    SELECT CAST((SELECT count(*) FROM ex WHERE vec_id IN (SELECT vec_id FROM hr))
                AS DOUBLE) / 10.0 AS recall_at_10
    """,
    doc=(
        "recall@10 of the 1-bit Hamming sketch vs exact cosine brute "
        "force — the measure-don't-guess gate every compressed index in "
        "the suite ships with (sibling of sim_ivf/pq/sq8_recall), "
        "quantifying what 32x compression costs this corpus."
    ),
)
def hamming_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import hamming_recall

    return hamming_recall(table(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


@register(
    "hard_negative_mining",
    f"""
    WITH q AS (
      SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb
      FROM embeddings WHERE vec_id % 97 = 0 ORDER BY vec_id LIMIT 256
    ), s AS (
      SELECT q.q_id, e.vec_id, {_COS_EXPRS}
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id % 97 <> 0 AND e.label <> q.q_label
    ), r AS (
      SELECT q_id, vec_id, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim FROM s
    ), rk AS (
      SELECT q_id, vec_id, cos_sim,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id)
                  AS BIGINT) AS rank
      FROM r
    )
    SELECT q_id, vec_id, cos_sim, rank FROM rk WHERE rank <= 3 ORDER BY q_id, rank
    """,
    doc=(
        "Contrastive hard-negative mining: for every sampled query, the "
        "3 most-similar vectors with a DIFFERENT label — the batch "
        "retrieval pass that builds triplet/InfoNCE training batches. "
        "knn_join's broadcast+map-side-score plan with a label gate."
    ),
)
def hard_negative_mining_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import hard_negative_mining

    return hard_negative_mining(table(spark, sf_dir, "embeddings"), query_mod=97, k=3)


@register(
    "text_chunk_windows",
    f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    s AS (
      SELECT doc_id, w,
             unnest(range(1, greatest(len(w), 1) + 1, 48)) AS start
      FROM t
    )
    SELECT doc_id,
           CAST((start - 1) // 48 AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(w, start, start + 63)) AS BIGINT) AS n_tok,
           substr(md5(array_to_string(list_slice(w, start, start + 63), ' ')), 1, 8)
             AS chunk_hash
    FROM s ORDER BY doc_id, chunk_idx
    """,
    doc=(
        "Sliding token-window chunking (size 64, stride 48): documents "
        "-> fixed-size training windows with 16 tokens of overlap, each "
        "with a stable md5-prefix content id for window-level dedup. "
        "Split once, one Generate, zero shuffles."
    ),
)
def chunk_windows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import chunk_windows

    return chunk_windows(table(spark, sf_dir, "documents"), size=64, stride=48)


@register(
    "dedup_containment",
    "WITH "
    + _shingle_cte(3)
    + """
    , sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
    , inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, containment FROM (
      SELECT doc_a, doc_b,
             round(CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh), 4) AS containment
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b) t
    WHERE containment >= 0.7 ORDER BY doc_a, doc_b
    """,
    doc=(
        "Asymmetric near-dup: 3-gram containment |A∩B| / min(|A|,|B|) — "
        "catches a short doc wholly embedded in a long one, which the "
        "union term hides from Jaccard. Shares dedup_jaccard's single-"
        "shuffle posting-list plan; only the score expression differs."
    ),
)
def containment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(table(spark, sf_dir, "documents"), ngram=3, threshold=0.7)


@register(
    "bpe_merge_step",
    f"""
    WITH w AS (SELECT unnest({_WORDS_LC}) AS w FROM documents),
    wc AS (SELECT w, count(*) AS cnt FROM w GROUP BY w),
    p AS (
      SELECT unnest(list_transform(range(1, length(w)),
               i -> substr(w, CAST(i AS INTEGER), 2))) AS pair, cnt
      FROM wc WHERE length(w) >= 2
    ),
    top AS (
      SELECT pair FROM (SELECT pair, sum(cnt) AS n FROM p GROUP BY pair) t
      ORDER BY n DESC, pair LIMIT 1
    ),
    m AS (SELECT replace(w, (SELECT pair FROM top), 'Ƶ') AS w, cnt FROM wc),
    p2 AS (
      SELECT unnest(list_transform(range(1, length(w)),
               i -> substr(w, CAST(i AS INTEGER), 2))) AS pair, cnt
      FROM m WHERE length(w) >= 2
    )
    SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
    FROM p2 GROUP BY pair ORDER BY n DESC, pair LIMIT 20
    """,
    doc=(
        "One BPE training iteration past the pair statistic: apply the "
        "corpus-weighted top-1 merge (left-to-right non-overlapping "
        "replace; merged pair becomes the reserved marker symbol Ƶ) to "
        "the distinct-word frequency table and re-rank adjacent pairs — "
        "the candidate list the NEXT merge chooses from. 1-row merge "
        "broadcast; both passes run over vocab rows, not the corpus."
    ),
)
def bpe_merge_step_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import bpe_merge_step

    return bpe_merge_step(table(spark, sf_dir, "documents"), top_n=20)


@register(
    "sim_cascade_topk",
    f"""
    WITH {_BITS_CTE},
    q AS (SELECT lo AS q_lo, hi AS q_hi FROM bits WHERE vec_id = 0),
    short AS (
      SELECT vec_id FROM bits b CROSS JOIN q WHERE vec_id <> 0
      ORDER BY {_HAMMING}, vec_id LIMIT 100
    ),
    qe AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    sx AS (
      SELECT e.vec_id, {_COS_EXPRS}
      FROM embeddings e JOIN short USING (vec_id) CROSS JOIN qe q
    )
    SELECT vec_id, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim
    FROM sx ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    doc=(
        "Two-tier cascade retrieval: Hamming sign-sketch shortlist "
        "(top-100, integer popcount scan — the only full corpus pass), "
        "exact cosine rerank of the 100 survivors via broadcast "
        "semi-join. The production ANN shape: float vectors are touched "
        "for 100 rows, never scanned."
    ),
)
def cascade_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import cascade_topk

    return cascade_topk(table(spark, sf_dir, "embeddings"), query_vec_id=0, k=10, shortlist=100)


@register(
    "sim_cascade_recall",
    f"""
    WITH {_BITS_CTE},
    q AS (SELECT lo AS q_lo, hi AS q_hi FROM bits WHERE vec_id = 0),
    short AS (
      SELECT vec_id FROM bits b CROSS JOIN q WHERE vec_id <> 0
      ORDER BY {_HAMMING}, vec_id LIMIT 100
    ),
    qe AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    sx AS (
      SELECT e.vec_id, {_COS_EXPRS}
      FROM embeddings e CROSS JOIN qe q WHERE e.vec_id <> 0
    ),
    scored AS (
      SELECT vec_id, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim FROM sx
    ),
    casc AS (
      SELECT s.vec_id FROM scored s JOIN short USING (vec_id)
      ORDER BY cos_sim DESC, vec_id LIMIT 10
    ),
    ex AS (SELECT vec_id FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10)
    SELECT CAST((SELECT count(*) FROM ex WHERE vec_id IN (SELECT vec_id FROM casc))
                AS DOUBLE) / 10.0 AS recall_at_10
    """,
    doc=(
        "recall@10 of the cascade (Hamming shortlist-100 + exact rerank) "
        "vs brute force — >= the raw sketch's recall by construction; "
        "the gate that justifies the two-tier index over the sketch "
        "alone, and the number that tunes the shortlist width."
    ),
)
def cascade_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import cascade_recall

    return cascade_recall(table(spark, sf_dir, "embeddings"), query_vec_id=0, k=10, shortlist=100)


@register(
    "chunk_dup_groups",
    f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    s AS (
      SELECT doc_id, w,
             unnest(range(1, greatest(len(w), 1) + 1, 48)) AS start
      FROM t
    ),
    ch AS (
      SELECT doc_id,
             substr(md5(array_to_string(list_slice(w, start, start + 63), ' ')), 1, 8)
               AS chunk_hash
      FROM s
    )
    SELECT chunk_hash,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc
    FROM ch GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2
    ORDER BY chunk_hash
    """,
    doc=(
        "Cross-document shared training windows: 64-token chunk hashes "
        "appearing in >= 2 distinct docs — substring duplication at the "
        "granularity that matters for train-set leakage (a memorized "
        "span, not a whole-doc match). One uniform-key groupBy shuffle."
    ),
)
def chunk_dup_groups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import chunk_dup_groups

    return chunk_dup_groups(table(spark, sf_dir, "documents"), size=64, stride=48)


@register(
    "vocab_growth",
    f"""
    WITH mx AS (SELECT max(doc_id) AS max_id FROM documents),
    w AS (SELECT doc_id, unnest({_WORDS}) AS word FROM documents),
    minw AS (SELECT word, min(doc_id) AS first_doc FROM w GROUP BY word),
    fr AS (SELECT unnest([0.1, 0.25, 0.5, 1.0]) AS frac),
    cut AS (
      SELECT frac, CAST(floor(frac * max_id) AS BIGINT) AS cutoff
      FROM fr CROSS JOIN mx
    ),
    v AS (
      SELECT frac, max(cutoff) AS cutoff,
             CAST(sum(CASE WHEN first_doc <= cutoff THEN 1 ELSE 0 END) AS BIGINT)
               AS vocab_size
      FROM minw CROSS JOIN cut GROUP BY frac
    ),
    t AS (SELECT doc_id, CAST(len({_WORDS}) AS BIGINT) AS n FROM documents),
    tk AS (
      SELECT frac,
             CAST(sum(CASE WHEN doc_id <= cutoff THEN n ELSE 0 END) AS BIGINT)
               AS n_tokens
      FROM t CROSS JOIN cut GROUP BY frac
    )
    SELECT v.frac, v.cutoff, v.vocab_size, tk.n_tokens
    FROM v JOIN tk USING (frac) ORDER BY frac
    """,
    doc=(
        "Heaps'-law vocabulary growth: distinct words + tokens over "
        "nested corpus prefixes (10/25/50/100% by doc_id) — sizes the "
        "tokenizer vocab and predicts marginal value of more data. One "
        "corpus scan builds word->first_doc; every curve point is a flag "
        "over vocab rows. Integer-exact."
    ),
)
def vocab_growth_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import vocab_growth

    return vocab_growth(table(spark, sf_dir, "documents"))


@register(
    "mix_budget_plan",
    """
    WITH s AS (
      SELECT source, CAST(sum(n_chars // 4 + 1) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    sh AS (
      SELECT source, tokens,
        CAST(tokens AS DOUBLE) / CAST(sum(tokens) OVER () AS DOUBLE) AS natural_share
      FROM s
    ),
    t AS (
      SELECT source, tokens,
             pow(natural_share, 0.7) / sum(pow(natural_share, 0.7)) OVER () AS temp_share
      FROM sh
    )
    SELECT source, tokens, round(temp_share, 4) AS temp_share,
           round(least(1.0, 100000 * temp_share / tokens), 4) AS sample_prob,
           round(least(1.0, 100000 * temp_share / tokens) * tokens, 4) AS expected_tokens
    FROM t ORDER BY source
    """,
    doc=(
        "Token-budget mixture plan: given a 100k-token budget and "
        "temperature-0.7 target shares, the per-source sampling "
        "probability (capped at 1 — a source cannot yield more than it "
        "has) and the tokens each source actually contributes. The "
        "planning query a training run executes BEFORE sampling; "
        "composes domain_mix_temperature with the absolute budget. "
        "Aggregates to |sources| rows first — window over dozens of "
        "rows, never the corpus."
    ),
)
def mix_budget_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from yamon_spark.operators.curation import est_tokens

    budget = 100_000
    tau = 0.7
    docs = table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(F.sum(est_tokens()).cast("bigint").alias("tokens"))
    wall = Window.partitionBy()
    share = F.col("tokens").cast("double") / F.sum("tokens").over(wall)
    shared = per_src.select("source", "tokens", share.alias("natural_share"))
    temp_share = F.pow("natural_share", tau) / F.sum(F.pow("natural_share", tau)).over(wall)
    t = shared.select("source", "tokens", temp_share.alias("temp_share"))
    prob = F.least(F.lit(1.0), F.lit(budget) * F.col("temp_share") / F.col("tokens"))
    return t.select(
        "source",
        "tokens",
        F.round("temp_share", 4).alias("temp_share"),
        F.round(prob, 4).alias("sample_prob"),
        F.round(prob * F.col("tokens"), 4).alias("expected_tokens"),
    ).orderBy("source")


def _bpe_apply_sql(n_merges: int = 6) -> str:
    """Chained-CTE DuckDB twin of operators.text.bpe_apply: v{i} is the
    vocabulary after i merges; each round recounts pairs, takes the
    top-1 (count desc, pair asc), and replaces it with that rank's
    reserved marker — the same unrolled iterative chain the Spark plan
    compiles."""
    from yamon_spark.operators.text import BPE_APPLY_MARKERS

    ctes = [
        f"w AS (SELECT doc_id, unnest({_WORDS_LC}) AS w FROM documents)",
        "v0 AS (SELECT w AS orig, w, count(*) AS cnt FROM w GROUP BY w)",
    ]
    for i in range(n_merges):
        ctes.append(
            f"""p{i} AS (
      SELECT unnest(list_transform(range(1, length(w)),
               k -> substr(w, CAST(k AS INTEGER), 2))) AS pair, cnt
      FROM v{i} WHERE length(w) >= 2)"""
        )
        ctes.append(
            f"""t{i} AS (
      SELECT pair FROM (SELECT pair, sum(cnt) AS n FROM p{i} GROUP BY pair) x
      ORDER BY n DESC, pair LIMIT 1)"""
        )
        # coalesce to chr(0) (outside the corpus alphabet, like the
        # markers) so an empty t{i} makes the round a no-op instead of
        # NULLing every word — mirrors the Spark side's left-join guard
        ctes.append(
            f"v{i + 1} AS (SELECT orig, replace(w, coalesce((SELECT pair FROM t{i}), chr(0)), "
            f"'{BPE_APPLY_MARKERS[i]}') AS w, cnt FROM v{i})"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    m AS (SELECT orig, CAST(length(w) AS BIGINT) AS n_tok FROM v{n_merges})
    SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(w.w)) AS BIGINT) AS n_units_char,
           CAST(sum(m.n_tok) AS BIGINT) AS n_units_bpe
    FROM w JOIN m ON w.w = m.orig
    GROUP BY w.doc_id ORDER BY w.doc_id"""
    )


@register(
    "bpe_apply",
    _bpe_apply_sql(6),
    doc=(
        "Tokenize with a LEARNED merge table: 6 true BPE training "
        "iterations (pairs recounted over the merged vocab each round, "
        "top-1 applied as that rank's marker symbol), then every doc "
        "encoded against the final merge map — per-doc unit counts "
        "before/after, the compression the merges buy. Every round is "
        "vocab-sized with a 1-row merge broadcast; the encode is one "
        "hash join of exploded words against the |vocab| merge map."
    ),
)
def bpe_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import bpe_apply

    return bpe_apply(table(spark, sf_dir, "documents"), n_merges=6)


@register(
    "tokenizer_fertility",
    f"""
    SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(b.n_words) AS BIGINT) AS n_words,
           round(CAST(sum(b.n_units_bpe) AS DOUBLE) / sum(b.n_words), 4) AS fertility,
           round(CAST(sum(b.n_units_char) AS DOUBLE) / sum(b.n_units_bpe), 4) AS compression
    FROM ({_bpe_apply_sql(6)}) b JOIN documents d ON b.doc_id = d.doc_id
    GROUP BY d.lang ORDER BY d.lang
    """,
    doc=(
        "Per-language tokenizer fertility under the LEARNED BPE merge "
        "table: units-per-word (fertility — the number multilingual "
        "vocab-size decisions hinge on: a language the tokenizer serves "
        "badly pays more sequence length per word) and char-to-BPE "
        "compression, aggregated per lang over bpe_apply's per-doc "
        "counts. One unique-key shuffle-hash join of the per-doc frame "
        "to the lang column, then a |langs|-row aggregate."
    ),
)
def tokenizer_fertility_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from yamon_spark.operators.text import bpe_apply

    docs = table(spark, sf_dir, "documents")
    per_doc = bpe_apply(docs, n_merges=6)
    return (
        per_doc.hint("shuffle_hash")
        .join(docs.select("doc_id", "lang").hint("shuffle_hash"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.round(F.sum("n_units_bpe").cast("double") / F.sum("n_words"), 4).alias(
                "fertility"
            ),
            F.round(F.sum("n_units_char").cast("double") / F.sum("n_units_bpe"), 4).alias(
                "compression"
            ),
        )
        .orderBy("lang")
    )


@register(
    "mix_repeat_plan",
    """
    WITH s AS (
      SELECT source, CAST(sum(n_chars // 4 + 1) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    sh AS (
      SELECT source, tokens,
        CAST(tokens AS DOUBLE) / CAST(sum(tokens) OVER () AS DOUBLE) AS natural_share
      FROM s
    ),
    t AS (
      SELECT source, tokens,
             pow(natural_share, 0.7) / sum(pow(natural_share, 0.7)) OVER () AS temp_share
      FROM sh
    ),
    r AS (
      SELECT source, tokens, temp_share,
             150000 * temp_share / tokens AS raw,
             least(150000 * temp_share / tokens, 4.0) AS capped
      FROM t
    )
    SELECT source, tokens, round(temp_share, 4) AS temp_share,
           round(capped, 4) AS repeat_factor,
           CAST(ceil(capped) AS INT) AS n_epochs,
           round(capped * tokens, 4) AS achieved_tokens,
           round((raw - capped) * tokens, 4) AS deficit_tokens
    FROM r ORDER BY source
    """,
    doc=(
        "Epoch-repeat plan under a SCARCE budget — the upsampling "
        "complement of mix_budget_plan (whose sample_prob caps at 1 "
        "because a source cannot yield more than it has in one pass): "
        "when the temperature-0.7 target share exceeds a source's "
        "tokens, the run must REPEAT the source across epochs. Per "
        "source: the repeat factor capped at 4 (the data-constrained "
        "scaling rule of thumb — repeating past ~4 epochs adds little), "
        "epochs to schedule, tokens actually achieved, and the deficit "
        "the cap leaves unmet (the signal to go buy/crawl more of that "
        "source). Aggregates to |sources| rows first — windows over "
        "dozens of rows, never the corpus."
    ),
)
def mix_repeat_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from yamon_spark.operators.curation import est_tokens

    budget, tau, max_repeat = 150_000, 0.7, 4.0
    docs = table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(F.sum(est_tokens()).cast("bigint").alias("tokens"))
    wall = Window.partitionBy()
    share = F.col("tokens").cast("double") / F.sum("tokens").over(wall)
    shared = per_src.select("source", "tokens", share.alias("natural_share"))
    temp_share = F.pow("natural_share", tau) / F.sum(F.pow("natural_share", tau)).over(wall)
    t = shared.select("source", "tokens", temp_share.alias("temp_share"))
    raw = F.lit(float(budget)) * F.col("temp_share") / F.col("tokens")
    capped = F.least(raw, F.lit(max_repeat))
    return t.select(
        "source",
        "tokens",
        F.round("temp_share", 4).alias("temp_share"),
        F.round(capped, 4).alias("repeat_factor"),
        F.ceil(capped).cast("int").alias("n_epochs"),
        F.round(capped * F.col("tokens"), 4).alias("achieved_tokens"),
        F.round((raw - capped) * F.col("tokens"), 4).alias("deficit_tokens"),
    ).orderBy("source")
