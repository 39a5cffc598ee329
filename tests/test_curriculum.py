"""curriculum_plan: stage assignment via broadcast quantile boundaries.

The oracle gate (driver_sim) pins engine parity; these pin the
semantics the SQL can't express as clearly: equal-mass staging on
distinct scores, degenerate collapse on a constant-score corpus, and
monotone stage boundaries (a later stage never contains an easier doc
than an earlier one).
"""

from pyspark.sql import functions as F

from yamon_spark.operators.curation import curriculum_plan


def _docs(spark, texts):
    rows = [(i, t, len(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint")


def test_equal_mass_stages_on_distinct_scores(spark):
    # 16 docs with strictly increasing word counts -> strictly increasing
    # scores -> exact quartiles put 4 docs in each stage
    texts = [" ".join(f"w{j}" for j in range(4 + i * 3)) for i in range(16)]
    out = curriculum_plan(_docs(spark, texts), n_stages=4).collect()
    assert [r["stage"] for r in out] == [1, 2, 3, 4]
    assert [r["n_docs"] for r in out] == [4, 4, 4, 4]
    shares = [r["token_share"] for r in out]
    assert abs(sum(shares) - 1.0) < 1e-6
    # curriculum is monotone: later stages hold harder (higher-score) docs
    for earlier, later in zip(out, out[1:]):
        assert earlier["max_score"] <= later["min_score"]
    # later stages carry more tokens (longer docs by construction)
    toks = [r["tokens"] for r in out]
    assert toks == sorted(toks)


def test_constant_score_corpus_collapses_to_one_stage(spark):
    out = curriculum_plan(_docs(spark, ["alpha beta gamma"] * 8), n_stages=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["stage"] == 1 and r["n_docs"] == 8 and r["token_share"] == 1.0
    assert r["min_score"] == r["max_score"]


def test_no_global_sort_or_python_in_plan(spark, sf_dir):
    from yamon_spark.queries import table

    plan = (
        curriculum_plan(table(spark, sf_dir, "documents"), n_stages=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # stage assignment must come from the broadcast boundary row, not a
    # corpus-wide ordering or an ntile window
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mix_shares_sum_to_one_per_stage(spark):
    from yamon_spark.operators.curation import curriculum_mix

    texts = [" ".join(f"w{j}" for j in range(4 + i * 3)) for i in range(16)]
    rows = [(i, t, len(t), ["web", "book"][i % 2]) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint, source string")
    out = curriculum_mix(docs, n_stages=4).collect()
    from collections import defaultdict

    per_stage = defaultdict(float)
    for r in out:
        per_stage[r["stage"]] += r["stage_share"]
    assert set(per_stage) == {1, 2, 3, 4}
    for stage, s in per_stage.items():
        assert abs(s - 1.0) < 1e-3, (stage, s)
