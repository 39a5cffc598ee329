"""Property-based invariants for the batched BLAS top-k kernel
(hypothesis) — the r10 rewrite that carries knn_join /
hard_negative_mining / sim_ivf_recall_batch / ivf_recall's exact side:

- Ranking ground truth: for arbitrary float corpora, the kernel's
  per-query (vec_id, rank) set equals a plain-Python brute force using
  the same 4dp-rounded cosine and (sim desc, vec_id asc) tie rule —
  localizes composite-key bugs (sign, bit-width, sentinel) that an
  oracle diff only reports as a hash mismatch.
- Partitioning invariance: the result is identical at 1 partition and
  at 7 partitions — per-partition running top-k must be a monotone
  merge (the survivor union containing the true top-k regardless of
  how rows are split).
- Label gates: "exclude" never returns a candidate sharing the query's
  label; "only" never returns one that doesn't.

Few, large examples: each case builds one DataFrame and runs the kernel
three ways, keeping Spark job counts low.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_component = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False, width=32
)
_vec8 = st.lists(_component, min_size=8, max_size=8)

EMB_SCHEMA = "vec_id bigint, label int, embedding array<float>"


def _brute(rows, query_mod, k, label_mode=None):
    qs = sorted((r for r in rows if r[0] % query_mod == 0), key=lambda r: r[0])[:256]
    cands = [r for r in rows if r[0] % query_mod != 0]
    out = set()
    for q_id, q_label, q_emb in qs:
        qn = math.sqrt(sum(x * x for x in q_emb)) or 1.0
        scored = []
        for vec_id, label, emb in cands:
            if label_mode == "exclude" and label == q_label:
                continue
            if label_mode == "only" and label != q_label:
                continue
            n = math.sqrt(sum(x * x for x in emb)) or 1.0
            cs = round(sum(a * b for a, b in zip(q_emb, emb)) / (qn * n), 4)
            scored.append((-cs, vec_id))
        scored.sort()
        for rank, (_, vec_id) in enumerate(scored[:k], start=1):
            out.add((q_id, vec_id, rank))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    vecs=st.lists(_vec8, min_size=6, max_size=24),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_kernel_matches_brute_force_and_is_partitioning_invariant(spark, vecs, seed):
    from yamon_spark.operators.similarity import _batched_blas_topk

    rows = [(i, (i * 7 + seed) % 3, v) for i, v in enumerate(vecs)]
    for n_parts in (1, 7):
        emb = spark.createDataFrame(rows, EMB_SCHEMA).repartition(n_parts)
        for mode in (None, "exclude", "only"):
            got = {
                (r.q_id, r.vec_id, r.rank)
                for r in _batched_blas_topk(emb, 3, 2, 256, label_mode=mode).collect()
            }
            want = _brute(rows, 3, 2, label_mode=mode)
            assert got == want, (n_parts, mode)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(vecs=st.lists(_vec8, min_size=8, max_size=20))
def test_label_gates_never_leak(spark, vecs):
    from yamon_spark.operators.similarity import _batched_blas_topk

    rows = [(i, i % 2, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, EMB_SCHEMA)
    labels = {i: i % 2 for i, _ in enumerate(vecs)}
    excl = _batched_blas_topk(emb, 4, 3, 256, label_mode="exclude").collect()
    assert all(labels[r.vec_id] != labels[r.q_id] for r in excl)
    only = _batched_blas_topk(emb, 4, 3, 256, label_mode="only").collect()
    assert all(labels[r.vec_id] == labels[r.q_id] for r in only)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    vecs=st.lists(_vec8, min_size=4, max_size=18),
    threshold=st.sampled_from([0.2, 0.5, 0.9]),
)
def test_near_dup_block_pairs_matches_brute_force(spark, vecs, threshold):
    """The near-dup BLAS pair kernel (one matmul per block, upper
    triangle) equals a plain-Python pairwise sweep under the same
    4dp/threshold rules, for arbitrary float blocks — and sub-bucketing
    OFF (target_block=None) must equal the single-label brute force
    exactly."""
    from yamon_spark.operators.similarity import embedding_near_dup_pairs

    rows = [(i, 0, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, EMB_SCHEMA)
    got = sorted(
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in embedding_near_dup_pairs(emb, threshold=threshold, target_block=None).collect()
    )
    want = []
    for i, (ia, _, va) in enumerate(rows):
        na = math.sqrt(sum(x * x for x in va)) or 1.0
        for ib, _, vb in rows[i + 1 :]:
            nb = math.sqrt(sum(x * x for x in vb)) or 1.0
            cs = round(sum(a * b for a, b in zip(va, vb)) / (na * nb), 4)
            if cs >= threshold:
                want.append((ia, ib, cs))
    assert got == sorted(want)
