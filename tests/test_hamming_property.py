"""Property-based invariants for the binary sign sketch and cascade
retrieval (hypothesis):

- Bit faithfulness: bit d of the packed sketch == (v[d] > 0) for
  arbitrary float vectors — localizes packing bugs (wrong word split,
  off-by-one shift) that an oracle diff only reports as a hash
  mismatch.
- Distance ground truth: hamming_topk's reported distance equals the
  Python popcount of the sign disagreement, for every candidate.
- Cascade dominance: recall@k of (Hamming shortlist + exact rerank) is
  >= recall@k of the raw Hamming ranking, for any corpus — the defining
  property of a rerank tier (it can fix tier-1 ordering inside the
  shortlist, never hurt it).

Examples batch into one DataFrame per case to keep Spark job counts low.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_component = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False, width=32
)
_vec64 = st.lists(_component, min_size=64, max_size=64)

EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"


def _signs(v):
    return [1 if x > 0 else 0 for x in v]


@settings(max_examples=6, deadline=None)
@given(vecs=st.lists(_vec64, min_size=1, max_size=4))
def test_sketch_bits_match_signs(spark, vecs):
    from yamon_spark.operators.similarity import binary_sketch

    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    out = binary_sketch(spark.createDataFrame(rows, EMB_SCHEMA)).collect()
    by_id = {r.vec_id: r for r in out}
    for i, v in enumerate(vecs):
        s = _signs(v)
        lo = sum(b << d for d, b in enumerate(s[:32]))
        hi = sum(b << d for d, b in enumerate(s[32:]))
        # python ints are unbounded; bit 31 set -> negative BIGINT in Spark
        def signed(x):
            return x - (1 << 64) if x >= (1 << 63) else x
        assert by_id[i].lo == signed(lo) and by_id[i].hi == signed(hi)


@settings(max_examples=6, deadline=None)
@given(vecs=st.lists(_vec64, min_size=3, max_size=6))
def test_hamming_distance_is_popcount_of_sign_disagreement(spark, vecs):
    from yamon_spark.operators.similarity import hamming_topk

    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    out = hamming_topk(spark.createDataFrame(rows, EMB_SCHEMA), 0, k=len(vecs)).collect()
    q = _signs(vecs[0])
    for r in out:
        want = sum(a != b for a, b in zip(q, _signs(vecs[r.vec_id])))
        assert r.hamming == want


@settings(
    max_examples=5,
    deadline=None,
    # 6x 64-float base example is inherently large; boundedness is the point
    suppress_health_check=[HealthCheck.large_base_example],
)
@given(vecs=st.lists(_vec64, min_size=6, max_size=10))
def test_cascade_recall_dominates_hamming_recall(spark, vecs):
    from yamon_spark.operators.similarity import cascade_recall, hamming_recall

    # zero-norm vectors make cosine undefined (the operator contract
    # presumes nonzero embeddings, as real embedding tables are); nudge
    # any all-zero sample rather than rejecting the whole case
    rows = [
        (i, [float(x) for x in v] if any(v) else [1.0] + [0.0] * 63, 0)
        for i, v in enumerate(vecs)
    ]
    emb = spark.createDataFrame(rows, EMB_SCHEMA)
    k = min(3, len(vecs) - 1)
    short = max(4, len(vecs) // 2)
    ham = hamming_recall(emb, 0, k).collect()[0].recall_at_10
    casc = cascade_recall(emb, 0, k, shortlist=short).collect()[0].recall_at_10
    assert casc >= ham - 1e-9
