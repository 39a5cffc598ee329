"""Single source of truth for the bounded-unpartitioned-window whitelist.

Windows with an EMPTY partition spec move ALL rows to one partition —
acceptable ONLY over inputs bounded by construction (row count constant
in corpus size). Both gates load this map: scripts/plan_audit.py (fails
the audit on any data-sized unpartitioned window not listed here) and
tests/test_plans.py (the CI twin of the same invariant). Living in the
package — not exec'd out of a script with top-level side effects —
keeps the import side-effect-free under pytest.

Every entry documents its boundedness provenance so a reviewer can
check the claim at the cited site.
"""

BOUNDED_WINDOW_WHITELIST: dict[str, str] = {
    # operators/embeddings.py: window runs over .limit(k) rows (k=8 centroid
    # seeds), never over the corpus.
    "embed_kmeans": "window over limit(k=8) centroid seed rows",
    # operators/similarity.py: RRF rank windows run over the two top-100
    # candidate shortlists, never over the corpus.
    "hybrid_rank_rrf": "rank windows over top-100 candidate shortlists",
    # queries/analytics_ext4.py: the gaps-and-islands row_number runs over
    # the ALERTING-HOURS rollup — time-range-sized (<= hours in retention,
    # ~8.8k/year), corpus-size-independent.
    "q91_alert_episodes": "window over the hourly alert rollup (calendar-bounded)",
}
