"""The driver certifies only the FIRST 50 registry entries
(CORRECTNESS_r01/r02 evidence). These tests make the breadth-first
window ordering an enforced invariant, not a convention."""

from __future__ import annotations

from ytspark.queries import _PRIORITY, registry
from tools.check_priority_window import WINDOW, family_coverage


def test_priority_fills_window_exactly():
    # a shorter list silently cedes window slots to registration order;
    # a longer one silently pushes its own tail out of certification
    assert len(_PRIORITY) == WINDOW
    assert len(set(_PRIORITY)) == WINDOW  # no duplicates eating slots


def test_every_family_has_a_certified_representative():
    cover, missing = family_coverage()
    assert not missing, f"families outside the certified window: {missing}"


def test_rotated_out_queries_remain_registered():
    # rotation moves near-duplicates below the window; they must stay
    # registered (and locally oracle-checked), not vanish
    reg = registry()
    for name in (
        "q13_customer_order_distribution",
        "q16_part_supplier_counts",
        "q18_large_orders",
        "cube_segment_priority",
        "except_all_order_priorities",
        "event_transition_matrix",
        "daily_revenue_moving_avg",
        "segment_price_percentiles",
        "customer_balance_quartiles",
        "pivot_segment_status",
        "dedup_simhash",
        # round-3 rotation for the search/fuzzy/layout families:
        # certified in r1+r2 (incremental_append_union), covered by a
        # window twin (top3 via q21/top_revenue topk+window tags), or
        # rows-only with its hash-certified twin still inside
        # (dedup_minhash_lsh -> dedup_minhash_lsh_checkable)
        "incremental_append_union",
        "top3_orders_per_priority",
        "dedup_minhash_lsh",
        # rotated for the sketch family; its tags all remain covered
        "text_stats",
        # rotated for the unpivot/null-semantics batteries: both were
        # certified in r1+r2 and every tag keeps a window member
        "q7_nation_trade",
        "knn_cosine_bruteforce",
    ):
        assert name in reg and name not in _PRIORITY


def test_window_fills_with_never_checked_first():
    """Round-7 policy (r6 VERDICT item 1), enforced: the certified
    window must carry at least 35 queries that have never appeared in
    any committed CORRECTNESS_r*.json — the repeat-anchor set stays
    minimal and rotation throughput stays high."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(f) as fh:
            checked.update(json.load(fh).keys())
    first_ever = [n for n in _PRIORITY if n not in checked]
    assert len(first_ever) >= 35, (
        f"only {len(first_ever)} never-driver-checked queries in the "
        "window — rotation has regressed to repeat-heavy"
    )
