"""Graded operator implementations (SURVEY.md §2 inventory).

Importing this package imports every query module, firing their
``@register`` decorators, then reorders the registry so the driver's
grading window sees full capability coverage. ``ALL_MODULES`` exists so
the registry can trigger that side effect explicitly.

Why the reorder: the round-1 driver graded exactly the FIRST 50 registry
entries in iteration order, which (with alphabetical module imports)
ended mid-``relational`` — windows, streaming, set-ops, and the UDF
surface got no correctness signal at all (VERDICT.md round 1, finding
#1). ``DRIVER_WINDOW`` pins the first 50 entries to a covering set: at
least one representative query for every SURVEY §2 capability row.
Everything else keeps its module order after the window.
"""

from . import (
    composites,
    functions_sweep,
    llm,
    multimodal,
    osm_demo,
    quality,
    relational,
    scale,
    sql_frontend,
    streaming_ops,
    udfs,
    windows,
)
from ..registry import REGISTRY

ALL_MODULES = (
    relational,
    composites,
    windows,
    functions_sweep,
    llm,
    multimodal,
    streaming_ops,
    osm_demo,
    scale,
    udfs,
    quality,
    sql_frontend,
)

# First 50 registry entries = the driver's grading window. Every window
# entry carries a full DuckDB oracle — the driver's 50 slots are all
# value-hash-graded, none rows-only. Order within the window is
# thematic, not significance-ranked — only membership matters.
#
# ROUND-10 ROTATION (the round-4..9 discipline, continued): 45 of the
# 50 slots are queries the driver has NEVER hash-graded (393 unique
# names carry driver signal from rounds 1-9, all green at their latest
# grade; zero overlap with the 45 — asserted against the
# CORRECTNESS_r01–r09 union when the window was built). The graded 393
# stay continuously verified by the driver-strict local replica
# (tests/test_oracle_parity.py) and the per-round full-registry sf0.1
# sweep. Coverage invariant unchanged: every §2 tag in the registry has
# a representative below
# (tests/test_plan_shapes.py::test_driver_window_covers_all_tags).
#
# SENTINEL LANE, ROUND 10 (standing policy below): 5 slots re-grade
# previously-green names whose source or shared helpers changed after
# their grade —
#   j7_asof_join            graded r2; round-10 single-struct carry
#                           rewrite (the multi-carry sweep's own
#                           finding) — the automatic pick; covers J7+W5
#   j15_nearest_event_join  graded r4; round-10 single-struct carry
#                           rewrite — automatic pick; covers W5+W3
#   l3_knn_block_matmul     graded r3; llm.py churned r4–r10 (the
#                           iter_ckpt rewrite landed in its module this
#                           round) — covers L3, and it is a headline
#                           bench query
#   st5_dedup_first         graded r3; streaming_ops.py churned r4–r10
#                           (st38–st40 land this round) — covers ST5+L1
#   st7_running_user_totals graded r3; same streaming_ops churn —
#                           covers ST7+W4
#
# SENTINEL RE-GRADE POLICY (standing, effective round 8): once the
# never-graded pool can no longer fill 50 slots — or from round 8
# regardless, for ~5 slots — the window reserves slots for CHURN
# SENTINELS: previously-green names whose source or shared helpers
# changed since their grade, chosen each round by diffing the
# operators/ tree against the round the name was graded in.
#
# TAG ARITHMETIC forcing this round's 10 twins: entering round 10, 38
# of the 69 registry tags had NO oracled never-graded carrier (A4 A5
# A6 A9 F6 F7 F9 J3 J4 J6 J7 L3 O1 O3 O4 O5 O6 P1 P3 P4 P5 S2 S4 S5
# S6 ST1-ST7 U1-U5 W5 — ROUND9_NOTES §8's precomputed list). The five
# churn sentinels above cover 7 organically (J7 W5 L3 ST5 ST7 + L1
# W2-adjacent); the remaining 31 get the ten round-10 twins (o12 s13
# p13 a57 j19 f29 u18 st38 st39 st40 — registry 478→488), each a
# multi-tag composite per the recipe that has now worked three rounds.
DRIVER_WINDOW = (
    # round-10 tag twins (all first-timers; see TAG ARITHMETIC above):
    "o12_channel_ledger",
    "s13_sink_relay",
    "p13_part_shaping",
    "a57_priority_cube_modes",
    "j19_clean_hot_price_bands",
    "f29_user_geo_profile",
    "u18_five_crossing_bridge",
    "st38_daily_segment_revenue",
    "st39_emitted_daily_hops",
    "st40_segment_session_dwell",
    # churn sentinels (see SENTINEL LANE above):
    "j7_asof_join",
    "j15_nearest_event_join",
    "l3_knn_block_matmul",
    "st5_dedup_first",
    "st7_running_user_totals",
    # thin-tag carriers the verdict named (the LAST never-graded
    # carrier of F2 / L2 / W2 respectively) plus the round-10
    # carry-sweep's newly-proven w8:
    "l4_readability",
    "l2_lsh_bucket_health",
    "w27_top_movers",
    "w8_gap_fill_calendar",
    # greedy tag-cover picks (each the never-graded carrier of tags no
    # other window entry covers):
    "a28_two_proportion_test",
    "l6_quantile_transform",
    "a14_copurchase_pairs",
    "f18_parameterized_sql",
    "m0_binary_ingest",
    "q11_market_share",
    "s11_temporal_split",
    "l4_vocab_coverage",
    "l1_block_dedup_census",
    "q35_mom_growth",
    "a25_entropy_profile",
    # strength fillers (remaining never-graded names spread across the
    # window/stats/SQL-frontend/source/function families so one broken
    # module cannot take out a whole window):
    "q27_ltv_curves",
    "q29_event_transitions",
    "l6_int8_quantize",
    "w13_time_weighted_avg",
    "w14_dist_functions",
    "w18_cusum_changepoint",
    "x11_sql_variables",
    "x13_filter_clause_sql",
    "s20_range_source",
    "s24_importance_sample",
    "f16_bitwise",
    "f25_edit_distance_battery",
    "dq7_benford_audit",
    "g5_powerlaw_alpha",
    "g8_clustering_by_degree",
    "l4_oov_rate",
    "q34_pareto_share",
    "a32_hhi_concentration",
    "a34_segment_beta",
    "q44_dense_monthly_spine",
)

assert len(DRIVER_WINDOW) == 50, len(DRIVER_WINDOW)


def _reorder_registry() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    assert not missing, f"DRIVER_WINDOW names not registered: {missing}"
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()
