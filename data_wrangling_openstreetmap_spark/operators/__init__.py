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
# ROUND-11 ROTATION — THE POOL-CLOSING ROUND: 48 of the 50 slots are
# the ENTIRE remaining never-driver-graded oracled pool (438 unique
# names carry driver signal from rounds 1-10, all green at their latest
# grade; the 48 below are exactly the oracled registry minus that union
# — recomputed from CORRECTNESS_r01–r10 when this window was built, and
# matching VERDICT r10 / ROUND10_NOTES §10 to the name). If this window
# grades green, cumulative unique = 486 and EVERY full-oracle query has
# been driver-hash-graded at least once; the only never-graded names
# left are the two rows-only multimodal codec stubs (m3_image_resize,
# m4_feature_extract — no oracle by design, env-gated codecs).
#
# SENTINEL LANE, ROUND 11 (standing policy below): with the pool taking
# 48 slots, 2 slots re-grade previously-green names whose source
# churned after their grade — VERDICT r10 §Next 1's named picks:
#   w5_last_ignorenulls  graded r5; windows.py churned r10 at the
#                        first/last-carry region itself (the j7/j15
#                        struct-carry rewrites) — covers W5
#   l2_dup_clusters      graded r3; the round-10 iter_ckpt rewrite
#                        landed inside its own fixpoint loop — covers
#                        the connected-components / L2 surface
#
# TAG COVERAGE, AMENDED FOR THE ENDGAME: a window drawn from a shrinking
# pool cannot carry a representative of every §2 tag (the 48 below span
# 25 of 68 tags). tests/test_plan_shapes.py::
# test_driver_window_covers_all_tags now enforces the real invariant:
# every registry tag has a representative EITHER in the window OR among
# names the driver has already hash-graded green (ledger union checked
# in at the repo root) — so a tag can never silently lose its driver
# correctness signal, which was always the point.
#
# ROUND-12+ WINDOW POLICY (decided now, per VERDICT r10 §Next 4 —
# round 11 exhausts the never-graded pool, so from round 12 the window
# is majority-sentinel):
#   1. AUTOMATIC picks, in order: (a) any name whose oracle or operator
#      body an ADVICE finding touched this round; (b) any name REWRITTEN
#      this round (the j7/j15 precedent); (c) j4_anti_join FIRST in
#      round 12 specifically — VERDICT r10 flagged that j19's anti-gate
#      is vacuous at this fixture, so J4's freshest non-degenerate grade
#      is r6 against since-reorganized source.
#   2. CHURN-RANKED sentinels fill the rest: for each graded name,
#      compute (last round its defining file was touched) − (round of
#      its latest grade); pick the largest-staleness names first,
#      tie-broken toward (a) names whose tags have the OLDEST freshest
#      grade anywhere (tag-level staleness), then (b) headline bench
#      queries. ~5 slots should stay reserved for brand-new twins minted
#      by capability work (never-graded names always outrank sentinels).
#   3. The tag-coverage invariant (window ∪ graded-green must span every
#      tag) and the all-oracled rule (no rows-only names in the window)
#      are unchanged and remain machine-checked.
#
# SENTINEL RE-GRADE POLICY (standing, effective round 8): once the
# never-graded pool can no longer fill 50 slots — or from round 8
# regardless, for ~5 slots — the window reserves slots for CHURN
# SENTINELS: previously-green names whose source or shared helpers
# changed since their grade, chosen each round by diffing the
# operators/ tree against the round the name was graded in.
DRIVER_WINDOW = (
    # churn sentinels (see SENTINEL LANE above):
    "w5_last_ignorenulls",
    "l2_dup_clusters",
    # the entire remaining never-graded oracled pool (48 names),
    # including the seven thin-tag carriers VERDICT r10 named:
    # a26 (A8), w7 (F3), a47 (J2), q46 (J5), l4_score_calibration (L1),
    # m8 (L5), s33 (S1).
    # — text/corpus battery:
    "l4_k_anonymity",
    "l4_corpus_report",
    "l4_blocklist_filter",
    "l4_mixture_plan",
    "l4_lexicon_sentiment",
    "l4_score_calibration",
    "l4_score_auc",
    # — embedding math:
    "l6_prefix_energy",
    "l6_centroid_drift",
    "l6_feature_standardize",
    # — aggregate/statistics family:
    "a41_weighted_median",
    "a43_user_entropy",
    "a45_tukey_outliers",
    "a48_trimmed_mean",
    "a51_permutation_test",
    "a52_price_indices",
    "a53_xbar_control",
    "a54_record_statistics",
    "a19_histogram",
    "a26_gini_concentration",
    "a47_hazard_curve",
    # — business-query composites:
    "q46_share_of_parent",
    "q47_interpurchase_distribution",
    "q49_pareto_skyline",
    "q53_abc_xyz",
    "q54_sla_attainment",
    "q57_receivables_aging",
    "q60_rate_volume_decomposition",
    # — functions / error-handling:
    "f14_try_arithmetic",
    "f20_presence_bitmap",
    "f26_try_battery",
    # — sources / multimodal / data-ops:
    "m8_mime_sniff_router",
    "s33_corrupt_file_resilience",
    "dp1_column_profile",
    "dq12_cross_table_volume_drift",
    "d8_compaction_planner",
    # — SQL frontend:
    "x12_parameterized_sql",
    "x15_lateral_alias_sql",
    # — window family:
    "w6_rank_fractions",
    "w7_range_interval_frame",
    "w24_runs_test",
    "w35_rolling_median",
    "w37_weighted_moving_average",
    "w39_hampel_repair",
    "w41_mase",
    "w42_peak_census",
    "w44_drawdown_duration",
    "w45_burstiness",
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
