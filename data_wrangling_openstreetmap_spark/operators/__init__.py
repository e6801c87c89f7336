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
# ROUND-12 ROTATION — the first MAJORITY-SENTINEL window, built by the
# policy below (written round 11, endorsed by VERDICT r11 §Next 1):
#
# AUTOMATIC picks (6):
#   u16_udtf_signature_rollup   its ORACLE was edited in round 11 — the
#                               checked-in r8 grade certifies dead text
#   j4_anti_join                VERDICT r10 #3 carry-over (j19's anti
#                               gate is vacuous at this fixture; J4's
#                               freshest non-degenerate grade is r6)
#   l2_substring_span_pairs     never-graded round-11 first-timer
#   l1_span_scrub_census        never-graded round-11 first-timer
#   l1_incremental_span_scrub   NEW round 12 (ingestion-time span
#                               scrub) — never graded
#   l3_ann_recall_contract      oracle AND body edited round 12 (floor
#                               0.45 → 0.70 after the LSH/IVF tuning)
#
# CHURN SENTINELS (44), staleness-ranked per the policy:
#   - the ENTIRE udfs.py surface (19): the module was rewritten
#     wholesale in round 11 (battery-driven body rewrites, +324
#     lines); every grade in it predates that rewrite.
#   - the regex-closure consumers (12): the sixteen \z/explicit-class
#     expression rewrites of round 11 plus l4_html_extract, whose
#     shared pattern constants were fixed THIS round by the AST lint
#     (naked-dot / \s classes) — oracles unchanged, bodies not.
#   - the tokenizer consumers (2): q9_text_stats and l4_token_counts
#     ride functions/text.py, whose whitespace class changed r11.
#   - oldest-grade names (11): graded r1–r3 in files that churned many
#     rounds since, tie-broken toward headline bench queries
#     (q1/q2/q10) and thin-tag carriers per the policy.
#
# ROUND-13+ WINDOW POLICY (standing, decided round 11 per VERDICT r10
# §Next 4 — kept verbatim so the next rotation follows it):
#   1. AUTOMATIC picks, in order: (a) any name whose oracle or operator
#      body an ADVICE finding touched this round; (b) any name REWRITTEN
#      this round (the j7/j15 precedent); (c) never-graded new names.
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
DRIVER_WINDOW = (
    # automatic picks:
    "u16_udtf_signature_rollup",
    "j4_anti_join",
    "l2_substring_span_pairs",
    "l1_span_scrub_census",
    "l1_incremental_span_scrub",
    "l3_ann_recall_contract",
    # udfs.py module-rewrite sentinels:
    "u1_scalar_udf_normalize",
    "u1b_arrow_udf_normalize",
    "u2_pandas_udf_score",
    "u2b_pandas_iter_udf",
    "u3_grouped_map_zscore",
    "u4b_grouped_agg_udaf",
    "u5_udtf_tag_split",
    "u6_map_in_arrow",
    "u7_sql_udf",
    "u8_sql_udtf",
    "u9_polymorphic_udtf",
    "u10_apply_in_arrow",
    "u11_udtf_table_arg",
    "u12_cogrouped_asof",
    "u13_cogrouped_arrow",
    "u14_arrow_udtf",
    "u15_udf_keyed_median_udaf",
    "u17_udtf_keyed_median_chain",
    "u18_five_crossing_bridge",
    # regex-closure consumers (r11 \z rewrites + r12 l4_html_extract):
    "p3_regex_classify",
    "p4_regex_extract",
    "p3b_name_classify",
    "p7_part_noun_brand",
    "p9_anchored_type_noun",
    "p11_chained_parse_normalize",
    "p12_customer_profile_shaping",
    "p13_part_shaping",
    "f2_regex_standardize",
    "l4_url_normalize",
    "m0_binary_ingest",
    "l4_html_extract",
    # tokenizer consumers (functions/text.py changed r11):
    "q9_text_stats",
    "l4_token_counts",
    # oldest-grade sentinels (graded r1–r3; headline + thin tags first):
    "q10_cosine_topk",
    "q1_pricing_summary",
    "q2_join_chain",
    "l1_exact_dedup",
    "l4_lang_id",
    "l4_quality_score",
    "l2_ngram_jaccard",
    "l3_cosine_topk_hof",
    "a6_grouping_sets",
    "f1_string_funcs",
    "q16_funnel",
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
