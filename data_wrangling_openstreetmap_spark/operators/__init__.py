"""Graded operator implementations (SURVEY.md §2 inventory).

Importing this package imports every query module, firing their
``@register`` decorators. ``ALL_MODULES`` exists so the registry can
trigger that side effect explicitly.
"""

from . import (
    composites,
    functions_sweep,
    llm,
    multimodal,
    osm_demo,
    relational,
    scale,
    streaming_ops,
    udfs,
    windows,
)

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
)
