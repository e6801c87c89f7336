"""Physical-plan introspection helpers (SURVEY.md §5.2 item 5).

The scale claims in operator docstrings (filters push down, dims
broadcast, top-k avoids global sorts, the graded path never crosses
into Python) are asserted as tests via these helpers, so a regression
in plan shape fails CI rather than silently costing 10× at 100 TB.
"""

from .asserts import (
    PYTHON_EVAL_MARKERS,
    assert_in_plan,
    assert_no_python_eval,
    plan_string,
)
from .window_orders import (
    SweepStats,
    WindowHazard,
    aggregate_order_hazards,
    checkpoint_opaque,
    logical_rdd_ids,
    window_order_hazards,
)

__all__ = [
    "PYTHON_EVAL_MARKERS",
    "assert_in_plan",
    "assert_no_python_eval",
    "plan_string",
    "SweepStats",
    "WindowHazard",
    "aggregate_order_hazards",
    "checkpoint_opaque",
    "logical_rdd_ids",
    "window_order_hazards",
]
