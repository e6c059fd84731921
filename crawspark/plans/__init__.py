from crawspark.plans.inspect import (  # noqa: F401
    executed_plan,
    has_broadcast_join,
    plan_summary,
    pushed_filters,
)
