from margaret_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_python_udf,
    assert_pushed_filters,
    explain_str,
    plan_summary,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_python_udf",
    "assert_pushed_filters",
    "explain_str",
    "plan_summary",
]
