from vectorchord_spark.plans.explain import (
    explain_str,
    has_broadcast_join,
    partition_filters,
    pushed_filters,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "partition_filters",
    "has_broadcast_join",
]
