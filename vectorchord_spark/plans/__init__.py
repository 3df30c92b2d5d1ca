from vectorchord_spark.plans.explain import (
    explain_str,
    has_broadcast_join,
    partition_filters,
    pushed_filters,
)
from vectorchord_spark.plans.transparent import (
    ann_sql,
    register_ann_index,
    try_rewrite_range,
    try_rewrite_topk,
    unregister_ann_index,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "partition_filters",
    "has_broadcast_join",
    "ann_sql",
    "register_ann_index",
    "unregister_ann_index",
    "try_rewrite_topk",
    "try_rewrite_range",
]
