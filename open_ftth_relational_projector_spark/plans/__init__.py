"""Physical-plan inspection utilities."""

from open_ftth_relational_projector_spark.plans.checks import (
    assert_no_cartesian,
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    scan_read_schemas,
    shuffle_count,
    wholestage_codegen_spans,
)

__all__ = [
    "assert_no_cartesian",
    "broadcast_join_count",
    "formatted_plan",
    "pushed_filters",
    "scan_read_schemas",
    "shuffle_count",
    "wholestage_codegen_spans",
]
