"""Plan-inspection helpers: make physical-plan properties testable."""

from npm_mirror_spark.plans.inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    wholestage_codegen_spans,
)
