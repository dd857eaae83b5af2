from glaredb_spark.plans.explain import (
    formatted_plan,
    plan_has,
    pushed_filters,
    query_profile,
    read_schema_columns,
)

__all__ = [
    "formatted_plan",
    "plan_has",
    "pushed_filters",
    "query_profile",
    "read_schema_columns",
]
