from datafusion_sqlgen_spark.plans.core import (
    Aggregate,
    Distinct,
    EmptyRelation,
    Explode,
    Filter,
    Join,
    Limit,
    Offset,
    Plan,
    Project,
    RecursiveWith,
    Scan,
    SetOp,
    Sort,
    SubqueryAlias,
    Values,
    With,
    scan,
    values_relation,
)

__all__ = [
    "Plan", "Scan", "Project", "Filter", "Distinct", "Sort", "Limit",
    "Offset", "EmptyRelation", "Explode", "Aggregate", "Join", "SetOp", "With",
    "RecursiveWith",
    "SubqueryAlias", "Values", "scan", "values_relation",
]
