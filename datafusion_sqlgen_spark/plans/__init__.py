from datafusion_sqlgen_spark.plans.audit import (
    PlanAudit,
    assert_scale_clean,
    audit_plan,
)
from datafusion_sqlgen_spark.plans.core import (
    Aggregate,
    AsofJoin,
    Distinct,
    EmptyRelation,
    Explode,
    Filter,
    Join,
    Lateral,
    Limit,
    Offset,
    Plan,
    Project,
    RecursiveWith,
    Scan,
    SetOp,
    Sort,
    SubqueryAlias,
    Pivot,
    Unpivot,
    Values,
    With,
    scan,
    values_relation,
)

__all__ = [
    "Plan", "Scan", "Project", "Filter", "Distinct", "Sort", "Limit",
    "Offset", "EmptyRelation", "Explode", "Aggregate", "Join", "AsofJoin",
    "SetOp", "With",
    "RecursiveWith", "Unpivot", "Pivot", "Lateral",
    "SubqueryAlias", "Values", "scan", "values_relation",
    "PlanAudit", "audit_plan", "assert_scale_clean",
]
