"""Plan inspection & linting: machine-checkable assertions that the
physical plan is the one a 100 TB deployment needs (SCALE.md)."""

from food_panda_etl_spark.plans.lint import (
    explain_formatted,
    lint_plan,
    plan_summary,
)

__all__ = ["explain_formatted", "lint_plan", "plan_summary"]
