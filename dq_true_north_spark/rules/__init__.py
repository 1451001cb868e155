"""Rule-family executors — the 8 reference rule families
(dq_rules_library.py) re-expressed as Catalyst plans.

Every executor has the same contract:
    execute(spark, rule: dict, params: dict, sink) -> RuleResult
where RuleResult carries the violation count (result_value), the universal
PASS/FAIL-iff-count>0 indicator (dq_rules_library.py:98,263,348,...) and any
detail DataFrames appended through the sink.
"""

from .base import RuleResult  # noqa: F401
