from __future__ import annotations

from dataclasses import dataclass, field

from .. import constants as C


@dataclass
class RuleResult:
    """Outcome of one rule execution (reference: the log_dq_result payload,
    dq_rules_library.py:17-52)."""

    result_value: str
    indicator: str
    error_message: str = ""
    extra: dict = field(default_factory=dict)

    @classmethod
    def from_count(cls, violations: int, **extra) -> "RuleResult":
        """FAIL iff violation count > 0 — the universal convention
        (dq_rules_library.py:98,263,348,496,605,702,795,1125,1195)."""
        return cls(
            result_value=str(violations),
            indicator=C.FAIL if violations > 0 else C.PASS,
            extra=extra,
        )
