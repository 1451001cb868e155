"""Driver-faithful correctness gate: every registered SQL query must match
its DuckDB oracle at sf0.01 (row count + schema + value hash)."""

from __future__ import annotations

import pytest

from dq_true_north_spark import queries as Q
from tests.conftest import SF_DIR
from tests.oracle import assert_parity

_REG = Q.registry()
SQL_CHECKED = sorted(n for n, v in _REG.items() if v["oracle"])
ROWS_ONLY = sorted(n for n, v in _REG.items() if not v["oracle"])


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_parity(spark, duck, name):
    entry = _REG[name]
    df = entry["spark"](spark, SF_DIR)
    assert_parity(df, duck, entry["oracle"], name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, name):
    entry = _REG[name]
    df = entry["spark"](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
