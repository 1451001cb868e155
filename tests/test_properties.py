"""Property-based checks (hypothesis) over the supported input domain:
printable text with ASCII whitespace, plus the corpus's diacritics/CJK.

These harden the three-way parity (Spark SQL expr / DuckDB RE2 / Python
golden) beyond the planted corpus: random adversarial strings from the
domain must agree everywhere, and scrub must be idempotent on anything.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from dq_true_north_spark.textquality import spec
from dq_true_north_spark.textquality.scrub import scrub_sql_expr, scrub_text
from tests.golden import heuristic_reasons

ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n.,;:!?#…-*•()@+/'\"éèüßñçàの的一是"
)
texts = st.text(alphabet=ALPHABET, min_size=0, max_size=400)


_DUCK = duckdb.connect()


@settings(max_examples=300, deadline=None)
@given(texts)
def test_scrub_idempotent_on_domain(t):
    once = scrub_text(t)
    assert scrub_text(once) == once


@settings(max_examples=150, deadline=None)
@given(st.lists(texts, min_size=1, max_size=8))
def test_duckdb_metrics_match_python_golden(batch):
    """DuckDB rendering of every metric+predicate == independent Python
    implementation (golden). The Spark rendering is pinned to DuckDB by
    tests/test_oracle_parity.py on real tables, closing the triangle."""
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(i INT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", list(enumerate(batch)))
    preds = spec.heuristic_drop_predicates(spec.DUCK, "text")
    cols = ", ".join(f"CAST(({p}) AS INT) AS {r}" for r, p in preds)
    rows = con.execute(f"SELECT i, {cols} FROM docs ORDER BY i").fetchall()
    for row, text in zip(rows, batch):
        duck_reasons = [
            r for (r, _), hit in zip(preds, row[1:]) if hit == 1
        ]
        assert duck_reasons == heuristic_reasons(text), repr(text)


@settings(max_examples=150, deadline=None)
@given(texts)
def test_duckdb_scrub_matches_python(t):
    out = _DUCK.execute(
        f"SELECT {scrub_sql_expr(False, 'col0')} FROM (SELECT ? AS col0)", [t]
    ).fetchone()[0]
    assert out == scrub_text(t), repr(t)
