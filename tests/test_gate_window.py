"""Invariants of the driver-gate ordering (plans/__init__.py).

The driver's CORRECTNESS check covers only the FIRST 50 registered
queries. _GATE_PRIORITY must therefore hold EXACTLY 50 names — a 51st
entry would look gate-covered while silently falling outside the
checked window (this shipped once in round 4: 52 entries, the last two
unchecked)."""

from __future__ import annotations

from de_gcp_lakehouse_iceberg_spark.plans import (
    _GATE_PRIORITY,
    ORACLE_SQL,
    QUERIES,
)


def test_gate_priority_is_exactly_the_checked_window():
    assert len(_GATE_PRIORITY) == 50
    assert len(set(_GATE_PRIORITY)) == 50
    assert all(n in QUERIES for n in _GATE_PRIORITY)
    # priority order IS the registry's first-50 insertion order
    assert list(QUERIES)[:50] == _GATE_PRIORITY


def test_every_registered_query_has_oracle_or_is_rows_only():
    # every gate-window query must be hash-checkable (oracle present)
    missing = [n for n in _GATE_PRIORITY if n not in ORACLE_SQL]
    assert not missing, f"gate-window queries without oracle: {missing}"
