"""Invariants of the driver-gate ordering (plans/__init__.py).

The driver's CORRECTNESS check covers only the FIRST 50 registered
queries. _GATE_PRIORITY must therefore hold EXACTLY 50 names — a 51st
entry would look gate-covered while silently falling outside the
checked window (this shipped once in round 4: 52 entries, the last two
unchecked)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from de_gcp_lakehouse_iceberg_spark.plans import (
    _CURRENT_ROUND,
    _GATE_PRIORITY,
    _derived_gate_window,
    ORACLE_SQL,
    QUERIES,
)
from de_gcp_lakehouse_iceberg_spark.plans.gate_window import (
    MAX_AGE,
    build_window,
    latest_green_rounds,
)


def test_gate_priority_is_exactly_the_checked_window():
    assert len(_GATE_PRIORITY) == 50
    assert len(set(_GATE_PRIORITY)) == 50
    assert all(n in QUERIES for n in _GATE_PRIORITY)
    # priority order IS the registry's first-50 insertion order
    assert list(QUERIES)[:50] == _GATE_PRIORITY


def test_gate_window_is_derived_from_correctness_ledger():
    """The static list must equal the one derived from CORRECTNESS files.

    This is the r11-verdict fix: cohort labels are generated from the
    recorded driver rows, never hand-maintained, so a mislabelled cohort
    (the r11 "three rounds stale" error) cannot recur."""
    assert _GATE_PRIORITY == _derived_gate_window()


def test_derivation_ignores_the_in_flight_rounds_ledger(tmp_path):
    """The round-N window derives from rounds < N ONLY (r12 verdict,
    "What's wrong" #1): the driver writes CORRECTNESS_r{N}.json after the
    builder's final commit, so a derivation that reads it would disagree
    with the pinned window the moment the file lands. Synthesize an
    in-flight file and assert the cutoff excludes it."""
    import json

    (tmp_path / "CORRECTNESS_r11.json").write_text(json.dumps({
        "q01_x": {"rows_match": True, "schema_match": True,
                  "hash_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r12.json").write_text(json.dumps({
        "q01_x": {"rows_match": True, "schema_match": True,
                  "hash_match": True, "err": None},
        "q02_y": {"rows_match": True, "schema_match": True,
                  "hash_match": True, "err": None},
    }))
    full = latest_green_rounds(root=tmp_path)
    assert full == {"q01_x": 12, "q02_y": 12}
    cut = latest_green_rounds(root=tmp_path, before_round=12)
    assert cut == {"q01_x": 11}
    # and the real derivation is pinned at the cutoff, so the static
    # window stays equal to the derived one even after the driver writes
    # CORRECTNESS_r{_CURRENT_ROUND}.json into the repo root
    assert all(
        r < _CURRENT_ROUND
        for r in latest_green_rounds(before_round=_CURRENT_ROUND).values()
    )


def test_no_registered_query_ages_past_two_rounds():
    """Every query whose latest green row would exceed MAX_AGE rounds of
    age after this round MUST be inside the gate window; queries with no
    green row at all (new this round) must be in the window too."""
    latest = latest_green_rounds(before_round=_CURRENT_ROUND)
    window = set(_GATE_PRIORITY)
    stale_cut = _CURRENT_ROUND - MAX_AGE - 1
    violations = [
        q
        for q in QUERIES
        if (q not in latest or latest[q] <= stale_cut) and q not in window
    ]
    assert not violations, (
        f"queries aging past {MAX_AGE} rounds outside the gate window: "
        f"{violations}"
    )


def test_every_registered_query_has_oracle_or_is_rows_only():
    # every gate-window query must be hash-checkable (oracle present)
    missing = [n for n in _GATE_PRIORITY if n not in ORACLE_SQL]
    assert not missing, f"gate-window queries without oracle: {missing}"


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_build_window_invariants(data):
    """For arbitrary registries / green-row histories / changed sets:
    the window is deduplicated, at most SIZE, contains every
    never-gated query, every query stale enough to age out, and every
    registered changed query — or raises when those mandatory cohorts
    alone cannot fit."""
    n = data.draw(st.integers(1, 140))
    registered = [f"q{i:03d}_x" for i in range(n)]
    current = data.draw(st.integers(3, 20))
    latest = {
        q: data.draw(
            st.one_of(st.none(), st.integers(1, current - 1)), label=q
        )
        for q in registered
    }
    latest = {q: r for q, r in latest.items() if r is not None}
    changed = data.draw(
        st.lists(st.sampled_from(registered), max_size=10, unique=True)
    )
    size = data.draw(st.integers(1, 60))

    new = [q for q in registered if q not in latest]
    stale = [
        q for q in registered
        if q in latest and latest[q] <= current - 3
    ]
    mandatory = set(new) | set(stale) | set(changed)

    try:
        window = build_window(registered, latest, changed, current, size)
    except ValueError:
        assert len(set(new) | set(stale) | set(changed)) > size
        return
    assert len(window) == len(set(window))
    assert len(window) <= size
    assert mandatory <= set(window)
    assert set(window) <= set(registered)
    # backfill prefers the OLDEST remaining rows: nothing outside the
    # window may be strictly older than something backfilled in,
    # unless the window is full of mandatory + older rows already
    if len(window) == size:
        outside = [
            latest.get(q, 0) for q in registered if q not in set(window)
        ]
        backfilled = [
            latest.get(q, 0)
            for q in window
            if q not in mandatory
        ]
        if outside and backfilled:
            assert max(backfilled) <= min(outside)
