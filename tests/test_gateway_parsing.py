"""Unit tests for the gateway's text-level helpers — the pieces every
DML/QUALIFY rewrite stands on — plus cross-query invariants of the
shared-oracle pattern."""

from __future__ import annotations

from de_gcp_lakehouse_iceberg_spark.sql_gateway import (
    _depth0_index,
    _parse_assignments,
    _rewrite_qualify,
    _split_top,
)


def test_depth0_index_skips_parens_and_strings():
    s = "a WHERE (x WHERE y) 'WHERE' WHERE z"
    i = _depth0_index(s, "WHERE")
    assert s[i:].startswith("WHERE (x")  # first depth-0 non-quoted hit
    j = _depth0_index(s, "WHERE", i + 1)
    assert s[j:] == "WHERE z"
    assert _depth0_index("nowhere here", "WHERE") == -1  # word boundary


def test_split_top_word_and_char_separators():
    assert _split_top("a = 1, b = f(x, y), c = 'p,q'", ",") == [
        "a = 1",
        " b = f(x, y)",
        " c = 'p,q'",
    ]
    assert _split_top("x = 1 AND (a AND b) AND c LIKE '%AND%'", "AND") == [
        "x = 1 ",
        " (a AND b) ",
        " c LIKE '%AND%'",
    ]
    # ANDy column names must not split
    assert _split_top("android = 1 AND b", "AND") == ["android = 1 ", " b"]


def test_parse_assignments_keeps_exprs_whole():
    a = _parse_assignments("x = CASE WHEN a >= 1 THEN f(b, c) ELSE 0 END, y = 'lit,eral'")
    assert a == {
        "x": "CASE WHEN a >= 1 THEN f(b, c) ELSE 0 END",
        "y": "'lit,eral'",
    }


def test_qualify_rewrite_keeps_order_inside_over():
    out = _rewrite_qualify(
        "SELECT a FROM t QUALIFY RANK() OVER (ORDER BY a) <= 2 LIMIT 1"
    )
    assert out == (
        "SELECT * EXCEPT (__qualify__) FROM (SELECT a, "
        "(RANK() OVER (ORDER BY a) <= 2) AS __qualify__ FROM t) "
        "WHERE __qualify__ LIMIT 1"
    )
    # no-op cases
    assert _rewrite_qualify("SELECT a FROM t") == "SELECT a FROM t"
    assert (
        _rewrite_qualify("SELECT 'QUALIFY' FROM t")
        == "SELECT 'QUALIFY' FROM t"
    )


def test_qualify_rejects_set_ops_on_either_side():
    """QUALIFY binds per SELECT branch; a depth-0 set op before OR
    after it means the whole-statement wrap would filter both branches
    — must raise, never silently mis-rewrite (ADVICE r9: the
    before-QUALIFY case was silently wrapped)."""
    import pytest

    for sql in (
        # set op BEFORE the QUALIFY (binds to the second branch only)
        "SELECT a FROM t UNION ALL SELECT a FROM u "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1",
        "SELECT a FROM t INTERSECT SELECT a FROM u "
        "QUALIFY RANK() OVER (ORDER BY a) <= 2",
        # set op AFTER the QUALIFY
        "SELECT a FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1 "
        "UNION ALL SELECT a FROM u",
        "SELECT a FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1 "
        "EXCEPT DISTINCT SELECT a FROM u",
    ):
        with pytest.raises(ValueError, match="QUALIFY"):
            _rewrite_qualify(sql)
    # parenthesized subquery branches stay fine (depth > 0)
    ok = _rewrite_qualify(
        "SELECT a FROM (SELECT a FROM t UNION ALL SELECT a FROM u) "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1"
    )
    assert "__qualify__" in ok
    # BigQuery select-list `* EXCEPT (col)` before QUALIFY is NOT a
    # set op — must still rewrite
    ok2 = _rewrite_qualify(
        "SELECT * EXCEPT (b) FROM t "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1"
    )
    assert "__qualify__" in ok2


def test_q113_shares_q107_oracle_exactly():
    """The stored-index BM25 gate is only meaningful if its oracle IS
    the direct path's oracle (the q88/q90 pattern) — pin it."""
    from de_gcp_lakehouse_iceberg_spark.plans import ORACLE_SQL

    assert (
        ORACLE_SQL["q113_bm25_from_index"]
        == ORACLE_SQL["q107_bm25_topk"]
    )


def test_qualify_set_op_except_before_qualify_rejected():
    """r10 ADVICE: a depth-0 set-operation EXCEPT occurring BEFORE the
    QUALIFY was silently mistranslated (the scan started after
    QUALIFY). Set-op EXCEPT is distinguished from select-list
    `* EXCEPT (...)` by the preceding `*`."""
    import pytest

    for sql in (
        "SELECT a FROM t EXCEPT DISTINCT SELECT a FROM u "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1",
        "SELECT a FROM t EXCEPT ALL SELECT a FROM u "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1",
    ):
        with pytest.raises(ValueError, match="EXCEPT"):
            _rewrite_qualify(sql)
    # select-list forms still pass: bare `* EXCEPT` and `t.* EXCEPT`
    for sql in (
        "SELECT * EXCEPT (b) FROM t "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1",
        "SELECT t.* EXCEPT (b) FROM t "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1",
    ):
        assert "__qualify__" in _rewrite_qualify(sql)
