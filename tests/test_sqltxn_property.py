"""Property tests for the transaction-script grammar (sqldml.parse_script).

Pure parse level, no Spark: scripts are RENDERED from a known statement
list — with semicolons, BEGIN/COMMIT keywords, and doubled quotes hidden
inside string literals, randomized keyword case/whitespace, and optional
TRANSACTION/WORK noise words — then split back, and the recovered
statement list must match the AST exactly. A split that breaks at an
in-literal ';' or treats a literal 'commit' as the terminator shows up
here long before an oracle would catch it."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import pytest

from maestro_spark import sqldml

# every literal is hostile to the script splitter in a different way
STMTS = [
    "INSERT INTO t (conv_id, turn_idx, role, text) VALUES ('A; B', 0, 'u', 'x; y; z')",
    "UPDATE t SET text = 'begin; commit; rollback' WHERE conv_id = 'A'",
    "UPDATE t SET text = 'it''s; fine' WHERE role = 'user'",
    "DELETE FROM t WHERE text LIKE '%;%'",
    "DELETE FROM t WHERE tool IN ('a;b', 'COMMIT')",
    "MERGE INTO t USING (SELECT conv_id, turn_idx, 'x;y' AS text FROM t) AS s "
    "ON s.conv_id = t.conv_id AND s.turn_idx = t.turn_idx "
    "WHEN MATCHED THEN UPDATE SET text = s.text",
    "TRUNCATE TABLE t",
    "ALTER TABLE t ADD COLUMN extra string",
]


def _sp():
    return st.sampled_from([" ", "  ", "\n", "\n  ", "\t"])


def _kw(w):
    return st.sampled_from([w.lower(), w.upper(), w.title()])


@st.composite
def script(draw):
    stmts = [draw(st.sampled_from(STMTS)) for _ in range(draw(st.integers(1, 4)))]
    s = draw(_kw("begin"))
    if draw(st.booleans()):
        s += " " + draw(_kw(draw(st.sampled_from(["transaction", "work"]))))
    s += draw(_sp()) + ";"
    for st_ in stmts:
        s += draw(_sp()) + st_ + draw(_sp()) + ";"
    term = draw(st.sampled_from(["commit", "rollback"]))
    s += draw(_sp()) + draw(_kw(term))
    if draw(st.booleans()):
        s += " " + draw(_kw(draw(st.sampled_from(["transaction", "work"]))))
    if draw(st.booleans()):
        s += draw(_sp()) + ";"
    return s, stmts, term


@settings(max_examples=200, deadline=None)
@given(script())
def test_script_split_roundtrip(case):
    text, stmts, term = case
    got_stmts, got_term = sqldml.parse_script(text)
    # whitespace inside a statement is the renderer's; normalize only at
    # the edges (the splitter must never alter interior text)
    assert [g.strip() for g in got_stmts] == [s.strip() for s in stmts], text
    assert got_term == term, text


@settings(max_examples=60, deadline=None)
@given(script())
def test_script_refusals_are_total(case):
    """Chopping the terminator or injecting a non-DML statement always
    refuses — never a partial parse."""
    text, stmts, term = case
    headless = text[text.index(";") + 1:]
    with pytest.raises(ValueError):
        sqldml.parse_script("BEGIN; " + "SELECT 1; " + headless)
    no_term = text[: text.lower().rindex(term)]
    with pytest.raises(ValueError):
        sqldml.parse_script(no_term)
