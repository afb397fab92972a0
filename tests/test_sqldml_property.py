"""Property tests for the SQL write-statement grammar (sqldml).

The parser's job is pure text → builder-call compilation, so these run at
parse level (no Spark jobs): statements are RENDERED from a known AST —
with hostile expression text (clause keywords inside literals, CASE WHEN,
nested calls, doubled/escaped quotes, commas), randomized keyword case,
and randomized inter-token whitespace — then parsed back, and the
captured builder calls must reproduce the AST exactly. A parse that
truncates a SET list at an in-literal WHERE, splits a MERGE clause at an
in-literal THEN, or swallows a trailing semicolon differently per verb
shows up as a mismatch here long before an oracle would catch it."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from maestro_spark import sqldml

# Expression pool: every entry is hostile in a different way. Text is
# compared VERBATIM after the round trip, so entries must be exact.
EXPRS = [
    "'x where 1=1'",
    "'when matched then boom'",
    "'a''b, c'",
    '"d,q"',
    "upper(trim(substr(text, 1, 2)))",
    "CASE WHEN role = 'user' THEN 'x then y' ELSE text END",
    "concat(text, ' and then some')",
    "coalesce(tool, 'none (really)')",
    "'it\\'s a backslash escape'",
    "1 + 2 * length(text)",
]
PREDICATES = [
    "conv_id = 'A'",
    "turn_idx = 0 AND role = 'user'",
    "text LIKE '%where%'",
    "tool IN ('a,b', 'set x = 1')",
    "CASE WHEN turn_idx > 1 THEN true ELSE false END",
]
COLS = ["text", "tool", "role"]


def _spaces() -> st.SearchStrategy[str]:
    return st.sampled_from([" ", "  ", "\n", "\n  ", "\t"])


def _kw(word: str) -> st.SearchStrategy[str]:
    return st.sampled_from([word.lower(), word.upper(), word.title()])


@st.composite
def update_stmt(draw):
    n = draw(st.integers(1, 3))
    cols = draw(st.permutations(COLS))[:n]
    assigns = {c: draw(st.sampled_from(EXPRS)) for c in cols}
    where = draw(st.none() | st.sampled_from(PREDICATES))
    s = draw(_kw("update")) + draw(_spaces()) + "t" + draw(_spaces())
    s += draw(_kw("set")) + draw(_spaces())
    s += ("," + draw(_spaces())).join(
        f"{c}{draw(_spaces())}={draw(_spaces())}{e}" for c, e in assigns.items()
    )
    if where is not None:
        s += draw(_spaces()) + draw(_kw("where")) + draw(_spaces()) + where
    if draw(st.booleans()):
        s += draw(_spaces()) + ";"
    return s, assigns, where


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(update_stmt())
def test_update_roundtrip(spark, case):
    stmt, assigns, where = case
    captured = {}

    def fake_update_where(table, pred, assign_cols, query_id="x"):
        captured["pred"] = pred
        captured["assigns"] = assign_cols
        return None

    real_expr = sqldml.F.expr
    orig = sqldml.update_where
    sqldml.update_where = fake_update_where
    try:
        sqldml.execute_dml(object(), stmt, name="t")
    finally:
        sqldml.update_where = orig
    got = {c: str(col) for c, col in captured["assigns"].items()}
    want = {c: str(real_expr(e)) for c, e in assigns.items()}
    assert got == want, stmt
    if where is None:
        assert str(captured["pred"]) == str(sqldml.F.lit(True)), stmt
    else:
        assert str(captured["pred"]) == str(real_expr(where)), stmt


@st.composite
def merge_stmt(draw):
    """(statement, expected clause list) — clauses as
    (kind, cond_or_None, action_kind, payload)."""
    clauses = []
    n = draw(st.integers(1, 3))
    kinds = draw(st.permutations(
        ["matched", "not matched", "not matched by source"]))[:n]
    for kind in kinds:
        cond = draw(st.none() | st.sampled_from(PREDICATES))
        if kind == "not matched":
            if draw(st.booleans()):
                clauses.append((kind, cond, "insert_star", None))
            else:
                cols = draw(st.permutations(COLS))[:2]
                vals = [draw(st.sampled_from(EXPRS)) for _ in cols]
                clauses.append((kind, cond, "insert_values",
                                (list(cols), vals)))
        else:
            if draw(st.booleans()):
                clauses.append((kind, cond, "delete", None))
            else:
                cols = draw(st.permutations(COLS))[:draw(st.integers(1, 2))]
                clauses.append((kind, cond, "update",
                                {c: draw(st.sampled_from(EXPRS)) for c in cols}))
    s = (draw(_kw("merge")) + " " + draw(_kw("into")) + draw(_spaces()) + "t"
         + draw(_spaces()) + draw(_kw("using")) + draw(_spaces()))
    if draw(st.booleans()):
        s += "src"
    else:
        s += "(SELECT conv_id, turn_idx, upper(trim(text)) AS text FROM src)"
    if draw(st.booleans()):
        s += draw(_spaces()) + draw(_kw("as")) + " s"
    s += (draw(_spaces()) + draw(_kw("on")) + draw(_spaces())
          + "t.conv_id = s.conv_id AND s.turn_idx = t.turn_idx")
    for kind, cond, act, payload in clauses:
        s += draw(_spaces()) + draw(_kw("when")) + " " + draw(_kw(kind))
        if cond is not None:
            s += draw(_spaces()) + draw(_kw("and")) + draw(_spaces()) + cond
        s += draw(_spaces()) + draw(_kw("then")) + draw(_spaces())
        if act == "delete":
            s += draw(_kw("delete"))
        elif act == "update":
            s += (draw(_kw("update")) + " " + draw(_kw("set")) + draw(_spaces())
                  + ("," + draw(_spaces())).join(
                      f"{c} = {e}" for c, e in payload.items()))
        elif act == "insert_star":
            s += draw(_kw("insert")) + draw(_spaces()) + "*"
        else:
            cols, vals = payload
            s += (draw(_kw("insert")) + draw(_spaces())
                  + "(" + ", ".join(cols) + ")" + draw(_spaces())
                  + draw(_kw("values")) + draw(_spaces())
                  + "(" + ", ".join(vals) + ")")
    if draw(st.booleans()):
        s += ";"
    return s, clauses


class _RecordingMerge:
    def __init__(self, table, source):
        self.calls = []

    def when_matched_update(self, set, condition=None):
        self.calls.append(("matched", condition, "update", set))

    def when_matched_delete(self, condition=None):
        self.calls.append(("matched", condition, "delete", None))

    def when_not_matched_insert(self, values=None, condition=None):
        if values is None:
            self.calls.append(("not matched", condition, "insert_star", None))
        else:
            self.calls.append(("not matched", condition, "insert_values", values))

    def when_not_matched_by_source_update(self, set, condition=None):
        self.calls.append(("not matched by source", condition, "update", set))

    def when_not_matched_by_source_delete(self, condition=None):
        self.calls.append(("not matched by source", condition, "delete", None))

    def execute(self, query_id="x"):
        return None


class _FakeSpark:
    def table(self, name):
        assert name == "src"
        return "src-df"

    def sql(self, q):
        assert q.lstrip().lower().startswith("select")
        return "subquery-df"


class _FakeTable:
    spark = _FakeSpark()


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(merge_stmt())
def test_merge_roundtrip(spark, case):
    stmt, clauses = case
    recorded = {}
    orig = sqldml.MergeInto

    def factory(table, source):
        b = _RecordingMerge(table, source)
        recorded["b"] = b
        return b

    sqldml.MergeInto = factory
    try:
        sqldml.execute_dml(_FakeTable(), stmt, name="t")
    finally:
        sqldml.MergeInto = orig

    def norm(calls):
        out = []
        for kind, cond, act, payload in calls:
            cond_n = re.sub(r"\s+", " ", cond).strip() if cond else None
            if isinstance(payload, dict):
                payload = {k: re.sub(r"\s+", " ", v).strip()
                           for k, v in payload.items()}
            elif isinstance(payload, tuple):
                payload = dict(zip(payload[0], payload[1]))
            out.append((kind, cond_n, act.replace("insert_values", "insert_values"),
                        payload))
        return out

    assert norm(recorded["b"].calls) == norm(clauses), stmt


def test_update_literal_where_never_truncates_exhaustive(spark):
    """Non-random spot matrix: every EXPRS entry as the last assignment,
    with and without a real WHERE — the split point must never land
    inside the literal."""
    for e in EXPRS:
        for where in (None, "conv_id = 'A'"):
            stmt = f"UPDATE t SET text = {e}"
            if where:
                stmt += f" WHERE {where}"
            captured = {}
            orig = sqldml.update_where
            sqldml.update_where = (
                lambda table, pred, assigns, query_id="x":
                captured.update(pred=pred, assigns=assigns)
            )
            try:
                sqldml.execute_dml(object(), stmt, name="t")
            finally:
                sqldml.update_where = orig
            assert str(captured["assigns"]["text"]) == str(sqldml.F.expr(e)), stmt
            if where:
                assert str(captured["pred"]) == str(sqldml.F.expr(where)), stmt
