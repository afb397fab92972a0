"""CHECK constraints (M42): write-side gates enforced in the merge path —
violating events dead-letter as constraint:<name> (SQL NULL-passes
semantics, absent-column tolerance); ADD CONSTRAINT validates current
data first; the DLQ repair flow is unchanged."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from maestro_spark import schema as S
from maestro_spark.dml import update_where, upsert
from maestro_spark.lake import LakeTable
from maestro_spark.merge import merge_batch, read_quarantine

TS = dt.datetime(2025, 1, 1, 12)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    merge_batch(t, spark.createDataFrame(
        [(5, "insert", "A", 0, "user", "a0", None, TS),
         (6, "insert", "A", 1, "assistant", "a1", None, TS),
         (7, "insert", "B", 0, "user", "b0", None, TS)],
        S.CHANGE_EVENT_SCHEMA), "seed", 0)
    return t


def test_constraint_gates_merge_and_dlq_carries_reason(spark, table):
    table.add_constraint("role_known", "role in ('user', 'assistant')")
    snap = merge_batch(table, spark.createDataFrame(
        [(10, "insert", "C", 0, "robot", "bad-role", None, TS),   # violates
         (11, "insert", "C", 1, "user", "fine", None, TS),        # passes
         (12, "insert", "C", 2, None, "null-passes", None, TS),   # NULL ok
         (13, "delete", "A", 1, None, None, None, TS)],           # deletes skip
        S.CHANGE_EVENT_SCHEMA), "q", 1)
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in table.read().collect()}
    assert ("C", 0) not in got                       # gated out
    assert got[("C", 1)] == "fine"
    assert got[("C", 2)] == "null-passes"            # NULL passes (SQL CHECK)
    assert ("A", 1) not in got                       # delete applied
    dlq = read_quarantine(table, "q").collect()
    assert [(r["conv_id"], r["_reason"]) for r in dlq] == \
        [("C", "constraint:role_known")]
    assert snap.stats["invalid_events"] == 1


def test_add_constraint_validates_current_data_and_compiles(spark, table):
    with pytest.raises(ValueError, match="violated by current data"):
        table.add_constraint("too_strict", "role = 'user'")  # a1 is assistant
    with pytest.raises(Exception):
        table.add_constraint("no_parse", "this is ]( not sql")
    table.add_constraint("text_nonempty", "length(text) > 0")
    with pytest.raises(ValueError, match="exists"):
        table.add_constraint("text_nonempty", "true")
    assert set(table.constraints()) == {"text_nonempty"}


def test_constraint_skips_absent_columns_and_gates_dml(spark, table):
    table.add_constraint("tool_prefix", "tool like 'tool-%'")
    # a narrow DML batch WITHOUT the tool column: constraint is unknown ->
    # passes (schema-evolving upstreams must not wedge)
    upsert(table, spark.createDataFrame(
        [("D", 0, "narrow")], "conv_id string, turn_idx int, text string"))
    assert table.read().filter(F.col("conv_id") == "D").count() == 1
    # a DML statement that DOES carry the column is gated
    update_where(table, F.col("conv_id") == "B", {"tool": F.lit("nope")},
                 query_id="dml-bad")
    assert table.read().filter(
        F.col("conv_id") == "B").head()["tool"] is None  # unchanged
    dlq = read_quarantine(table, "dml-bad").collect()
    assert [r["_reason"] for r in dlq] == ["constraint:tool_prefix"]
    # drop re-admits
    assert table.drop_constraint("tool_prefix")
    update_where(table, F.col("conv_id") == "B", {"tool": F.lit("nope")})
    assert table.read().filter(F.col("conv_id") == "B").head()["tool"] == "nope"


def test_constraint_cli(spark, table, capsys, monkeypatch):
    from maestro_spark.__main__ import main as cli

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rc = cli(["constraint", "--table", table.root,
              "--name", "turn_nonneg", "--expr", "turn_idx >= 0"])
    assert rc in (0, None)
    out = capsys.readouterr().out
    assert '"added": "turn_nonneg"' in out
    rc = cli(["constraint", "--table", table.root, "--drop", "turn_nonneg"])
    assert rc in (0, None) and '"dropped": true' in capsys.readouterr().out


def test_constraint_literal_word_is_not_a_column_reference(spark, table):
    """r4 ADVICE: a table-column name appearing INSIDE a string literal
    (role IN ('user','tool') on a table with a tool column) must not make
    the constraint skip batches that lack that column — the reference set
    is computed outside literals, so the gate stays armed."""
    table.add_constraint("role_known", "role in ('user', 'assistant', 'tool')")
    # batch carries role but NOT tool: the constraint must still gate
    merge_batch(table, spark.createDataFrame(
        [(20, "insert", "E", 0, "nonsense-role", "e0")],
        "op_lsn long, op string, conv_id string, turn_idx int, "
        "role string, text string"), "lit", 1)
    assert table.read().filter(F.col("conv_id") == "E").count() == 0
    dlq = read_quarantine(table, "lit").collect()
    assert [r["_reason"] for r in dlq] == ["constraint:role_known"]
    # and a batch with a VALID role still merges
    merge_batch(table, spark.createDataFrame(
        [(21, "insert", "F", 0, "user", "f0")],
        "op_lsn long, op string, conv_id string, turn_idx int, "
        "role string, text string"), "lit", 2)
    assert table.read().filter(F.col("conv_id") == "F").count() == 1
