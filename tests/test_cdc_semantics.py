"""Named required CDC cases (BASELINE.json:6, FIXTURES.md A4) + schema
evolution (SURVEY §5.4). These are the adversarial semantics the north rule
calls out explicitly: LSN order — not arrival order — decides."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from maestro_spark import schema as S
from maestro_spark.lake import LakeTable
from maestro_spark.merge import merge_batch

TS = dt.datetime(2025, 1, 1)


def _events(spark, rows, evolved=False):
    """rows: (op_lsn, op, conv_id, turn_idx, text) or +(tool_calls, metadata)."""
    base = [
        (lsn, op, cid, ti, None, txt, None, TS) for (lsn, op, cid, ti, txt) in rows
    ] if not evolved else [
        (lsn, op, cid, ti, None, txt, None, TS, tc, md)
        for (lsn, op, cid, ti, txt, tc, md) in rows
    ]
    schema = S.CHANGE_EVENT_SCHEMA_V2 if evolved else S.CHANGE_EVENT_SCHEMA
    return spark.createDataFrame(base, schema)


def _state(table):
    return {
        (r.conv_id, r.turn_idx): r.text
        for r in table.read().select("conv_id", "turn_idx", "text").collect()
    }


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)


def test_out_of_order_delete_across_epochs(spark, table):
    # delete (LSN 9) arrives in epoch 0; its insert (LSN 5) arrives in epoch 1
    merge_batch(table, _events(spark, [(9, "delete", "c1", 0, None)]), "q", 0)
    merge_batch(table, _events(spark, [(5, "insert", "c1", 0, "hello")]), "q", 1)
    assert _state(table) == {}  # delete wins: higher LSN, regardless of arrival


def test_stale_resurrect_rejected_same_epoch(spark, table):
    merge_batch(
        table,
        _events(spark, [(9, "delete", "c1", 0, None), (5, "insert", "c1", 0, "x")]),
        "q",
        0,
    )
    assert _state(table) == {}


def test_duplicate_delivery_three_times(spark, table):
    ev = [(1, "insert", "c1", 0, "a"), (2, "insert", "c1", 1, "b")]
    merge_batch(table, _events(spark, ev * 3), "q", 0)  # 3x within an epoch
    merge_batch(table, _events(spark, ev), "q", 1)  # and again next epoch
    assert _state(table) == {("c1", 0): "a", ("c1", 1): "b"}
    # re-delivery of a whole epoch id is a no-op
    assert merge_batch(table, _events(spark, ev), "q", 1) is None


def test_update_chain_shuffled_arrival(spark, table):
    chain = [(lsn, "update" if lsn > 1 else "insert", "c9", 3, f"rev{lsn}") for lsn in
             [4, 1, 7, 3, 6, 2, 5]]  # arrival-shuffled
    merge_batch(table, _events(spark, chain[:4]), "q", 0)
    merge_batch(table, _events(spark, chain[4:]), "q", 1)
    assert _state(table) == {("c9", 3): "rev7"}


def test_delete_then_higher_lsn_insert_recreates(spark, table):
    merge_batch(table, _events(spark, [(5, "insert", "c1", 0, "v1")]), "q", 0)
    merge_batch(table, _events(spark, [(6, "delete", "c1", 0, None)]), "q", 1)
    assert _state(table) == {}
    merge_batch(table, _events(spark, [(7, "insert", "c1", 0, "v2")]), "q", 2)
    assert _state(table) == {("c1", 0): "v2"}  # higher-LSN insert recreates


def test_crash_between_data_write_and_commit(spark, table):
    """FIXTURES A4.6: data files written, snapshot publish crashed → restart
    re-applies the epoch; no duplicates, no loss; vacuum clears orphans."""
    ev = _events(spark, [(1, "insert", "c1", 0, "a"), (2, "insert", "c2", 0, "b")])
    # simulate the half-committed write: data files land with final names but
    # no snapshot references them
    from maestro_spark.lake import bucket_expr

    staged = ev.withColumn("pk_bucket", bucket_expr("conv_id", 4)).withColumn(
        S.LSN_COL, F.col("op_lsn")
    ).withColumn(S.DELETED_COL, F.col("op") == "delete").drop("op", "op_lsn")
    table.write_bucket_files(staged)  # crash here: no commit happened
    assert table.read().count() == 0  # invisible
    orphans = table.orphan_files()
    assert len(orphans) > 0

    # restart: the epoch is re-delivered and applies exactly once
    merge_batch(table, ev, "q", 0)
    assert _state(table) == {("c1", 0): "a", ("c2", 0): "b"}
    table.vacuum()
    assert table.orphan_files() == []
    assert _state(table) == {("c1", 0): "a", ("c2", 0): "b"}


def test_schema_evolution_added_columns(spark, table):
    # epoch 0: base schema
    merge_batch(table, _events(spark, [(1, "insert", "c1", 0, "old-row")]), "q", 0)
    # epoch 1: events carry tool_calls + metadata (FIXTURES A3)
    ev2 = _events(
        spark,
        [
            (2, "insert", "c1", 1, "new-row", [("search", '{"q": 1}')], {"model": "m1"}),
            (3, "update", "c1", 0, "old-row-v2", None, {"model": "m2"}),
        ],
        evolved=True,
    )
    merge_batch(table, ev2, "q", 1)

    snap = table.snapshot()
    names = [f.name for f in snap.payload_schema().fields]
    assert names == ["conv_id", "turn_idx", "role", "text", "tool", "ts",
                     "tool_calls", "metadata"]
    rows = {(r.conv_id, r.turn_idx): r for r in table.read().collect()}
    assert rows[("c1", 1)].metadata == {"model": "m1"}
    assert rows[("c1", 1)].tool_calls[0].name == "search"
    assert rows[("c1", 0)].text == "old-row-v2"
    assert rows[("c1", 0)].tool_calls is None  # pre-evolution value stays null

    # epoch 2: an OLD-schema producer writes again — must still work
    merge_batch(table, _events(spark, [(4, "insert", "c2", 0, "late-old")]), "q", 2)
    rows = {(r.conv_id, r.turn_idx): r for r in table.read().collect()}
    assert rows[("c2", 0)].metadata is None
    assert rows[("c1", 1)].metadata == {"model": "m1"}  # untouched row survives


def test_incompatible_evolution_rejected(spark, table):
    from pyspark.sql import types as T

    bad = T.StructType(
        [
            T.StructField("op_lsn", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.IntegerType()),  # string -> int: illegal
        ]
    )
    ev = spark.createDataFrame([(1, "insert", "c1", 0, 42)], bad)
    with pytest.raises(TypeError, match="incompatible schema evolution"):
        merge_batch(table, ev, "q", 0)


def test_widening_int_to_long_accepted(spark, table):
    from pyspark.sql import types as T

    merge_batch(table, _events(spark, [(1, "insert", "c1", 0, "a")]), "q", 0)
    widened = T.StructType(
        [
            T.StructField("op_lsn", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.LongType()),  # int -> long: safe widening
            T.StructField("text", T.StringType()),
        ]
    )
    ev = spark.createDataFrame([(2, "insert", "c1", 1, "b")], widened)
    merge_batch(table, ev, "q", 1)
    snap = table.snapshot()
    t = {f.name: f.dataType.simpleString() for f in snap.payload_schema().fields}
    assert t["turn_idx"] == "bigint"
    assert _state(table) == {("c1", 0): "a", ("c1", 1): "b"}


def test_permutation_invariance_seeded(spark, table, tmp_path):
    """Property (SURVEY §5.6): shuffles/duplications of the same logical event
    set converge to the same state."""
    import random

    base = [(lsn, "insert" if lsn % 3 else "delete", f"c{lsn % 5}", lsn % 4, f"t{lsn}")
            for lsn in range(1, 41)]
    rng = random.Random(7)
    states = []
    for trial in range(3):
        t = LakeTable.create(spark, str(tmp_path / f"lake{trial}"), n_buckets=4)
        ev = base[:]
        rng.shuffle(ev)
        ev = ev + rng.sample(ev, 10)  # duplicate re-deliveries
        cut = rng.randrange(5, 35)
        merge_batch(t, _events(spark, ev[:cut]), "q", 0)
        merge_batch(t, _events(spark, ev[cut:]), "q", 1)
        states.append(_state(t))
    assert states[0] == states[1] == states[2]
