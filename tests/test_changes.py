"""Incremental change feed (LakeTable.changes) — consumer contract tests.

The contract: applying the feed for (k, n] on top of snapshot k reproduces
snapshot n exactly, tombstones included (VERDICT r1 item 4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from maestro_spark.gen import GenConfig, generate, write_log
from maestro_spark.lake import LakeTable
from maestro_spark.replay import replay
from maestro_spark.schema import DELETED_COL, LSN_COL


def _resolved_pdf(table: LakeTable, sid=None) -> pd.DataFrame:
    cols = ["conv_id", "turn_idx", "text", "role", "tool", LSN_COL, DELETED_COL]
    return (
        table.read_resolved(snapshot_id=sid)
        .select(*cols)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )


def _feed_as_events(feed):
    return feed.select(
        F.col("lsn").alias("op_lsn"),
        F.when(F.col("op") == "delete", F.lit("delete")).otherwise(F.lit("insert")).alias("op"),
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    )


def _build(spark, tmp_path, seed=31, n_convs=50, segment_rows=250):
    log = generate(GenConfig(seed=seed, n_convs=n_convs, segment_rows=segment_rows))
    write_log(log, str(tmp_path / "log"), segment_rows=segment_rows)
    table = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8)
    replay(spark, str(tmp_path / "log"), table, query_id="cf")
    return table


def test_changes_from_zero_equal_resolved_state(spark, tmp_path):
    # (0, latest] over a fresh table == the entire resolved state incl.
    # tombstones: every key's current winner appeared in exactly one epoch
    table = _build(spark, tmp_path)
    feed = table.changes(0).toPandas().sort_values(
        ["conv_id", "turn_idx"], kind="stable"
    ).reset_index(drop=True)
    state = _resolved_pdf(table)
    assert len(feed) == len(state)
    assert (feed["conv_id"].values == state["conv_id"].values).all()
    assert (feed["lsn"].values == state[LSN_COL].values).all()
    assert ((feed["op"].values == "delete") == state[DELETED_COL].values).all()
    pd.testing.assert_series_equal(
        feed["text"], state["text"], check_names=False
    )
    assert (feed["op"].values == "delete").any()  # tombstones ride along


def test_changes_apply_reconverges_to_target_snapshot(spark, tmp_path):
    # replaying the feed of epochs (k, n] onto snapshot k reproduces n
    table = _build(spark, tmp_path)
    sids = table.snapshot_ids()
    k = sids[len(sids) // 2]
    n = sids[-1]
    feed = table.changes(k, n)

    # rebuild: fresh table seeded with snapshot k's resolved rows (as events
    # at their recorded LSN, tombstones as deletes), then one feed epoch
    twin = LakeTable.create(spark, str(tmp_path / "twin"), n_buckets=8)
    base = table.read_resolved(snapshot_id=k).select(
        F.col(LSN_COL).alias("op_lsn"),
        F.when(F.col(DELETED_COL), F.lit("delete")).otherwise(F.lit("insert")).alias("op"),
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    )
    from maestro_spark.merge import merge_batch

    merge_batch(twin, base, query_id="seed", epoch_id=0)
    merge_batch(twin, _feed_as_events(feed), query_id="apply", epoch_id=1)

    got = _resolved_pdf(twin)
    want = _resolved_pdf(table, sid=n)
    pd.testing.assert_frame_equal(got, want)


def test_changes_empty_and_bad_range(spark, tmp_path):
    table = _build(spark, tmp_path, seed=5, n_convs=10, segment_rows=10_000)
    latest = table.snapshot().snapshot_id
    assert table.changes(latest, latest).count() == 0
    import pytest

    with pytest.raises(ValueError):
        table.changes(latest, latest - 1)


def test_changes_across_schema_evolution(spark, tmp_path):
    # feed spanning an evolution boundary: pre-evolution winners surface with
    # the evolved columns null-filled, post-evolution winners carry values
    log = generate(GenConfig(seed=61, n_convs=40, evolution_at=0.5, segment_rows=200))
    write_log(log, str(tmp_path / "log"), segment_rows=200)
    table = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    replay(spark, str(tmp_path / "log"), table, query_id="evo")
    feed = table.changes(0)
    assert "tool_calls" in feed.columns and "metadata" in feed.columns
    n_with = feed.filter(F.col("tool_calls").isNotNull()).count()
    n_without = feed.filter(F.col("tool_calls").isNull()).count()
    assert n_with > 0 and n_without > 0
    # and the feed still covers exactly the resolved key set
    assert feed.count() == table.read_resolved().count()


def test_changes_skip_compaction_snapshots(spark, tmp_path):
    # force a compaction inside the range; the feed must not re-state the
    # whole table through the maintenance snapshot's rewritten files
    table = _build(spark, tmp_path, seed=8, n_convs=30, segment_rows=150)
    pre = table.snapshot().snapshot_id
    table.compact()
    assert table.snapshot().snapshot_id == pre + 1
    assert table.changes(pre).count() == 0  # only the compaction in range
    # and the full-range feed is still exactly the resolved state
    feed = table.changes(0)
    assert feed.count() == len(_resolved_pdf(table))


# ------------------------------------------------- all-changes feed + SCD2
def test_all_changes_and_scd2_contract(spark, tmp_path):
    """collapse=False emits every retained (key, lsn) version exactly once
    (COW re-statements deduped); scd2 chains them into [from, to) LSN
    intervals with exactly one open current version per live key."""
    import datetime as dt

    from maestro_spark import schema as S
    from maestro_spark.dml import update_where
    from maestro_spark.merge import merge_batch

    TS = dt.datetime(2025, 1, 1, 12)
    t = LakeTable.create(spark, str(tmp_path / "lk2"), n_buckets=4)
    merge_batch(t, spark.createDataFrame(
        [(1, "insert", "A", 0, "user", "a0", None, TS),
         (2, "insert", "B", 0, "user", "b0", None, TS)],
        S.CHANGE_EVENT_SCHEMA), "q", 0)
    merge_batch(t, spark.createDataFrame(
        [(3, "update", "A", 0, "user", "a0v2", None, TS),
         (4, "delete", "B", 0, None, None, None, TS)],
        S.CHANGE_EVENT_SCHEMA), "q", 1)
    # a COW statement re-states rows at their current LSN (update_where
    # touches nothing here: false predicate -> no-op; use a real one)
    update_where(t, F.col("conv_id") == "A", {"text": F.lit("a0v3")})

    allc = t.changes(0, collapse=False)
    got = {(r["conv_id"], r["lsn"]): (r["op"], r["text"], r["snapshot_id"])
           for r in allc.collect()}
    assert len(got) == allc.count()  # (key, lsn) unique after dedup
    assert got[("A", 1)][:2] == ("upsert", "a0")
    assert got[("A", 3)][:2] == ("upsert", "a0v2")
    assert got[("B", 4)][0] == "delete"
    a_final_lsn = max(l for (c, l) in got if c == "A")
    assert got[("A", a_final_lsn)][1] == "a0v3"

    hist = t.scd2().collect()
    by_key = {}
    for r in hist:
        by_key.setdefault((r["conv_id"], r["turn_idx"]), []).append(r)
    a = sorted(by_key[("A", 0)], key=lambda r: r["valid_from_lsn"])
    # intervals chain: each version's valid_to is the next's valid_from
    for prev, nxt in zip(a, a[1:]):
        assert prev["valid_to_lsn"] == nxt["valid_from_lsn"]
    assert [r["is_current"] for r in a] == [False] * (len(a) - 1) + [True]
    b = sorted(by_key[("B", 0)], key=lambda r: r["valid_from_lsn"])
    assert [r["op"] for r in b] == ["upsert", "delete"]
    assert all(not r["is_current"] for r in b)  # deleted key: nothing current
    # exactly one current version per live key, none for deleted keys
    cur = [r for r in hist if r["is_current"]]
    assert {(r["conv_id"], r["turn_idx"]) for r in cur} == {("A", 0)}
    assert cur[0]["text"] == "a0v3"


def test_read_asof_lsn_reconstructs_source_states(spark, tmp_path):
    """read_asof_lsn(L) = live rows once the source had applied op_lsn<=L —
    including mid-epoch positions no snapshot boundary ever published."""
    import datetime as dt

    from maestro_spark import schema as S
    from maestro_spark.merge import merge_batch

    TS = dt.datetime(2025, 1, 1, 12)
    t = LakeTable.create(spark, str(tmp_path / "lk3"), n_buckets=4)
    merge_batch(t, spark.createDataFrame(
        [(1, "insert", "A", 0, "user", "a0", None, TS),
         (2, "insert", "B", 0, "user", "b0", None, TS)],
        S.CHANGE_EVENT_SCHEMA), "q", 0)
    merge_batch(t, spark.createDataFrame(
        [(5, "update", "A", 0, "user", "a1", None, TS),
         (7, "delete", "B", 0, None, None, None, TS)],
        S.CHANGE_EVENT_SCHEMA), "q", 1)

    def state(lsn):
        return {(r["conv_id"]): r["text"]
                for r in t.read_asof_lsn(lsn).collect()}

    assert state(0) == {}
    assert state(1) == {"A": "a0"}
    assert state(2) == {"A": "a0", "B": "b0"}
    # LSN 6: A already updated (5), B's delete (7) not yet applied — a
    # state that exists between the second epoch's two changes, never as
    # a published snapshot
    assert state(6) == {"A": "a1", "B": "b0"}
    assert state(7) == {"A": "a1"}
    assert state(10**9) == {(r["conv_id"]): r["text"]
                            for r in t.read().collect()}
