"""Write-audit-publish: epochs staged on a zero-copy branch are invisible
to main until adopt(); adopt fast-forwards main to the audited branch
state exactly (content, epoch idempotence, change feed); a failed audit
costs only the branch directory; a moved main refuses the fast-forward."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from maestro_spark import schema as S
from maestro_spark.lake import CommitConflict, LakeTable
from maestro_spark.merge import merge_batch
from maestro_spark.verify import symmetric_diff_empty

TS = dt.datetime(2025, 1, 1, 12)


def _events(spark, rows):
    return spark.createDataFrame(
        [(lsn, op, cid, ti, None, txt, None, TS) for (lsn, op, cid, ti, txt) in rows],
        S.CHANGE_EVENT_SCHEMA,
    )


@pytest.fixture()
def main(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "main"), n_buckets=4)
    merge_batch(t, _events(spark, [
        (1, "insert", "A", 0, "a0"),
        (2, "insert", "B", 0, "b0"),
    ]), "q", 0)
    return t


def test_staged_epochs_invisible_until_adopt(spark, tmp_path, main):
    branch = main.clone(str(tmp_path / "branch"))
    merge_batch(branch, _events(spark, [
        (3, "update", "A", 0, "a0-v2"),
        (4, "insert", "C", 0, "c0"),
        (5, "delete", "B", 0, None),
    ]), "q", 1)
    # audit happens HERE, on the branch; main is untouched
    assert main.read().count() == 2
    assert {r["text"] for r in main.read().collect()} == {"a0", "b0"}
    main.adopt(branch)
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in main.read().collect()}
    assert got == {("A", 0): "a0-v2", ("C", 0): "c0"}
    # adopted state is bit-identical to the branch's
    assert symmetric_diff_empty(main.read(), branch.read())


def test_adopt_carries_epoch_idempotence(spark, tmp_path, main):
    branch = main.clone(str(tmp_path / "branch"))
    ev = [(3, "insert", "C", 0, "c0")]
    merge_batch(branch, _events(spark, ev), "q", 1)
    main.adopt(branch)
    # re-delivering the adopted epoch straight to main is a no-op
    assert merge_batch(main, _events(spark, ev), "q", 1) is None
    assert main.read().filter(F.col("conv_id") == "C").count() == 1


def test_adopt_refuses_moved_main(spark, tmp_path, main):
    branch = main.clone(str(tmp_path / "branch"))
    merge_batch(branch, _events(spark, [(3, "insert", "C", 0, "c0")]), "q", 1)
    # main moves while the branch is being audited
    merge_batch(main, _events(spark, [(4, "insert", "D", 0, "d0")]), "q", 9)
    with pytest.raises(CommitConflict, match="re-stage"):
        main.adopt(branch)
    # re-stage from the new tip and publish
    branch2 = main.clone(str(tmp_path / "branch2"))
    merge_batch(branch2, _events(spark, [(3, "insert", "C", 0, "c0")]), "q", 1)
    main.adopt(branch2)
    assert main.read().count() == 4


def test_adopt_multi_epoch_chain_and_feed(spark, tmp_path, main):
    """A branch with several epochs publishes as the same number of commits;
    the change feed over the adopted range equals replaying the branch's
    own feed."""
    pre = main.snapshot().snapshot_id
    branch = main.clone(str(tmp_path / "branch"))
    merge_batch(branch, _events(spark, [(3, "update", "A", 0, "a1")]), "q", 1)
    merge_batch(branch, _events(spark, [(4, "update", "A", 0, "a2")]), "q", 2)
    out = main.adopt(branch)
    feed = main.changes(pre, out.snapshot_id)
    rows = {(r["conv_id"], r["turn_idx"]): (r["text"], r["op"]) for r in feed.collect()}
    assert rows[("A", 0)] == ("a2", "upsert")
    assert [main.snapshot(s).epoch_key for s in main.snapshot_ids()][-2:] == ["q:1", "q:2"]


def test_failed_audit_discards_branch_only(spark, tmp_path, main):
    import shutil

    branch = main.clone(str(tmp_path / "branch"))
    merge_batch(branch, _events(spark, [(3, "insert", "BAD", 0, "poison")]), "q", 1)
    # audit: the quality gate rejects the batch → throw the branch away
    shutil.rmtree(branch.root)
    assert main.read().count() == 2
    assert main.read().filter(F.col("conv_id") == "BAD").count() == 0


def test_transaction_atomicity(spark, main):
    """Multi-statement transaction: both statements land atomically on
    clean exit; an exception inside the block leaves main untouched."""
    from maestro_spark.dml import delete_where, upsert

    with main.transaction() as txn:
        upsert(txn, spark.createDataFrame(
            [("T", 0, "t0")], "conv_id string, turn_idx int, text string"))
        delete_where(txn, F.col("conv_id") == "A")
        # mid-transaction: main still shows the old world
        assert {r["conv_id"] for r in main.read().collect()} == {"A", "B"}
    assert {r["conv_id"] for r in main.read().collect()} == {"B", "T"}

    with pytest.raises(RuntimeError, match="boom"):
        with main.transaction() as txn:
            delete_where(txn, F.col("conv_id") == "B")
            raise RuntimeError("boom")
    # nothing from the failed transaction leaked
    assert {r["conv_id"] for r in main.read().collect()} == {"B", "T"}


def test_ivm_view_converges_across_adopt(spark, tmp_path, main):
    """An incrementally-maintained view refreshed across an adopted branch
    (staged epochs published as normal commits) equals a full recompute."""
    from maestro_spark.ivm import ConvStatsView

    view = ConvStatsView(spark, main, str(tmp_path / "view"))
    view.refresh()
    branch = main.clone(str(tmp_path / "ivmbranch"))
    merge_batch(branch, _events(spark, [
        (3, "insert", "A", 1, "a1"),
        (4, "insert", "C", 0, "c0"),
        (5, "delete", "B", 0, None),
    ]), "q", 1)
    main.adopt(branch)
    view.refresh()
    got = {r["conv_id"]: r["n_turns"] for r in view.read().collect()}
    want = {
        r["conv_id"]: r["n"]
        for r in main.read().groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want and got == {"A": 2, "C": 1}


def test_adopt_resumes_after_midway_crash(spark, tmp_path, main):
    """A crash between adopt's per-epoch commits leaves main holding a
    prefix of the branch; re-running adopt resumes (skipping adopted
    epochs) instead of refusing, and converges to the full branch state —
    exactly-once across the crash."""
    branch = main.clone(str(tmp_path / "branch"))
    merge_batch(branch, _events(spark, [(3, "insert", "C", 0, "c0")]), "q", 1)
    merge_batch(branch, _events(spark, [(4, "insert", "D", 0, "d0")]), "q", 2)

    real = main.commit
    calls = {"n": 0}

    def crashing_commit(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash mid-adopt")
        return real(*a, **kw)

    main.commit = crashing_commit
    with pytest.raises(RuntimeError, match="mid-adopt"):
        main.adopt(branch)
    main.commit = real
    # main holds epoch 1 only; a fresh handle (new process) resumes
    main2 = LakeTable(spark, main.root)
    keys = {main2.snapshot(s).epoch_key for s in main2.snapshot_ids()}
    assert "q:1" in keys and "q:2" not in keys
    main2.adopt(branch)
    keys = [main2.snapshot(s).epoch_key for s in main2.snapshot_ids()]
    assert keys.count("q:1") == 1 and keys.count("q:2") == 1
    assert symmetric_diff_empty(main2.read(), branch.read())


def test_adopt_resumes_across_maintenance_commits(spark, tmp_path, main):
    """r2 advice: a branch containing epoch_key=None commits (compact /
    purge inside a transaction) must crash-resume exactly-once too — resume
    dedupes on the branch identity stamp, not the epoch key."""
    branch = main.clone(str(tmp_path / "branch"))
    merge_batch(branch, _events(spark, [(3, "insert", "C", 0, "c0")]), "q", 1)
    branch.compact()  # epoch_key=None maintenance commit on the branch
    merge_batch(branch, _events(spark, [(4, "insert", "D", 0, "d0")]), "q", 2)

    real = main.commit
    calls = {"n": 0}

    def crashing(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:  # q:1 + the None-key compact landed, then crash
            raise RuntimeError("simulated crash mid-adopt")
        return real(*a, **kw)

    main.commit = crashing
    with pytest.raises(RuntimeError, match="mid-adopt"):
        main.adopt(branch)
    main.commit = real

    main2 = LakeTable(spark, main.root)  # fresh process resumes
    main2.adopt(branch)
    keys = [main2.snapshot(s).epoch_key for s in main2.snapshot_ids()]
    assert keys.count("q:1") == 1 and keys.count("q:2") == 1
    n_compacts = sum(
        1 for s in main2.snapshot_ids()
        if main2.snapshot(s).stats.get("maintenance") == "compact"
        and main2.snapshot(s).stats.get("adopted_branch") is not None
    )
    assert n_compacts == 1  # the None-key commit adopted exactly once
    assert symmetric_diff_empty(main2.read(), branch.read())


def test_cross_table_transaction_atomic(spark, tmp_path, main):
    """r2 verdict #7: a table + its IVM view land atomically. Crash while
    STAGING leaves neither visible; crash BETWEEN the per-table adopts rolls
    forward via resume_transactions — both-or-neither, never a lasting
    half-publish."""
    from maestro_spark.ivm import ConvStatsView
    from maestro_spark.lake import CommitConflict  # noqa: F401

    view = ConvStatsView(spark, main, str(tmp_path / "view"))
    view.refresh()
    base_rows = main.read().count()
    view_rows = view.read().count()

    # clean path: epoch + view refresh land together
    with main.transaction_multi(view.table) as (b, v):
        merge_batch(b, _events(spark, [(10, "insert", "Z", 0, "z0")]), "q", 9)
        ConvStatsView(spark, b, v.root).refresh()
        assert main.read().count() == base_rows  # invisible mid-txn
        assert view.read().count() == view_rows
    assert main.read().filter(F.col("conv_id") == "Z").count() == 1
    assert view.read().filter(F.col("conv_id") == "Z").head()["n_turns"] == 1

    # crash while staging (before the intent): neither table moves
    with pytest.raises(RuntimeError, match="boom"):
        with main.transaction_multi(view.table) as (b, v):
            merge_batch(b, _events(spark, [(11, "insert", "W", 0, "w0")]), "q", 10)
            raise RuntimeError("boom")
    assert main.read().filter(F.col("conv_id") == "W").count() == 0

    # crash BETWEEN adopts (after the intent): roll-forward recovery
    import maestro_spark.lake as lake_mod

    real_adopt = lake_mod.LakeTable.adopt
    calls = {"n": 0}

    def crashing_adopt(self, branch):
        calls["n"] += 1
        if calls["n"] == 2:  # first table adopted, second not yet
            raise RuntimeError("crash mid-txn")
        return real_adopt(self, branch)

    lake_mod.LakeTable.adopt = crashing_adopt
    try:
        with pytest.raises(RuntimeError, match="mid-txn"):
            with main.transaction_multi(view.table) as (b, v):
                merge_batch(b, _events(spark, [(12, "insert", "Y", 0, "y0")]), "q", 11)
                ConvStatsView(spark, b, v.root).refresh()
    finally:
        lake_mod.LakeTable.adopt = real_adopt
    # half-published: base has Y, view does not — converge via resume
    assert main.read().filter(F.col("conv_id") == "Y").count() == 1
    assert main.resume_transactions() == 1
    assert view.read().filter(F.col("conv_id") == "Y").head()["n_turns"] == 1
    assert main.resume_transactions() == 0  # idempotent
