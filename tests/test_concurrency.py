"""Optimistic concurrency: two writers race on the snapshot-id CAS; the
loser must validate the intervening commits and rebase (MOR appends,
disjoint COW), dedupe itself (same epoch_key), or refuse with
CommitConflict (overlapping COW, rebucket, rollback) — never corrupt.

The race is injected at the REAL boundary: writer A's ``_publish`` is
wrapped so writer B commits between A's snapshot read and A's CAS attempt,
which makes A's first hard-link genuinely fail with FileExistsError and
drives the production retry path."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from maestro_spark import schema as S
from maestro_spark.lake import CommitConflict, LakeTable
from maestro_spark.merge import merge_batch

TS = dt.datetime(2025, 1, 1, 12)


def _events(spark, rows):
    """rows: (op_lsn, op, conv_id, turn_idx, text)."""
    return spark.createDataFrame(
        [(lsn, op, cid, ti, None, txt, None, TS) for (lsn, op, cid, ti, txt) in rows],
        S.CHANGE_EVENT_SCHEMA,
    )


def _two_bucket_ids() -> tuple[str, str]:
    """Two conv_ids guaranteed to land in different buckets (n_buckets=4)."""
    from maestro_spark.keyhash import bucket_of

    first = "A"
    for i in range(100):
        cand = f"K{i}"
        if bucket_of(cand, 4) != bucket_of(first, 4):
            return first, cand
    raise AssertionError("unreachable")


@pytest.fixture()
def pair(spark, tmp_path):
    """Two independent handles on one table, seeded with two conversations
    landing in different buckets."""
    ka, kb = _two_bucket_ids()
    root = str(tmp_path / "lake")
    a = LakeTable.create(spark, root, n_buckets=4)
    merge_batch(a, _events(spark, [
        (1, "insert", ka, 0, "a0"),
        (2, "insert", kb, 0, "b0"),
    ]), "seed", 0)
    b = LakeTable(spark, root)
    return a, b


def _race(a, b_action):
    """Arm handle ``a`` so its next publish attempt happens AFTER
    ``b_action()`` has committed — the classic read-plan-publish race."""
    real = a._publish
    state = {"fired": False}

    def hooked(snap, **kwargs):
        if not state["fired"]:
            state["fired"] = True
            b_action()
        real(snap, **kwargs)

    a._publish = hooked
    return state


def test_append_race_rebases_and_loses_nothing(spark, pair):
    """Two MOR delta commits race; the loser rebases its append onto the
    winner's snapshot and the table converges to the union of both."""
    a, b = pair
    ka, kb = _two_bucket_ids()
    _race(a, lambda: merge_batch(b, _events(spark, [
        (3, "update", kb, 0, "b1"),
    ]), "qb", 1))
    merge_batch(a, _events(spark, [
        (4, "insert", ka, 1, "a1"),
    ]), "qa", 1)
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in a.read().collect()
    }
    assert got == {(ka, 0): "a0", (ka, 1): "a1", (kb, 0): "b1"}
    # both epochs are in the chain, as separate snapshots
    keys = {a.snapshot(sid).epoch_key for sid in a.snapshot_ids()}
    assert {"qa:1", "qb:1"} <= keys


def test_duplicate_epoch_key_race_is_idempotent(spark, pair):
    """The same epoch delivered by two drivers at once: the loser detects
    its own epoch_key in the gap and becomes a no-op instead of applying
    the batch twice."""
    a, b = pair
    ev = [(5, "insert", "C", 0, "c0")]
    _race(a, lambda: merge_batch(b, _events(spark, ev), "q", 7))
    merge_batch(a, _events(spark, ev), "q", 7)
    chain_keys = [a.snapshot(sid).epoch_key for sid in a.snapshot_ids()]
    assert chain_keys.count("q:7") == 1
    assert a.read().filter(F.col("conv_id") == "C").count() == 1


def test_overlapping_cow_race_conflicts(spark, pair):
    """Copy-on-write replacements of the SAME bucket cannot merge by
    manifest arithmetic — the loser must surface CommitConflict."""
    a, b = pair
    snap = a.snapshot()
    bucket = next(iter(snap.files))
    # B truncates the bucket (a genuinely different file list) while A is
    # mid-flight replacing the same bucket's content
    _race(a, lambda: b.commit({bucket: []}, "cow-b", append=False))
    with pytest.raises(CommitConflict, match="rewrote buckets"):
        a.commit({bucket: snap.files[bucket]}, "cow-a", append=False)


def test_disjoint_cow_race_rebases(spark, pair):
    """COW replacements of DIFFERENT buckets are independent; the loser
    rebases and both replacements land."""
    a, b = pair
    snap = a.snapshot()
    buckets = sorted(snap.files)
    assert len(buckets) >= 2, "seed data must span two buckets"
    b0, b1 = buckets[0], buckets[1]
    _race(a, lambda: b.commit({b0: []}, "cow-b", append=False))
    out = a.commit({b1: snap.files[b1]}, "cow-a", append=False)
    keys = [a.snapshot(sid).epoch_key for sid in a.snapshot_ids()]
    assert "cow-b" in keys and "cow-a" in keys
    # the rebase carried B's truncation forward instead of resurrecting b0
    assert out.files.get(b0, []) == []


def test_rebucket_race_conflicts(spark, pair):
    """A concurrent rebucket invalidates the loser's file layout."""
    a, b = pair
    _race(a, lambda: b.rebucket(8))
    with pytest.raises(CommitConflict, match="rebucket"):
        merge_batch(a, _events(spark, [(9, "insert", "D", 0, "d0")]), "qa", 9)
    # and a re-plan against the new tip succeeds
    merge_batch(a, _events(spark, [(9, "insert", "D", 0, "d0")]), "qa", 9)
    assert a.read().filter(F.col("conv_id") == "D").count() == 1


def test_strict_single_writer_mode_raises_raw(spark, pair):
    """retries=0 keeps the documented single-writer contract: the raw
    FileExistsError surfaces."""
    a, b = pair
    snap = a.snapshot()
    bucket = next(iter(snap.files))
    _race(a, lambda: b.commit({bucket: b.snapshot().files[bucket]}, "w", append=True))
    with pytest.raises(FileExistsError):
        a.commit({bucket: snap.files[bucket]}, "l", append=True, retries=0)


def test_three_writer_soak_converges(spark, tmp_path):
    """Nine interleaved epochs from three handles, every one racing the
    others at the publish point: the table must converge to the same state
    a sequential application produces, with all nine epoch keys committed."""
    root = str(tmp_path / "soak")
    w = [LakeTable.create(spark, root, n_buckets=4)]
    w += [LakeTable(spark, root), LakeTable(spark, root)]
    batches = []  # (writer, qid, epoch, rows)
    for e in range(3):
        for i in range(3):
            rows = [
                (e * 100 + i * 10 + k, "insert" if (e + k) % 3 else "update",
                 f"c{(i * 7 + k) % 9}", k, f"w{i}e{e}k{k}")
                for k in range(5)
            ]
            batches.append((i, f"w{i}", e, rows))
    # interleave: each writer's merge races the NEXT batch's writer
    for j, (i, qid, e, rows) in enumerate(batches):
        nxt = batches[(j + 1) % len(batches)]
        if nxt is not batches[j]:
            ni, nqid, ne, nrows = nxt
            if (nqid, ne) != (qid, e):
                _race(w[i], lambda ni=ni, nqid=nqid, ne=ne, nrows=nrows:
                      merge_batch(w[ni], _events(spark, nrows), nqid, ne))
        merge_batch(w[i], _events(spark, rows), qid, e)
    keys = {w[0].snapshot(s).epoch_key for s in w[0].snapshot_ids()}
    assert {f"w{i}:{e}" for i in range(3) for e in range(3)} <= keys
    # convergence: rebuild sequentially in a fresh table and compare
    ref = LakeTable.create(spark, str(tmp_path / "ref"), n_buckets=4)
    for i, qid, e, rows in batches:
        merge_batch(ref, _events(spark, rows), qid, e)
    a = w[0].read().orderBy("conv_id", "turn_idx").toPandas()
    b = ref.read().orderBy("conv_id", "turn_idx").toPandas()
    assert a.equals(b)


def test_epoch_survives_compaction_commit_race(spark, tmp_path):
    """Auto-compaction losing its commit race must not fail the epoch: the
    merge's own commit already landed, and maintenance re-triggers later."""
    root = str(tmp_path / "cr")
    a = LakeTable.create(spark, root, n_buckets=2)
    b = LakeTable(spark, root)
    spark.conf.set("maestro.compact.maxDeltas", "2")
    try:
        for e in range(3):  # enough deltas to trigger auto-compaction
            merge_batch(a, _events(spark, [(e + 1, "insert", "A", e, f"t{e}")]), "q", e)
        # next epoch triggers compaction; inject a COW race against it:
        # every publish attempt by `a` (epoch commit AND compaction) is
        # preceded by b truncating... that would conflict the epoch too.
        # Instead hook compact specifically.
        real_compact = a.compact_tiered  # the default auto-trigger policy

        def racing_compact(buckets=None, **kw):
            bkt = str(buckets[0]) if buckets else next(iter(a.snapshot().files))
            b.commit({bkt: []}, f"race-{bkt}", append=False)
            return real_compact(buckets, **kw)

        a.compact_tiered = racing_compact
        snap = merge_batch(a, _events(spark, [(9, "insert", "A", 9, "t9")]), "q", 9)
        assert snap is not None  # the epoch committed despite the lost race
        assert "q:9" in {a.snapshot(s).epoch_key for s in a.snapshot_ids()}
    finally:
        spark.conf.set("maestro.compact.maxDeltas", "8")


def test_pinned_reader_isolated_from_concurrent_writes(spark, pair):
    """Snapshot isolation: a DataFrame planned against a pinned snapshot
    returns identical rows before and after another handle commits epochs
    and compacts — committed data files are immutable and compaction never
    deletes them (only vacuum after expiry does)."""
    a, b = pair
    sid = a.snapshot().snapshot_id
    pinned = a.read(snapshot_id=sid)
    before = pinned.orderBy("conv_id", "turn_idx").toPandas()
    for e in range(1, 4):
        merge_batch(b, _events(spark, [
            (10 * e, "update", "A", 0, f"v{e}"),
            (10 * e + 1, "insert", f"N{e}", 0, f"n{e}"),
        ]), "w", e)
    b.compact()
    again = pinned.orderBy("conv_id", "turn_idx").toPandas()
    assert again.equals(before)
    # while the live read moved on
    live = a.read().orderBy("conv_id", "turn_idx").toPandas()
    assert len(live) == len(before) + 3
    assert live[live["conv_id"] == "A"].iloc[0]["text"] == "v3"


def test_planning_window_delta_not_dropped(spark, pair):
    """r2 advice (high): a MOR delta committed between a rewrite job's
    PLANNING read and its commit() call must conflict, not vanish. The CAS
    alone can't catch this — commit() reads the tip at entry, so its first
    hard-link succeeds; only the caller-supplied ``base`` exposes the gap."""
    a, b = pair
    ka, _ = _two_bucket_ids()
    from maestro_spark.keyhash import bucket_of

    bucket = str(bucket_of(ka, 4))
    snap = a.snapshot()  # a's planning read
    # delta lands AFTER a planned, BEFORE a enters commit(): previously a
    # silent lost update, now a validated conflict
    merge_batch(b, _events(spark, [(10, "update", ka, 0, "late-delta")]), "qb", 1)
    with pytest.raises(CommitConflict, match="rewrote buckets"):
        a.commit({bucket: snap.files[bucket]}, "cow-a", append=False,
                 base=snap.snapshot_id)
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in a.read().collect()}
    assert got[(ka, 0)] == "late-delta"  # the racing delta survived


def test_compact_racing_delta_conflicts_then_replans(spark, pair):
    """compact() plans from a snapshot, runs a long rewrite job, commits;
    a delta landing mid-job must surface CommitConflict (compact passes its
    planning snapshot as base) and a re-planned compact preserves it."""
    a, b = pair
    ka, _ = _two_bucket_ids()
    real = a.write_bucket_files

    def hooked(df, **kw):
        out = real(df, **kw)  # the compaction job runs on pre-delta state
        merge_batch(b, _events(spark, [(11, "update", ka, 0, "mid-job")]), "qb", 2)
        return out

    a.write_bucket_files = hooked
    with pytest.raises(CommitConflict):
        a.compact()
    a.write_bucket_files = real
    snap = a.compact()  # re-plan from the new tip succeeds
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in a.read().collect()}
    assert got[(ka, 0)] == "mid-job"
    assert snap.stats.get("maintenance") == "compact"


def test_lsn_fence_validated_before_first_publish(spark, pair):
    """The DML LSN fence must fire even when the racing commit lands before
    commit() entry (no CAS failure): the (base, tip] gap is validated for
    an LSN at/above the statement's fence."""
    a, b = pair
    _, kb = _two_bucket_ids()
    base = a.snapshot().snapshot_id  # statement acquired LSN 3 here
    merge_batch(b, _events(spark, [(3, "update", kb, 0, "racer")]), "qb", 3)
    with pytest.raises(CommitConflict, match="LSN"):
        a.commit({}, "stmt", append=True, base=base, check_lsn=3)


def test_rebucket_racing_delta_conflicts_cleanly(spark, pair):
    """rebucket publishes at its PLANNED parent+1 id, so a delta landing
    mid-job steals the id and the publish must surface CommitConflict (not
    a raw FileExistsError) with the delta intact; a re-plan succeeds."""
    a, b = pair
    ka, _ = _two_bucket_ids()
    real = a.write_bucket_files

    def hooked(df, **kw):
        out = real(df, **kw)
        merge_batch(b, _events(spark, [(12, "update", ka, 0, "mid-rb")]), "qb", 5)
        return out

    a.write_bucket_files = hooked
    with pytest.raises(CommitConflict, match="rebucket"):
        a.rebucket(8)
    a.write_bucket_files = real
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in a.read().collect()}
    assert got[(ka, 0)] == "mid-rb"  # the racing delta survived
    snap = a.rebucket(8)
    assert snap.n_buckets == 8
    assert a.read().filter(
        (F.col("conv_id") == ka) & (F.col("turn_idx") == 0)
    ).head()["text"] == "mid-rb"


def test_rollback_racing_commit_conflicts_cleanly(spark, pair):
    """rollback also publishes at its planned parent+1 id: a racing commit
    must surface CommitConflict (operator re-decides), never a raw
    FileExistsError or a silent overwrite of the racer."""
    a, b = pair
    _, kb = _two_bucket_ids()
    target = a.snapshot().snapshot_id
    merge_batch(a, _events(spark, [(20, "insert", "R", 0, "r0")]), "qa", 8)
    _race(a, lambda: merge_batch(b, _events(spark, [
        (21, "update", kb, 0, "race"),
    ]), "qb", 9))
    with pytest.raises(CommitConflict, match="rollback"):
        a.rollback(target)
    # racer intact; a re-issued rollback from the new tip succeeds
    assert a.read().filter(F.col("text") == "race").count() == 1
    a.rollback(target)
    assert a.read().filter(F.col("conv_id") == "R").count() == 0
