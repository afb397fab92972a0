"""Manifest-list metadata layer: per-epoch commit metadata must be O(files
added by that commit) — not O(all live files) — while every read surface
stays byte-identical. At 10^10 events the snapshot chain is thousands of
commits over tens of thousands of buckets; inline file lists would make
each commit write (and each load parse) tens of MB of JSON. These tests pin
the on-disk shape (append = parent's manifest names + one new manifest),
the consolidation cadence (COW/compaction resets the list), legacy inline
compatibility, and manifest GC."""

from __future__ import annotations

import datetime as dt
import json
import os
import time

import pyspark.sql.functions as F

from maestro_spark import schema as S
from maestro_spark.gen import GenConfig, generate, write_log
from maestro_spark.lake import MANIFEST_PREFIX, SNAP_DIR, LakeTable
from maestro_spark.merge import merge_batch
from maestro_spark.replay import replay

TS = dt.datetime(2025, 1, 1, 12)


def _events(spark, rows):
    return spark.createDataFrame(
        [(lsn, op, cid, ti, None, txt, None, TS) for (lsn, op, cid, ti, txt) in rows],
        S.CHANGE_EVENT_SCHEMA,
    )


def _raw_snap(t: LakeTable, sid: int) -> dict:
    with open(os.path.join(t.root, SNAP_DIR, f"s-{sid:013d}.json")) as fh:
        return json.load(fh)


def test_append_commit_metadata_is_o_new_files(spark, tmp_path):
    """Each MOR delta commit persists ONE manifest holding only its own new
    files and a name list; the raw snapshot JSON never inlines the (growing)
    full file list."""
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    for e in range(4):
        merge_batch(t, _events(spark, [
            (10 * e + 1, "insert", f"c{e}", 0, f"t{e}"),
            (10 * e + 2, "insert", f"d{e}", 0, f"u{e}"),
        ]), "q", e)
    tip = t.snapshot()
    # create consolidates {} into 1 manifest; each epoch appends exactly 1
    assert tip.manifest_list is not None and len(tip.manifest_list) == 5
    raw = _raw_snap(t, tip.snapshot_id)
    assert set(raw["files"]) == {"_manifests"}
    # the tip's own manifest holds ONLY the last epoch's files
    last = raw["files"]["_manifests"][-1]
    with open(os.path.join(t.root, SNAP_DIR, last)) as fh:
        own = json.load(fh)
    n_own = sum(len(ps) for ps in own.values())
    n_total = sum(len(ps) for ps in tip.files.values())
    assert 0 < n_own < n_total
    # per-bucket concatenation order == commit order (the _seq contract):
    # a fresh instance (cold cache) resolves to the identical dict
    t2 = LakeTable(spark, t.root)
    assert t2.snapshot().files == tip.files


def test_cow_commit_consolidates_manifest_list(spark, tmp_path):
    """append=False (compaction/COW) resets the manifest list to one
    consolidated manifest — the cadence that bounds list length."""
    spark.conf.set("maestro.compact.maxDeltas", "100")  # no auto-trigger
    try:
        t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=2)
        for e in range(4):
            merge_batch(t, _events(spark, [
                (10 * e + 1, "insert", f"c{e}", 0, f"t{e}"),
            ]), "q", e)
        assert len(t.snapshot().manifest_list) == 5
        snap = t.compact_tiered(min_fold=2)
        assert snap is not None
        assert len(t.snapshot().manifest_list) == 1
        got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()}
        assert got == {(f"c{e}", 0): f"t{e}" for e in range(4)}
    finally:
        spark.conf.set("maestro.compact.maxDeltas", "8")


def test_legacy_inline_snapshot_reads_and_upgrades(spark, tmp_path):
    """A pre-manifest table (inline files in the snapshot JSON) loads as-is
    (manifest_list None), reads identically, and the next commit upgrades
    it in place by consolidating."""
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    merge_batch(t, _events(spark, [
        (1, "insert", "A", 0, "a0"), (2, "insert", "B", 0, "b0"),
    ]), "q", 0)
    tip = t.snapshot()
    before = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()}
    # rewrite the tip to the legacy inline form
    raw = _raw_snap(t, tip.snapshot_id)
    raw["files"] = tip.files
    path = os.path.join(t.root, SNAP_DIR, f"s-{tip.snapshot_id:013d}.json")
    os.unlink(path)
    with open(path, "w") as fh:
        json.dump(raw, fh)
    t2 = LakeTable(spark, t.root)
    legacy = t2.snapshot()
    assert legacy.manifest_list is None and legacy.files == tip.files
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t2.read().collect()}
    assert got == before
    # next append consolidates (legacy parent has no list to extend)
    merge_batch(t2, _events(spark, [(9, "update", "A", 0, "a0v2")]), "q", 1)
    up = t2.snapshot()
    assert up.manifest_list is not None and len(up.manifest_list) == 1
    assert {(r["conv_id"], r["turn_idx"]): r["text"] for r in t2.read().collect()} == {
        ("A", 0): "a0v2", ("B", 0): "b0",
    }


def test_vacuum_gcs_unreferenced_manifests(spark, tmp_path):
    """Manifests referenced only by expired snapshots (or by nobody — CAS
    losers) are removed by vacuum; every retained snapshot's manifests
    survive and reads still work."""
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=2)
    for e in range(5):
        merge_batch(t, _events(spark, [
            (10 * e + 1, "insert", f"c{e}", 0, f"t{e}"),
        ]), "q", e)
    sdir = os.path.join(t.root, SNAP_DIR)
    # a stray CAS-loser manifest nothing references
    stray = os.path.join(sdir, f"{MANIFEST_PREFIX}deadbeefdeadbeef.json")
    with open(stray, "w") as fh:
        json.dump({"0": ["data/pk_bucket=0/ghost.parquet"]}, fh)
    before = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()}
    # expire all but the tip; its manifest list still names every manifest
    # it depends on, so nothing load-bearing may be GC'd
    t.expire_snapshots(keep_last=1)
    # the stray is mtime-fresh: the default grace period protects it (it
    # could be an in-flight commit's manifest) -- grace=0 asserts the caller
    # knows no writer is mid-commit and GCs it
    t.vacuum()
    assert os.path.exists(stray)
    t.vacuum(manifest_grace_seconds=0)
    assert not os.path.exists(stray)
    live = {fn for fn in os.listdir(sdir) if fn.startswith(MANIFEST_PREFIX)}
    assert live == set(t.snapshot().manifest_list)
    t3 = LakeTable(spark, t.root)  # cold cache: must re-read from disk
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t3.read().collect()}
    assert got == before


def test_replayed_log_equality_and_snapshot_json_stays_small(spark, tmp_path):
    """End-to-end on a generated log: replay equality is unchanged by the
    metadata layer, and the tip snapshot JSON stays small even as live
    files accumulate (the raw-bytes assertion that pins the O(new files)
    claim)."""
    log = generate(GenConfig(seed=33, n_convs=40, segment_rows=300))
    write_log(log, str(tmp_path / "log"), segment_rows=300)
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8)
    spark.conf.set("maestro.compact.maxDeltas", "100")  # keep all deltas
    try:
        replay(spark, str(tmp_path / "log"), t, query_id="m")
    finally:
        spark.conf.set("maestro.compact.maxDeltas", "8")
    from maestro_spark.gen import expected_final_state

    got = t.read().orderBy("conv_id", "turn_idx").toPandas()
    exp = expected_final_state(log)
    assert (got["text"].values == exp["text"].values).all()
    tip = t.snapshot()
    raw = _raw_snap(t, tip.snapshot_id)
    # the files FIELD is a short name list, not every live path (the rest
    # of the snapshot JSON — schema, stats — is O(1) per commit anyway);
    # and the per-commit growth is one ~27-byte name vs one epoch's paths
    files_field = len(json.dumps(raw["files"]))
    inline_bytes = len(json.dumps(tip.files))
    assert files_field * 3 < inline_bytes
    per_epoch_inline = inline_bytes / max(1, len(tip.manifest_list) - 1)
    assert len(json.dumps(tip.manifest_list[-1])) + 4 < per_epoch_inline
    # time travel across the manifest chain
    mid = tip.snapshot_id // 2
    assert t.read(snapshot_id=mid).count() > 0
    # lookup (bloom path dormant here — maintenance mode, no compaction)
    cid = got["conv_id"].iloc[0]
    want = got[got["conv_id"] == cid].reset_index(drop=True)
    have = t.lookup(cid).orderBy("turn_idx").toPandas().reset_index(drop=True)
    assert have[["conv_id", "turn_idx", "text"]].equals(
        want[["conv_id", "turn_idx", "text"]]
    )


def test_append_rebase_keeps_o_new_files_shape(spark, tmp_path):
    """A CAS-losing append commit rebases onto the winner and must STILL
    publish in the O(new files) form: winner's manifest list + exactly one
    manifest for the loser's own files (written once, reused across
    rebase attempts) — never a consolidation of the whole table."""
    a = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=2)
    b = LakeTable(spark, a.root)
    merge_batch(a, _events(spark, [(1, "insert", "A", 0, "a0")]), "qa", 0)
    base_list = list(a.snapshot().manifest_list)

    real = a._publish
    fired = {"done": False}

    def hooked(snap, **kwargs):
        if not fired["done"]:
            fired["done"] = True
            merge_batch(b, _events(spark, [(2, "insert", "B", 0, "b0")]), "qb", 0)
        real(snap, **kwargs)

    a._publish = hooked
    try:
        merge_batch(a, _events(spark, [(3, "insert", "C", 0, "c0")]), "qa", 1)
    finally:
        a._publish = real
    tip = a.snapshot()
    winner = a.snapshot(tip.parent_id)
    # winner (b's epoch) extended the base; loser rebased on top of it
    assert winner.manifest_list[: len(base_list)] == base_list
    assert tip.manifest_list[:-1] == winner.manifest_list
    assert len(tip.manifest_list) == len(base_list) + 2
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in a.read().collect()}
    assert got == {("A", 0): "a0", ("B", 0): "b0", ("C", 0): "c0"}


def test_vacuum_grace_protects_in_flight_commit_manifest(spark, tmp_path):
    """r3 advice (medium): an append commit writes its manifest once and
    holds it across the CAS validate/rebase retry loop BEFORE publishing its
    snapshot — a concurrent vacuum must not GC it, or the published snapshot
    references a missing manifest and the table is unreadable. The
    mtime-based grace period (Iceberg orphan-cleanup rule) covers that
    window; backdating the mtime past the grace makes GC proceed."""
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=2)
    merge_batch(t, _events(spark, [(1, "insert", "A", 0, "a0")]), "q", 0)
    sdir = os.path.join(t.root, SNAP_DIR)

    # simulate the in-flight writer: a manifest exists, its snapshot not yet
    inflight = os.path.join(sdir, f"{MANIFEST_PREFIX}aaaaaaaaaaaaaaaa.json")
    with open(inflight, "w") as fh:
        json.dump({"0": ["data/pk_bucket=0/pending.parquet"]}, fh)

    assert t.vacuum() == 0  # default grace: the in-flight manifest survives
    assert os.path.exists(inflight)

    # same manifest long abandoned (CAS loser from an old crash): GC'd
    old = time.time() - 7200
    os.utime(inflight, (old, old))
    t.vacuum()
    assert not os.path.exists(inflight)
