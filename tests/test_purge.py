"""Right-to-be-forgotten purge: content physically erased from live files
(only the key's bucket rewritten), payload-nulled tombstones keep late
re-deliveries rejected and propagate op='delete' through the change feed,
and after expire+vacuum NO surviving file under the table root contains
the purged text."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from maestro_spark import schema as S
from maestro_spark.keyhash import bucket_of
from maestro_spark.lake import LakeTable
from maestro_spark.merge import merge_batch

TS = dt.datetime(2025, 1, 1, 12)
SECRET = "SECRET-PAYLOAD-q7x"


def _events(spark, rows):
    return spark.createDataFrame(
        [(lsn, op, cid, ti, None, txt, None, TS) for (lsn, op, cid, ti, txt) in rows],
        S.CHANGE_EVENT_SCHEMA,
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    merge_batch(t, _events(spark, [
        (1, "insert", "P", 0, SECRET + "-0"),
        (2, "insert", "P", 1, SECRET + "-1"),
        (3, "insert", "Q", 0, "keep-q0"),
    ]), "q", 0)
    # second epoch: P updated (two delta versions of turn 0 now on disk)
    merge_batch(t, _events(spark, [
        (4, "update", "P", 0, SECRET + "-0v2"),
        (5, "insert", "R", 0, "keep-r0"),
    ]), "q", 1)
    return t


def test_purge_removes_key_keeps_others(table):
    before = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.read().collect()
        if r["conv_id"] != "P"
    }
    table.purge("P")
    rows = table.read().collect()
    assert all(r["conv_id"] != "P" for r in rows)
    after = {(r["conv_id"], r["turn_idx"]): r["text"] for r in rows}
    assert after == before
    assert table.lookup("P").count() == 0


def test_purge_tombstones_guard_late_redelivery(spark, table):
    """A late re-delivery of the purged content below its last LSN must
    stay dead; a genuinely NEW higher-LSN event may resurrect the key."""
    table.purge("P")
    merge_batch(table, _events(spark, [
        (4, "update", "P", 0, SECRET + "-0v2"),  # same LSN as purged turn
        (1, "insert", "P", 1, SECRET + "-1"),    # below purged turn's LSN
    ]), "late", 2)
    assert table.read().filter(F.col("conv_id") == "P").count() == 0
    merge_batch(table, _events(spark, [
        (99, "insert", "P", 0, "fresh-after-purge"),
    ]), "fresh", 3)
    got = table.lookup("P").collect()
    assert [(r["turn_idx"], r["text"]) for r in got] == [(0, "fresh-after-purge")]


def test_purge_bytes_gone_after_expire_vacuum(table):
    table.purge("P")
    table.expire_snapshots(keep_last=1)
    table.vacuum()
    hits = []
    for p in glob.glob(os.path.join(table.root, "data", "**", "*.parquet"), recursive=True):
        t = pq.read_table(p)
        for col in t.column_names:
            if t[col].type == "string":
                vals = [v for v in t[col].to_pylist() if v and SECRET in v]
                if vals:
                    hits.append((p, col, vals[:2]))
    assert hits == [], hits
    # the tombstones themselves survive (deletion is remembered, content isn't)
    raw = table.read_resolved().filter(F.col("conv_id") == "P").collect()
    assert len(raw) == 2 and all(r[S.DELETED_COL] and r["text"] is None for r in raw)


def test_purge_only_rewrites_one_bucket(table):
    snap_before = table.snapshot()
    out = table.purge("P")
    b = str(bucket_of("P", 4))
    changed = {
        bk for bk in set(snap_before.files) | set(out.files)
        if snap_before.files.get(bk) != out.files.get(bk)
    }
    assert changed == {b}


def test_purge_propagates_deletes_through_feed(table):
    pre = table.snapshot().snapshot_id
    out = table.purge("P")
    feed = table.changes(pre, out.snapshot_id)
    dels = {
        (r["conv_id"], r["turn_idx"])
        for r in feed.filter(F.col("op") == "delete").collect()
    }
    assert {("P", 0), ("P", 1)} <= dels
    texts = [r["text"] for r in feed.collect() if r["conv_id"] == "P"]
    assert all(v is None for v in texts)


def test_purge_missing_key_is_noop(table):
    before = table.snapshot().snapshot_id
    table.purge("conv_does_not_exist_anywhere")
    # either a no-op (key's bucket empty) or a content-identical rewrite;
    # live content must be unchanged
    assert table.snapshot().snapshot_id in (before, before + 1)
    assert table.read().filter(F.col("text").isNull()).count() == 0


def test_purge_random_logs_property(spark, tmp_path):
    """Property over generated logs: purging any key leaves exactly the
    expected final state minus that conversation, for several seeds/keys.
    (Loop-based rather than hypothesis: each case costs a Spark replay.)"""
    import random

    from maestro_spark.gen import GenConfig, expected_final_state, generate, write_log
    from maestro_spark.replay import replay

    for seed in (3, 17):
        log = generate(GenConfig(seed=seed, n_convs=25, segment_rows=300))
        d = tmp_path / f"p{seed}"
        write_log(log, str(d / "log"), segment_rows=300)
        t = LakeTable.create(spark, str(d / "lake"), n_buckets=4)
        replay(spark, str(d / "log"), t, query_id="v")
        exp = expected_final_state(log)
        rng = random.Random(seed)
        for cid in rng.sample(sorted(set(exp["conv_id"])), 2):
            t.purge(cid)
            got = (
                t.read()
                .orderBy("conv_id", "turn_idx")
                .toPandas()
                .reset_index(drop=True)
            )
            exp = exp[exp["conv_id"] != cid].reset_index(drop=True)
            assert list(got["conv_id"]) == list(exp["conv_id"])
            assert list(got["text"]) == list(exp["text"])
