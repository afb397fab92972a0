"""Zone-map data skipping: per-file ts/lsn bounds in the fstats store, and
the exactness of read_where_ts under merge-on-read — in particular the
superseded-winner trap (an in-range old version whose out-of-range update
lives in a pruned file must NOT be resurrected; the keys-only mask scan
knocks it out)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from maestro_spark import schema as S
from maestro_spark.filestats import SHARD_PREFIX
from maestro_spark.gen import GenConfig, generate, write_log
from maestro_spark.lake import SNAP_DIR, LakeTable
from maestro_spark.merge import merge_batch
from maestro_spark.replay import replay
from maestro_spark.verify import symmetric_diff_empty

D1 = dt.datetime(2025, 1, 1, 12)
D2 = dt.datetime(2025, 1, 2, 12)
D3 = dt.datetime(2025, 1, 3, 12)


def _events(spark, rows):
    """rows: (op_lsn, op, conv_id, turn_idx, text, ts)."""
    return spark.createDataFrame(
        [(lsn, op, cid, ti, None, txt, None, ts) for (lsn, op, cid, ti, txt, ts) in rows],
        S.CHANGE_EVENT_SCHEMA,
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    # epoch 0 (day 1): A, B, C
    merge_batch(t, _events(spark, [
        (1, "insert", "A", 0, "a0", D1),
        (2, "insert", "B", 0, "b0", D1),
        (3, "insert", "C", 0, "c0", D1),
    ]), "q", 0)
    # epoch 1 (day 2): B updated OUT of day 1, C deleted, D inserted
    merge_batch(t, _events(spark, [
        (4, "update", "B", 0, "b1", D2),
        (5, "delete", "C", 0, None, D2),
        (6, "insert", "D", 0, "d0", D2),
    ]), "q", 1)
    # epoch 2 (day 3): E inserted
    merge_batch(t, _events(spark, [(7, "insert", "E", 0, "e0", D3)]), "q", 2)
    return t


def _ids(df):
    return sorted(r.conv_id for r in df.select("conv_id").collect())


def test_store_populated_by_writes(table):
    snap = table.snapshot()
    shards = [f for f in os.listdir(os.path.join(table.root, SNAP_DIR))
              if f.startswith(SHARD_PREFIX)]
    assert shards, "write path must persist fstats shards"
    for ps in snap.files.values():
        for p in ps:
            st = table.file_stats.get(p)
            assert st is not None and st["rows"] >= 1
            assert st["lsn_min"] is not None and st["ts_min"] is not None


def test_superseded_winner_masked_not_resurrected(table):
    # day-1 window: B's day-1 version is superseded by a day-2 update living
    # in a file the ts-zone pruner drops; C is tombstoned on day 2. Neither
    # may appear.
    got = table.read_where_ts(D1 - dt.timedelta(hours=1), D1 + dt.timedelta(hours=1))
    assert _ids(got) == ["A"]


def test_matches_unpruned_filter_everywhere(table):
    for lo, hi in [(None, D1), (D1, D2), (D2, None), (None, None), (D3, D3)]:
        pruned = table.read_where_ts(lo, hi)
        full = table.read()
        if lo is not None:
            full = full.filter(full.ts >= lo)
        if hi is not None:
            full = full.filter(full.ts <= hi)
        assert symmetric_diff_empty(pruned, full), (lo, hi)


def test_plan_actually_prunes(table):
    cand, mask, total = table.plan_ts_scan(D3, None)
    n_cand = sum(len(v) for v in cand.values())
    assert n_cand < total, "day-3 scan must not admit every file"
    # day-3 rows were never updated: only epoch-2 files are candidates,
    # and every earlier file has lsn_max < the candidates' lsn_min → no mask
    assert mask == []


def test_empty_range_touches_nothing(table):
    cand, mask, total = table.plan_ts_scan(D3 + dt.timedelta(days=7), None)
    assert cand == {} and mask == []
    assert table.read_where_ts(D3 + dt.timedelta(days=7), None).count() == 0


def test_survives_compaction_and_vacuum(table):
    table.compact()
    table.vacuum()  # folds fstats shards, drops dead entries
    got = table.read_where_ts(D1, D1)
    assert _ids(got) == ["A"]
    # compacted bucket files have fresh stats entries
    for ps in table.snapshot().files.values():
        for p in ps:
            assert table.file_stats.get(p) is not None


def test_clone_carries_zone_maps(table, tmp_path):
    dst = table.clone(str(tmp_path / "copy"))
    assert _ids(dst.read_where_ts(D1, D1)) == ["A"]
    shards = [f for f in os.listdir(os.path.join(dst.root, SNAP_DIR))
              if f.startswith(SHARD_PREFIX)]
    assert shards


def test_randomized_against_generator(spark, tmp_path):
    """Replay a generated log (updates, deletes, duplicates, late events),
    then check read_where_ts == read().filter over the middle ts tercile."""
    log = generate(GenConfig(seed=7, n_convs=80, segment_rows=400))
    write_log(log, str(tmp_path / "log"), segment_rows=400)
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8)
    replay(spark, str(tmp_path / "log"), t, query_id="z", max_epochs=4)
    import pandas as pd

    tss = sorted(log.cols["ts"])
    lo = pd.Timestamp(tss[len(tss) // 3]).to_pydatetime()
    hi = pd.Timestamp(tss[2 * len(tss) // 3]).to_pydatetime()
    pruned = t.read_where_ts(lo, hi)
    full = t.read()
    full = full.filter((full.ts >= lo) & (full.ts <= hi))
    assert symmetric_diff_empty(pruned, full)


def test_read_where_ts_columns_prune(spark, table):
    """Time pruning x column pruning compose: narrow range read equals the
    wide one projected, and its scan schema stays narrow."""
    import contextlib
    import io
    import re

    narrow = table.read_where_ts(D2, D2, columns=["conv_id", "text"])
    wide = (
        table.read_where_ts(D2, D2)
        .select("conv_id", "text")
        .orderBy("conv_id")
        .toPandas()
    )
    got = narrow.orderBy("conv_id").toPandas()
    assert got.equals(wide) and len(got) > 0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        narrow.explain("formatted")
    widths = [int(m.group(1)) for m in re.finditer(r"Output \[(\d+)\]", buf.getvalue())]
    assert max(widths) <= 6  # keys + text + ts + _lsn + _deleted


def test_read_where_payload_column_prunes_and_matches(spark, tmp_path):
    """Generalized zone maps (VERDICT r2 #4): a range predicate on a payload
    column prunes files like a ts range — candidates are only the files
    whose per-column bounds overlap — and the result equals the unpruned
    read().filter() exactly."""
    import pyspark.sql.functions as F

    spark.conf.set("maestro.compact.maxDeltas", "0")
    try:
        t = LakeTable.create(spark, str(tmp_path / "col_lake"), n_buckets=2)
        # four epochs with disjoint turn ranges AND epoch-prefixed text
        for e in range(4):
            merge_batch(t, _events(spark, [
                (e * 100 + i, "insert", c, e * 10 + i, f"g{e}-{c}{i}", D1)
                for c in ("A", "B") for i in range(5)
            ]), "q", e)

        # integer column: only epoch-2's files can hold turn_idx in [20, 24]
        cand, mask, total = t.plan_col_scan("turn_idx", 20, 24)
        n_cand = sum(len(v) for v in cand.values())
        # one file per (epoch, non-empty bucket); only epoch 2's files hit
        per_epoch = total // 4
        assert n_cand == per_epoch and n_cand < total
        got = t.read_where("turn_idx", 20, 24)
        want = t.read().filter(F.col("turn_idx").between(20, 24))
        assert symmetric_diff_empty(got, want) and got.count() == 10

        # string column bounds prune too
        cand_s, _, _ = t.plan_col_scan("text", "g1", "g1~")
        assert sum(len(v) for v in cand_s.values()) == per_epoch
        got_s = t.read_where("text", "g1", "g1~")
        assert got_s.count() == 10

        with pytest.raises(ValueError, match="unknown column"):
            t.read_where("nope", 0, 1)
    finally:
        spark.conf.set("maestro.compact.maxDeltas", "8")


def test_read_where_mask_knocks_out_superseded_string_winner(spark, tmp_path):
    """MOR exactness on a non-key column: a row whose OLD version is in
    range but whose higher-LSN update moved it out of range lives only in a
    pruned file — the keys-only mask scan must knock the stale winner out."""
    import pyspark.sql.functions as F

    spark.conf.set("maestro.compact.maxDeltas", "0")
    try:
        t = LakeTable.create(spark, str(tmp_path / "mask_lake"), n_buckets=2)
        merge_batch(t, _events(spark, [
            (1, "insert", "A", 0, "g2-old", D1),
            (2, "insert", "B", 0, "g2-keep", D1),
        ]), "q", 0)
        # epoch 1 moves A out of the g2* range (and is NOT a candidate file)
        merge_batch(t, _events(spark, [
            (3, "update", "A", 0, "zz-new", D2),
        ]), "q", 1)
        got = t.read_where("text", "g2", "g2~")
        rows = {(r["conv_id"], r["text"]) for r in got.collect()}
        assert rows == {("B", "g2-keep")}  # A's stale g2-old NOT resurrected
        want = t.read().filter(F.col("text").between("g2", "g2~"))
        assert symmetric_diff_empty(got, want)
    finally:
        spark.conf.set("maestro.compact.maxDeltas", "8")
