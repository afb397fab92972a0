"""Lake maintenance: compaction, tombstone GC, snapshot expiry."""

from __future__ import annotations

import os

from maestro_spark.gen import GenConfig, generate, write_log
from maestro_spark.lake import DATA_DIR, LakeTable
from maestro_spark.replay import replay
from maestro_spark.verify import symmetric_diff_empty


def _n_data_files(table):
    n = 0
    for _, _, files in os.walk(os.path.join(table.root, DATA_DIR)):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def test_compact_preserves_content_and_reduces_files(spark, tmp_path):
    log = generate(GenConfig(seed=31, n_convs=40, segment_rows=200))
    write_log(log, str(tmp_path / "log"), segment_rows=200)
    table = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    replay(spark, str(tmp_path / "log"), table, query_id="c")

    before = table.read().orderBy("conv_id", "turn_idx")
    files_before = sum(len(v) for v in table.snapshot().files.values())
    table.compact()
    table.vacuum()  # old files still referenced by old snapshots -> kept
    after = table.read().orderBy("conv_id", "turn_idx")
    files_after = sum(len(v) for v in table.snapshot().files.values())
    assert symmetric_diff_empty(before, after)
    assert files_after <= files_before
    assert files_after <= 4  # one file per bucket


def test_tombstone_gc(spark, tmp_path):
    from pyspark.sql import functions as F

    from maestro_spark import schema as S

    log = generate(GenConfig(seed=32, n_convs=30, delete_frac=0.2, segment_rows=500))
    write_log(log, str(tmp_path / "log"), segment_rows=500)
    table = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    replay(spark, str(tmp_path / "log"), table, query_id="g")

    raw = table.read_raw()
    n_tomb = raw.filter(F.col(S.DELETED_COL)).count()
    assert n_tomb > 0
    live_before = table.read().orderBy("conv_id", "turn_idx")

    max_lsn = raw.agg(F.max(S.LSN_COL)).head()[0]
    table.compact(tombstone_horizon_lsn=max_lsn + 1)  # everything is settled
    assert table.read_raw().filter(F.col(S.DELETED_COL)).count() == 0
    assert symmetric_diff_empty(live_before, table.read().orderBy("conv_id", "turn_idx"))


def test_expire_snapshots_then_vacuum(spark, tmp_path):
    log = generate(GenConfig(seed=33, n_convs=20, segment_rows=200))
    write_log(log, str(tmp_path / "log"), segment_rows=200)
    table = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    replay(spark, str(tmp_path / "log"), table, query_id="e")
    table.compact()

    live = table.read().count()
    files_on_disk_before = _n_data_files(table)
    dropped = table.expire_snapshots(keep_last=1)
    assert dropped >= 1
    removed = table.vacuum()
    assert removed > 0
    assert _n_data_files(table) < files_on_disk_before
    assert table.read().count() == live  # current snapshot untouched
