"""ALTER TABLE surface (M41): metadata-only add, rewrite-backed
rename/drop — content, tombstone semantics, idempotence keys, zone maps,
the feed contract, and physical erasure all hold across the boundary."""

from __future__ import annotations

import datetime as dt
import os

import pyspark.sql.functions as F
import pytest

from maestro_spark import schema as S
from maestro_spark.ddl import add_column, drop_column, rename_column
from maestro_spark.dml import delete_where, update_where, upsert
from maestro_spark.lake import DATA_DIR, LakeTable
from maestro_spark.merge import merge_batch

TS = dt.datetime(2025, 1, 1, 12)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    merge_batch(t, spark.createDataFrame(
        [(5, "insert", "A", 0, "user", "a0", "search", TS),
         (6, "insert", "A", 1, "assistant", "a1", None, TS),
         (7, "insert", "B", 0, "user", "b0", "browse", TS),
         (8, "insert", "C", 0, "user", "c0", None, TS)],
        S.CHANGE_EVENT_SCHEMA), "seed", 0)
    return t


def test_add_column_is_metadata_only(spark, table):
    files_before = table.snapshot().files
    snap = add_column(table, "rating", "int")
    assert snap.files == files_before  # no data IO at all
    assert table.read().filter(F.col("rating").isNotNull()).count() == 0
    upsert(table, spark.createDataFrame(
        [("A", 0, 5)], "conv_id string, turn_idx int, rating int"))
    got = {(r["conv_id"], r["turn_idx"]): r["rating"]
           for r in table.read().collect()}
    assert got[("A", 0)] == 5 and got[("B", 0)] is None
    with pytest.raises(ValueError, match="already exists"):
        add_column(table, "rating", "int")


def test_rename_column_preserves_everything(spark, table, tmp_path):
    delete_where(table, F.col("conv_id") == "C")
    pre_rename = table.snapshot().snapshot_id
    before = {(r["conv_id"], r["turn_idx"]): r["text"]
              for r in table.read().collect()}

    rename_column(table, "text", "body")
    cols = set(table.read().columns)
    assert "body" in cols and "text" not in cols
    got = {(r["conv_id"], r["turn_idx"]): r["body"]
           for r in table.read().collect()}
    assert got == before

    # tombstones survived the rewrite: a late lower-LSN redelivery of the
    # deleted key stays dead (its old-name payload evolves a fresh column)
    merge_batch(table, spark.createDataFrame(
        [(8, "insert", "C", 0, "user", "c0", None, TS)],
        S.CHANGE_EVENT_SCHEMA), "late", 1)
    assert table.read().filter(F.col("conv_id") == "C").count() == 0
    assert "text" in table.read().columns  # evolved back, all-null
    assert table.read().filter(F.col("text").isNotNull()).count() == 0

    # epoch idempotence survived: the seed epoch re-delivers as a no-op
    assert merge_batch(table, spark.createDataFrame(
        [(5, "insert", "A", 0, "user", "SHOULD-NOT-LAND", "x", TS)],
        S.CHANGE_EVENT_SCHEMA), "seed", 0) is None
    assert {r["body"] for r in table.read().collect()} >= {"a0", "a1", "b0"}

    # zone maps + lookup serve the new layout/name
    assert sorted(map(tuple,
        table.read_where("body", "a0", "a1").select("conv_id", "body").collect()
    )) == [("A", "a0"), ("A", "a1")]
    assert {r["body"] for r in table.lookup("A").collect()} == {"a0", "a1"}

    # the feed refuses to span the rename, works on either side
    with pytest.raises(ValueError, match="rename"):
        table.changes(pre_rename).collect()
    tip = table.snapshot().snapshot_id
    assert table.changes(tip - 1, tip).count() >= 0  # post-rename range fine
    with pytest.raises(ValueError, match="already exists"):
        rename_column(table, "body", "role")
    with pytest.raises(ValueError, match="key/internal"):
        rename_column(table, "conv_id", "cid")


def test_drop_column_erases_physically_and_frees_the_name(spark, table):
    update_where(table, F.col("conv_id") == "B",
                 {"tool": F.lit("SENTINELTOOL")})
    drop_column(table, "tool")
    assert "tool" not in table.read().columns

    # the name is free at ANY type now — no stale physical data to clash
    add_column(table, "tool", "int")
    assert table.read().filter(F.col("tool").isNotNull()).count() == 0
    upsert(table, spark.createDataFrame(
        [("B", 0, 7)], "conv_id string, turn_idx int, tool int"))
    assert table.read().filter(F.col("conv_id") == "B").head()["tool"] == 7

    # physical erasure completes at expiry+vacuum (the RTBF-grade grep)
    table.expire_snapshots(keep_last=1)
    table.vacuum(manifest_grace_seconds=0)
    for dirpath, _, files in os.walk(os.path.join(table.root, DATA_DIR)):
        for fn in files:
            data = open(os.path.join(dirpath, fn), "rb").read()
            assert b"SENTINELTOOL" not in data, fn

    with pytest.raises(ValueError, match="key/internal"):
        drop_column(table, "turn_idx")
    with pytest.raises(ValueError, match="no payload column"):
        drop_column(table, "nope")


def test_widen_column_metadata_only_and_expire_by_age(spark, table):
    """widen_column publishes the wider schema with zero data IO; old
    narrow files read through parquet upcast. expire_snapshots
    older_than_seconds keeps young history even past keep_last."""
    import time as _time

    from maestro_spark.ddl import widen_column

    upsert(table, spark.createDataFrame(
        [("W", 0, "w0", 7)], "conv_id string, turn_idx int, text string, score int"))
    files_before = table.snapshot().files
    widen_column(table, "score", "long")
    assert table.snapshot().files == files_before  # no rewrite
    got = {r["conv_id"]: r["score"] for r in table.read().collect()}
    assert got["W"] == 7 and got["A"] is None  # narrow file upcast + nulls
    upsert(table, spark.createDataFrame(
        [("W", 1, "big", 2**40)], "conv_id string, turn_idx int, text string, score long"))
    assert table.read().filter(
        (F.col("conv_id") == "W") & (F.col("turn_idx") == 1)
    ).head()["score"] == 2**40
    with pytest.raises(TypeError, match="widen must move"):
        widen_column(table, "score", "int")   # narrowing refused
    with pytest.raises(TypeError):
        widen_column(table, "text", "int")    # not a safe widening

    # age-gated expiry: everything is seconds old -> nothing drops; with no
    # age gate the same keep_last drops history (tags still protected)
    assert table.expire_snapshots(keep_last=1,
                                  older_than_seconds=3600) == 0
    assert table.expire_snapshots(keep_last=1) > 0
