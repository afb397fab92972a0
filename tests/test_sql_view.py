"""SQL front door: `spark.sql` over lake tables via MOR-resolved temp
views — equality with lake.read(), time travel, snapshot isolation, and
the CLI `sql` subcommand (VERDICT r2 next-round #3)."""

from __future__ import annotations

import datetime as dt
import time

import pyspark.sql.functions as F
import pytest

from maestro_spark import schema as S
from maestro_spark.lake import LakeTable
from maestro_spark.merge import merge_batch
from maestro_spark.verify import symmetric_diff_empty

TS = dt.datetime(2025, 1, 1, 12)


def _events(spark, rows):
    return spark.createDataFrame(
        [(lsn, op, cid, ti, None, txt, None, TS) for (lsn, op, cid, ti, txt) in rows],
        S.CHANGE_EVENT_SCHEMA,
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "sql_lake"), n_buckets=4)
    merge_batch(t, _events(spark, [
        (1, "insert", "A", 0, "a0"),
        (2, "insert", "A", 1, "a1"),
        (3, "insert", "B", 0, "b0"),
    ]), "q", 0)
    return t


def test_sql_view_equals_read(spark, table):
    table.create_view("conv")
    got = spark.sql("SELECT conv_id, turn_idx, text FROM conv")
    assert symmetric_diff_empty(
        got, table.read().select("conv_id", "turn_idx", "text"))
    # aggregates route through the same resolved scan
    n = spark.sql(
        "SELECT conv_id, count(*) AS n FROM conv GROUP BY conv_id "
        "ORDER BY conv_id").collect()
    assert [(r["conv_id"], r["n"]) for r in n] == [("A", 2), ("B", 1)]


def test_sql_view_is_mor_resolved(spark, table):
    """The view must show merged winners (not raw delta rows) and honour
    tombstones."""
    merge_batch(table, _events(spark, [
        (4, "update", "A", 0, "a0-v2"),
        (5, "delete", "B", 0, None),
    ]), "q", 1)
    table.create_view("conv")
    rows = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in spark.sql("SELECT * FROM conv").collect()}
    assert rows == {("A", 0): "a0-v2", ("A", 1): "a1"}


def test_sql_view_time_travel(spark, table):
    sid0 = table.snapshot().snapshot_id
    t_mid = time.time()
    time.sleep(0.05)
    merge_batch(table, _events(spark, [(6, "update", "A", 0, "late")]), "q", 2)
    # pin by snapshot id
    table.create_view("conv_v0", snapshot_id=sid0)
    assert spark.sql(
        "SELECT text FROM conv_v0 WHERE conv_id='A' AND turn_idx=0"
    ).head()["text"] == "a0"
    # pin by wall-clock ts
    table.create_view("conv_ts", ts=t_mid)
    assert spark.sql(
        "SELECT text FROM conv_ts WHERE conv_id='A' AND turn_idx=0"
    ).head()["text"] == "a0"
    with pytest.raises(ValueError, match="at most one"):
        table.create_view("x", snapshot_id=sid0, ts=t_mid)


def test_sql_view_snapshot_isolation(spark, table):
    """A registered view keeps reading its plan-time snapshot while commits
    land (committed files are immutable; vacuum keeps referenced files)."""
    table.create_view("pinned")
    before = spark.sql("SELECT * FROM pinned ORDER BY conv_id, turn_idx").collect()
    merge_batch(table, _events(spark, [(7, "delete", "A", 0, None)]), "q", 3)
    table.compact()
    table.vacuum()
    after = spark.sql("SELECT * FROM pinned ORDER BY conv_id, turn_idx").collect()
    assert after == before
    # re-registering picks the new world up
    table.create_view("pinned")
    assert spark.sql(
        "SELECT count(*) AS n FROM pinned WHERE conv_id='A' AND turn_idx=0"
    ).head()["n"] == 0


def test_sql_joins_two_lake_tables(spark, table, tmp_path):
    other = LakeTable.create(spark, str(tmp_path / "sql_lake2"), n_buckets=2)
    merge_batch(other, _events(spark, [
        (1, "insert", "A", 0, "meta-A"),
        (2, "insert", "C", 0, "meta-C"),
    ]), "q", 0)
    table.create_view("conv")
    other.create_view("meta")
    got = spark.sql("""
        SELECT c.conv_id, c.turn_idx, m.text AS meta_text
        FROM conv c JOIN meta m
          ON c.conv_id = m.conv_id AND m.turn_idx = 0
        ORDER BY c.conv_id, c.turn_idx
    """).collect()
    assert [(r["conv_id"], r["turn_idx"], r["meta_text"]) for r in got] == [
        ("A", 0, "meta-A"), ("A", 1, "meta-A")]


def test_table_sql_shorthand(spark, table):
    df = table.sql("SELECT count(*) AS n FROM t WHERE conv_id = 'A'")
    assert df.head()["n"] == 2


def test_cli_sql_subcommand(spark, table, capsys, monkeypatch):
    from maestro_spark.__main__ import main

    # the CLI stops its session on exit; the test session must survive
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    rc = main(["sql", "SELECT conv_id, count(*) AS n FROM sql_lake "
               "GROUP BY conv_id ORDER BY conv_id",
               "--table", table.root])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"rows": 2' in out


def test_register_catalog_discovers_and_joins(spark, tmp_path, capsys, monkeypatch):
    """register_catalog: every table under a warehouse dir becomes a SQL
    view (plus __files/__history metadata views) in one call — cross-table
    joins and ops queries work with zero engine-API calls afterward."""
    from maestro_spark.lake import register_catalog

    wh = tmp_path / "wh"
    wh.mkdir()
    (wh / "not_a_table").mkdir()  # must be skipped, not crashed on
    convs = LakeTable.create(spark, str(wh / "convs"), n_buckets=4)
    merge_batch(convs, _events(spark, [
        (1, "insert", "A", 0, "a0"),
        (2, "insert", "B", 0, "b0"),
    ]), "q", 0)
    tags = LakeTable.create(spark, str(wh / "tags"), n_buckets=4)
    merge_batch(tags, _events(spark, [
        (1, "insert", "A", 0, "vip"),
    ]), "q", 0)

    tables = register_catalog(spark, str(wh))
    assert sorted(tables) == ["convs", "tags"]

    got = spark.sql(
        "SELECT c.conv_id, c.text, t.text AS tag FROM convs c "
        "LEFT JOIN tags t ON c.conv_id = t.conv_id AND c.turn_idx = t.turn_idx "
        "ORDER BY c.conv_id"
    ).collect()
    assert [(r["conv_id"], r["text"], r["tag"]) for r in got] == [
        ("A", "a0", "vip"), ("B", "b0", None)]

    # metadata views: ops queries over files/history without data IO
    files = spark.sql(
        "SELECT count(*) AS n, sum(rows) AS r FROM convs__files").collect()[0]
    assert files["n"] >= 1 and files["r"] == 2
    hist = spark.sql(
        "SELECT max(snapshot_id) AS tip FROM convs__history").collect()[0]
    assert hist["tip"] == convs.snapshot().snapshot_id

    # re-registration refreshes the pin (snapshot isolation until then)
    merge_batch(convs, _events(spark, [(3, "insert", "C", 0, "c0")]), "q", 1)
    assert spark.sql("SELECT count(*) AS n FROM convs").collect()[0]["n"] == 2
    register_catalog(spark, str(wh))
    assert spark.sql("SELECT count(*) AS n FROM convs").collect()[0]["n"] == 3

    # CLI twin: `sql --warehouse` registers the whole catalog
    from maestro_spark.__main__ import main

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rc = main(["sql", "SELECT count(*) AS n FROM convs c JOIN tags t "
               "ON c.conv_id = t.conv_id", "--warehouse", str(wh)])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"rows": 1' in out and "tags__history" not in out


def test_register_catalog_changes_view(spark, tmp_path):
    """__changes view: the CDC feed over the retained horizon is plain SQL
    (Delta table_changes parity) — net row per changed key, tombstones as
    op='delete'; a rollback in the retained range degrades to 'view
    skipped', never a registration failure."""
    from maestro_spark.lake import register_catalog

    wh = tmp_path / "wh"
    wh.mkdir()
    convs = LakeTable.create(spark, str(wh / "convs"), n_buckets=4)
    merge_batch(convs, _events(spark, [
        (1, "insert", "A", 0, "a0"),
        (2, "insert", "B", 0, "b0"),
    ]), "q", 0)
    merge_batch(convs, _events(spark, [
        (3, "update", "A", 0, "a0-v2"),
        (4, "delete", "B", 0, None),
    ]), "q", 1)

    register_catalog(spark, str(wh))
    rows = {(r["conv_id"], r["op"]): (r["text"], r["lsn"]) for r in spark.sql(
        "SELECT conv_id, op, text, lsn FROM convs__changes").collect()}
    # net change per key over the whole retained history, max-LSN winners
    assert rows[("A", "upsert")] == ("a0-v2", 3)
    assert rows[("B", "delete")][1] == 4
    # __scd2 twin: per-version history with validity intervals, plain SQL
    hist = {(r["conv_id"], r["valid_from_lsn"]):
            (r["valid_to_lsn"], r["is_current"], r["op"]) for r in spark.sql(
        "SELECT conv_id, op, valid_from_lsn, valid_to_lsn, is_current "
        "FROM convs__scd2").collect()}
    assert hist[("A", 1)] == (3, False, "upsert")
    assert hist[("A", 3)] == (None, True, "upsert")
    assert hist[("B", 4)][1] is False and hist[("B", 4)][2] == "delete"

    # rollback in the retained range: data/metadata views still register,
    # the changes view is skipped (added-files feed can't express removals)
    convs.rollback(convs.snapshot_ids()[-2])
    tables = register_catalog(spark, str(wh))
    assert "convs" in tables
    assert spark.sql("SELECT count(*) AS n FROM convs").collect()[0]["n"] == 2
    # the stale pre-rollback pin must be dropped, not silently served
    assert not spark.catalog.tableExists("convs__changes")
    assert not spark.catalog.tableExists("convs__scd2")


def test_catalog_staleness_and_refresh(spark, tmp_path):
    """r3 verdict #6: temp views are plan-time-pinned, so a long-lived
    session needs (a) a staleness surface — catalog_staleness and the
    __catalog view report 'pinned at N, tip is M' — and (b) refresh_catalog
    as the cheap re-pin: after a writer commits, the reader refreshes and
    the view serves the new snapshot."""
    from maestro_spark.lake import (
        catalog_staleness,
        refresh_catalog,
        register_catalog,
    )

    wh = tmp_path / "wh"
    wh.mkdir()
    convs = LakeTable.create(spark, str(wh / "convs"), n_buckets=4)
    merge_batch(convs, _events(spark, [(1, "insert", "A", 0, "a0")]), "q", 0)

    register_catalog(spark, str(wh))
    pinned = convs.snapshot().snapshot_id
    st = catalog_staleness(spark, str(wh))
    assert st["convs"] == {
        "pinned_snapshot": pinned, "tip_snapshot": pinned, "snapshots_behind": 0,
    }
    cat = {r["table_name"]: r for r in spark.sql("SELECT * FROM __catalog").collect()}
    assert cat["convs"]["snapshots_behind"] == 0

    # a writer commits while the reader session holds the pin
    merge_batch(convs, _events(spark, [(5, "update", "A", 0, "a0v2")]), "q", 1)
    assert [r["text"] for r in spark.sql(
        "SELECT text FROM convs WHERE conv_id = 'A'").collect()] == ["a0"]  # stale pin
    st = catalog_staleness(spark, str(wh))
    assert st["convs"]["snapshots_behind"] >= 1  # the staleness surface sees it

    moved = refresh_catalog(spark, str(wh))
    assert moved["convs"]["refreshed"] is True
    assert [r["text"] for r in spark.sql(
        "SELECT text FROM convs WHERE conv_id = 'A'").collect()] == ["a0v2"]
    assert catalog_staleness(spark, str(wh))["convs"]["snapshots_behind"] == 0

    # a table created AFTER registration is surfaced and picked up on refresh
    tags = LakeTable.create(spark, str(wh / "tags"), n_buckets=4)
    merge_batch(tags, _events(spark, [(1, "insert", "A", 0, "vip")]), "q", 0)
    st = catalog_staleness(spark, str(wh))
    assert st["tags"]["pinned_snapshot"] is None
    refresh_catalog(spark, str(wh))
    assert spark.sql("SELECT count(*) n FROM tags").head()["n"] == 1
