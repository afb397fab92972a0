"""SQL write statements (sqldml): INSERT/UPDATE/DELETE/MERGE statement text
compiles onto the fenced native DML builders — same exactly-once commit,
LSN fencing, change-feed visibility, and constraint gating as the Python
API — and anything outside the restricted grammar refuses loudly."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from maestro_spark import schema as S
from maestro_spark.lake import LakeTable
from maestro_spark.merge import merge_batch, read_quarantine
from maestro_spark.sqldml import execute_dml, is_dml

TS = dt.datetime(2025, 1, 1, 12)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    merge_batch(t, spark.createDataFrame(
        [(5, "insert", "A", 0, "user", "a0", "search", TS),
         (6, "insert", "A", 1, "assistant", "a1", None, TS),
         (7, "insert", "B", 0, "user", "b0", None, TS)],
        S.CHANGE_EVENT_SCHEMA), "seed", 0)
    return t


def test_is_dml_detects_verbs():
    assert is_dml("  INSERT INTO t VALUES (1)")
    assert is_dml("update t set x = 1")
    assert is_dml("DELETE FROM t")
    assert is_dml("Merge Into t USING s ON ...")
    assert not is_dml("SELECT * FROM t")
    assert not is_dml("WITH x AS (SELECT 1) SELECT * FROM x")


def test_insert_values_and_select(spark, table):
    execute_dml(table, "INSERT INTO t (conv_id, turn_idx, role, text) "
                       "VALUES ('C', 0, 'user', 'c0'), ('C', 1, 'assistant', 'c,1')")
    got = {r["turn_idx"]: r["text"]
           for r in table.read().filter(F.col("conv_id") == "C").collect()}
    assert got == {0: "c0", 1: "c,1"}  # comma INSIDE a literal parses fine
    table.create_view("t")
    execute_dml(table, "INSERT INTO t (conv_id, turn_idx, role, text) "
                       "SELECT concat(conv_id, '_x'), turn_idx, role, upper(text) "
                       "FROM t WHERE conv_id = 'C'")
    got = {r["turn_idx"]: r["text"]
           for r in table.read().filter(F.col("conv_id") == "C_x").collect()}
    assert got == {0: "C0", 1: "C,1"}
    # the statement is one epoch in the change feed like any other write
    feed = table.changes(0)
    assert feed.filter(F.col("conv_id") == "C_x").count() == 2
    # CTE source: INSERT INTO … WITH … SELECT parses and lands
    table.create_view("t")
    execute_dml(table, "INSERT INTO t (conv_id, turn_idx, role, text) "
                       "WITH src AS (SELECT * FROM t WHERE conv_id = 'C') "
                       "SELECT concat(conv_id, '_w'), turn_idx, role, text "
                       "FROM src")
    assert table.read().filter(F.col("conv_id") == "C_w").count() == 2


def test_update_and_delete(spark, table):
    execute_dml(table, "UPDATE t SET text = upper(text), tool = 'edited' "
                       "WHERE conv_id = 'A'")
    rows = {r["turn_idx"]: (r["text"], r["tool"])
            for r in table.read().filter(F.col("conv_id") == "A").collect()}
    assert rows == {0: ("A0", "edited"), 1: ("A1", "edited")}
    execute_dml(table, "DELETE FROM t WHERE conv_id = 'B'")
    assert table.read().filter(F.col("conv_id") == "B").count() == 0
    # the delete is a TOMBSTONE: a late lower-LSN re-delivery stays dead
    merge_batch(table, spark.createDataFrame(
        [(7, "insert", "B", 0, "user", "b0", None, TS)],
        S.CHANGE_EVENT_SCHEMA), "late", 9)
    assert table.read().filter(F.col("conv_id") == "B").count() == 0


def test_merge_statement_full_vocabulary(spark, table):
    spark.createDataFrame(
        [("A", 0, "merged"), ("D", 0, "d0")],
        "conv_id string, turn_idx int, text string",
    ).createOrReplaceTempView("src")
    execute_dml(table, """
        MERGE INTO t USING src AS s
        ON s.conv_id = t.conv_id AND s.turn_idx = t.turn_idx
        WHEN MATCHED AND t.role = 'user' THEN UPDATE SET text = s.text
        WHEN NOT MATCHED THEN
          INSERT (conv_id, turn_idx, text, role) VALUES (s.conv_id, s.turn_idx, s.text, 'user')
        WHEN NOT MATCHED BY SOURCE AND t.conv_id = 'B' THEN DELETE
    """)
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in table.read().collect()}
    assert got[("A", 0)] == "merged"      # matched + condition hit
    assert got[("A", 1)] == "a1"          # matched, condition false -> untouched
    assert got[("D", 0)] == "d0"          # not matched -> inserted
    assert ("B", 0) not in got            # not matched by source -> deleted
    # subquery source + INSERT *
    execute_dml(table, """
        MERGE INTO t USING (SELECT 'E' AS conv_id, 0 AS turn_idx, 'e0' AS text) AS s
        ON s.conv_id = t.conv_id AND s.turn_idx = t.turn_idx
        WHEN NOT MATCHED THEN INSERT *
    """)
    assert table.read().filter(F.col("conv_id") == "E").head()["text"] == "e0"


def test_grammar_survives_literals_nesting_and_case_when(spark, table):
    """Clause keywords inside string literals, CASE WHEN expressions, a
    deeply-nested USING subquery, double-quoted literals, and trailing
    semicolons are all valid statement text — the grammar must locate
    clause boundaries outside literals/parens, not by raw word search."""
    execute_dml(table, "INSERT INTO t (conv_id, turn_idx, role, text) "
                       "VALUES ('Z', 0, 'user', 'z0');")  # trailing ;
    # WHERE-word inside a SET literal + CASE WHEN + double-quoted literal
    execute_dml(table, """
        UPDATE t SET tool = 'x where 1=1',
          text = CASE WHEN role = 'user' THEN upper(text) ELSE text END,
          role = "d,q"
        WHERE conv_id = 'Z'
    """)
    row = table.read().filter(F.col("conv_id") == "Z").head()
    assert row["tool"] == "x where 1=1"
    assert row["text"] == "Z0"
    assert row["role"] == "d,q"
    # MERGE: USING subquery nests function calls 3 deep; the SET value is
    # a CASE WHEN whose result is a literal containing 'when matched then'
    table.create_view("t")
    execute_dml(table, """
        MERGE INTO t USING (
          SELECT conv_id, turn_idx, role, upper(trim(substr(text, 1, 2))) AS text
          FROM t WHERE conv_id = 'Z'
        ) AS s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED THEN UPDATE SET
          text = CASE WHEN s.text = 'Z0' THEN 'when matched then boom' ELSE s.text END
        WHEN NOT MATCHED THEN INSERT *
    """)
    row = table.read().filter(F.col("conv_id") == "Z").head()
    assert row["text"] == "when matched then boom"


def test_refusals_are_loud_and_precise(spark, table):
    with pytest.raises(ValueError, match="refusing to write a different table"):
        execute_dml(table, "UPDATE other SET text = 'x'")
    with pytest.raises(ValueError, match="key columns"):
        execute_dml(table, "UPDATE t SET conv_id = 'x'")
    with pytest.raises(ValueError, match="equate the table key"):
        execute_dml(table, "MERGE INTO t USING src ON s.text = t.text "
                           "WHEN MATCHED THEN DELETE")
    with pytest.raises(ValueError, match="full table key"):
        execute_dml(table, "MERGE INTO t USING src ON s.conv_id = t.conv_id "
                           "WHEN MATCHED THEN DELETE")
    with pytest.raises(ValueError, match="unsupported INSERT"):
        execute_dml(table, "INSERT OVERWRITE t VALUES (1)")
    with pytest.raises(ValueError, match="not a DML"):
        execute_dml(table, "SELECT 1")
    with pytest.raises(ValueError, match="assignment"):
        execute_dml(table, "UPDATE t SET nonsense WHERE true")


def test_lake_sql_routes_dml_and_returns_post_state(spark, table):
    out = table.sql("UPDATE t SET tool = 'via-sql' WHERE conv_id = 'A'")
    assert {r["tool"] for r in out.filter(F.col("conv_id") == "A").collect()} \
        == {"via-sql"}
    # follow-up SELECT through the same front door sees the new state
    n = table.sql("SELECT count(*) AS n FROM t WHERE tool = 'via-sql'").head()["n"]
    assert n == 2
    with pytest.raises(ValueError, match="time-travel"):
        table.sql("DELETE FROM t", snapshot_id=1)


def test_sql_dml_respects_constraints(spark, table):
    """The statement flows through the SAME merge gate as the binlog tail:
    a CHECK constraint dead-letters the violating SQL rows."""
    table.add_constraint("role_known", "role in ('user', 'assistant')")
    execute_dml(table, "INSERT INTO t (conv_id, turn_idx, role, text) "
                       "VALUES ('Z', 0, 'gremlin', 'z0')", query_id="sqlbad")
    assert table.read().filter(F.col("conv_id") == "Z").count() == 0
    dlq = read_quarantine(table, "sqlbad").collect()
    assert [r["_reason"] for r in dlq] == ["constraint:role_known"]


def test_sql_dml_fence_replans_against_racer(spark, table, monkeypatch):
    """The statement LSN is fenced: simulate a racer landing a higher LSN
    between plan and commit — the statement re-plans and still applies."""
    from maestro_spark import dml as dml_mod

    real = dml_mod.max_live_lsn
    calls = {"n": 0}

    def stale_then_real(table_, snapshot_id=None):
        calls["n"] += 1
        if calls["n"] == 1:
            # racer: commit a higher-LSN row AFTER this plan read
            merge_batch(table_, table_.spark.createDataFrame(
                [(100, "insert", "R", 0, "user", "r0", None, TS)],
                S.CHANGE_EVENT_SCHEMA), "racer", 1)
            return 0  # stale answer -> fenced commit must conflict + re-plan
        return real(table_, snapshot_id)

    monkeypatch.setattr(dml_mod, "max_live_lsn", stale_then_real)
    execute_dml(table, "UPDATE t SET tool = 'fenced' WHERE conv_id = 'A'")
    assert calls["n"] >= 2  # re-planned at least once
    assert {r["tool"] for r in table.read().filter(F.col("conv_id") == "A").collect()} \
        == {"fenced"}
    assert table.read().filter(F.col("conv_id") == "R").count() == 1


def test_cli_sql_accepts_dml(spark, table, capsys, monkeypatch):
    from maestro_spark.__main__ import main as cli

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rc = cli(["sql", "UPDATE lake SET tool = 'cli' WHERE conv_id = 'B'",
              "--table", f"{table.root}=lake"])
    assert rc in (0, None)
    out = capsys.readouterr().out
    assert '"dml": true' in out
    assert table.read().filter(F.col("conv_id") == "B").head()["tool"] == "cli"


def test_ddl_statements_route_to_metadata_builders(spark, table):
    """ALTER TABLE text compiles onto the ddl builders: add / rename /
    widen / drop are all metadata-only commits (zero data files written),
    and DROP ... ERASE opts into the immediate RTBF rewrite."""
    from maestro_spark.sqldml import execute_ddl, is_ddl

    assert is_ddl("  ALTER TABLE t ADD COLUMN x string")
    assert not is_ddl("SELECT 1") and not is_ddl("UPDATE t SET x = 1")

    def files(snap):
        return {p for ps in snap.files.values() for p in ps}

    before = files(table.snapshot())
    s1 = execute_ddl(table, "ALTER TABLE t ADD COLUMN score double")
    s2 = execute_ddl(table, "ALTER TABLE t RENAME COLUMN score TO rating")
    s3 = execute_ddl(table, "ALTER TABLE t ALTER COLUMN turn_count TYPE bigint") \
        if "turn_count" in [f.name for f in table.snapshot().schema.fields] \
        else None
    assert files(table.snapshot()) == before  # all metadata-only so far
    assert s1.snapshot_id < s2.snapshot_id
    cols = [f.name for f in table.snapshot().payload_schema().fields]
    assert "rating" in cols and "score" not in cols
    assert table.read().filter(F.col("rating").isNotNull()).count() == 0

    # masked drop: still zero data files written
    execute_ddl(table, "ALTER TABLE t DROP COLUMN rating")
    assert files(table.snapshot()) == before
    assert "rating" not in [f.name for f in table.snapshot().payload_schema().fields]

    # ERASE drop: the immediate rewrite path (files DO change)
    execute_ddl(table, "ALTER TABLE t ADD COLUMN secret string")
    execute_dml(table, "UPDATE t SET secret = 'classified' WHERE conv_id = 'A'")
    execute_ddl(table, "ALTER TABLE t DROP COLUMN secret ERASE")
    assert files(table.snapshot()) != files(table.snapshot(1))
    # RTBF completion = expiry + vacuum drop the superseded pre-rewrite files
    table.expire_snapshots(keep_last=1)
    table.vacuum(manifest_grace_seconds=0)
    import subprocess
    grep = subprocess.run(["grep", "-r", "classified", table.root],
                          capture_output=True)
    assert grep.returncode != 0  # bytes physically gone

    # refusals: wrong target, unsupported form, time-travel pin
    with pytest.raises(ValueError, match="targets"):
        execute_ddl(table, "ALTER TABLE other ADD COLUMN x string")
    with pytest.raises(ValueError, match="unsupported ALTER"):
        execute_ddl(table, "ALTER TABLE t SET TBLPROPERTIES ('a'='b')")
    with pytest.raises(ValueError, match="time-travel"):
        table.sql("ALTER TABLE t ADD COLUMN y string", snapshot_id=1)


def test_ddl_via_sql_front_door_and_cli(spark, table, capsys, monkeypatch):
    """table.sql and the CLI both route ALTER TABLE; the post-statement
    view serves the new schema immediately."""
    import json as _json

    df = table.sql("ALTER TABLE conv ADD COLUMN note string", name="conv")
    assert "note" in df.columns

    from maestro_spark.__main__ import main
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rc = main(["sql", "ALTER TABLE lake RENAME COLUMN note TO remark",
               "--table", table.root])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ddl"] is True and "remark" in out["schema"]
    assert "remark" in table.sql("SELECT * FROM t").columns


# ------------------------------------------------- materialized-view DDL
def _mv_oracle(table, sql):
    """DuckDB-independent oracle: the same GROUP BY run straight on the
    base table's live rows through the session."""
    table.create_view("t")
    return {tuple(r) for r in table.spark.sql(sql).collect()}


def test_is_mv_detects_statements():
    from maestro_spark.sqldml import is_mv

    assert is_mv("CREATE MATERIALIZED VIEW v AS SELECT ...")
    assert is_mv("  refresh   materialized view 'p'")
    assert not is_mv("CREATE VIEW v AS SELECT 1")
    assert not is_mv("SELECT * FROM t")


def test_create_and_refresh_materialized_view_sql(spark, table, tmp_path):
    """CREATE MATERIALIZED VIEW compiles onto ivm.MaterializedView, the
    declaration persists in the view root, and REFRESH MATERIALIZED VIEW
    folds later DML deltas in — matching a full GROUP BY recompute."""
    stmt = (f"CREATE MATERIALIZED VIEW '{tmp_path}/mv' AS "
            "SELECT conv_id, role, count(*) AS n, sum(length(text)) AS chars "
            "FROM t GROUP BY conv_id, role")
    got = table.sql(stmt)
    assert sorted(got.columns) == ["chars", "conv_id", "n", "role"]
    oracle = ("SELECT conv_id, role, count(*) AS n, "
              "sum(length(text)) AS chars FROM t GROUP BY conv_id, role")
    assert {tuple(r) for r in got.collect()} == _mv_oracle(table, oracle)

    # identical re-CREATE is idempotent (reopen, not refuse)
    again = table.sql(stmt)
    assert again.count() == got.count()

    # a DIFFERING declaration over the same root refuses loudly
    with pytest.raises(ValueError, match="DIFFERENT declaration"):
        table.sql(f"CREATE MATERIALIZED VIEW '{tmp_path}/mv' AS "
                  "SELECT conv_id, role, count(*) AS n FROM t "
                  "GROUP BY conv_id, role")

    # write through SQL DML, then REFRESH by view path alone — the refresh
    # recompiles from the persisted declaration and folds only the delta
    table.sql("INSERT INTO t (conv_id, turn_idx, role, text) "
              "VALUES ('A', 2, 'user', 'a2'), ('Z', 0, 'user', 'z0')")
    refreshed = table.sql(f"REFRESH MATERIALIZED VIEW '{tmp_path}/mv'")
    assert {tuple(r) for r in refreshed.collect()} == _mv_oracle(table, oracle)


def test_mv_bare_name_lives_beside_base_and_cli(spark, table, capsys,
                                                monkeypatch):
    """A bare view identifier places the view at <base>__mv_<name>; the
    CLI sql subcommand drives both verbs end-to-end."""
    import json as _json
    import os

    from maestro_spark.__main__ import main

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rc = main(["sql", "CREATE MATERIALIZED VIEW stats AS SELECT conv_id, "
               "count(*) AS n FROM lake GROUP BY conv_id",
               "--table", table.root + "=lake"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["materialized_view"] is True
    assert out["view_root"] == table.root.rstrip("/") + "__mv_stats"
    assert os.path.exists(os.path.join(out["view_root"], "_mv.json"))
    assert out["rows"] == 2  # convs A and B

    execute_dml(table, "DELETE FROM t WHERE conv_id = 'B'", name="t")
    rc = main(["sql", "REFRESH MATERIALIZED VIEW stats",
               "--table", table.root + "=lake"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 1  # B's group row tombstoned by the delta refresh


def test_mv_refusals_and_pruning_retry(spark, table, tmp_path, monkeypatch):
    """Grammar refusals are precise; a wrong scan-pruning guess falls back
    to an unpruned declaration instead of failing the statement."""
    with pytest.raises(ValueError, match="needs an alias"):
        table.sql(f"CREATE MATERIALIZED VIEW '{tmp_path}/v1' AS "
                  "SELECT conv_id, count(*) FROM t GROUP BY conv_id")
    with pytest.raises(ValueError, match="echo exactly"):
        table.sql(f"CREATE MATERIALIZED VIEW '{tmp_path}/v2' AS "
                  "SELECT role, count(*) AS n FROM t GROUP BY conv_id")
    with pytest.raises(ValueError, match="targets"):
        table.sql(f"CREATE MATERIALIZED VIEW '{tmp_path}/v3' AS "
                  "SELECT conv_id, count(*) AS n FROM other GROUP BY conv_id")
    with pytest.raises(ValueError, match="unsupported materialized-view"):
        table.sql("CREATE MATERIALIZED VIEW v AS SELECT 1")
    with pytest.raises(ValueError, match="at least one aggregate"):
        table.sql(f"CREATE MATERIALIZED VIEW '{tmp_path}/v4' AS "
                  "SELECT conv_id FROM t GROUP BY conv_id")

    # literal-stripping: 'tool' appears only inside a string literal, so
    # the scan set is {role} — the pruned probe resolves and the result is
    # exact (the constraint-gate lesson from ADVICE r4 applied here)
    from maestro_spark import sqldml

    assert sqldml._derive_scan_columns(
        ["count_if(role = 'tool') AS n_tool"], table) == ["role"]
    got = table.sql(f"CREATE MATERIALIZED VIEW '{tmp_path}/v5' AS "
                    "SELECT conv_id, count_if(role = 'tool') AS n_tool "
                    "FROM t GROUP BY conv_id")
    assert {tuple(r) for r in got.collect()} == _mv_oracle(
        table, "SELECT conv_id, count_if(role = 'tool') AS n_tool "
               "FROM t GROUP BY conv_id")

    # a derivation MISS (simulated) retries unpruned and still succeeds,
    # leaving no half-written declaration behind
    monkeypatch.setattr(sqldml, "_derive_scan_columns",
                        lambda exprs, tbl: ["role"])
    got = table.sql(f"CREATE MATERIALIZED VIEW '{tmp_path}/v6' AS "
                    "SELECT conv_id, max(length(text)) AS m "
                    "FROM t GROUP BY conv_id")
    assert {tuple(r) for r in got.collect()} == _mv_oracle(
        table, "SELECT conv_id, max(length(text)) AS m "
               "FROM t GROUP BY conv_id")


def test_mv_declare_load_roundtrip_refuses_wrong_base(spark, table, tmp_path):
    """ivm.declare persists; ivm.load reconstructs from the root alone and
    refuses a mismatched base table."""
    from maestro_spark import ivm

    mv = ivm.declare(spark, table, str(tmp_path / "mv"),
                     key_cols=["conv_id"], agg_exprs=["count(*) AS n"])
    mv.refresh()
    loaded = ivm.load(spark, str(tmp_path / "mv"))
    assert loaded.base.root == table.root
    assert {tuple(r) for r in loaded.read().collect()} == \
           {tuple(r) for r in mv.read().collect()}
    with pytest.raises(ValueError, match="no declared materialized view"):
        ivm.load(spark, str(tmp_path / "nothing"))
    other = LakeTable.create(spark, str(tmp_path / "other"), n_buckets=2)
    with pytest.raises(ValueError, match="declared over"):
        ivm.load(spark, str(tmp_path / "mv"), base=other)


def test_drop_materialized_view_sql(spark, table, tmp_path):
    """DROP MATERIALIZED VIEW removes only ivm-declared roots of THIS
    table; IF EXISTS no-ops on a missing view."""
    import os

    root = str(tmp_path / "mv")
    table.sql(f"CREATE MATERIALIZED VIEW '{root}' AS "
              "SELECT conv_id, count(*) AS n FROM t GROUP BY conv_id")
    assert os.path.exists(os.path.join(root, "_mv.json"))

    # another table's view refuses the drop (ownership via persisted base)
    other = LakeTable.create(spark, str(tmp_path / "other"), n_buckets=2)
    with pytest.raises(ValueError, match="declared over"):
        other.sql(f"DROP MATERIALIZED VIEW '{root}'")
    assert os.path.exists(root)

    out = table.sql(f"DROP MATERIALIZED VIEW '{root}'")
    assert out.columns == ["dropped_view"]
    assert out.head()[0] == root
    assert not os.path.exists(root)

    with pytest.raises(ValueError, match="no declared materialized view"):
        table.sql(f"DROP MATERIALIZED VIEW '{root}'")
    assert table.sql(
        f"DROP MATERIALIZED VIEW IF EXISTS '{root}'").head()[0] is None

    # an arbitrary directory is NOT removable through this statement
    os.makedirs(str(tmp_path / "notaview"))
    with pytest.raises(ValueError, match="no declared materialized view"):
        table.sql(f"DROP MATERIALIZED VIEW '{tmp_path}/notaview'")
    assert os.path.exists(str(tmp_path / "notaview"))


def test_maintenance_statements(spark, table, capsys, monkeypatch):
    """OPTIMIZE / VACUUM statements route onto the engine's idempotent
    maintenance primitives and report a summary row."""
    import json as _json

    # fragment the table a little so OPTIMIZE has tiers to fold
    execute_dml(table, "UPDATE t SET text = upper(text) WHERE turn_idx = 0",
                name="t")
    row = table.sql("VACUUM t DRY RUN").head()
    assert row["op"] == "vacuum"
    assert _json.loads(row["summary"])["dry_run"] is True

    row = table.sql("OPTIMIZE t").head()
    assert row["op"] == "optimize"
    summary = _json.loads(row["summary"])
    assert "compact" in summary
    # post-OPTIMIZE state unchanged semantically
    assert table.read().filter(F.col("turn_idx") == 0).count() == 2

    row = table.sql("OPTIMIZE t ZORDER BY (ts, turn_idx)").head()
    assert _json.loads(row["summary"])["compact"]["mode"] == "zorder"
    assert table.snapshot().stats.get("zorder") is True

    with pytest.raises(ValueError, match="targets"):
        table.sql("VACUUM other")
    with pytest.raises(ValueError, match="unsupported maintenance"):
        table.sql("OPTIMIZE t REWRITE EVERYTHING")

    # CLI twin
    from maestro_spark.__main__ import main
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rc = main(["sql", "VACUUM lake DRY RUN", "--table", table.root + "=lake"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["maintenance"] is True and out["op"] == "vacuum"


def test_index_sql_statements(spark, table, tmp_path, capsys, monkeypatch):
    """CREATE/REFRESH/DROP INDEX compile onto the feed-maintained index
    family: the declaration persists in the index root, the index
    registers with its base table (optimize folds it), probes equal the
    directly-constructed class, and refusals are precise."""
    import json as _json
    import os

    from maestro_spark import index_maint as IM

    root = str(tmp_path / "ti")
    idx = table.sql(f"CREATE INDEX '{root}' ON t USING text (text) "
                    "WITH (n_buckets = 8)")
    assert idx.columns == ["index", "root", "applied_through"]
    assert idx.head()["index"] == "MaintainedTextIndex"
    # the declaration lives BESIDE the dir (rebuild overwrites the dir)
    assert os.path.exists(root + "._index.json")

    loaded = IM.load_index(spark, root, base=table)
    assert loaded.n_buckets == 8
    hits = {tuple(r)[:2] for r in loaded.search("a0").collect()}
    assert hits == {("A", 0)}

    # identical re-CREATE reopens; divergent declaration refuses
    table.sql(f"CREATE INDEX '{root}' ON t USING text (text) "
              "WITH (n_buckets = 8)")
    with pytest.raises(ValueError, match="DIFFERENT declaration"):
        table.sql(f"CREATE INDEX '{root}' ON t USING text (text) "
                  "WITH (n_buckets = 16)")

    # the index is REGISTERED: optimize folds new epochs into it
    execute_dml(table, "INSERT INTO t (conv_id, turn_idx, role, text) "
                "VALUES ('Q', 0, 'user', 'zebra quux')", name="t")
    from maestro_spark.lake import optimize
    out = optimize(table)
    assert any("MaintainedTextIndex" in d for d in out["refreshed"])
    hits = {tuple(r)[:2]
            for r in IM.load_index(spark, root).search("zebra").collect()}
    assert hits == {("Q", 0)}

    # REFRESH by path alone; DROP lifecycle incl. ownership + IF EXISTS
    table.sql(f"REFRESH INDEX '{root}'")
    other = LakeTable.create(spark, str(tmp_path / "otheridx"), n_buckets=2)
    with pytest.raises(ValueError, match="declared over"):
        other.sql(f"DROP INDEX '{root}'")
    dropped = table.sql(f"DROP INDEX '{root}'")
    assert dropped.head()["dropped_index"] == root
    assert not os.path.exists(root)
    assert not os.path.exists(root + "._index.json")
    assert IM.registered_indexes(spark, table) == []
    assert table.sql(f"DROP INDEX IF EXISTS '{root}'").head()[0] is None

    # refusals: unknown kind, bad WITH param, duplicate column param
    with pytest.raises(ValueError, match="unknown index kind"):
        table.sql(f"CREATE INDEX '{tmp_path}/x' ON t USING btree (text)")
    with pytest.raises(ValueError, match="does not accept"):
        table.sql(f"CREATE INDEX '{tmp_path}/x' ON t USING text (text) "
                  "WITH (nope = 3)")
    with pytest.raises(ValueError, match="do not also pass"):
        table.sql(f"CREATE INDEX '{tmp_path}/x' ON t USING text (text) "
                  "WITH (text_col = 'text')")
    with pytest.raises(ValueError, match="targets"):
        table.sql(f"CREATE INDEX '{tmp_path}/x' ON other USING text (text)")

    # bare name lives beside the base; CLI drives create + drop
    from maestro_spark.__main__ import main
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rc = main(["sql", "CREATE INDEX terms ON lake USING text (text)",
               "--table", table.root + "=lake"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["index"] is True and out["kind"] == "MaintainedTextIndex"
    assert out["root"] == table.root.rstrip("/") + "__idx_terms"
    rc = main(["sql", "DROP INDEX terms", "--table", table.root + "=lake"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dropped"].endswith("__idx_terms")


# --------------------------------------------------- inline time travel (r5)


def test_inline_time_travel_version_tag_timestamp(spark, table):
    import datetime as _dt

    s1 = table.snapshot().snapshot_id
    merge_batch(table, spark.createDataFrame(
        [(8, "update", "A", 0, "user", "a0-v2", None, TS),
         (9, "insert", "E", 0, "user", "e0", None, TS)],
        S.CHANGE_EVENT_SCHEMA), "seed", 1)
    s2 = table.snapshot().snapshot_id

    # VERSION AS OF <id>: pre-update text, no E conversation
    old = {(r["conv_id"], r["turn_idx"]): r["text"] for r in table.sql(
        f"SELECT conv_id, turn_idx, text FROM t VERSION AS OF {s1}"
    ).collect()}
    assert old[("A", 0)] == "a0" and ("E", 0) not in old
    # Iceberg FOR VERSION AS OF spelling, and the current snapshot
    assert table.sql(
        f"SELECT count(*) AS n FROM t FOR VERSION AS OF {s2}"
    ).head()["n"] == 4
    assert table.sql("SELECT count(*) AS n FROM t").head()["n"] == 4

    # VERSION AS OF '<tag>'
    table.tag("rel", s1)
    assert table.sql(
        "SELECT count(*) AS n FROM t VERSION AS OF 'rel'"
    ).head()["n"] == 3

    # TIMESTAMP AS OF epoch-seconds and ISO (and SQL:2011 SYSTEM_TIME)
    t1 = table.snapshot(s1).committed_at
    assert table.snapshot(s2).committed_at > t1  # test precondition
    assert table.sql(
        f"SELECT count(*) AS n FROM t TIMESTAMP AS OF {t1!r}"
    ).head()["n"] == 3
    iso = _dt.datetime.fromtimestamp(t1).isoformat()
    assert table.sql(
        f"SELECT count(*) AS n FROM t FOR SYSTEM_TIME AS OF '{iso}'"
    ).head()["n"] == 3

    # two agreeing clauses (self-join at one pin) work; the view is pinned
    assert table.sql(
        f"SELECT count(*) AS n FROM t VERSION AS OF {s1} "
        f"JOIN (SELECT 1) ON 1=1"
    ).head()["n"] == 3


def test_inline_time_travel_refusals(spark, table):
    s1 = table.snapshot().snapshot_id
    merge_batch(table, spark.createDataFrame(
        [(9, "insert", "E", 0, "user", "e0", None, TS)],
        S.CHANGE_EVENT_SCHEMA), "seed", 1)
    s2 = table.snapshot().snapshot_id

    with pytest.raises(ValueError, match="inline OR as a kwarg"):
        table.sql(f"SELECT * FROM t VERSION AS OF {s1}", snapshot_id=s1)
    with pytest.raises(ValueError, match="only.*INSERT.*MERGE"):
        table.sql(f"DELETE FROM t VERSION AS OF {s1} WHERE 1=1")
    with pytest.raises(ValueError, match="reads only live rows"):
        table.sql(f"UPDATE t FOR VERSION AS OF {s1} SET text = 'x'")
    with pytest.raises(ValueError, match="must agree"):
        table.sql(f"SELECT t1.* FROM t VERSION AS OF {s1} t1, "
                  f"t VERSION AS OF {s2} t2")
    with pytest.raises(ValueError, match="serves only view"):
        table.sql("SELECT * FROM other VERSION AS OF 1")
    with pytest.raises(KeyError, match="no tag"):
        table.sql("SELECT * FROM t VERSION AS OF 'nope'")
    with pytest.raises(FileNotFoundError):  # unknown snapshot id
        table.sql("SELECT * FROM t VERSION AS OF 9999")
    # a literal containing the clause text is data, not a pin
    table.create_view("t")
    execute_dml(table, "UPDATE t SET text = 'was VERSION AS OF 9' "
                       "WHERE conv_id = 'E'")
    got = table.read().filter(F.col("conv_id") == "E").head()["text"]
    assert got == "was VERSION AS OF 9"


def test_mv_sql_where_filter(spark, table, tmp_path):
    """CREATE MATERIALIZED VIEW … WHERE … (r5 final): the filter is parsed,
    applied pre-aggregation, persisted with the declaration, and survives
    the load-by-path REFRESH."""
    root = str(tmp_path / "mv_where")
    out = table.sql(
        f"CREATE MATERIALIZED VIEW '{root}' AS SELECT conv_id, "
        "count(*) AS n FROM t WHERE role = 'user' GROUP BY conv_id")
    assert {(r["conv_id"], r["n"]) for r in out.collect()} == {
        ("A", 1), ("B", 1)}
    execute_dml(table, "INSERT INTO t (conv_id, turn_idx, role, text) "
                       "VALUES ('C', 0, 'user', 'c0'), ('C', 1, 'assistant', 'c1')")
    out = table.sql(f"REFRESH MATERIALIZED VIEW '{root}'")
    assert {(r["conv_id"], r["n"]) for r in out.collect()} == {
        ("A", 1), ("B", 1), ("C", 1)}
    import json as _json
    import os
    decl = _json.load(open(os.path.join(root, "_mv.json")))
    assert decl["where"] == "role = 'user'"


def test_mv_grammar_survives_keyword_literals(spark, table, tmp_path):
    """A WHERE literal containing ' group by ' (or any clause keyword)
    is data, not grammar — the CREATE statement matches over a
    literal-masked copy, so the filter text survives intact."""
    root = str(tmp_path / "mv_lit")
    out = table.sql(
        f"CREATE MATERIALIZED VIEW '{root}' AS SELECT conv_id, "
        "count(*) AS n FROM t "
        "WHERE tool = 'no group by here' OR role = 'user' GROUP BY conv_id")
    assert {(r["conv_id"], r["n"]) for r in out.collect()} == {
        ("A", 1), ("B", 1)}
    import json as _json
    import os
    decl = _json.load(open(os.path.join(root, "_mv.json")))
    assert decl["where"] == "tool = 'no group by here' OR role = 'user'"


def test_time_travel_repair_insert_and_merge(spark, table):
    """Point-in-time repair (r5 final): a time-travel pin on the SOURCE of
    INSERT … SELECT / MERGE … USING restores rows from history into the
    live table — the statement's view reads the pinned snapshot, the write
    is a normal fenced epoch on the tip."""
    s1 = table.snapshot().snapshot_id
    execute_dml(table, "DELETE FROM t WHERE conv_id = 'B'")
    assert table.read().filter(F.col("conv_id") == "B").count() == 0

    # restore the deleted conversation from the pre-delete snapshot
    table.sql(f"INSERT INTO t (conv_id, turn_idx, role, text) "
              f"SELECT conv_id, turn_idx, role, text "
              f"FROM t VERSION AS OF {s1} WHERE conv_id = 'B'")
    got = table.read().filter(F.col("conv_id") == "B").collect()
    assert [(r["turn_idx"], r["text"]) for r in got] == [(0, "b0")]
    # the restore is a NEW higher-LSN write, not a resurrection of the
    # tombstoned version: the change feed shows it as the winner
    assert table.read().count() == 3

    # MERGE flavor: overwrite live text from a pinned snapshot's values
    execute_dml(table, "UPDATE t SET text = 'clobbered' WHERE conv_id = 'A'")
    table.sql(f"""
        MERGE INTO t USING (SELECT conv_id, turn_idx, text
                            FROM t VERSION AS OF {s1}
                            WHERE conv_id = 'A') AS s
        ON s.conv_id = t.conv_id AND s.turn_idx = t.turn_idx
        WHEN MATCHED THEN UPDATE SET text = s.text""")
    texts = {r["turn_idx"]: r["text"] for r in
             table.read().filter(F.col("conv_id") == "A").collect()}
    assert texts == {0: "a0", 1: "a1"}
    # follow-up SELECT through the front door sees the repaired tip
    assert table.sql("SELECT count(*) AS n FROM t").head()["n"] == 3


def test_time_travel_extraction_property():
    """Property (hypothesis): for ANY statement assembled from quoted
    literals (which may contain clause-shaped text) and real clauses on the
    registered name, extraction finds exactly the real clauses, strips
    exactly them, and never mistakes literal content for a pin."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from maestro_spark.sqldml import extract_time_travel_any

    kinds = st.sampled_from(["VERSION", "FOR VERSION", "TIMESTAMP",
                             "FOR SYSTEM_TIME", "for version", "timestamp"])
    vals = st.sampled_from(["3", "12.5", "'2025-01-01 00:00:00'", "'rel-1'",
                            '"tagname"'])
    idents = st.sampled_from(["t", "conv", "my_table"])
    lit_bodies = st.sampled_from([
        "plain text", "x VERSION AS OF 9", "FOR SYSTEM_TIME AS OF 1",
        "it''s TIMESTAMP AS OF '2020'", ""])

    @st.composite
    def statements(draw):
        parts, clauses = ["SELECT * FROM"], []
        for _ in range(draw(st.integers(0, 3))):
            which = draw(st.integers(0, 2))
            if which == 0:  # a real clause on a table reference
                ident = draw(idents)
                kind, val = draw(kinds), draw(vals)
                parts.append(f"{ident} {kind} AS OF {val}")
                norm = "VERSION" if "version" in kind.lower() else "TIMESTAMP"
                clauses.append((ident, norm, val))
            elif which == 1:  # a quoted literal with clause-shaped text
                parts.append(f"WHERE x = '{draw(lit_bodies)}'")
            else:
                parts.append("JOIN u ON 1=1")
        return " ".join(parts), clauses

    @given(statements())
    @settings(max_examples=200, deadline=None)
    def check(case):
        sql, clauses = case
        stripped, by_ident = extract_time_travel_any(sql)
        got = [(i, k, v) for i, pins in by_ident.items() for k, v in pins]
        # every real clause found with its ident/kind/value, nothing else
        assert sorted(got) == sorted(clauses)
        # stripping removed exactly the clause text (idents survive)
        assert "AS OF" not in stripped.replace(
            "''", "").split("'")[0] or not clauses
        re_stripped, re_pins = extract_time_travel_any(stripped)
        assert re_stripped == stripped and not re_pins  # idempotent

    check()


def test_restore_table_sql(spark, table):
    """RESTORE TABLE (r5 final, Delta parity): rolls the table back to a
    version or tag through the SQL door — forward-only (a NEW snapshot
    re-states the target; history stays for audit) — and refuses outside
    the grammar."""
    s1 = table.snapshot().snapshot_id
    table.tag("good", s1)
    execute_dml(table, "DELETE FROM t WHERE conv_id = 'A'")
    assert table.read().count() == 1

    out = table.sql(f"RESTORE TABLE t TO VERSION AS OF {s1}").head()
    assert out["op"] == "restore" and out["restored_to"] == s1
    assert out["snapshot_id"] > s1  # forward-only: a NEW snapshot
    assert table.read().count() == 3

    # tag flavor, via the warehouse-door routing too
    execute_dml(table, "DELETE FROM t WHERE conv_id = 'B'")
    table.sql("RESTORE TABLE t TO VERSION AS OF 'good'")
    assert table.read().count() == 3

    # timestamp flavor
    t1 = table.snapshot(s1).committed_at
    table.sql(f"RESTORE TABLE t TO TIMESTAMP AS OF {t1!r}")
    assert table.read().count() == 3

    with pytest.raises(ValueError, match="unsupported RESTORE"):
        table.sql("RESTORE TABLE t VERSION AS OF 1")  # missing TO
    with pytest.raises(ValueError, match="targets"):
        table.sql("RESTORE TABLE other TO VERSION AS OF 1")
