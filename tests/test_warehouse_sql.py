"""Warehouse-level SQL front door (r5 final): CREATE TABLE / CTAS / DROP
TABLE provision lake tables under a warehouse dir, single-table verbs
route by their own target name onto LakeTable.sql, SELECTs run over the
registered catalog with PER-TABLE inline time travel."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from maestro_spark.lake import LakeTable, warehouse_sql


@pytest.fixture()
def wh(tmp_path):
    return str(tmp_path / "wh")


def _seed(spark, wh):
    os.makedirs(wh, exist_ok=True)
    warehouse_sql(spark, wh, "CREATE TABLE conv (conv_id string, "
                             "turn_idx int, role string, text string) "
                             "WITH (n_buckets = 4)")
    warehouse_sql(spark, wh, "INSERT INTO conv (conv_id, turn_idx, role, text) "
                             "VALUES ('A', 0, 'user', 'hi'), "
                             "('A', 1, 'assistant', 'yo'), ('B', 0, 'user', 'q')")
    return LakeTable(spark, f"{wh}/conv")


def test_provision_route_select_and_per_table_time_travel(spark, wh):
    t = _seed(spark, wh)
    s1 = t.snapshot().snapshot_id
    warehouse_sql(spark, wh, "DELETE FROM conv WHERE conv_id = 'B'")

    assert warehouse_sql(spark, wh, "SELECT count(*) AS n FROM conv").head()["n"] == 2
    # the pinned past still serves, from the same statement text
    assert warehouse_sql(
        spark, wh, f"SELECT count(*) AS n FROM conv VERSION AS OF {s1}"
    ).head()["n"] == 3

    # CTAS over the live catalog; then join history vs tip in ONE statement
    warehouse_sql(spark, wh, "CREATE TABLE conv2 AS SELECT conv_id, turn_idx, "
                             "upper(text) AS text FROM conv")
    t2 = LakeTable(spark, f"{wh}/conv2")
    assert {r["text"] for r in t2.read().collect()} == {"HI", "YO"}
    joined = warehouse_sql(
        spark, wh,
        f"SELECT old.conv_id, old.turn_idx FROM conv VERSION AS OF {s1} old "
        "LEFT ANTI JOIN conv2 cur ON old.conv_id = cur.conv_id "
        "AND old.turn_idx = cur.turn_idx",
    ).collect()
    assert {(r[0], r[1]) for r in joined} == {("B", 0)}  # only the deleted row

    # ALTER and OPTIMIZE route to the target table's own front door
    warehouse_sql(spark, wh, "ALTER TABLE conv2 ADD COLUMN rating int")
    assert "rating" in [f.name for f in t2.snapshot().payload_schema().fields]
    out = warehouse_sql(spark, wh, "OPTIMIZE conv").head()
    assert out["op"] == "optimize"


def test_schema_contract_refusals_and_ctas_cleanup(spark, wh):
    os.makedirs(wh, exist_ok=True)
    with pytest.raises(ValueError, match="must include key column"):
        warehouse_sql(spark, wh, "CREATE TABLE x (a int)")
    with pytest.raises(ValueError, match="must be int, got bigint"):
        warehouse_sql(spark, wh, "CREATE TABLE x (conv_id string, turn_idx bigint)")
    with pytest.raises(ValueError, match="reserved"):
        warehouse_sql(spark, wh, "CREATE TABLE x (conv_id string, turn_idx int, "
                                 "_deleted boolean)")
    with pytest.raises(ValueError, match="unknown CREATE TABLE WITH"):
        warehouse_sql(spark, wh, "CREATE TABLE x (conv_id string, turn_idx int) "
                                 "WITH (buckets = 4)")
    _seed(spark, wh)
    with pytest.raises(ValueError, match="already exists"):
        warehouse_sql(spark, wh, "CREATE TABLE conv (conv_id string, turn_idx int)")
    # IF NOT EXISTS opens instead
    assert warehouse_sql(spark, wh, "CREATE TABLE IF NOT EXISTS conv "
                                    "(conv_id string, turn_idx int)").count() == 3
    # a CTAS that fails downstream (duplicate keys) leaves NO half-born table
    with pytest.raises(ValueError, match="duplicate keys"):
        warehouse_sql(spark, wh, "CREATE TABLE dup AS SELECT conv_id, "
                                 "0 AS turn_idx, text FROM conv")
    assert not os.path.exists(f"{wh}/dup")
    with pytest.raises(ValueError, match="no lake table 'missing'"):
        warehouse_sql(spark, wh, "UPDATE missing SET text = 'x'")
    with pytest.raises(ValueError, match="not a lake table"):
        warehouse_sql(spark, wh, "SELECT * FROM ghost VERSION AS OF 1")
    # index DDL on an unknown base refuses; a known base ROUTES (see
    # test_warehouse_routes_mv_and_index_ddl for the full lifecycle)
    with pytest.raises(ValueError, match="no lake table 'ghost'"):
        warehouse_sql(spark, wh, "CREATE INDEX i ON ghost USING text (text)")


def test_drop_table_removes_registered_derived_data(spark, wh):
    t = _seed(spark, wh)
    # declare a persisted MV and index so DROP has derived data to own
    mv = warehouse_sql  # noqa: F841  (readability)
    t.sql("CREATE MATERIALIZED VIEW stats AS SELECT conv_id, count(*) AS n "
          "FROM t GROUP BY conv_id", name="t")
    t.sql("CREATE INDEX terms ON t USING text (text)", name="t")
    mv_dir = t.root.rstrip("/") + "__mv_stats"
    idx_dir = t.root.rstrip("/") + "__idx_terms"
    assert os.path.isdir(mv_dir) and os.path.isdir(idx_dir)

    # a FOREIGN registry marker (another table's view, e.g. a registry dir
    # copied wholesale) must not let DROP TABLE delete that table's data
    import shutil
    warehouse_sql(spark, wh, "CREATE TABLE other (conv_id string, "
                             "turn_idx int, text string)")
    other = LakeTable(spark, f"{wh}/other")
    warehouse_sql(spark, wh, "INSERT INTO other (conv_id, turn_idx, text) "
                             "VALUES ('o', 0, 'x')")
    other.sql("CREATE MATERIALIZED VIEW ostats AS SELECT conv_id, "
              "count(*) AS n FROM other GROUP BY conv_id", name="other")
    other_mv = other.root.rstrip("/") + "__mv_ostats"
    assert os.path.isdir(other_mv)
    for f in os.listdir(os.path.join(other.root, "_mv_registry")):
        shutil.copy(os.path.join(other.root, "_mv_registry", f),
                    os.path.join(t.root, "_mv_registry", f))

    out = warehouse_sql(spark, wh, "DROP TABLE conv").head()
    assert os.path.isdir(other_mv)  # foreign view untouched
    summary = json.loads(out["summary"])
    assert summary["dropped"].endswith("/conv")
    assert sorted(os.path.basename(d) for d in summary["derived_dropped"]) == [
        "conv__idx_terms", "conv__mv_stats"]
    assert not os.path.exists(t.root)
    assert not os.path.exists(mv_dir) and not os.path.exists(idx_dir)
    assert not os.path.exists(idx_dir + "._index.json")
    # idempotent with IF EXISTS; loud without
    assert json.loads(warehouse_sql(spark, wh, "DROP TABLE IF EXISTS conv")
                      .head()["summary"])["dropped"] is None
    with pytest.raises(ValueError, match="no lake table"):
        warehouse_sql(spark, wh, "DROP TABLE conv")


def test_cli_table_ddl(spark, wh, capsys, monkeypatch):
    _seed(spark, wh)
    from maestro_spark.__main__ import main
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rc = main(["sql", "CREATE TABLE c3 AS SELECT conv_id, turn_idx, text "
               "FROM conv WHERE conv_id = 'A'", "--warehouse", wh])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 2
    assert LakeTable(spark, f"{wh}/c3").read().count() == 2
    rc = main(["sql", "DROP TABLE c3", "--warehouse", wh])
    assert rc == 0
    assert not os.path.exists(f"{wh}/c3")


def test_show_tables_and_describe(spark, wh):
    _seed(spark, wh)
    warehouse_sql(spark, wh, "CREATE TABLE empty_t (conv_id string, "
                             "turn_idx int, note string)")
    rows = {r["table_name"]: r for r in
            warehouse_sql(spark, wh, "SHOW TABLES").collect()}
    assert set(rows) == {"conv", "empty_t"}
    assert rows["conv"]["n_columns"] == 4 and rows["empty_t"]["n_columns"] == 3
    props = {r["property"]: r["value"] for r in
             warehouse_sql(spark, wh, "DESCRIBE conv").collect()}
    assert props["root"].endswith("/conv")
    assert json.loads(props["rows_incl_tombstones"]) == 3
    assert "conv_id:string" in props["schema"]
    with pytest.raises(ValueError, match="no lake table"):
        warehouse_sql(spark, wh, "DESCRIBE ghost")


def test_create_resumes_half_born_table(spark, wh):
    """A crash between mkdir and the first snapshot publish leaves a dir
    with an empty _snapshots/ chain; CREATE TABLE resumes it (both plain
    and IF NOT EXISTS) instead of refusing against an empty shell."""
    os.makedirs(f"{wh}/ghost/_snapshots")  # the half-born shape
    df = warehouse_sql(spark, wh, "CREATE TABLE ghost (conv_id string, "
                                  "turn_idx int, note string)")
    assert df.columns == ["conv_id", "turn_idx", "note"]
    t = LakeTable(spark, f"{wh}/ghost")
    assert t.snapshot().snapshot_id == 0
    # a fully-born table still refuses a plain re-CREATE
    with pytest.raises(ValueError, match="already exists"):
        warehouse_sql(spark, wh, "CREATE TABLE ghost (conv_id string, "
                                 "turn_idx int)")


def test_copy_into_idempotent_per_file(spark, wh, tmp_path):
    """COPY INTO (r5 final): per-file exactly-once derived from the
    snapshot chain's own epoch keys (no side-state), corrupt rows to the
    merge-compatible quarantine, re-runs load only NEW files, and the
    loaded rows carry a fresh dominating LSN."""
    import json as _json

    from maestro_spark.merge import read_quarantine

    _seed(spark, wh)
    src = tmp_path / "incoming"
    src.mkdir()
    (src / "a.csv").write_text(
        "conv_id,turn_idx,role,text\nX,0,user,x0\nX,1,assistant,x1\n")
    (src / "b.csv").write_text(
        "conv_id,turn_idx,role,text\nY,0,user,y0\nY,oops,user,bad\n")

    s1 = _json.loads(warehouse_sql(
        spark, wh, f"COPY INTO conv FROM '{src}' FILEFORMAT = csv"
    ).head()["summary"])
    assert (s1["files_loaded"], s1["rows_loaded"], s1["rows_quarantined"]) \
        == (2, 3, 1)
    t = LakeTable(spark, f"{wh}/conv")
    assert t.read().count() == 6  # 3 seeded + 3 loaded

    # exact re-run: nothing loads, nothing duplicates
    s2 = _json.loads(warehouse_sql(
        spark, wh, f"COPY INTO conv FROM '{src}' FILEFORMAT = csv"
    ).head()["summary"])
    assert (s2["files_loaded"], s2["files_skipped"], s2["rows_loaded"]) \
        == (0, 2, 0)
    assert t.read().count() == 6

    # a new file loads alone; a loaded file's UPSERT dominates prior rows
    (src / "c.csv").write_text(
        "conv_id,turn_idx,role,text\nA,0,user,REPLACED\n")
    s3 = _json.loads(warehouse_sql(
        spark, wh, f"COPY INTO conv FROM '{src}' FILEFORMAT = csv"
    ).head()["summary"])
    assert (s3["files_loaded"], s3["files_skipped"]) == (1, 2)
    assert t.read().filter("conv_id = 'A' AND turn_idx = 0") \
        .head()["text"] == "REPLACED"

    # the DLQ row is readable through the standard repair flow
    dlq = read_quarantine(t, "copy").collect()
    assert len(dlq) == 1 and dlq[0]["_reason"] == "corrupt_record"
    assert "oops" in dlq[0]["_corrupt"]

    # grammar refusals
    with pytest.raises(ValueError, match="fileformat"):
        warehouse_sql(spark, wh, f"COPY INTO conv FROM '{src}' "
                                 "FILEFORMAT = avro")
    with pytest.raises(ValueError, match="no files"):
        warehouse_sql(spark, wh, f"COPY INTO conv FROM '{src}/none-*' "
                                 "FILEFORMAT = csv")
    with pytest.raises(ValueError, match="unsupported COPY"):
        warehouse_sql(spark, wh, "COPY INTO conv FROM missing_quotes "
                                 "FILEFORMAT = csv")


def test_warehouse_routes_mv_and_index_ddl(spark, wh, tmp_path):
    """Every MV/index verb routes from the warehouse door (r5 final):
    CREATE by its inline base reference, REFRESH/DROP by the persisted
    declaration's own base root (quoted-path targets)."""
    _seed(spark, wh)
    mv_root = str(tmp_path / "mv")
    out = warehouse_sql(
        spark, wh, f"CREATE MATERIALIZED VIEW '{mv_root}' AS "
        "SELECT conv_id, count(*) AS n FROM conv GROUP BY conv_id")
    assert {(r["conv_id"], r["n"]) for r in out.collect()} == {
        ("A", 2), ("B", 1)}
    warehouse_sql(spark, wh, "INSERT INTO conv (conv_id, turn_idx, role, "
                             "text) VALUES ('C', 0, 'user', 'c0')")
    out = warehouse_sql(spark, wh, f"REFRESH MATERIALIZED VIEW '{mv_root}'")
    assert ("C", 1) in {(r["conv_id"], r["n"]) for r in out.collect()}

    idx_root = str(tmp_path / "idx")
    warehouse_sql(spark, wh, f"CREATE INDEX '{idx_root}' ON conv "
                             "USING text (text) WITH (n_buckets = 4)")
    warehouse_sql(spark, wh, f"REFRESH INDEX '{idx_root}'")
    assert os.path.isdir(idx_root)

    assert warehouse_sql(spark, wh, f"DROP INDEX '{idx_root}'") \
        .head()[0] == idx_root
    assert warehouse_sql(spark, wh, f"DROP MATERIALIZED VIEW '{mv_root}'") \
        .head()[0] == mv_root
    # IF EXISTS no-ops on the already-dropped path
    assert warehouse_sql(
        spark, wh, f"DROP MATERIALIZED VIEW IF EXISTS '{mv_root}'"
    ).head()[0] is None
    # bare-name REFRESH/DROP need the owning table's door
    with pytest.raises(ValueError, match="QUOTED path"):
        warehouse_sql(spark, wh, "REFRESH MATERIALIZED VIEW stats")


def test_copy_into_batched_mode(spark, wh, tmp_path):
    """Batched COPY INTO (per_file = 0): all pending files land as ONE
    merge epoch; the loaded set interoperates with per-file mode; a commit
    whose ledger record was lost is recognized by its epoch key and the
    ledger backfills instead of double-loading."""
    import json as _json

    _seed(spark, wh)
    t = LakeTable(spark, f"{wh}/conv")
    src = tmp_path / "bulk"
    src.mkdir()
    for i in range(4):
        (src / f"f{i}.csv").write_text(
            f"conv_id,turn_idx,role,text\nN{i},0,user,n{i}\n")

    snaps_before = len(t.snapshot_ids())
    s1 = _json.loads(warehouse_sql(
        spark, wh, f"COPY INTO conv FROM '{src}' FILEFORMAT = csv "
                   "WITH (per_file = 0)").head()["summary"])
    assert (s1["files_loaded"], s1["rows_loaded"]) == (4, 4)
    assert len(t.snapshot_ids()) == snaps_before + 1  # ONE epoch for 4 files
    assert t.read().filter("conv_id LIKE 'N%'").count() == 4

    # idempotent re-run (batched)
    s2 = _json.loads(warehouse_sql(
        spark, wh, f"COPY INTO conv FROM '{src}' FILEFORMAT = csv "
                   "WITH (per_file = 0)").head()["summary"])
    assert (s2["files_loaded"], s2["files_skipped"]) == (0, 4)

    # per-file mode sees the batched files as loaded (shared loaded-set):
    # ONLY the new file loads — the 4 batched ones are skipped, never
    # re-read, and emit no fresh change-feed rows
    (src / "g.csv").write_text("conv_id,turn_idx,role,text\nG,0,user,g\n")
    from maestro_spark.ingest import copy_into
    s3 = copy_into(t, str(src), "csv", per_file=True)
    assert (s3["files_loaded"], s3["files_skipped"]) == (1, 4)
    assert t.read().filter("conv_id = 'G'").count() == 1
    assert t.read().filter("conv_id LIKE 'N%'").count() == 4  # no dupes

    # crash-before-ledger simulation: a MULTI-file batch (whose batch key
    # differs from every per-file key) loses its ledger record; the re-run
    # recomputes the same pending set, the epoch key catches the commit,
    # and the ledger entry backfills instead of double-loading
    import os as _os
    ldir = _os.path.join(t.root, "_ledger", "copy")
    (src / "h1.csv").write_text("conv_id,turn_idx,role,text\nH,0,user,h1\n")
    (src / "h2.csv").write_text("conv_id,turn_idx,role,text\nH,1,user,h2\n")
    before = set(_os.listdir(ldir))
    s4 = copy_into(t, str(src / "h*.csv"), "csv", per_file=False)
    assert s4["files_loaded"] == 2
    new_entry = (set(_os.listdir(ldir)) - before).pop()
    _os.unlink(_os.path.join(ldir, new_entry))  # lose the ledger record
    s5 = copy_into(t, str(src / "h*.csv"), "csv", per_file=False)
    assert (s5["files_loaded"], s5["files_skipped"]) == (0, 2)  # key caught it
    assert _os.path.exists(_os.path.join(ldir, new_entry))  # backfilled
    # and with the ledger healed, the next run's loaded-set sees the tags
    s6 = copy_into(t, str(src / "h*.csv"), "csv", per_file=False)
    assert (s6["files_loaded"], s6["files_skipped"]) == (0, 2)
    assert t.read().filter("conv_id = 'H'").count() == 2

    # crash-before-ledger with a CHANGED pending set: lose the ledger
    # record AND add a new file before the retry — the batch key no longer
    # matches, but the committed snapshot's own copy_files stats mark the
    # old files loaded, so only the new file loads (no double-load)
    (src / "k1.csv").write_text("conv_id,turn_idx,role,text\nK,0,user,k1\n")
    (src / "k2.csv").write_text("conv_id,turn_idx,role,text\nK,1,user,k2\n")
    before = set(_os.listdir(ldir))
    s7 = copy_into(t, str(src / "k*.csv"), "csv", per_file=False)
    assert s7["files_loaded"] == 2
    for entry in set(_os.listdir(ldir)) - before:
        _os.unlink(_os.path.join(ldir, entry))  # lose the ledger record
    (src / "k3.csv").write_text("conv_id,turn_idx,role,text\nK,2,user,k3\n")
    s8 = copy_into(t, str(src / "k*.csv"), "csv", per_file=False)
    assert (s8["files_loaded"], s8["files_skipped"]) == (1, 2)
    assert t.read().filter("conv_id = 'K'").count() == 3
    # …and per-file mode agrees the whole K set is loaded
    s9 = copy_into(t, str(src / "k*.csv"), "csv", per_file=True)
    assert (s9["files_loaded"], s9["files_skipped"]) == (0, 3)


def test_copy_into_subdir_tags_and_grouped_scan(spark, wh, tmp_path):
    """Two same-named same-sized files in DIFFERENT subdirectories of a
    recursive glob are distinct loads (tags are relative paths, not
    basenames — a basename tag would silently skip the second forever);
    and a batched load of mixed-header CSVs lands all rows in one epoch
    via signature-grouped scans (subset headers fill absent columns)."""
    import json as _json

    _seed(spark, wh)
    t = LakeTable(spark, f"{wh}/conv")
    src = tmp_path / "tree"
    (src / "a").mkdir(parents=True)
    (src / "b").mkdir()
    # identical byte LENGTH, same basename, different content
    (src / "a" / "part.csv").write_text(
        "conv_id,turn_idx,role,text\nP1,0,user,xx\n")
    (src / "b" / "part.csv").write_text(
        "conv_id,turn_idx,role,text\nP2,0,user,yy\n")
    from maestro_spark.ingest import copy_into
    s1 = copy_into(t, str(src / "*" / "*.csv"), "csv", per_file=False)
    assert (s1["files_loaded"], s1["rows_loaded"]) == (2, 2)
    assert t.read().filter("conv_id IN ('P1','P2')").count() == 2
    s2 = copy_into(t, str(src / "*" / "*.csv"), "csv", per_file=False)
    assert (s2["files_loaded"], s2["files_skipped"]) == (0, 2)

    # mixed headers in one batched load: three full-header files share one
    # grouped scan, the subset-header file gets its own; all ONE epoch
    bulk = tmp_path / "mixed"
    bulk.mkdir()
    for i in range(3):
        (bulk / f"full{i}.csv").write_text(
            f"conv_id,turn_idx,role,text\nM{i},0,user,m{i}\n")
    (bulk / "subset.csv").write_text("conv_id,turn_idx\nM9,0\n")
    snaps_before = len(t.snapshot_ids())
    s3 = _json.loads(warehouse_sql(
        spark, wh, f"COPY INTO conv FROM '{bulk}' FILEFORMAT = csv "
                   "WITH (per_file = 0)").head()["summary"])
    assert (s3["files_loaded"], s3["rows_loaded"]) == (4, 4)
    assert len(t.snapshot_ids()) == snaps_before + 1
    got = {r["conv_id"]: r["text"]
           for r in t.read().filter("conv_id LIKE 'M%'").collect()}
    assert got == {"M0": "m0", "M1": "m1", "M2": "m2", "M9": None}


def test_show_materialized_views_and_indexes(spark, wh):
    """SHOW MATERIALIZED VIEWS / SHOW INDEXES list the persisted
    declarations registered over a table (metadata only) through both
    doors; the warehouse door needs ON <table>, the table door refuses a
    foreign target."""
    _seed(spark, wh)
    t = LakeTable(spark, f"{wh}/conv")
    assert t.sql("SHOW MATERIALIZED VIEWS", name="t").count() == 0
    t.sql("CREATE MATERIALIZED VIEW stats AS SELECT conv_id, count(*) AS n "
          "FROM t GROUP BY conv_id", name="t")
    t.sql("CREATE INDEX terms ON t USING text (text)", name="t")
    mv_rows = t.sql("SHOW MATERIALIZED VIEWS", name="t").collect()
    assert [os.path.basename(r["root"]) for r in mv_rows] == ["conv__mv_stats"]
    assert json.loads(mv_rows[0]["declaration"])["key_cols"] == ["conv_id"]
    idx_rows = warehouse_sql(spark, wh, "SHOW INDEXES ON conv").collect()
    assert [os.path.basename(r["root"]) for r in idx_rows] == ["conv__idx_terms"]
    assert json.loads(idx_rows[0]["declaration"])["kind"] == "text"
    with pytest.raises(ValueError, match="needs ON"):
        warehouse_sql(spark, wh, "SHOW INDEXES")
    with pytest.raises(ValueError, match="registered as"):
        t.sql("SHOW INDEXES ON other", name="t")


def test_copy_into_orc_and_explain(spark, wh, tmp_path):
    """ORC rides the same schema-projected columnar path as parquet
    (footer-typed, exactly-once per file); EXPLAIN passes through both
    front doors to Spark's native planner, honoring inline time travel."""
    _seed(spark, wh)
    t = LakeTable(spark, f"{wh}/conv")
    src = str(tmp_path / "orc")
    spark.createDataFrame(
        [("O1", 0, "user", "o-zero"), ("O1", 1, "assistant", "o-one")],
        "conv_id string, turn_idx int, role string, text string",
    ).coalesce(1).write.orc(src)
    s1 = json.loads(warehouse_sql(
        spark, wh, f"COPY INTO conv FROM '{src}/*.orc' FILEFORMAT = orc"
    ).head()["summary"])
    assert (s1["files_loaded"], s1["rows_loaded"]) == (1, 2)
    assert t.read().filter("conv_id = 'O1'").count() == 2
    s2 = json.loads(warehouse_sql(
        spark, wh, f"COPY INTO conv FROM '{src}/*.orc' FILEFORMAT = orc"
    ).head()["summary"])
    assert (s2["files_loaded"], s2["files_skipped"]) == (0, 1)

    plan = t.sql("EXPLAIN FORMATTED SELECT conv_id, count(*) AS n FROM t "
                 "WHERE turn_idx = 0 GROUP BY conv_id").head()["plan"]
    assert "Physical Plan" in plan and "HashAggregate" in plan
    plan2 = warehouse_sql(
        spark, wh, "EXPLAIN SELECT count(*) FROM conv VERSION AS OF 1"
    ).head()["plan"]
    assert "Physical Plan" in plan2


def test_copy_into_schema_evolution(spark, wh, tmp_path):
    """COPY INTO WITH (evolve = 1): unknown incoming columns evolve the
    table schema in the loading commit (merge-side add-only gate) instead
    of refusing; types come from one per-file inference pass (CSV/JSON) or
    the parquet footer; reserved internal names refuse in every mode; and
    the dropped-name protection holds (a re-sent dropped column evolves a
    FRESH column — pre-drop files never leak into it)."""
    from maestro_spark import ddl

    t = _seed(spark, wh)
    src = tmp_path / "in_evolve"
    src.mkdir()
    (src / "a.csv").write_text(
        "conv_id,turn_idx,role,text,score\nE,0,user,e0,7\n")

    # without evolve: same refusal as before, now naming the opt-in
    with pytest.raises(ValueError, match="evolve = 1"):
        warehouse_sql(spark, wh,
                      f"COPY INTO conv FROM '{src}' FILEFORMAT = csv")

    s1 = json.loads(warehouse_sql(
        spark, wh, f"COPY INTO conv FROM '{src}' FILEFORMAT = csv "
                   "WITH (evolve = 1)").head()["summary"])
    assert (s1["files_loaded"], s1["rows_loaded"]) == (1, 1)
    got = {f.name: f.dataType.simpleString() for f in
           t.snapshot().payload_schema().fields}
    assert got["score"] == "int"  # inference typed the new column
    rows = {r["conv_id"]: r["score"] for r in
            t.read().select("conv_id", "score").collect()}
    assert rows["E"] == 7 and rows["A"] is None  # old rows read null

    # JSON evolution: a second new column arrives name-based
    (src / "b.jsonl").write_text(
        '{"conv_id": "F", "turn_idx": 0, "role": "user", '
        '"text": "f0", "lang": "en"}\n')
    s2 = json.loads(warehouse_sql(
        spark, wh, f"COPY INTO conv FROM '{src / 'b.jsonl'}' "
                   "FILEFORMAT = json WITH (evolve = 1)").head()["summary"])
    assert s2["files_loaded"] == 1
    assert t.read().filter("conv_id = 'F'").head()["lang"] == "en"

    # parquet evolution: footer-typed new column
    spark.createDataFrame(
        [("G", 0, "user", "g0", 2.5)],
        "conv_id string, turn_idx int, role string, text string, conf double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "pq"))
    s3 = json.loads(warehouse_sql(
        spark, wh, f"COPY INTO conv FROM '{tmp_path / 'pq'}/part-*.parquet' "
                   "FILEFORMAT = parquet WITH (evolve = 1)").head()["summary"])
    assert s3["files_loaded"] == 1
    got = {f.name: f.dataType.simpleString() for f in
           t.snapshot().payload_schema().fields}
    assert got["conf"] == "double"

    # reserved internal names refuse even with evolve
    (src / "bad.csv").write_text("conv_id,turn_idx,op_lsn\nZ,0,9\n")
    with pytest.raises(ValueError, match="internal/event"):
        warehouse_sql(spark, wh,
                      f"COPY INTO conv FROM '{src / 'bad.csv'}' "
                      "FILEFORMAT = csv WITH (evolve = 1)")

    # dropped-name protection: drop score, re-send it via COPY evolve —
    # the re-add is a FRESH column; pre-drop files read null, never 7
    ddl.drop_column(t, "score")
    (src / "c.csv").write_text(
        "conv_id,turn_idx,role,text,score\nH,0,user,h0,11\n")
    s4 = json.loads(warehouse_sql(
        spark, wh, f"COPY INTO conv FROM '{src / 'c.csv'}' "
                   "FILEFORMAT = csv WITH (evolve = 1)").head()["summary"])
    assert s4["files_loaded"] == 1
    rows = {r["conv_id"]: r["score"] for r in
            t.read().select("conv_id", "score").collect()}
    assert rows["H"] == 11 and rows["E"] is None


def test_describe_history_and_files(spark, wh):
    """DESCRIBE HISTORY / DESCRIBE FILES (Delta/Iceberg metadata-table
    parity) serve the snapshot chain and the live file manifest as result
    rows through BOTH SQL doors — metadata only, no data IO."""
    t = _seed(spark, wh)

    hist = warehouse_sql(spark, wh, "DESCRIBE HISTORY conv").collect()
    assert [r["snapshot_id"] for r in hist] == sorted(t.snapshot_ids())
    assert hist[-1]["epoch_key"].startswith("sqldml:")  # the INSERT epoch

    files = warehouse_sql(spark, wh, "DESCRIBE FILES conv")
    assert files.count() > 0 and "lsn_max" in files.columns

    # single-table door: same statements, target-name discipline
    assert t.sql("DESCRIBE HISTORY t").count() == len(hist)
    with pytest.raises(ValueError, match="registered as"):
        t.sql("DESCRIBE HISTORY other")
    # plain DESCRIBE still resolves to the one-call report
    rep = warehouse_sql(spark, wh, "DESCRIBE conv").collect()
    assert {"root", "snapshot_id"} <= {r["property"] for r in rep}


def test_truncate_and_show_create(spark, wh):
    """TRUNCATE TABLE = one fenced delete-all epoch (tombstones — the
    feed/history remember the rows); SHOW CREATE TABLE emits a statement
    that round-trips through the warehouse door."""
    t = _seed(spark, wh)
    pre = t.snapshot().snapshot_id

    stmt = warehouse_sql(spark, wh, "SHOW CREATE TABLE conv") \
        .head()["create_statement"]
    assert stmt.startswith("CREATE TABLE conv (conv_id string, turn_idx int")
    assert "n_buckets = 4" in stmt

    out = warehouse_sql(spark, wh, "TRUNCATE TABLE conv")
    assert out.count() == 0  # post-statement live rows
    assert t.read().count() == 0
    # tombstones, not erasure: one new snapshot, deletes visible in history
    assert t.snapshot().snapshot_id == pre + 1
    assert t.read(snapshot_id=pre).count() == 3
    # idempotent grammar discipline: wrong target refuses
    with pytest.raises(ValueError, match="refusing"):
        t.sql("TRUNCATE TABLE other")

    # the SHOW CREATE statement round-trips as a fresh table
    stmt2 = stmt.replace("CREATE TABLE conv", "CREATE TABLE conv2")
    df = warehouse_sql(spark, wh, stmt2)
    assert "role" in df.columns
    assert warehouse_sql(spark, wh, "SHOW CREATE TABLE conv2") \
        .head()["create_statement"] == stmt2


def test_search_statement(spark, wh, tmp_path):
    """SEARCH routes retrieval onto a maintained text index through both
    SQL doors — the base table is never scanned, and modes map to the
    index's probe family (tf AND, BM25, phrase)."""
    t = _seed(spark, wh)
    warehouse_sql(spark, wh, "INSERT INTO conv VALUES "
                             "('C', 0, 'user', 'spark engine of record'), "
                             "('C', 1, 'assistant', 'the spark engine')")
    idx_path = str(tmp_path / "conv_text_idx")
    warehouse_sql(spark, wh,
                  f"CREATE INDEX '{idx_path}' ON conv USING text (text)")

    rows = warehouse_sql(spark, wh,
                         f"SEARCH '{idx_path}' FOR 'spark engine' MODE and"
                         ).collect()
    assert {(r["conv_id"], r["turn_idx"]) for r in rows} \
        == {("C", 0), ("C", 1)}

    top = warehouse_sql(spark, wh,
                        f"SEARCH '{idx_path}' FOR 'engine record' LIMIT 1"
                        ).collect()  # default mode = bm25 OR
    assert len(top) == 1 and top[0]["turn_idx"] == 0  # 'record' only in C/0

    ph = warehouse_sql(spark, wh,
                       f"SEARCH '{idx_path}' FOR 'engine of record' "
                       "MODE phrase").collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in ph] == [("C", 0)]

    with pytest.raises(ValueError, match="QUOTED"):
        warehouse_sql(spark, wh, "SEARCH bare_idx FOR 'spark'")
    with pytest.raises(ValueError, match="unsupported SEARCH"):
        t.sql(f"SEARCH '{idx_path}' FOR spark")  # unquoted query text
    # bad mode refuses with the accepted list
    with pytest.raises(ValueError, match="accepted: term"):
        t.sql(f"SEARCH '{idx_path}' FOR 'spark' MODE fuzzy")
