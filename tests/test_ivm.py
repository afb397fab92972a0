"""Incremental view maintenance: the view must always reconverge to the
full recompute, refresh must be delta-driven and idempotent, and deletes
must propagate as view tombstones."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from maestro_spark.gen import GenConfig, generate, write_log
from maestro_spark.ivm import ConvStatsView
from maestro_spark.lake import LakeTable
from maestro_spark.merge import merge_batch
from maestro_spark.replay import replay


def _build_base(spark, d, n_convs=120, segments=4):
    log = generate(GenConfig(seed=31, n_convs=n_convs))
    write_log(log, f"{d}/log", segment_rows=(len(log) + segments - 1) // segments)
    t = LakeTable.create(spark, f"{d}/lake", n_buckets=8)
    replay(spark, f"{d}/log", t, query_id="ivm-base")
    return t


def _assert_view_matches(view):
    got = view.read().orderBy("conv_id").toPandas()
    exp = view.expected().orderBy("conv_id").toPandas()
    assert len(got) == len(exp)
    for col in ("conv_id", "n_turns", "n_tool_turns", "total_chars", "last_ts"):
        assert (
            got[col].fillna(-1).values == exp[col].fillna(-1).values
        ).all(), col


def test_staged_refresh_reconverges(spark):
    d = tempfile.mkdtemp()
    base = _build_base(spark, d)
    sids = [s for s in base.snapshot_ids() if s > 0]
    assert len(sids) >= 3  # one snapshot per replay epoch
    view = ConvStatsView(spark, base, f"{d}/stats")
    # refresh in two stages: mid-chain, then to current — the second stage
    # must fold exactly the remaining epochs' changes
    mid = sids[len(sids) // 2]
    assert view.refresh(to_snapshot=mid) is not None
    assert view.applied_through() == mid
    assert view.refresh() is not None
    assert view.applied_through() == sids[-1]
    _assert_view_matches(view)


def test_refresh_is_idempotent(spark):
    d = tempfile.mkdtemp()
    base = _build_base(spark, d)
    view = ConvStatsView(spark, base, f"{d}/stats")
    assert view.refresh() is not None
    assert view.refresh() is None  # already current: no new snapshot
    # re-attaching from disk derives the same cursor (no state file)
    again = ConvStatsView(spark, base, f"{d}/stats")
    assert again.applied_through() == view.applied_through()
    assert again.refresh() is None


def test_full_conv_delete_tombstones_view_row(spark):
    d = tempfile.mkdtemp()
    base = _build_base(spark, d)
    view = ConvStatsView(spark, base, f"{d}/stats")
    view.refresh()
    victim = base.read().select("conv_id").orderBy("conv_id").head()[0]
    assert view.read().filter(F.col("conv_id") == victim).count() == 1
    # delete every turn of one conversation through the normal merge path
    max_lsn = base.read_resolved().agg(F.max("_lsn")).head()[0]
    doomed = (
        base.read()
        .filter(F.col("conv_id") == victim)
        .select(
            (F.lit(max_lsn) + 1 + F.col("turn_idx")).cast("long").alias("op_lsn"),
            F.lit("delete").alias("op"),
            "conv_id", "turn_idx", "role", "text", "tool", "ts",
        )
    )
    assert merge_batch(base, doomed, query_id="ivm-del", epoch_id=999) is not None
    view.refresh()
    assert view.read().filter(F.col("conv_id") == victim).count() == 0
    _assert_view_matches(view)


def test_refresh_across_compaction(spark):
    d = tempfile.mkdtemp()
    base = _build_base(spark, d)
    view = ConvStatsView(spark, base, f"{d}/stats")
    sids = [s for s in base.snapshot_ids() if s > 0]
    view.refresh(to_snapshot=sids[0])
    base.compact()  # content-preserving maintenance snapshot mid-range
    assert view.refresh() is not None
    _assert_view_matches(view)


def test_full_refresh_fallback_after_expiry(spark):
    d = tempfile.mkdtemp()
    base = _build_base(spark, d)
    view = ConvStatsView(spark, base, f"{d}/stats")
    sids = [s for s in base.snapshot_ids() if s > 0]
    view.refresh(to_snapshot=sids[0])
    # expire the early chain so the incremental feed horizon is gone
    base.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        base.changes(view.applied_through())
    assert view.refresh() is not None  # silently falls back to full rebuild
    _assert_view_matches(view)


def test_crossover_rebuilds_when_feed_outweighs_table(spark, monkeypatch):
    """When the unapplied feed range carries more bytes than the table
    itself (epochs re-stating the same keys, then compacted away), refresh
    must route through full_refresh — and still reconverge."""
    d = tempfile.mkdtemp()
    base = _build_base(spark, d)
    # re-apply the same log under a second query id: every key re-stated,
    # so the feed over the full chain carries ~2x the compacted table
    replay(spark, f"{d}/log", base, query_id="ivm-base-2")
    base.compact()
    to = base.snapshot().snapshot_id
    view = ConvStatsView(spark, base, f"{d}/stats")
    assert view._range_bytes(0, to) > view._table_bytes(to)
    calls = []
    orig = view.full_refresh
    monkeypatch.setattr(
        view, "full_refresh", lambda t=None: calls.append(t) or orig(t)
    )
    assert view.refresh() is not None
    assert calls, "crossover should route through full_refresh"
    _assert_view_matches(view)


def test_streaming_maintains_view_per_epoch(spark, tmp_path):
    """stream_ingest(maintain_views=[view]) keeps the view converged with the
    final table state after the availableNow run completes."""
    from maestro_spark.stream import stream_ingest

    log = generate(GenConfig(seed=13, n_convs=60, segment_rows=400))
    write_log(log, str(tmp_path / "log"), segment_rows=400)
    base = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8)
    view = ConvStatsView(spark, base, str(tmp_path / "stats"))
    stream_ingest(
        spark, str(tmp_path / "log"), base.root, query_id="sivm",
        maintain_views=[view],
    )
    assert view.applied_through() == base.snapshot().snapshot_id
    _assert_view_matches(view)


def _role_view(spark, base, root):
    from maestro_spark.ivm import MaterializedView

    return MaterializedView(
        spark, base, root,
        key_cols=["conv_id", "role"],
        aggs=[
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long"))
             .alias("total_chars"),
            F.max("ts").alias("last_ts"),
        ],
        columns=["conv_id", "role", "text", "ts"],
        query_id="ivm-role-stats",
    )


def _assert_mv_matches(view, keys):
    got = view.read().orderBy(*keys).toPandas()
    exp = view.expected().orderBy(*keys).toPandas()
    assert len(got) == len(exp), (len(got), len(exp))
    for col in got.columns:
        assert (got[col].fillna(-1).values == exp[col].fillna(-1).values).all(), col


def test_declared_view_staged_refresh_reconverges(spark):
    """The generalized MaterializedView (r4 verdict ask #2): a multi-key
    (conv_id, role) declaration rides the SAME delta machinery — staged
    refresh reconverges to the full recompute at every stage."""
    d = tempfile.mkdtemp()
    base = _build_base(spark, d, n_convs=60, segments=3)
    sids = [s for s in base.snapshot_ids() if s > 0]
    view = _role_view(spark, base, f"{d}/role_view")
    for sid in sids[:: max(1, len(sids) // 3)] + [sids[-1]]:
        view.refresh(to_snapshot=sid)
    _assert_mv_matches(view, ["conv_id", "role"])


def test_declared_view_delete_tombstones_vanished_groups(spark):
    """Deleting every turn of one role inside a conversation must tombstone
    exactly that (conv, role) group — the vanished-group detection over the
    encoded multi-key."""
    d = tempfile.mkdtemp()
    base = _build_base(spark, d, n_convs=40, segments=2)
    view = _role_view(spark, base, f"{d}/role_view")
    view.refresh()
    _assert_mv_matches(view, ["conv_id", "role"])
    # pick a conv and delete all its 'user' turns
    victim = base.read().filter(F.col("role") == "user").head()["conv_id"]
    rows = base.read().filter(
        (F.col("conv_id") == victim) & (F.col("role") == "user")
    ).select("conv_id", "turn_idx").collect()
    max_lsn = int(base.snapshot().stats.get("max_lsn") or 0)
    events = spark.createDataFrame(
        [(max_lsn + 1 + i, "delete", r["conv_id"], r["turn_idx"])
         for i, r in enumerate(rows)],
        "op_lsn long, op string, conv_id string, turn_idx int")
    merge_batch(base, events, "kill-role", 1)
    view.refresh()
    got = view.read().filter(
        (F.col("conv_id") == victim) & (F.col("role") == "user"))
    assert got.count() == 0
    _assert_mv_matches(view, ["conv_id", "role"])


def test_declared_view_idempotent_and_validates(spark):
    d = tempfile.mkdtemp()
    base = _build_base(spark, d, n_convs=20, segments=1)
    view = _role_view(spark, base, f"{d}/role_view")
    assert view.refresh() is not None
    assert view.refresh() is None          # already current
    _assert_mv_matches(view, ["conv_id", "role"])
    from maestro_spark.ivm import MaterializedView

    with pytest.raises(ValueError, match="conv_id in key_cols"):
        MaterializedView(spark, base, f"{d}/bad", key_cols=["role"],
                         aggs=[F.count(F.lit(1)).alias("n")])
    with pytest.raises(ValueError, match="unknown key"):
        MaterializedView(spark, base, f"{d}/bad2",
                         key_cols=["conv_id", "nope"],
                         aggs=[F.count(F.lit(1)).alias("n")])
    # full-only opt-in: a role-keyed (cross-conversation) view still works,
    # every refresh a full recompute
    v = MaterializedView(
        spark, base, f"{d}/role_only",
        key_cols=["role"],
        aggs=[F.count(F.lit(1)).alias("n_turns")],
        columns=["role"],
        query_id="ivm-role-only", allow_full_only=True)
    v.refresh()
    got = {r["role"]: r["n_turns"] for r in v.read().collect()}
    exp = {r["role"]: r["n_turns"] for r in v.expected().collect()}
    assert got == exp


def test_cli_declarative_view_and_alter_erase(spark, tmp_path, capsys, monkeypatch):
    """CLI surface for the r5 features: `ivm --keys/--aggs` declares and
    refreshes a MaterializedView; `alter --drop --erase` takes the
    immediate-RTBF path (data files rewritten), plain --drop is
    metadata-only (zero files written)."""
    import json as _json
    import tempfile

    from maestro_spark.__main__ import main as cli

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    d = tempfile.mkdtemp()
    base = _build_base(spark, d, n_convs=20, segments=1)

    rc = cli(["ivm", "--table", base.root, "--view", f"{d}/cli_view",
              "--keys", "conv_id,role",
              "--aggs", "count(1) AS n_turns, max(ts) AS last_ts",
              "--columns", "conv_id,role,ts",
              "--query-id", "cli-role"])
    assert rc in (0, None)
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["refreshed"] and out["view_rows"] > 0
    view = _role_view(spark, base, f"{d}/cli_view2")  # independent recompute
    view.refresh()
    assert out["view_rows"] == view.read().count()

    files_before = {p for ps in base.snapshot().files.values() for p in ps}
    rc = cli(["alter", "--table", base.root, "--drop", "tool"])
    assert rc in (0, None)
    assert {p for ps in base.snapshot().files.values() for p in ps} == files_before
    _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rc = cli(["alter", "--table", base.root, "--drop", "text", "--erase"])
    assert rc in (0, None)
    assert {p for ps in base.snapshot().files.values() for p in ps} != files_before
    cols = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])["schema"]
    assert not any(c.startswith("text:") or c.startswith("tool:") for c in cols)


def test_registry_folds_declared_views_in_optimize(spark):
    """declare() registers the view with its BASE table; optimize() folds
    every registered view BEFORE expiry can trim its feed horizon; stale
    and foreign registry markers are pruned, never raised; undeclare
    deregisters."""
    import os

    from maestro_spark import ivm
    from maestro_spark.lake import optimize
    from maestro_spark.merge import merge_batch
    from maestro_spark import schema as S
    import datetime as dt

    d = tempfile.mkdtemp()
    base = _build_base(spark, d, n_convs=30, segments=2)
    v1 = ivm.declare(spark, base, f"{d}/v1", key_cols=["conv_id"],
                     agg_exprs=["count(*) AS n"])
    v2 = ivm.declare(spark, base, f"{d}/v2", key_cols=["conv_id", "role"],
                     agg_exprs=["max(turn_idx) AS last_turn"],
                     query_id="sql-mv-2")
    assert len(ivm.registered_views(spark, base)) == 2
    v1.refresh()  # v2 left UNREFRESHED: optimize must bring it current

    # advance the base, then optimize with aggressive expiry: the views
    # must be folded first (delta path) and end exactly current
    merge_batch(base, spark.createDataFrame(
        [(10**9, "insert", "REGX", 0, "user", "x0", None,
          dt.datetime(2025, 6, 1))], S.CHANGE_EVENT_SCHEMA), "reg", 99)
    out = optimize(base, expire_keep_last=1)
    assert len(out["refreshed"]) == 2
    for v in (ivm.load(spark, f"{d}/v1"), ivm.load(spark, f"{d}/v2")):
        got = {tuple(r) for r in v.read().collect()}
        exp = {tuple(r) for r in v.expected().collect()}
        assert got == exp
        # optimize folded the real delta BEFORE its own maintenance commits
        # (compact/expire), so the only thing left behind the cursor is the
        # content-free maintenance snapshot itself
        s = v.refresh()
        assert s is None or s.stats.get("rows_in") == 0

    # undeclare removes view + marker; optimize stops folding it
    ivm.undeclare(spark, f"{d}/v2", base=base)
    assert not os.path.exists(f"{d}/v2")
    assert len(ivm.registered_views(spark, base)) == 1

    # stale marker (view dir removed out-of-band) is pruned silently
    import shutil
    shutil.rmtree(f"{d}/v1")
    assert ivm.registered_views(spark, base) == []
    assert ivm.registered_views(spark, base) == []  # pruned, stays empty
    assert "refreshed" not in optimize(base)

    # foreign marker (registry dir copied into another table) is pruned
    other = _build_base(spark, f"{d}/o", n_convs=5, segments=1)
    v3 = ivm.declare(spark, other, f"{d}/v3", key_cols=["conv_id"],
                     agg_exprs=["count(*) AS n"])
    shutil.copytree(os.path.join(other.root, ivm._REG_DIR),
                    os.path.join(base.root, ivm._REG_DIR),
                    dirs_exist_ok=True)
    assert ivm.registered_views(spark, base) == []
    assert len(ivm.registered_views(spark, other)) == 1  # untouched


def test_filtered_view_where_delta_semantics(spark, tmp_path):
    """WHERE-filtered materialized view (r5 final): rows ENTERING and
    LEAVING the filter across epochs maintain the view through the same
    delta machinery, a group whose rows all leave the filter vanishes
    (tombstoned), the persisted declaration carries the filter through
    load-by-path, staged refresh reconverges to the direct filtered
    aggregate, and a divergent re-declaration (different WHERE) refuses."""
    import datetime as dt

    from maestro_spark import schema as S
    from maestro_spark.ivm import declare, load

    TS = dt.datetime(2025, 1, 1)
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    merge_batch(t, spark.createDataFrame(
        [(1, "insert", "A", 0, "user", "a0", None, TS),
         (2, "insert", "A", 1, "assistant", "a1", "search", TS),
         (3, "insert", "B", 0, "user", "b0", None, TS)],
        S.CHANGE_EVENT_SCHEMA), "s", 0)
    root = str(tmp_path / "mv")
    mv = declare(spark, t, root, key_cols=["conv_id"],
                 agg_exprs=["count(*) AS n_user"], where="role = 'user'")
    mv.refresh()
    assert {(r["conv_id"], r["n_user"]) for r in mv.read().collect()} == {
        ("A", 1), ("B", 1)}

    # one row ENTERS the filter (role flip), one conv LEAVES (delete)
    merge_batch(t, spark.createDataFrame(
        [(4, "update", "A", 1, "user", "a1", "search", TS),
         (5, "delete", "B", 0, None, None, None, TS)],
        S.CHANGE_EVENT_SCHEMA), "s", 1)
    mv2 = load(spark, root)  # reconstructed filter from the declaration
    mv2.refresh()
    assert {(r["conv_id"], r["n_user"]) for r in mv2.read().collect()} == {
        ("A", 2)}

    # every row of A leaves the FILTER (not the table): group tombstones
    merge_batch(t, spark.createDataFrame(
        [(6, "update", "A", 0, "assistant", "a0", None, TS),
         (7, "update", "A", 1, "assistant", "a1", None, TS)],
        S.CHANGE_EVENT_SCHEMA), "s", 2)
    mv2.refresh()
    assert mv2.read().count() == 0
    assert t.read().count() == 2  # the base rows themselves are alive

    # reconvergence vs the direct filtered aggregate after more churn
    merge_batch(t, spark.createDataFrame(
        [(8, "insert", "C", 0, "user", "c0", None, TS),
         (9, "insert", "C", 1, "user", "c1", None, TS)],
        S.CHANGE_EVENT_SCHEMA), "s", 3)
    mv2.refresh()
    direct = (t.read().filter("role = 'user'").groupBy("conv_id")
              .agg(F.count("*").alias("n_user")))
    assert ({(r["conv_id"], r["n_user"]) for r in mv2.read().collect()}
            == {(r["conv_id"], r["n_user"]) for r in direct.collect()})

    # divergent WHERE refuses; identical re-declare reopens
    with pytest.raises(ValueError, match="DIFFERENT declaration"):
        declare(spark, t, root, key_cols=["conv_id"],
                agg_exprs=["count(*) AS n_user"], where="role = 'x'")
    declare(spark, t, root, key_cols=["conv_id"],
            agg_exprs=["count(*) AS n_user"], where="role = 'user'")
    # an unresolvable WHERE fails at declaration, before anything persists
    with pytest.raises(Exception, match="UNRESOLVED|cannot be resolved"):
        declare(spark, t, str(tmp_path / "mv_bad"), key_cols=["conv_id"],
                agg_exprs=["count(*) AS n"], where="nope = 1")
    import os
    assert not os.path.exists(str(tmp_path / "mv_bad"))


def test_dim_joined_view(spark, tmp_path):
    """Dimension-enriched materialized view (r5 cont.): base rows
    broadcast-join a dim LakeTable before aggregation. Base-only changes
    keep the delta path (joined against the PINNED dim snapshot);
    a dim-only change triggers one full re-enrichment refresh even on an
    idle base (the cursor encodes both snapshots); a duplicate dim key
    and a dim rollback refuse loudly; the declaration persists through
    load-by-path."""
    import datetime as dt

    from maestro_spark import schema as S
    from maestro_spark.ivm import declare, load

    TS = dt.datetime(2025, 1, 1)
    base = LakeTable.create(spark, str(tmp_path / "base"), n_buckets=4)
    merge_batch(base, spark.createDataFrame(
        [(1, "insert", "A", 0, "user", "hello", "search", TS),
         (2, "insert", "A", 1, "assistant", "hi", "browse", TS),
         (3, "insert", "B", 0, "user", "yo", "search", TS)],
        S.CHANGE_EVENT_SCHEMA), "s", 0)

    # dim: tool -> cost weight, as its own lake table
    from pyspark.sql import types as T

    dim = LakeTable.create(
        spark, str(tmp_path / "dim"), n_buckets=2,
        payload_schema=T.StructType([
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("weight", T.LongType(), True),
        ]))
    from maestro_spark.dml import upsert
    upsert(dim, spark.createDataFrame(
        [("search", 0, "search", 10), ("browse", 0, "browse", 1)],
        "conv_id string, turn_idx int, tool string, weight long"),
        query_id="dimload")

    root = str(tmp_path / "mv")
    mv = declare(spark, base, root, key_cols=["conv_id"],
                 agg_exprs=["count(*) AS n", "sum(weight) AS cost"],
                 dim_root=dim.root, dim_on=["tool"],
                 dim_columns=["tool", "weight"])
    mv.refresh()
    assert {(r["conv_id"], r["n"], r["cost"]) for r in mv.read().collect()} \
        == {("A", 2, 11), ("B", 1, 10)}

    # base-only change: delta path, pinned dim
    merge_batch(base, spark.createDataFrame(
        [(4, "insert", "B", 1, "assistant", "sup", "browse", TS)],
        S.CHANGE_EVENT_SCHEMA), "s", 1)
    mv.refresh()
    assert {(r["conv_id"], r["n"], r["cost"]) for r in mv.read().collect()} \
        == {("A", 2, 11), ("B", 2, 11)}

    # dim-only change on an IDLE base: cursor sees the dim move and runs
    # one full re-enrichment refresh (weight of 'search' flips to 100)
    upsert(dim, spark.createDataFrame(
        [("search", 0, "search", 100)],
        "conv_id string, turn_idx int, tool string, weight long"),
        query_id="dimload")
    snap = mv.refresh()
    assert snap is not None
    assert {(r["conv_id"], r["n"], r["cost"]) for r in mv.read().collect()} \
        == {("A", 2, 101), ("B", 2, 101)}
    # idempotent: nothing moved since
    assert mv.refresh() is None

    # reconverges to the live oracle (expected joins the current dim)
    got = {tuple(r) for r in mv.read().collect()}
    exp = {tuple(r) for r in mv.expected().collect()}
    assert got == exp

    # persistence round-trip reconstructs the dim join
    mv2 = load(spark, root)
    assert mv2.dim is not None and mv2.dim_on == ["tool"]
    assert mv2.refresh() is None  # same cursor state

    # duplicate dim key refuses the refresh loudly
    upsert(dim, spark.createDataFrame(
        [("dup", 5, "search", 7)],
        "conv_id string, turn_idx int, tool string, weight long"),
        query_id="dimload")
    with pytest.raises(ValueError, match="not unique"):
        mv.refresh()

    # dim rollback is FORWARD-ONLY (a new snapshot restating the target),
    # so the cursor just sees another dim move: one re-enrichment refresh
    # lands the rolled-back weights (and the dup row is gone with them)
    dim.rollback(1)
    assert mv.refresh() is not None
    assert {(r["conv_id"], r["n"], r["cost"]) for r in mv.read().collect()} \
        == {("A", 2, 11), ("B", 2, 11)}


def test_dim_joined_view_sql(spark, tmp_path):
    """CREATE MATERIALIZED VIEW … JOIN '<dim>' USING (cols) (r5 cont.):
    the SQL front door declares a dim-enriched view; REFRESH by path picks
    up both base and dim changes; plain JOIN is inner (an unmatched tool
    drops the row), LEFT JOIN keeps it."""
    import datetime as dt

    from maestro_spark import schema as S
    from maestro_spark.ivm import load
    from pyspark.sql import types as T

    TS = dt.datetime(2025, 1, 1)
    base = LakeTable.create(spark, str(tmp_path / "base"), n_buckets=4)
    merge_batch(base, spark.createDataFrame(
        [(1, "insert", "A", 0, "user", "hi", "search", TS),
         (2, "insert", "A", 1, "assistant", "yo", "mystery", TS)],
        S.CHANGE_EVENT_SCHEMA), "s", 0)
    from maestro_spark.dml import upsert
    dim = LakeTable.create(spark, str(tmp_path / "dim"), n_buckets=2,
                           payload_schema=T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("weight", T.LongType(), True)]))
    upsert(dim, spark.createDataFrame(
        [("search", 0, "search", 10)],
        "conv_id string, turn_idx int, tool string, weight long"),
        query_id="dl")

    inner_root = str(tmp_path / "mv_inner")
    mv = base.sql(
        f"CREATE MATERIALIZED VIEW '{inner_root}' AS "
        f"SELECT conv_id, count(*) AS n, sum(weight) AS cost "
        f"FROM t JOIN '{dim.root}' USING (tool) GROUP BY conv_id")
    assert {tuple(r) for r in mv.collect()} == {("A", 1, 10)}  # inner drops

    left_root = str(tmp_path / "mv_left")
    mv2 = base.sql(
        f"CREATE MATERIALIZED VIEW '{left_root}' AS "
        f"SELECT conv_id, count(*) AS n, sum(weight) AS cost "
        f"FROM t LEFT JOIN '{dim.root}' USING (tool) GROUP BY conv_id")
    assert {tuple(r) for r in mv2.collect()} == {("A", 2, 10)}  # left keeps

    # dim change propagates through REFRESH by path
    upsert(dim, spark.createDataFrame(
        [("mystery", 0, "mystery", 5)],
        "conv_id string, turn_idx int, tool string, weight long"),
        query_id="dl")
    base.sql(f"REFRESH MATERIALIZED VIEW '{left_root}'")
    v = load(spark, left_root)
    assert {tuple(r) for r in v.read().collect()} == {("A", 2, 15)}
