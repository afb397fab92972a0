"""Streaming change-feed source (table_changes) + the replication consumer:
bootstrap from snapshot 0, incremental catch-up off the checkpoint,
maintenance transparency, and the rollback refusal contract."""

from __future__ import annotations

from maestro_spark.feed import stream_replicate
from maestro_spark.gen import GenConfig, generate, write_log
from maestro_spark.lake import LakeTable
from maestro_spark.replay import replay
from maestro_spark.verify import symmetric_diff_empty


def _mk_source(spark, tmp_path, seed=51, n_convs=50):
    log = generate(GenConfig(seed=seed, n_convs=n_convs, segment_rows=300))
    write_log(log, str(tmp_path / "log"), segment_rows=300)
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8)
    return t


def _eq(a, b):
    return symmetric_diff_empty(
        a.read().orderBy("conv_id", "turn_idx"),
        b.read().orderBy("conv_id", "turn_idx"),
    )


def test_replicate_bootstrap_and_incremental(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    replay(spark, str(tmp_path / "log"), src, query_id="s", max_epochs=2)

    # bootstrap: full history from snapshot 0 through the stream
    dst = stream_replicate(spark, src.root, str(tmp_path / "replica"), query_id="rep")
    assert _eq(src, dst)

    # more epochs land (plus a content-preserving compaction the feed must
    # skip); the SAME checkpoint resumes and catches up incrementally
    replay(spark, str(tmp_path / "log"), src, query_id="s")
    src.compact()
    before = dst.snapshot().snapshot_id
    dst = stream_replicate(spark, src.root, str(tmp_path / "replica"), query_id="rep")
    assert _eq(src, dst)
    # incremental, not a re-bootstrap: at most a couple of new replica epochs
    assert dst.snapshot().snapshot_id - before <= 3

    # re-running with nothing new is a no-op (offsets checkpointed)
    sid = dst.snapshot().snapshot_id
    dst = stream_replicate(spark, src.root, str(tmp_path / "replica"), query_id="rep")
    assert dst.snapshot().snapshot_id == sid


def test_feed_rows_carry_op_and_lsn(spark, tmp_path):
    from maestro_spark.feed import FORMAT_NAME, register

    src = _mk_source(spark, tmp_path, seed=52)
    replay(spark, str(tmp_path / "log"), src, query_id="s")
    register(spark)
    rows = (
        spark.readStream.format(FORMAT_NAME)
        .option("path", src.root)
        .load()
        .writeStream.format("memory")
        .queryName("feed_rows")
        .trigger(availableNow=True)
        .start()
    )
    rows.awaitTermination()
    pdf = spark.sql(
        "select op, count(*) n, min(lsn) lo, max(lsn) hi from feed_rows group by op"
    ).toPandas()
    ops = dict(zip(pdf.op, pdf.n))
    assert ops.get("upsert", 0) > 0 and ops.get("delete", 0) > 0
    assert pdf.lo.min() >= 0 and pdf.hi.max() > 0


def test_feed_raises_on_rollback(spark, tmp_path):
    import pytest

    src = _mk_source(spark, tmp_path, seed=53)
    replay(spark, str(tmp_path / "log"), src, query_id="s")
    good = src.snapshot().snapshot_id
    src.rollback(good - 1)

    with pytest.raises(Exception, match="rollback"):
        stream_replicate(
            spark, src.root, str(tmp_path / "replica"), query_id="rep"
        )


def test_feed_schema_pinned_across_midstream_evolution(spark, tmp_path):
    """r2 advice: a schema-evolving commit MID-STREAM must not fail the
    microbatch — batches are conformed to the schema the stream started
    with (new columns dropped until restart), per the documented contract."""
    import datetime as dt

    from maestro_spark import schema as S
    from maestro_spark.feed import TableChangesStreamReader, feed_schema
    from maestro_spark.merge import merge_batch

    src = LakeTable.create(spark, str(tmp_path / "evo_lake"), n_buckets=4)
    merge_batch(src, spark.createDataFrame(
        [(1, "insert", "A", 0, None, "a0", None, dt.datetime(2025, 1, 1))],
        S.CHANGE_EVENT_SCHEMA), "q", 0)

    declared = feed_schema(src.root)  # stream starts HERE
    reader = TableChangesStreamReader(declared, {"path": src.root})
    reader.initialOffset()

    # schema evolves mid-stream (tool_calls + metadata columns appear)
    merge_batch(src, spark.createDataFrame(
        [(2, "insert", "A", 1, None, "a1", None, dt.datetime(2025, 1, 1),
          None, {"model": "m1"})],
        S.CHANGE_EVENT_SCHEMA_V2), "q", 1)

    parts = reader.partitions(
        {"snapshot": 0}, {"snapshot": src.snapshot().snapshot_id})
    want = [f.name for f in declared.fields]
    rows = 0
    for p in parts:
        for rb in reader.read(p):
            got = list(rb.schema.names)
            assert got == want  # no wider-than-declared Arrow batches
            rows += rb.num_rows
    assert rows == 2  # both epochs readable despite the evolution
    # a RESTARTED stream picks the new columns up
    assert "metadata" in [f.name for f in feed_schema(src.root).fields]


def test_replicate_catchup_bounded_by_max_snapshots_per_trigger(spark, tmp_path):
    """maxSnapshotsPerTrigger is admission control for the change-feed
    subscriber: after the replica was down while many source epochs landed,
    a processing-time restart catches up in batches of at most that many
    snapshots (checkpointHint bounds the FIRST restart batch too) — and
    converges to the exact source state, losing nothing."""
    import json
    import os
    import time

    log = generate(GenConfig(seed=61, n_convs=40, segment_rows=100))
    write_log(log, str(tmp_path / "log"), segment_rows=100)  # ~8 epochs
    src = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8)
    replay(spark, str(tmp_path / "log"), src, query_id="s", max_epochs=1)

    # bootstrap the replica (availableNow, unclamped by design)
    dst = stream_replicate(spark, src.root, str(tmp_path / "replica"), query_id="rep")
    assert _eq(src, dst)

    # while the subscriber is down, several more epochs land on the source
    replay(spark, str(tmp_path / "log"), src, query_id="s", start_epoch=1)
    tip = src.snapshot().snapshot_id

    q = stream_replicate(
        spark, src.root, str(tmp_path / "replica"), query_id="rep",
        available_now=False, max_snapshots_per_trigger=2,
    )
    ckpt = str(tmp_path / "replica" / "_feed_checkpoint")

    def _end_of(batch_file: str) -> int:
        with open(os.path.join(ckpt, "offsets", batch_file)) as fh:
            obj = json.loads(fh.read().strip().splitlines()[-1])
        if isinstance(obj, str):
            obj = json.loads(obj)
        return int(obj["snapshot"])

    try:
        # wait until a COMMITTED batch (not just a planned one) covers the
        # source tip — stopping on the offsets WAL alone could cut the last
        # batch mid-flight
        t0 = time.time()
        while time.time() - t0 < 180:
            cdir = os.path.join(ckpt, "commits")
            done = sorted(
                (f for f in os.listdir(cdir) if f.isdigit()), key=int
            ) if os.path.isdir(cdir) else []
            if done and _end_of(done[-1]) >= tip:
                break
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination()

    assert _eq(src, dst)  # no loss, exact convergence

    # every catch-up batch (all batches after the bootstrap drain) advanced
    # the source offset by at most the clamp
    ends = [
        _end_of(f)
        for f in sorted(
            (f for f in os.listdir(os.path.join(ckpt, "offsets")) if f.isdigit()),
            key=int,
        )
    ]
    spans = [b - a for a, b in zip(ends, ends[1:])]
    assert ends[-1] >= tip
    assert spans, "restart produced no catch-up batches"
    assert max(spans) <= 2, f"clamp violated: batch spans {spans}"
    assert len(spans) >= 2, f"catch-up was not split: {spans}"


def test_feed_latest_offset_clamp_contract(spark, tmp_path):
    """Unit contract of the admission clamp, no streaming query needed:
    unclamped until a cursor is known (fresh/availableNow semantics), then
    cursor + maxSnapshotsPerTrigger; checkpointHint restores the cursor
    from a WAL so the first restart announcement is bounded too."""
    import datetime as dt
    import json
    import os

    from maestro_spark import schema as S
    from maestro_spark.feed import TableChangesStreamReader, feed_schema
    from maestro_spark.merge import merge_batch

    src = LakeTable.create(spark, str(tmp_path / "clamp_lake"), n_buckets=4)
    ts = dt.datetime(2025, 1, 1)
    for eid in range(6):
        merge_batch(src, spark.createDataFrame(
            [(eid + 1, "insert", "A", eid, None, f"a{eid}", None, ts)],
            S.CHANGE_EVENT_SCHEMA), "q", eid)
    tip = src.snapshot().snapshot_id
    assert tip >= 6

    sch = feed_schema(src.root)

    # no clamp option: always the tip
    r = TableChangesStreamReader(sch, {"path": src.root})
    assert r.latestOffset() == {"snapshot": tip}

    # clamp set, no cursor yet: unclamped (availableNow must drain fully)
    r = TableChangesStreamReader(sch, {"path": src.root,
                                       "maxsnapshotspertrigger": "2"})
    assert r.latestOffset() == {"snapshot": tip}
    # once a batch end is seen, announcements advance two snapshots at a time
    r.partitions({"snapshot": 0}, {"snapshot": 1})
    assert r.latestOffset() == {"snapshot": 3}
    r.partitions({"snapshot": 1}, {"snapshot": 3})
    assert r.latestOffset() == {"snapshot": 5}
    # never past the tip
    r.partitions({"snapshot": 3}, {"snapshot": tip - 1})
    assert r.latestOffset() == {"snapshot": tip}

    # checkpointHint: the cursor comes from the offset WAL before any
    # partitions() call, so a restarted query's first batch is bounded
    ckpt = tmp_path / "clamp_ckpt" / "offsets"
    os.makedirs(ckpt)
    (ckpt / "0").write_text("v1\n{}\n" + json.dumps({"snapshot": 2}))
    r = TableChangesStreamReader(sch, {"path": src.root,
                                       "maxsnapshotspertrigger": "2",
                                       "checkpointhint": str(tmp_path / "clamp_ckpt")})
    assert r.latestOffset() == {"snapshot": 4}

    # checkpointHint with an EMPTY WAL (a first-ever hinted subscriber):
    # clamps from startingSnapshot — a fresh start against a long-lived
    # table must not admit the whole history in one batch (mirrors
    # cdc_binlog's fresh-start clamp; availableNow drains stay complete
    # via stream_replicate's drain loop)
    os.makedirs(tmp_path / "fresh_ckpt" / "offsets")
    r = TableChangesStreamReader(sch, {"path": src.root,
                                       "maxsnapshotspertrigger": "2",
                                       "checkpointhint": str(tmp_path / "fresh_ckpt")})
    assert r.latestOffset() == {"snapshot": 2}
    r2 = TableChangesStreamReader(sch, {"path": src.root,
                                        "maxsnapshotspertrigger": "2",
                                        "startingsnapshot": "3",
                                        "checkpointhint": str(tmp_path / "fresh_ckpt")})
    assert r2.latestOffset() == {"snapshot": 5}


def test_replicate_available_now_restart_with_clamp_fully_drains(spark, tmp_path):
    """r3 advice (high): a RESTARTED availableNow drain with
    maxSnapshotsPerTrigger used to be truncated to N snapshots — Spark
    captures one target offset per run and checkpointHint made the clamp
    engage from the first trigger — leaving the replica silently stale.
    stream_replicate now loops start/awaitTermination until the WAL cursor
    reaches the source tip, so the drain is bounded AND complete."""
    src = _mk_source(spark, tmp_path, seed=71)
    replay(spark, str(tmp_path / "log"), src, query_id="s", max_epochs=1)

    # first drain: fresh checkpoint (clamped from snapshot 0 since r5's
    # fresh-start rule; the drain loop still reaches the tip)
    dst = stream_replicate(
        spark, src.root, str(tmp_path / "replica"), query_id="rep",
        max_snapshots_per_trigger=2,
    )
    assert _eq(src, dst)

    # while the subscriber is down, MORE than max_snapshots epochs land
    replay(spark, str(tmp_path / "log"), src, query_id="s", start_epoch=1)
    assert src.snapshot().snapshot_id - dst.snapshot().snapshot_id >= 0

    # restarted availableNow drain with the clamp: must reach the tip, not
    # stop after 2 snapshots
    dst = stream_replicate(
        spark, src.root, str(tmp_path / "replica"), query_id="rep",
        max_snapshots_per_trigger=2,
    )
    assert _eq(src, dst)


def test_feed_restored_cursor_below_start_is_ignored(spark, tmp_path):
    """r3 advice (low): a WAL line from the wrong source (or a corrupt one)
    restoring a cursor BELOW startingSnapshot must degrade to unclamped,
    never announce an offset behind the committed start."""
    import datetime as dt
    import json
    import os

    from maestro_spark import schema as S
    from maestro_spark.feed import TableChangesStreamReader, feed_schema
    from maestro_spark.merge import merge_batch

    src = LakeTable.create(spark, str(tmp_path / "vlake"), n_buckets=4)
    ts = dt.datetime(2025, 1, 1)
    for eid in range(5):
        merge_batch(src, spark.createDataFrame(
            [(eid + 1, "insert", "A", eid, None, f"a{eid}", None, ts)],
            S.CHANGE_EVENT_SCHEMA), "q", eid)
    tip = src.snapshot().snapshot_id

    ckpt = tmp_path / "v_ckpt" / "offsets"
    os.makedirs(ckpt)
    # wrong-source offset: far below the configured start
    (ckpt / "0").write_text("v1\n{}\n" + json.dumps({"snapshot": 1}))
    sch = feed_schema(src.root)
    r = TableChangesStreamReader(sch, {
        "path": src.root, "startingsnapshot": "3",
        "maxsnapshotspertrigger": "1",
        "checkpointhint": str(tmp_path / "v_ckpt")})
    # bogus restore ignored -> unclamped (tip), never {"snapshot": 2} (< start)
    assert r.latestOffset() == {"snapshot": tip}
