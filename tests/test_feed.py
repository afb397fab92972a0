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
