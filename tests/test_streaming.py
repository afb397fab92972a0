"""Streaming path tests (SURVEY §5.5): custom source, exactly-once under
restart, resumable tailing, checkpoint-loss survival."""

from __future__ import annotations

import pandas as pd

from maestro_spark.gen import GenConfig, expected_final_state, generate, write_log
from maestro_spark.lake import LakeTable
from maestro_spark.stream import stream_ingest
from maestro_spark.verify import canonical


def _final(table):
    return canonical(table.read()).toPandas().reset_index(drop=True)


def test_stream_matches_oracle_and_is_restart_safe(spark, tmp_path):
    cfg = GenConfig(seed=21, n_convs=50, segment_rows=400)
    log = generate(cfg)
    write_log(log, str(tmp_path / "log"), segment_rows=400)
    table = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8)

    q = stream_ingest(spark, str(tmp_path / "log"), table.root, query_id="s1")
    got = _final(table)
    exp = expected_final_state(log)
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]], exp[["conv_id", "turn_idx", "text"]]
    )
    snap_after = table.snapshot().snapshot_id

    # restart with same checkpoint: no new data -> no new snapshots
    stream_ingest(spark, str(tmp_path / "log"), table.root, query_id="s1")
    assert table.snapshot().snapshot_id == snap_after


def test_stream_tails_new_segments(spark, tmp_path):
    cfg = GenConfig(seed=22, n_convs=60, segment_rows=300)
    log = generate(cfg)
    paths = write_log(log, str(tmp_path / "log"), segment_rows=300)
    assert len(paths) >= 3
    # hide the tail of the log, stream, then reveal it and stream again
    hidden = paths[2:]
    import os

    for p in hidden:
        os.rename(p, p + ".hidden")
    table = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    stream_ingest(spark, str(tmp_path / "log"), table.root, query_id="s2")
    partial_rows = table.read().count()
    assert partial_rows > 0

    for p in hidden:
        os.rename(p + ".hidden", p)
    stream_ingest(spark, str(tmp_path / "log"), table.root, query_id="s2")
    got = _final(table)
    exp = expected_final_state(log)
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]], exp[["conv_id", "turn_idx", "text"]]
    )


def test_checkpoint_loss_does_not_duplicate(spark, tmp_path):
    """Even deleting Spark's checkpoint dir cannot double-apply epochs: the
    lake's epoch-keyed snapshot chain skips re-delivered epoch ids."""
    import shutil

    cfg = GenConfig(seed=23, n_convs=25, segment_rows=500)
    log = generate(cfg)
    write_log(log, str(tmp_path / "log"), segment_rows=500)
    table = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    ckpt = str(tmp_path / "ckpt")

    stream_ingest(spark, str(tmp_path / "log"), table.root, query_id="s3",
                  checkpoint_dir=ckpt)
    before = _final(table)
    snap_before = table.snapshot().snapshot_id

    shutil.rmtree(ckpt)  # lose ALL streaming state
    stream_ingest(spark, str(tmp_path / "log"), table.root, query_id="s3",
                  checkpoint_dir=ckpt)
    after = _final(table)
    assert table.snapshot().snapshot_id == snap_before  # all epochs skipped
    pd.testing.assert_frame_equal(before, after)


def test_stream_with_dedup_within_watermark(spark, tmp_path):
    cfg = GenConfig(seed=24, n_convs=20, segment_rows=400, duplicate_frac=0.2)
    log = generate(cfg)
    write_log(log, str(tmp_path / "log"), segment_rows=400)
    table = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    stream_ingest(
        spark, str(tmp_path / "log"), table.root, query_id="s4",
        dedup_within_watermark=True, watermark="60 minutes",
    )
    got = _final(table)
    exp = expected_final_state(log)
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]], exp[["conv_id", "turn_idx", "text"]]
    )


def test_bounded_batches_lose_no_data(spark, tmp_path):
    """maxSegmentsPerBatch is admission control, not truncation: every
    segment must be applied. (Regression: clamping in partitions() committed
    the full offset range while reading only a prefix — silent data loss.)"""
    cfg = GenConfig(seed=23, n_convs=60, segment_rows=200)
    log = generate(cfg)
    write_log(log, str(tmp_path / "log"), segment_rows=200)
    table = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)

    # run twice: the first availableNow catch-up batch is unclamped by
    # design; the second run starts from a known cursor and is bounded
    stream_ingest(spark, str(tmp_path / "log"), table.root, query_id="s3",
                  max_segments_per_batch=1)
    got = _final(table)
    exp = expected_final_state(log)
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]], exp[["conv_id", "turn_idx", "text"]]
    )


def test_restart_catchup_is_bounded_with_checkpoint_hint(spark, tmp_path):
    """ADVICE r1: the admission clamp must also bound the restart catch-up
    batch under processing-time triggers. With checkpointHint the source
    recovers its cursor from the offset WAL, so segments that arrived while
    the query was down are admitted maxSegmentsPerBatch at a time — and
    nothing is lost."""
    import os
    import time

    import pyarrow.parquet as pq

    from maestro_spark import source as cdc_source
    from maestro_spark.gen import to_arrow

    log = generate(GenConfig(seed=27, n_convs=60, segment_rows=100))
    half = (len(log) // 200) * 100  # half the rows, whole segments
    log_dir = tmp_path / "log"
    os.makedirs(log_dir)
    seg = 100
    for i, lo in enumerate(range(0, half, seg)):
        pq.write_table(to_arrow(log, lo, min(lo + seg, half)),
                       str(log_dir / f"segment-{i:05d}.parquet"))
    n1 = len(os.listdir(log_dir))

    cdc_source.register(spark)
    ckpt = str(tmp_path / "ckpt")

    def reader():
        return (
            spark.readStream.format("cdc_binlog")
            .option("path", str(log_dir))
            .option("maxSegmentsPerBatch", "2")
            .option("checkpointHint", ckpt)
            .load()
        )

    def run(counts, target):
        q = (
            reader().writeStream
            .foreachBatch(lambda df, eid: counts.append(df.count()))
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        t0 = time.time()
        while sum(counts) < target and time.time() - t0 < 90:
            time.sleep(0.2)
        q.stop()
        q.awaitTermination()

    c1: list[int] = []
    run(c1, half)
    assert sum(c1) >= half  # no loss (see at-least-once note below)
    # the clamp bounds the FIRST-EVER batch too (empty WAL + hint clamps
    # from segment 0 — a fresh start against a backlog must not admit
    # everything at once)
    assert all(c <= 200 for c in c1), c1
    assert len(c1) >= 2

    # while down, the rest of the log arrives
    for i, lo in enumerate(range(half, len(log), seg)):
        pq.write_table(to_arrow(log, lo, min(lo + seg, len(log))),
                       str(log_dir / f"segment-{n1 + i:05d}.parquet"))

    c2: list[int] = []
    run(c2, len(log) - half)
    # no loss. NOT exact equality: q.stop() can race the commit-log write
    # of the final counted batch, and Spark's source contract is
    # at-least-once — a re-delivered batch double-counts here. Exactly-once
    # is the SINK's job (merge epoch idempotence, test_replay/test_stateful
    # assert it end-to-end); this test pins admission control.
    assert sum(c1) + sum(c2) >= len(log)
    # every catch-up batch bounded by the clamp (2 segments x 100 rows)
    assert c2 and all(c <= 200 for c in c2), c2
    assert len(c2) >= 2  # the catch-up really was split, not one big batch


def test_stream_native_source_matches_python_source(spark, tmp_path):
    """Native FileStreamSource mode and the custom Python source must
    converge to the identical final state, including evolved columns
    (the stream schema is discovered from segment footers)."""
    cfg = GenConfig(seed=24, n_convs=50, segment_rows=300, evolution_at=0.5)
    log = generate(cfg)
    write_log(log, str(tmp_path / "log"), segment_rows=300)

    t_py = LakeTable.create(spark, str(tmp_path / "lake_py"), n_buckets=4)
    stream_ingest(spark, str(tmp_path / "log"), t_py.root, query_id="py")
    t_nat = LakeTable.create(spark, str(tmp_path / "lake_nat"), n_buckets=4)
    stream_ingest(spark, str(tmp_path / "log"), t_nat.root, query_id="nat",
                  source="native")

    got_py = _final(t_py)
    got_nat = _final(t_nat)
    exp = expected_final_state(log)
    assert "metadata" in got_py.columns and "metadata" in got_nat.columns
    for got in (got_py, got_nat):
        pd.testing.assert_frame_equal(
            got[["conv_id", "turn_idx", "text"]], exp[["conv_id", "turn_idx", "text"]]
        )
    n_meta = sum(m is not None for m in exp["metadata"])
    assert n_meta > 0
    assert sum(m is not None for m in got_py["metadata"]) == n_meta
    assert sum(m is not None for m in got_nat["metadata"]) == n_meta


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (two watermarked tails joined on conv_id
    within an event-time bound) produces exactly the rows the equivalent
    static batch join produces, and the physical plan carries the
    state-bounding watermarks."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from maestro_spark.stream import stream_stream_join

    cfg = GenConfig(seed=31, n_convs=20, segment_rows=300)
    log = generate(cfg)
    write_log(log, str(tmp_path / "left"), segment_rows=300)
    # right stream: the same keys with event times shifted +2 minutes —
    # inside the 10-minute interval, so every left event matches
    import os

    os.makedirs(str(tmp_path / "right"))
    for i, fn in enumerate(sorted(os.listdir(str(tmp_path / "left")))):
        t = pq.read_table(str(tmp_path / "left" / fn))
        ts = pa.compute.add(t["ts"], pa.scalar(120_000_000, type=pa.duration("us")))
        t = t.set_column(t.column_names.index("ts"), "ts", ts)
        pq.write_table(t, str(tmp_path / "right" / fn))

    out = stream_stream_join(
        spark, str(tmp_path / "left"), str(tmp_path / "right"), within="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT conv_id, l_turn, l_lsn, r_turn, r_lsn FROM ssj_out"
    ).toPandas()

    lb = spark.read.parquet(str(tmp_path / "left")).select(
        "conv_id", F.col("turn_idx").alias("l_turn"),
        F.col("op_lsn").alias("l_lsn"), F.col("ts").cast("timestamp").alias("l_time"),
    )
    rb = spark.read.parquet(str(tmp_path / "right")).select(
        F.col("conv_id").alias("r_conv"), F.col("turn_idx").alias("r_turn"),
        F.col("op_lsn").alias("r_lsn"), F.col("ts").cast("timestamp").alias("r_time"),
    )
    want = (
        lb.join(
            rb,
            (lb["conv_id"] == rb["r_conv"])
            & (rb["r_time"] >= lb["l_time"])
            & (rb["r_time"] <= lb["l_time"] + F.expr("INTERVAL 10 minutes")),
            "inner",
        )
        .select("conv_id", "l_turn", "l_lsn", "r_turn", "r_lsn")
        .toPandas()
    )
    key = ["conv_id", "l_turn", "l_lsn", "r_turn", "r_lsn"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)
