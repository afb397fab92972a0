"""I5: arbitrary stateful streaming operator across microbatches."""

from __future__ import annotations

from maestro_spark import source as cdc_source
from maestro_spark.gen import GenConfig, generate, write_log
from maestro_spark.stream import stateful_conv_progress


def test_stateful_conv_progress(spark, tmp_path):
    log = generate(GenConfig(seed=41, n_convs=12, segment_rows=300))
    write_log(log, str(tmp_path / "log"), segment_rows=300)
    cdc_source.register(spark)
    events = (
        spark.readStream.format(cdc_source.FORMAT_NAME)
        .option("path", str(tmp_path / "log"))
        .load()
    )
    out = stateful_conv_progress(events)
    q = (
        out.writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "select conv_id, max(max_lsn) as max_lsn, max(total_events) as n "
        "from conv_progress group by conv_id"
    ).collect()
    got = {r.conv_id: (r.max_lsn, r.n) for r in rows}

    import pandas as pd

    pdf = pd.DataFrame({k: v for k, v in log.cols.items()})
    exp_lsn = pdf.groupby("conv_id")["op_lsn"].max()
    exp_n = pdf.groupby("conv_id").size()
    assert set(got) == set(exp_lsn.index)
    for cid in got:
        assert got[cid][0] == exp_lsn[cid]
        assert got[cid][1] == exp_n[cid]
