"""I6: watermark + late-event accounting in the ledger (BASELINE.json:6)."""

from __future__ import annotations

import datetime as dt

from maestro_spark import schema as S
from maestro_spark.lake import LakeTable
from maestro_spark.ledger import Ledger
from maestro_spark.merge import merge_batch


def _ev(spark, rows):
    data = [(lsn, op, cid, ti, None, txt, None, ts) for (lsn, op, cid, ti, txt, ts) in rows]
    return spark.createDataFrame(data, S.CHANGE_EVENT_SCHEMA)


def test_watermark_monotone_and_late_counted(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4)
    t1 = dt.datetime(2025, 1, 1, 10, 0)
    t2 = dt.datetime(2025, 1, 1, 12, 0)
    t_old = dt.datetime(2025, 1, 1, 9, 0)

    merge_batch(t, _ev(spark, [(1, "insert", "c1", 0, "a", t1),
                               (2, "insert", "c1", 1, "b", t2)]), "q", 0)
    led = Ledger(t.root, "q")
    assert led.last_watermark() == str(t2)
    assert led.entries()[0]["stats"]["late_events"] == 0

    # epoch 1: one event before the watermark (late) + one after
    merge_batch(t, _ev(spark, [(3, "update", "c1", 0, "a2", t_old),
                               (4, "insert", "c2", 0, "c", t2 + dt.timedelta(hours=1))]),
                "q", 1)
    e1 = led.entries()[1]
    assert e1["stats"]["late_events"] == 1
    assert led.last_watermark() == str(t2 + dt.timedelta(hours=1))

    # the late event was APPLIED (higher LSN wins regardless of event time)
    state = {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}
    assert state[("c1", 0)] == "a2"

    # epoch 2: all-late batch — watermark must not regress
    merge_batch(t, _ev(spark, [(5, "update", "c2", 0, "c2", t_old)]), "q", 2)
    assert led.last_watermark() == str(t2 + dt.timedelta(hours=1))
    assert led.entries()[2]["stats"]["late_events"] == 1
