"""Randomized end-to-end CDC semantics (SURVEY §5 extension): hypothesis
drives arbitrary event histories — inserts/updates/deletes over a small
key space, split into arbitrary epochs, with random maintenance
(tiered/full/clustered compaction, expiry, vacuum) interleaved — and the
table must ALWAYS equal the pure-Python max-LSN oracle, with a randomly
chosen epoch's re-delivery a no-op. One property that cross-checks the
merge, MOR resolution, tombstones, commit idempotence, and every
maintenance rewrite against each other."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from maestro_spark import schema as S
from maestro_spark.lake import LakeTable
from maestro_spark.merge import merge_batch

TS = dt.datetime(2025, 1, 1)
KEYS = [(f"k{c}", t) for c in range(4) for t in range(3)]

event = st.tuples(
    st.integers(0, len(KEYS) - 1),          # which key
    st.sampled_from(["insert", "update", "delete"]),
)
history = st.lists(event, min_size=1, max_size=40)
cuts = st.lists(st.integers(1, 39), max_size=3)
maint = st.lists(
    st.sampled_from(["compact", "tiered", "clustered", "expire", "vacuum"]),
    max_size=4,
)


def _expected(events):
    """Pure-Python oracle: per key, the max-LSN event wins; deletes erase."""
    win: dict[tuple, tuple] = {}
    for lsn, (ki, op) in enumerate(events, start=1):
        win[KEYS[ki]] = (lsn, op)
    return {
        k: f"v{lsn}"
        for k, (lsn, op) in win.items()
        if op != "delete"
    }


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(history=history, cut_points=cuts, actions=maint,
       redeliver=st.integers(0, 3))
def test_random_histories_always_converge(spark, tmp_path_factory, history,
                                          cut_points, actions, redeliver):
    root = tmp_path_factory.mktemp("chaos")
    t = LakeTable.create(spark, str(root / "lake"), n_buckets=4)
    spark.conf.set("maestro.compact.maxDeltas", "100")  # we drive maintenance
    try:
        rows = [
            (lsn, op, *KEYS[ki], "user", f"v{lsn}" if op != "delete" else None,
             None, TS)
            for lsn, (ki, op) in enumerate(history, start=1)
        ]
        bounds = sorted({min(c, len(rows)) for c in cut_points} | {len(rows)})
        epochs, start = [], 0
        for b in bounds:
            if b > start:
                epochs.append(rows[start:b])
                start = b
        acts = list(actions) + [None] * len(epochs)
        batches = []
        for i, ep in enumerate(epochs):
            df = spark.createDataFrame(
                [(r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7]) for r in ep],
                S.CHANGE_EVENT_SCHEMA)
            batches.append(df)
            merge_batch(t, df, "chaos", i)
            a = acts[i]
            if a == "compact":
                t.compact()
            elif a == "tiered":
                t.compact_tiered()
            elif a == "clustered":
                t.compact(cluster_by=["ts"], target_file_rows=8)
            elif a == "expire":
                t.expire_snapshots(keep_last=2)
            elif a == "vacuum":
                t.vacuum(manifest_grace_seconds=0)

        got = {(r["conv_id"], r["turn_idx"]): r["text"]
               for r in t.read().collect()}
        assert got == _expected(history)

        # exactly-once: re-delivering a random already-applied epoch changes
        # nothing (same epoch id -> skipped)
        i = min(redeliver, len(epochs) - 1)
        assert merge_batch(t, batches[i], "chaos", i) is None
        got2 = {(r["conv_id"], r["turn_idx"]): r["text"]
                for r in t.read().collect()}
        assert got2 == got
    finally:
        spark.conf.set("maestro.compact.maxDeltas", "8")
