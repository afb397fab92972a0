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


# ---------------------------------------------------------------- DDL chaos
# Same idea, with metadata-only ALTER TABLE (add / rename / drop / drop
# erase=True) randomly interleaved between epochs and maintenance. The
# pure-Python oracle tracks each extra column as an IDENTITY TOKEN that
# survives renames and dies on drop — exactly the physical-name contract
# ddl.py documents — so it catches every composition failure the named
# test_ddl.py cases can't enumerate: stale bytes resurrected through a
# drop + re-add, a rename losing pre-rename values, compaction excising a
# live aliased column, an epoch's schema evolution colliding with a
# retired physical name, etc.

DDL_POOL = [
    ("add", "ca"), ("add", "cb"),
    ("drop", "ca"), ("drop", "cb"),
    ("erase", "ca"),
    ("rename", "ca", "cb"), ("rename", "cb", "ca"),
    ("compact",), ("tiered",), ("expire",), ("vacuum",), (None,),
]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(history=history, cut_points=cuts,
       schedule=st.lists(st.sampled_from(DDL_POOL), max_size=8),
       seed=st.integers(0, 7))
def test_random_ddl_histories_converge(spark, tmp_path_factory, history,
                                       cut_points, schedule, seed):
    from pyspark.sql import types as T

    from maestro_spark import ddl

    root = tmp_path_factory.mktemp("chaosddl")
    t = LakeTable.create(spark, str(root / "lake"), n_buckets=4)
    spark.conf.set("maestro.compact.maxDeltas", "100")
    try:
        # pre-seed one extra column so drop/rename/erase are applicable
        # from the very first boundary (otherwise short schedules rarely
        # get past "add" and the interesting verbs go unexercised)
        ddl.add_column(t, "ca", "string")
        live: dict[str, int] = {"ca": 0}  # logical extra -> identity token
        next_tok = 1
        win: dict[tuple, tuple] = {}  # key -> (lsn, op, {token: value})
        bounds = sorted({min(c, len(history)) for c in cut_points}
                        | {len(history)})
        epochs, start = [], 0
        for b in bounds:
            if b > start:
                epochs.append(history[start:b])
                start = b
        acts = list(schedule) + [(None,)] * (2 * len(epochs))
        lsn0 = 0
        for i, ep in enumerate(epochs):
            live_cols = sorted(live)
            # which live extra column this epoch's batch carries (if any):
            # a full-row CDC image, so the epoch's winner REPLACES every
            # extra value — absent column reads null after the merge
            carry = live_cols[(seed + i) % len(live_cols)] if live_cols else None
            rows = []
            for j, (ki, op) in enumerate(ep):
                lsn = lsn0 + j + 1
                k = KEYS[ki]
                xval = f"x{lsn}" if (carry and op != "delete") else None
                base = (lsn, op, k[0], k[1], "user",
                        f"v{lsn}" if op != "delete" else None, None, TS)
                rows.append((*base, xval) if carry else base)
                win[k] = (lsn, op, {live[carry]: xval} if carry else {})
            lsn0 += len(ep)
            sch = (
                T.StructType([*S.CHANGE_EVENT_SCHEMA.fields,
                              T.StructField(carry, T.StringType(), True)])
                if carry else S.CHANGE_EVENT_SCHEMA
            )
            merge_batch(t, spark.createDataFrame(rows, sch), "chaosddl", i)
            for a in acts[2 * i:2 * i + 2]:  # two boundary actions/epoch
                if a[0] == "add" and a[1] not in live:
                    ddl.add_column(t, a[1], "string")
                    live[a[1]] = next_tok
                    next_tok += 1
                elif a[0] == "drop" and a[1] in live:
                    ddl.drop_column(t, a[1])
                    del live[a[1]]
                elif a[0] == "erase" and a[1] in live:
                    ddl.drop_column(t, a[1], erase=True)
                    del live[a[1]]
                elif a[0] == "rename" and a[1] in live and a[2] not in live:
                    ddl.rename_column(t, a[1], a[2])
                    live[a[2]] = live.pop(a[1])
                elif a[0] == "compact":
                    t.compact()
                elif a[0] == "tiered":
                    t.compact_tiered()
                elif a[0] == "expire":
                    t.expire_snapshots(keep_last=2)
                elif a[0] == "vacuum":
                    t.vacuum(manifest_grace_seconds=0)

        cols = sorted(live)
        rcols = set(t.read().columns)
        assert set(cols) <= rcols
        # dropped / renamed-away names and physical aliases never surface
        assert not (({"ca", "cb"} - set(cols)) & rcols)
        assert not any("__p" in c for c in rcols)

        exp = {
            k: (f"v{lsn}", tuple(ex.get(live[c]) for c in cols))
            for k, (lsn, op, ex) in win.items()
            if op != "delete"
        }
        got = {
            (r["conv_id"], r["turn_idx"]): (r["text"],
                                            tuple(r[c] for c in cols))
            for r in t.read().collect()
        }
        assert got == exp
    finally:
        spark.conf.set("maestro.compact.maxDeltas", "8")
