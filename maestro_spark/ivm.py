"""Incremental materialized-view maintenance driven by the change feed.

``ConvStatsView`` maintains a per-conversation aggregate table (turn count,
tool-turn count, total characters, last event time) on top of a transcript
``LakeTable``, refreshed from :meth:`LakeTable.changes` so each refresh does
work proportional to the DELTA, not the table:

- the feed names the changed conversations; only the lake buckets containing
  them are read (manifest file pruning — untouched buckets contribute zero
  bytes of IO), and only the changed conversations are re-aggregated;
- the refreshed rows flow through the engine's own ``merge_batch`` upsert
  path, so the view inherits the exactly-once contract for free: the epoch
  key ``ivm-conv-stats:<base_snapshot_id>`` makes every refresh idempotent,
  and a crash mid-refresh is invisible (the view's snapshot chain is the
  commit point, same as any table);
- the refresh cursor is DERIVED, not stored: the highest base snapshot id
  folded in so far is read back from the view's own committed epoch keys,
  so there is no side-channel state file to lose or corrupt.

This is the canonical downstream consumer a CDC engine exists for: the
pattern generalizes to any per-key aggregate by swapping the ``_AGGS`` list.

Delta-driven partial recompute (re-aggregate changed keys from current
state) rather than algebraic delta application (add/subtract increments)
is deliberate: the change feed carries post-images only, and update/delete
events would need pre-images to subtract from SUM/COUNT aggregates.
Recomputing only the touched conversations needs no pre-images, handles
non-subtractable aggregates (MAX) uniformly, and its cost is bounded by the
touched buckets — at 10^10 events per day across millions of conversations
the touched-bucket set per refresh stays a small fraction of the table.

Scale posture: one bucket-pruned scan + one aggregation + merge_batch's
single exchange per refresh; nothing driver-side except the bounded
changed-bucket id list (≤ n_buckets ints, the same bound the COW planner
already accepts).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from maestro_spark.lake import LakeTable, Snapshot, bucket_expr
from maestro_spark.merge import merge_batch

STATS_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        # the merge key is (conv_id, turn_idx); a per-conversation view pins
        # turn_idx = 0 so conv_id alone is the effective key
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("n_turns", T.LongType(), True),
        T.StructField("n_tool_turns", T.LongType(), True),
        T.StructField("total_chars", T.LongType(), True),
        T.StructField("last_ts", T.TimestampNTZType(), True),
    ]
)

_QUERY_ID = "ivm-conv-stats"


# the only payload columns the view aggregate touches — reads prune to these
# (turn_idx/role are never decoded; see lake.read(columns=...))
_AGG_COLS = ["conv_id", "tool", "text", "ts"]


def _conv_aggs() -> list[F.Column]:
    return [
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.col("tool").isNotNull().cast("long")).alias("n_tool_turns"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")).alias(
            "total_chars"
        ),
        F.max("ts").alias("last_ts"),
    ]


class ConvStatsView:
    """Per-conversation aggregate view over a transcript LakeTable."""

    def __init__(self, spark: SparkSession, base: LakeTable, root: str):
        self.spark = spark
        self.base = base
        try:
            self.table = LakeTable(spark, root)
            self.table.snapshot()
        except Exception:  # noqa: BLE001 — not a table yet: create it
            # the view is one row per conversation — an order of magnitude
            # smaller than the base table — so it takes a fraction of the
            # base's bucket fan-out (fewer files written and tasks launched
            # per refresh); view and base buckets never join co-partitioned,
            # so the counts are free to differ
            self.table = LakeTable.create(
                spark,
                root,
                payload_schema=STATS_PAYLOAD_SCHEMA,
                n_buckets=max(4, base.snapshot().n_buckets // 8),
            )

    # ------------------------------------------------------------- cursor
    def applied_through(self) -> int:
        """Highest base snapshot id already folded into the view, derived
        from the view's own committed epoch keys (no side-channel state)."""
        prefix = f"{_QUERY_ID}:"
        sids = [
            int(k[len(prefix):])
            for k in self.table.committed_epoch_keys()
            if k.startswith(prefix)
        ]
        return max(sids, default=0)

    def _id_offset(self) -> int:
        """Snapshot-id translation for branch (clone) bases: a branch's ids
        restart at 0 from its fork, but adopt() replays branch commit i as
        main id fork+i — so the refresh cursor (epoch keys) and the view
        LSNs are stored in MAIN-equivalent coordinates (fork + branch id).
        Without this, a view refreshed inside transaction_multi would reuse
        an epoch key main's view already consumed and be silently dropped
        by adopt's idempotence. 0 for ordinary (non-clone) tables."""
        try:
            return int(self.base.snapshot(0).stats.get("source_snapshot") or 0)
        except FileNotFoundError:
            # snapshot 0 expired: a long-lived main table (branches live
            # only inside a transaction's scratch and are never expired)
            return 0

    # ------------------------------------------------------------ refresh
    def refresh(self, to_snapshot: int | None = None) -> Snapshot | None:
        """Fold base changes ``(applied_through, to_snapshot]`` into the view.

        Returns the view's new snapshot, or None when already current (or
        when a concurrent/repeated refresh of the same range already
        committed — merge_batch's idempotence).

        Falls back to :meth:`full_refresh` when the feed horizon has been
        expired away (same degradation any lake change-feed consumer
        implements).
        """
        off = self._id_offset()
        # cursor is stored in main-equivalent ids; translate to base coords
        frm = max(0, self.applied_through() - off)
        to = (
            to_snapshot
            if to_snapshot is not None
            else self.base.snapshot().snapshot_id
        )
        if to <= frm:
            return None
        try:
            feed = self.base.changes(frm, to)
        except (FileNotFoundError, ValueError):
            # feed horizon expired, or the range spans a rollback (whose
            # delta the feed cannot express) → full rebuild re-syncs
            return self.full_refresh(to)

        # Crossover rule (manifest arithmetic, zero data IO): a long
        # unapplied range can carry AS MANY OR MORE bytes than the table
        # itself (epochs re-state the same keys; a bootstrap-from-0 over an
        # uncompacted table hits exact equality — every table file IS a feed
        # file), at which point the partial path scans the feed AND re-reads
        # the changed buckets — strictly more than one resolved read of
        # current state. Measured 27.8s partial vs 10.6s full at 8.3M
        # events / 5 epochs behind; at exact equality (1M-event bootstrap)
        # interleaved A/B gives full 3.9-4.5s vs partial 4.2-5.4s. Delta-
        # proportionality holds only while the delta is the strictly
        # smaller side; otherwise rebuild.
        if self._range_bytes(frm, to) >= self._table_bytes(to):
            return self.full_refresh(to)

        n_buckets = self.base.snapshot(to).n_buckets
        # ONE scan of the feed's epoch-file union: the changed-conv set is
        # checkpointed (bounded: convs touched in the range — small relative
        # to the table by construction), then the bucket list (driver-side,
        # ≤ n_buckets ints), the aggregate join, and the tombstone anti-join
        # all read the checkpoint — the feed itself is never scanned again
        changed = feed.select("conv_id").distinct().localCheckpoint(eager=True)
        bucket_rows = (
            changed.select(bucket_expr("conv_id", n_buckets).alias("b"))
            .distinct()
            .collect()
        )
        buckets = sorted(r["b"] for r in bucket_rows)
        if not buckets:
            # content-free range (e.g. maintenance-only): record the cursor
            # advance with an empty upsert batch so applied_through moves
            empty = self.spark.createDataFrame([], self._event_schema())
            return merge_batch(
                self.table, empty, query_id=_QUERY_ID, epoch_id=off + to
            )

        current = self.base.read(
            snapshot_id=to, buckets=buckets, columns=_AGG_COLS
        )
        return self._apply(changed, current, off + to)

    def full_refresh(self, to_snapshot: int | None = None) -> Snapshot | None:
        """Rebuild every conversation's row from base state at ``to_snapshot``
        (used when the incremental feed horizon is gone, and by the
        crossover rule when the unapplied range outweighs the table).

        Unlike the incremental path there is no changed-set join at all:
        every conversation is trivially "changed", so the plan is one
        resolved column-pruned scan → one aggregate (map-side partial) →
        merge. Vanished conversations are tombstoned by anti-joining the
        view's own (one-row-per-conv, much smaller) key set against the
        fresh aggregate."""
        to = (
            to_snapshot
            if to_snapshot is not None
            else self.base.snapshot().snapshot_id
        )
        current = self.base.read(snapshot_id=to, columns=_AGG_COLS)
        agg = (
            current.groupBy("conv_id").agg(*_conv_aggs()).localCheckpoint(eager=True)
        )
        gone = self.table.read().select("conv_id").join(
            agg.select("conv_id"), "conv_id", "left_anti"
        )
        return self._merge(agg, gone, self._id_offset() + to)

    # -------------------------------------------- crossover cost estimate
    def _range_bytes(self, frm: int, to: int) -> int:
        """Bytes the change feed for ``(frm, to]`` would scan: the sizes of
        the data files each non-maintenance epoch in the range ADDED vs its
        parent — the exact file set :meth:`LakeTable.changes` unions. Pure
        driver-side manifest walk + file stats, no data IO. (An object-store
        lake would carry sizes in the manifest itself; the local-FS lake
        stats instead — same information, same cost class.)"""
        total = 0
        for sid in range(frm + 1, to + 1):
            snap = self.base.snapshot(sid)
            if snap.stats.get("maintenance"):
                continue
            parent = (
                self.base.snapshot(snap.parent_id)
                if snap.parent_id is not None
                else None
            )
            for b, ps in snap.files.items():
                prev = set(parent.files.get(b, [])) if parent else set()
                for p in ps:
                    if p not in prev:
                        try:
                            total += os.path.getsize(os.path.join(self.base.root, p))
                        except OSError:
                            pass  # vacuumed early: changes() will raise anyway
        return total

    def _table_bytes(self, to: int) -> int:
        """Bytes a full resolved read of base snapshot ``to`` scans (every
        live manifest file — deltas included, since MOR reads them too)."""
        snap = self.base.snapshot(to)
        total = 0
        for ps in snap.files.values():
            for p in ps:
                try:
                    total += os.path.getsize(os.path.join(self.base.root, p))
                except OSError:
                    pass
        return total

    def _event_schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField("op_lsn", T.LongType(), False),
                T.StructField("op", T.StringType(), False),
                *STATS_PAYLOAD_SCHEMA.fields,
            ]
        )

    def _apply(
        self, changed: DataFrame, current: DataFrame, to: int
    ) -> Snapshot | None:
        """Re-aggregate ``changed`` conv_ids from ``current`` rows and merge
        upserts + tombstones into the view at LSN ``to`` (monotone per
        refresh, so later refreshes always dominate earlier rows)."""
        # The changed set is small by construction (convs touched in the
        # range; checkpointed) — broadcast it so the semi-join runs in the
        # SCAN stage instead of shuffling the re-read buckets. Guarded by a
        # count (cheap on the checkpoint) against degenerate huge ranges.
        n_changed = changed.count()
        probe = (
            F.broadcast(changed)
            if n_changed <= int(
                self.spark.conf.get("maestro.ivm.broadcastChangedMax", "2000000")
            )
            else changed
        )
        # materialize the (small: one row per changed conv) aggregate once —
        # it feeds BOTH union branches below (upserts and the anti-join that
        # finds vanished convs), and without the checkpoint each branch would
        # re-execute the whole bucket-read + join + aggregate DAG
        agg = (
            current.join(probe, "conv_id")
            .groupBy("conv_id")
            .agg(*_conv_aggs())
            .localCheckpoint(eager=True)
        )
        gone = changed.join(agg.select("conv_id"), "conv_id", "left_anti")
        return self._merge(agg, gone, to)

    def _merge(self, agg: DataFrame, gone_ids: DataFrame, to: int) -> Snapshot | None:
        """Merge the re-aggregated rows (upserts) + vanished conv_ids
        (tombstones) into the view at LSN ``to``."""
        upserts = agg.select(
            F.lit(to).cast("long").alias("op_lsn"),
            F.lit("upsert").alias("op"),
            "conv_id",
            F.lit(0).alias("turn_idx"),
            "n_turns",
            "n_tool_turns",
            "total_chars",
            "last_ts",
        )
        # convs with zero surviving turns no longer exist in base
        gone = gone_ids.select(
            F.lit(to).cast("long").alias("op_lsn"),
            F.lit("delete").alias("op"),
            "conv_id",
            F.lit(0).alias("turn_idx"),
            F.lit(None).cast("long").alias("n_turns"),
            F.lit(None).cast("long").alias("n_tool_turns"),
            F.lit(None).cast("long").alias("total_chars"),
            F.lit(None).cast("timestamp_ntz").alias("last_ts"),
        )
        events = upserts.unionByName(gone)
        return merge_batch(self.table, events, query_id=_QUERY_ID, epoch_id=to)

    # -------------------------------------------------------------- reads
    def read(self) -> DataFrame:
        return self.table.read().drop("turn_idx")

    def expected(self, snapshot_id: int | None = None) -> DataFrame:
        """Full recompute from base — the reconvergence oracle for tests."""
        return (
            self.base.read(snapshot_id=snapshot_id)
            .groupBy("conv_id")
            .agg(*_conv_aggs())
        )
