"""User-facing DML over the lake: upsert / delete_where / update_where.

The CDC engine's native write language is change events (op, op_lsn,
payload). Interactive users and batch jobs want SQL-DML ergonomics
instead; this module compiles DML verbs into one synthetic change-event
epoch and routes it through the SAME merge path as the binlog tail
(merge.merge_batch) — so DML rows obey LSN dominance, land exactly-once,
appear in the change feed, refresh IVM views, and coexist with a live
stream writing the same table (the commit validate-and-rebase handles the
race).

LSN assignment: every row of a DML statement takes ``max live LSN + 1`` —
strictly above everything already applied, so the statement wins against
any late re-delivery of older data, while the NEXT statement (max+2 …)
wins against this one. Per-key ordering is all the merge needs, so one
shared LSN per statement is sound; the max is read driver-side from the
zone-map store (per-file lsn_max — no data IO).

Concurrency: the acquired LSN is FENCED at commit time. The statement
records the snapshot it read the max from, and ``merge_batch`` passes both
through to ``LakeTable.commit``, which validates that no snapshot committed
after that read applied an LSN at or above the statement's — two concurrent
statements (or a statement racing a streaming epoch) can therefore never
land the SAME LSN for different payloads of one key. The loser raises
:class:`CommitConflict` internally and this module re-plans it: re-read the
max (now higher), rebuild the batch from CURRENT state, commit again —
bounded by ``maestro.dml.retries`` (default 5).
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from maestro_spark import schema as S
from maestro_spark.lake import CommitConflict, LakeTable, Snapshot
from maestro_spark.merge import merge_batch


def max_live_lsn(table: LakeTable, snapshot_id: int | None = None) -> int:
    """Highest LSN in the given (default current) snapshot — driver-side
    zone-map arithmetic over per-file lsn_max, zero data IO at any table
    size."""
    snap = table.snapshot(snapshot_id)
    best = 0
    for ps in snap.files.values():
        for p in ps:
            hi = table.file_stats.get_or_read(p).get("lsn_max")
            if hi is not None and hi > best:
                best = hi
    return best


def _dml_statement(
    table: LakeTable,
    build_batch: Callable[[int], DataFrame],
    query_id: str,
) -> Snapshot | None:
    """Acquire a fenced statement LSN, build the batch at it, merge; on an
    LSN-fence or bucket conflict, re-plan from the new current state.

    epoch id = microsecond wall clock: unique per statement (and per retry —
    a re-planned statement is a NEW epoch reading newer state); exactly-once
    for a RETRYING driver comes from the commit CAS + fence, not this id (a
    driver that wants replayable DML passes its own query_id/epoch through
    merge_batch directly).
    """
    retries = int(table.spark.conf.get("maestro.dml.retries", "5"))
    last: Exception | None = None
    for _ in range(retries + 1):
        base = table.snapshot().snapshot_id
        lsn = max_live_lsn(table, base) + 1
        batch = build_batch(lsn)
        try:
            return merge_batch(
                table,
                batch,
                query_id,
                epoch_id=int(time.time() * 1e6),
                fence_lsn=lsn,
                base_snapshot=base,
            )
        except CommitConflict as e:  # racer raised the LSN / touched buckets
            last = e
    raise CommitConflict(
        f"DML statement lost the LSN fence {retries + 1} times"
    ) from last


def upsert(table: LakeTable, df: DataFrame, query_id: str = "dml") -> Snapshot | None:
    """Insert-or-replace full rows. ``df`` carries payload columns (at
    least the key); new columns schema-evolve exactly as evolved binlog
    events do. Duplicate keys inside ``df`` are rejected — a statement
    must be unambiguous about a key's final value."""
    dup = df.groupBy(*S.KEY_COLS).count().filter(F.col("count") > 1).head(1)
    if dup:
        raise ValueError(f"upsert input has duplicate keys, e.g. {dup[0][:2]}")

    def build(lsn: int) -> DataFrame:
        return df.withColumn("op", F.lit("upsert")).withColumn(
            "op_lsn", F.lit(lsn).cast("long")
        )

    return _dml_statement(table, build, query_id)


def delete_where(
    table: LakeTable, predicate: Column, query_id: str = "dml"
) -> Snapshot | None:
    """Delete every live row matching ``predicate`` (tombstones, so late
    lower-LSN re-deliveries of the deleted rows stay dead)."""

    def build(lsn: int) -> DataFrame:
        # re-read per attempt: a re-planned statement must see the racer's rows
        keys = table.read().filter(predicate).select(*S.KEY_COLS)
        return keys.withColumn("op", F.lit("delete")).withColumn(
            "op_lsn", F.lit(lsn).cast("long")
        )

    return _dml_statement(table, build, query_id)


def update_where(
    table: LakeTable,
    predicate: Column,
    assignments: dict[str, Column],
    query_id: str = "dml",
) -> Snapshot | None:
    """Set ``assignments`` on every live row matching ``predicate`` —
    reads current values, applies the expressions, re-emits the full rows
    as upserts (the merge is replace-by-key, so unchanged columns must
    ride along)."""

    def build(lsn: int) -> DataFrame:
        rows = table.read().filter(predicate)
        for col, expr in assignments.items():
            rows = rows.withColumn(col, expr)
        return rows.withColumn("op", F.lit("upsert")).withColumn(
            "op_lsn", F.lit(lsn).cast("long")
        )

    return _dml_statement(table, build, query_id)
