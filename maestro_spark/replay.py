"""Batch replay of the change-event log (SURVEY §3.2).

Reads the ordered log-segment directory written by ``gen.write_log`` (or
tailed live by ``source``), chunks it into synthetic epochs (one or more
segment files per epoch), and drives ``merge.merge_batch`` per epoch so the
idempotence / lineage / ledger machinery is exercised identically to the
streaming path. Resuming from any checkpoint is free: committed epochs are
detected via the snapshot chain and skipped, and max-LSN dominance makes the
final state invariant to the epoch boundaries chosen.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from maestro_spark.lake import LakeTable
from maestro_spark.merge import merge_batch


def log_segments(log_dir: str) -> list[str]:
    return sorted(
        os.path.join(log_dir, f)
        for f in os.listdir(log_dir)
        if f.startswith("segment-") and f.endswith(".parquet")
    )


def replay(
    spark: SparkSession,
    log_dir: str,
    table: LakeTable,
    query_id: str = "replay",
    segments_per_epoch: int = 1,
    start_epoch: int = 0,
    max_epochs: int | None = None,
) -> int:
    """Replay the log into ``table``; returns number of epochs committed
    (skipped-as-already-committed epochs don't count)."""
    segs = log_segments(log_dir)
    epochs = [
        segs[i : i + segments_per_epoch] for i in range(0, len(segs), segments_per_epoch)
    ]
    committed = 0
    for eid, files in enumerate(epochs):
        if eid < start_epoch:
            continue
        if max_epochs is not None and eid >= start_epoch + max_epochs:
            break
        batch = spark.read.parquet(*files)
        snap = merge_batch(
            table,
            batch,
            query_id=query_id,
            epoch_id=eid,
            offsets={"segments": [os.path.basename(f) for f in files]},
        )
        if snap is not None:
            committed += 1
    return committed
