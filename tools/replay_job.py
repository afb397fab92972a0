"""One CDC replay run at a given parallelism — the unit job of the scaling
benchmark (fresh JVM per run so parallelism levels don't share state).

Usage: python tools/replay_job.py <log_dir> <lake_dir> <cpus> [n_buckets]
Prints one JSON line with events/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

try:
    import maestro_spark  # noqa: F401  (provided via spark-submit --py-files)
except ImportError:  # repo-local run without packaging
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    log_dir, lake_dir, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    seg_per_epoch = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    from maestro_spark.lake import LakeTable
    from maestro_spark.replay import log_segments, replay
    from maestro_spark.session import get_spark

    # Size scan splits and AQE's coalescing target to the actual input so
    # BOTH parallelism levels have parallel work — the sandbox stand-in for a
    # 10^10-event run where thousands of natural splits exist. At production
    # split sizes (128MB) this 4M-event input collapses to ~8 tasks and the
    # comparison measures scheduler overhead, not scaling.
    log_bytes = sum(
        os.path.getsize(p) for p in log_segments(log_dir)
    )
    split = max(4 * 1024 * 1024, log_bytes // (cpus * 4))
    extra = {
        "spark.sql.files.maxPartitionBytes": str(split),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(split),
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        # local mode: shuffle bytes never cross a NIC — lz4 compress+decompress
        # is pure CPU/memory-traffic overhead here (measured best-of-3 at 8M
        # events: 10.48s -> 9.18s @32c, 15.25s -> 11.65s @8c). A cluster
        # deployment keeps the codec on for network shuffle.
        "spark.shuffle.compress": "false",
    }
    # experiment hook: MAESTRO_EXTRA_CONF='{"spark.x": "y", ...}' overlays
    # per-run Spark conf so A/B runs get a fresh JVM each (subprocess)
    extra.update(json.loads(os.environ.get("MAESTRO_EXTRA_CONF", "{}")))
    spark = get_spark(
        f"scale-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pyarrow.parquet as pq

    n_events = sum(pq.ParquetFile(p).metadata.num_rows for p in log_segments(log_dir))

    # steady-state measurement: a full warmup replay (JIT, codegen, page
    # cache) into a scratch lake, then the timed run into a fresh lake
    warm = LakeTable.create(spark, lake_dir + ".warmup", n_buckets=n_buckets)
    replay(spark, log_dir, warm, query_id=f"warm{cpus}", segments_per_epoch=seg_per_epoch)

    table = LakeTable.create(spark, lake_dir, n_buckets=n_buckets)
    t0 = time.time()
    epochs = replay(spark, log_dir, table, query_id=f"scale{cpus}", segments_per_epoch=seg_per_epoch)
    wall = time.time() - t0
    final_rows = table.read().count()
    from maestro_spark.ledger import Ledger
    per_epoch = [
        {k: e["stats"].get(k) for k in
         ("rows_in", "rows_out", "wall_s", "plan_s", "write_s", "lineage_s")}
        for e in Ledger(table.root, f"scale{cpus}").entries()
    ]
    # compaction cost lives in the maintenance snapshots' own stats
    compactions = [
        {"snapshot_id": sid, "compact_s": s.stats.get("compact_s"),
         "buckets": len(s.stats.get("buckets") or [])}
        for sid in table.snapshot_ids()
        for s in [table.snapshot(sid)]
        if s.stats.get("maintenance")
    ]
    with open("/tmp/replay_diag.log", "a") as fh:
        fh.write(json.dumps({"cpus": cpus, "per_epoch": per_epoch,
                             "compactions": compactions}) + "\n")
    print(
        json.dumps(
            {
                "cpus": cpus,
                "events": n_events,
                "epochs": epochs,
                "wall_sec": round(wall, 2),
                "events_per_sec": round(n_events / wall, 1),
                "final_rows": final_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
