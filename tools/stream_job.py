"""One streaming-path CDC ingest run at a given parallelism — the streaming
twin of replay_job.py for the scaling evidence (fresh JVM per run).

Drives ``stream_ingest`` (SURVEY §3.1 flagship) with the native JVM file
source and bounded microbatch admission, so the run is a sequence of
foreachBatch epochs exactly like production tailing — not one giant batch.

Usage: python tools/stream_job.py <log_dir> <lake_dir> <cpus>
           [n_buckets] [segments_per_batch]
Prints one JSON line with events/sec.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

try:
    import maestro_spark  # noqa: F401  (provided via spark-submit --py-files)
except ImportError:  # repo-local run without packaging
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    log_dir, lake_dir, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    seg_per_batch = int(sys.argv[5]) if len(sys.argv) > 5 else 32

    from maestro_spark.lake import LakeTable
    from maestro_spark.replay import log_segments
    from maestro_spark.session import get_spark
    from maestro_spark.stream import stream_ingest

    log_bytes = sum(os.path.getsize(p) for p in log_segments(log_dir))
    split = max(4 * 1024 * 1024, log_bytes // (cpus * 4))
    extra = {
        "spark.sql.files.maxPartitionBytes": str(split),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(split),
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.shuffle.compress": "false",  # local mode: no NIC in the path
    }
    extra.update(json.loads(os.environ.get("MAESTRO_EXTRA_CONF", "{}")))
    spark = get_spark(
        f"stream-scale-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pyarrow.parquet as pq

    n_events = sum(pq.ParquetFile(p).metadata.num_rows for p in log_segments(log_dir))

    # steady-state protocol (same as replay_job): full warmup pass into a
    # scratch lake (JIT, codegen, page cache), then the timed run
    LakeTable.create(spark, lake_dir + ".warmup", n_buckets=n_buckets)
    stream_ingest(
        spark, log_dir, lake_dir + ".warmup", query_id=f"swarm{cpus}",
        source="native", max_segments_per_batch=seg_per_batch,
    )
    shutil.rmtree(lake_dir + ".warmup", ignore_errors=True)

    table = LakeTable.create(spark, lake_dir, n_buckets=n_buckets)
    t0 = time.time()
    q = stream_ingest(
        spark, log_dir, lake_dir, query_id=f"stream{cpus}",
        source="native", max_segments_per_batch=seg_per_batch,
    )
    wall = time.time() - t0
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    final_rows = table.read().count()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "events": n_events,
                "microbatches": n_batches,
                "wall_sec": round(wall, 2),
                "events_per_sec": round(n_events / wall, 1),
                "final_rows": final_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
