"""Metadata-scale microbench: per-commit snapshot metadata bytes, manifest
form vs the inline alternative, over a many-epoch replay.

The 10^10-event target implies thousands of commits; this measures the two
costs that grow with the chain — (a) bytes persisted per commit and (b)
driver-side time to load the tip snapshot cold — for the manifest-list
layout actually written versus the pre-M30 inline layout (computed from the
same resolved state, not re-run). Results land in BENCH/BASELINE.md.

Usage: python tools/bench_metadata.py [epochs] [events_per_epoch]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maestro_spark.gen import GenConfig, write_log_distributed  # noqa: E402
from maestro_spark.lake import SNAP_DIR, LakeTable, load_snapshot  # noqa: E402
from maestro_spark.replay import replay  # noqa: E402
from maestro_spark.session import get_spark  # noqa: E402


def main() -> None:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    spark = get_spark(
        "bench-metadata",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    tmp = tempfile.mkdtemp(prefix="benchmeta-")
    cfg = GenConfig(seed=7, n_convs=n_convs)
    n = write_log_distributed(spark, cfg, f"{tmp}/log", n_shards=epochs)
    t = LakeTable.create(spark, f"{tmp}/lake", n_buckets=64)
    t0 = time.time()
    replay(spark, f"{tmp}/log", t, query_id="meta", segments_per_epoch=1)
    wall = time.time() - t0

    sdir = os.path.join(t.root, SNAP_DIR)
    snap_bytes = mani_bytes = 0
    inline_bytes = 0
    sids = t.snapshot_ids()
    for fn in os.listdir(sdir):
        p = os.path.join(sdir, fn)
        if fn.startswith("s-") and fn.endswith(".json"):
            snap_bytes += os.path.getsize(p)
        elif fn.startswith("m-") and fn.endswith(".json"):
            mani_bytes += os.path.getsize(p)
    for sid in sids:
        s = t.snapshot(sid)
        inline_bytes += len(json.dumps(s.files))

    # cold tip load (fresh cache): the serving-path planning cost
    t1 = time.time()
    tip = load_snapshot(t.root, sids[-1], cache={})
    cold_ms = (time.time() - t1) * 1000
    files_total = sum(len(ps) for ps in tip.files.values())

    print(json.dumps({
        "events": n,
        "epochs": len(sids) - 1,
        "replay_sec": round(wall, 2),
        "live_files": files_total,
        "manifest_list_len": len(tip.manifest_list or []),
        "metadata_bytes_written": snap_bytes + mani_bytes,
        "snapshot_json_bytes": snap_bytes,
        "manifest_bytes": mani_bytes,
        "inline_equivalent_bytes": snap_bytes + inline_bytes,
        "savings_ratio": round(
            (snap_bytes + inline_bytes) / max(1, snap_bytes + mani_bytes), 2
        ),
        "cold_tip_load_ms": round(cold_ms, 1),
    }))


if __name__ == "__main__":
    main()
