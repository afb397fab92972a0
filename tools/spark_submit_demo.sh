#!/usr/bin/env bash
# North-rule deployment shape: `spark-submit --py-files` with the engine
# packaged as a zip — exactly how the job ships to a real multi-executor
# cluster (cluster managers distribute the zip to every executor's Python
# worker; no repo checkout needed on the nodes).
#
# Usage: tools/spark_submit_demo.sh [log_dir] [lake_dir] [cores]
# Packages maestro_spark into a wheel-style zip, then runs the replay job
# through bin/spark-submit with the package attached via --py-files.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG_DIR="${1:-/tmp/maestro_submit_demo/log}"
LAKE_DIR="${2:-/tmp/maestro_submit_demo/lake}"
CORES="${3:-4}"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

# 1. package the engine (sources only, no tests)
(cd "$REPO" && python - "$WORK/maestro_spark.zip" <<'EOF'
import sys, zipfile, pathlib
out = sys.argv[1]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(pathlib.Path("maestro_spark").rglob("*.py")):
        z.write(p, str(p))
print("packaged", out)
EOF
)

# 2. tiny input if none supplied
if [ ! -d "$LOG_DIR" ]; then
  PYTHONPATH="$REPO" python - "$LOG_DIR" <<'EOF'
import sys
from maestro_spark.gen import GenConfig, generate, write_log
log = generate(GenConfig(seed=7, n_convs=2000))
write_log(log, sys.argv[1], segment_rows=len(log) // 4 + 1)
print("generated", len(log), "events")
EOF
fi

rm -rf "$LAKE_DIR" "$LAKE_DIR.warmup"

# 3. the actual cluster-shaped invocation: NO PYTHONPATH, the zip is the
# only way the driver AND executors can import the engine
SPARK_SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"
"$SPARK_SUBMIT" \
  --master "local[$CORES]" \
  --py-files "$WORK/maestro_spark.zip" \
  --conf spark.sql.shuffle.partitions="$((4 * CORES))" \
  "$REPO/tools/replay_job.py" "$LOG_DIR" "$LAKE_DIR" "$CORES" 16 1
