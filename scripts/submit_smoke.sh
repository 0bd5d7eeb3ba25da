#!/bin/bash
# Exercise the PRODUCTION launch path end-to-end: zip the package, ship
# it with spark-submit --py-files (the north-rule launch mode), replay a
# synthetic changelog into a fresh lake table from a cwd OUTSIDE the
# repo (so only the shipped zip provides the package), and assert the
# run reports applied batches. The only divergence from a real cluster
# is the master URL ($SMOKE_MASTER, default local[4] — pass
# local-cluster[2,2,4096] to ship the zip to separate executor JVMs).
set -euo pipefail
cd "$(dirname "$0")/.."
REPO="$(pwd)"

MASTER="${SMOKE_MASTER:-local[4]}"
WORK="$(mktemp -d /tmp/submit_smoke.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

# --py-files wants a zip whose root contains the package directory
zip -qr "$WORK/pkg.zip" arcane_stream_sqlserver_change_tracking_spark -x '*/__pycache__/*'

cat > "$WORK/runner.py" <<'PY'
import sys
from arcane_stream_sqlserver_change_tracking_spark.__main__ import main
sys.exit(main(sys.argv[1:]))
PY

SUBMIT="$(python -c 'import os, pyspark; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"

cd "$WORK"
"$SUBMIT" \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.ui.enabled=false \
  --py-files "$WORK/pkg.zip" \
  "$WORK/runner.py" \
  --mode replay --table "$WORK/t" --events 100000 --bootstrap \
  2>"$WORK/submit.err" | tee "$WORK/out.jsonl"

python - "$WORK/out.jsonl" <<'PY'
import json, sys
lines = [l for l in open(sys.argv[1]) if l.strip().startswith("{")]
assert lines, "no batch results printed"
last = json.loads(lines[-1])
assert last.get("rows_deduped", 0) > 0, last
print(f"SUBMIT SMOKE OK: {len(lines)} batches, last={lines[-1].strip()}")
PY
