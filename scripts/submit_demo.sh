#!/usr/bin/env bash
# Package crawlee_spark as a zip and run the flagship job via
# spark-submit --py-files (north_rule deployment shape). Usage:
#   scripts/submit_demo.sh [master] [sf_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
MASTER="${1:-local[8]}"
SF_DIR="${2:-/root/testdata/sf0.001}"
python -c "import shutil; shutil.make_archive('/tmp/crawlee_spark', 'zip', '.', 'crawlee_spark')"
exec spark-submit --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=8 \
  --py-files /tmp/crawlee_spark.zip \
  scripts/submit_job.py "$SF_DIR"
