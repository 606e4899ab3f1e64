#!/usr/bin/env bash
# North-rule deployment check: package horus_spark as a zip and run the
# extraction pipeline via `spark-submit --py-files` from a scratch
# directory (no repo on sys.path — the zip is the only import source).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d /tmp/horus_pkg_XXXX)"
trap 'rm -rf "$WORK"' EXIT

ZIP="$WORK/horus_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" horus_spark -x '*__pycache__*' -x '*.pyc')
cp "$REPO/tools/submit_job.py" "$WORK/"

SPARK_SUBMIT="${SPARK_SUBMIT:-spark-submit}"
cd "$WORK"
"$SPARK_SUBMIT" \
  --master "local[${HORUS_SUBMIT_CORES:-4}]" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.ui.enabled=false \
  submit_job.py 2> "$WORK/stderr.log" | tee "$WORK/stdout.log"

grep -q '"ok": true' "$WORK/stdout.log" && echo "PACKAGE CHECK OK" || {
  echo "PACKAGE CHECK FAILED"; tail -40 "$WORK/stderr.log"; exit 1;
}
