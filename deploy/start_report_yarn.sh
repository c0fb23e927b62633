#!/bin/bash
# YARN cluster deploy of the report pipeline — spark-submit twin of the
# reference's DataReport/bin/startDataReport.sh:2-11 (same knob mapping
# as start_clean_yarn.sh; see that header).
set -euo pipefail
cd "$(dirname "$0")/.."

PYFILES=/tmp/flinkproj_spark.zip
(cd "$(pwd)" && zip -qr "$PYFILES" flinkproj_spark)

exec spark-submit \
  --master yarn \
  --deploy-mode cluster \
  --queue "${YARN_QUEUE:-default}" \
  --name DataReportJob \
  --num-executors "${NUM_EXECUTORS:-2}" \
  --executor-cores "${EXECUTOR_CORES:-2}" \
  --executor-memory "${EXECUTOR_MEMORY:-1g}" \
  --driver-memory "${DRIVER_MEMORY:-1g}" \
  --properties-file deploy/spark-defaults-yarn.conf \
  --py-files "$PYFILES" \
  deploy/run_report.py "$@"
