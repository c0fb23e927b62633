#!/bin/bash
# YARN cluster deploy of the nightly lake-maintenance batch job (no
# reference twin — the reference has no batch maintenance surface;
# sizing profile notes in deploy/start_clean_yarn.sh apply).
# Requires SPARK_HOME on PATH and HADOOP_CONF_DIR exported.
set -euo pipefail
cd "$(dirname "$0")/.."

PYFILES=/tmp/flinkproj_spark.zip
(cd "$(pwd)" && zip -qr "$PYFILES" flinkproj_spark)

exec spark-submit \
  --master yarn \
  --deploy-mode cluster \
  --queue "${YARN_QUEUE:-default}" \
  --name LakeMaintenanceJob \
  --num-executors "${NUM_EXECUTORS:-2}" \
  --executor-cores "${EXECUTOR_CORES:-2}" \
  --executor-memory "${EXECUTOR_MEMORY:-1g}" \
  --driver-memory "${DRIVER_MEMORY:-1g}" \
  --properties-file deploy/spark-defaults-yarn.conf \
  --py-files "$PYFILES" \
  deploy/run_lake_maintenance.py "$@"
