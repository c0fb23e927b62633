#!/bin/bash
# YARN cluster deploy of the clean pipeline — the spark-submit twin of
# the reference's Flink launcher (DataClean/bin/startDataClean.sh:3-12:
# `flink run -m yarn-cluster -d -yqu default -ynm DataCleanJob -yn 2
# -ys 2 -yjm 1024 -ytm 1024 ...`). Flink's knobs map as:
#   -yn 2 -ys 2 (2 TMs × 2 slots)  -> --num-executors 2 --executor-cores 2
#   -yjm/-ytm 1024                 -> --driver-memory/--executor-memory 1g
#   -yqu default                   -> --queue default
#   -d (detached)                  -> cluster deploy-mode is detached
#   -ynm DataCleanJob              -> --name
# The tiny sizing mirrors the reference rig; deploy/spark-defaults-yarn.conf
# holds the 100 TB-fleet profile to use instead on a real cluster.
# Requires SPARK_HOME on PATH and HADOOP_CONF_DIR exported.
set -euo pipefail
cd "$(dirname "$0")/.."

PYFILES=/tmp/flinkproj_spark.zip
(cd "$(pwd)" && zip -qr "$PYFILES" flinkproj_spark)

exec spark-submit \
  --master yarn \
  --deploy-mode cluster \
  --queue "${YARN_QUEUE:-default}" \
  --name DataCleanJob \
  --num-executors "${NUM_EXECUTORS:-2}" \
  --executor-cores "${EXECUTOR_CORES:-2}" \
  --executor-memory "${EXECUTOR_MEMORY:-1g}" \
  --driver-memory "${DRIVER_MEMORY:-1g}" \
  --properties-file deploy/spark-defaults-yarn.conf \
  --py-files "$PYFILES" \
  deploy/run_clean.py "$@"
