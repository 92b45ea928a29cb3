#!/bin/sh
# External-reader interop gate (VERDICT r10 #1): build lifecycle fixture
# tables with graft.InteropDump (multi-snapshot appends + schema evolution,
# MOR position+equality deletes with a post-purge re-append, sorted append
# + compaction, partition transforms with deletes), then read them back
# from the SPEC FILE FORMATS ALONE — metadata JSON, Avro manifest lists,
# Avro manifests, parquet data/delete files — via the clean-room Python
# Avro decoder + DuckDB in tools/iceberg_external_read.py (zero shared
# code with the Scala library), and compare against load() row for row.
#
# Usage: tools/interop_check.sh [sfDir] [outRoot]
set -e
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/interop}"
sbt -batch package
rm -rf "$OUT"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" /opt/spark/bin/spark-submit \
  --driver-memory 8g --class graft.InteropDump \
  target/scala-2.13/targeticebergspark_2.13-0.1.0.jar "$SF" "$OUT"
python3 tools/iceberg_external_read.py "$OUT"
