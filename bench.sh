#!/bin/sh
# Bench wrapper with a machine-parseable tail: runs graft.Bench under sbt
# (which appends its own "[success] ..." noise after the program's stdout),
# then cats the benchmark's JSON file so the ONE-LINE JSON contract is the
# true last line of this script's stdout.
#
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 ./bench.sh
#
# The same line is also left in BENCH_LOCAL.json (override with
# SPARK_GRAFT_BENCH_OUT).
set -e
cd "$(dirname "$0")"
OUT="${SPARK_GRAFT_BENCH_OUT:-BENCH_LOCAL.json}"
sbt -batch 'runMain graft.Bench'
cat "$OUT"
