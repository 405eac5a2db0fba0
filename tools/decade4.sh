#!/bin/bash
# 4th corpus decade (2x10^7 docs, ~10^9 shingle rows): one op per process
# so each op's shuffle files die with its JVM -- at this size a single
# process accumulating all nine ops' shuffle+spill would overflow the
# disk. zstd shuffle compression for the same reason (jaccard alone
# projects ~50 GB of lz4 shuffle against 80 GB free); recorded in the
# SURVEY attribution since it makes 4th-decade walls carry a small codec
# delta vs the lz4 decades.
set -u
cd "$(dirname "$0")/.."
ops="${SPARK_GRAFT_DECADE4_OPS:-jaccard_pairs cc_clusters fingerprint_pairs minhash_lsh dup_spans strip_spans dedup_exact decontam_exact decontam_bloom}"
out="${1:-/tmp/decade4}"
mkdir -p "$out"
for op in $ops; do
  echo "=== $op $(date -u +%H:%M:%S) df=$(df --output=avail -BG / | tail -1)"
  SPARK_GRAFT_SCALE_OPS="$op" SPARK_GRAFT_SCALE_DOCS=20000000 \
  SPARK_DRIVER_MEM=8g \
  JAVA_TOOL_OPTIONS="-Dspark.io.compression.codec=zstd" \
    tools/run.sh graft.BenchScale \
    >"$out/$op.out" 2>"$out/$op.log"
  rc=$?
  echo "=== $op exit=$rc $(date -u +%H:%M:%S)"
  grep -h 'bench_scale\] op' "$out/$op.log" | tail -1
done
