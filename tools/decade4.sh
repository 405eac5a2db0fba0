#!/bin/bash
# 4th corpus decade (2x10^7 docs, ~10^9 shingle rows): one op per process
# so each op's shuffle files die with its JVM -- at this size a single
# process accumulating all the ops' shuffle+spill would overflow the
# disk. zstd shuffle compression for the same reason; recorded in the
# SURVEY attribution since it makes 4th-decade walls carry a small codec
# delta vs the lz4 decades.
#
# jaccard_pairs and cc_clusters (which consumes jaccard's pairs) are NOT
# in the default list: exact inverted-index pair generation follows an
# n^2/|shingle-space| law once the fixture's 3-gram space (~1.25e8)
# saturates -- measured 5.0 GB of pair shuffle at 2e6 docs, and the 2e7
# run wrote ~65 GB of scratch before ENOSPC with the pair stage still
# early (projected ~100x the 2e6 volume, ~350-500 GB). The 4th-decade
# near-dup path is minhash_lsh / cc_clusters_lsh (linear candidates).
set -u
cd "$(dirname "$0")/.."
ops="${SPARK_GRAFT_DECADE4_OPS:-dedup_exact minhash_lsh cc_clusters_lsh fingerprint_pairs dup_spans strip_spans decontam_exact decontam_bloom}"
docs="${SPARK_GRAFT_DECADE4_DOCS:-20000000}"
out="${1:-/tmp/decade4}"
mkdir -p "$out"
for op in $ops; do
  echo "=== $op $(date -u +%H:%M:%S) df=$(df --output=avail -BG / | tail -1)"
  SPARK_GRAFT_SCALE_OPS="$op" SPARK_GRAFT_SCALE_DOCS="$docs" \
  SPARK_DRIVER_MEM=8g \
  JAVA_TOOL_OPTIONS="-Dspark.io.compression.codec=zstd" \
    tools/run.sh graft.BenchScale \
    >"$out/$op.out" 2>"$out/$op.log"
  rc=$?
  echo "=== $op exit=$rc $(date -u +%H:%M:%S)"
  grep -h 'bench_scale\] op' "$out/$op.log" | tail -1
done
