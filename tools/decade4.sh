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

# Pre-run disk-budget projection (the 10^8 minhash_lsh lesson: the run
# died on ENOSPC 38 minutes in, exactly where a one-line projection would
# have said it would). Components, all from MEASURED points:
#   - docs fixture: ~270 B/doc DISK_ONLY (27 GB at 10^8);
#   - minhash-class sketch: docs x k x 8 B x 1.25 block-store multiplier
#     (44 GB raw -> ~55 GB stored at 10^8, k = autoRows x autoBands
#     replicated below) + ~0.5x for the concurrent signature-agg shuffle;
#   - other ops: 3x fixture for index + shuffle scratch (the measured
#     2x10^7 points all fit well under this).
# An op whose projection exceeds free scratch is SKIPPED with a recorded
# line -- the probe fails in the plan, not half an hour into the run.
budget_skip() { # $1=op $2=docs -> 0 keep, 1 skip (prints the reason)
  python3 - "$1" "$2" <<'PYEOF'
import math, shutil, sys
op, docs = sys.argv[1], int(sys.argv[2])
free = shutil.disk_usage("/tmp").free / 1e9
fixture = docs * 270 / 1e9
if op in ("minhash_lsh", "cc_clusters_lsh"):
    r = max(4, math.ceil(4.0 * math.log10(max(1, docs) / 2e5)))
    p = 0.95 ** r
    b = max(4, math.ceil(math.log1p(-0.985) / math.log1p(-p)))
    sketch = docs * (r * b) * 8 * 1.25 / 1e9
    need = fixture + sketch * 1.5
elif op == "kn_perplexity":
    # token-volume class, calibrated on the measured 2e7 point (~53 GB
    # peak consumption vs this formula's 54): ~39 B/token for shuffle
    # files + the DISK_ONLY model-table checkpoints (measured 28.8 GB
    # zstd shuffle + ~10 GB checkpoint blocks at 1e9 tokens) plus
    # ~10 B/token disk spill (8.7 GB measured)
    need = fixture + docs * 50 * 39 / 1e9 + docs * 50 * 10 / 1e9
else:
    need = fixture * 3
if need > free * 0.9:
    print(f"SKIP {op}: projected ~{need:.0f} GB scratch > {free:.0f} GB free")
    sys.exit(1)
print(f"keep {op}: projected ~{need:.0f} GB scratch, {free:.0f} GB free")
PYEOF
}

for op in $ops; do
  msg=$(budget_skip "$op" "$docs"); rc=$?
  echo "$msg" | tee -a "$out/budget.log"
  [ $rc -ne 0 ] && continue
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
