#!/bin/bash
# Standing BOTH-SF correctness gate: run graft.Verify + the DuckDB oracle
# compare at sf0.01 AND sf0.1 and record both results in
# CORRECTNESS_BOTH.json (committed per round). The one-off sf0.1 sweep in
# round 9 found four real scale-sensitive bugs (fixed probe depths,
# float-sum ordering, rounding boundaries) that the sf0.01 gate missed —
# this makes the 10x point a permanent part of the gate, not a one-off.
# Exits non-zero if either SF fails.
set -u
cd "$(dirname "$0")/.."
rc=0
for sf in 0.01 0.1; do
  out="/tmp/verify_sf${sf}_gate"
  rm -rf "$out"
  if ! tools/run.sh graft.Verify "/root/testdata/sf$sf" "$out" \
      2>"/tmp/verify_sf${sf}_gate.log"; then
    echo "sf$sf: graft.Verify FAILED (see /tmp/verify_sf${sf}_gate.log)"
    rc=1
  fi
  if ! python3 tools/check.py "/root/testdata/sf$sf" "$out" \
      --json "/tmp/check_sf${sf}.json" >"/tmp/check_sf${sf}.txt" 2>&1; then
    rc=1
  fi
  echo "sf$sf: $(tail -1 /tmp/check_sf${sf}.txt)"
done
python3 - <<'EOF'
import json
rec = {}
for sf in ("0.01", "0.1"):
    try:
        rec[f"sf{sf}"] = json.load(open(f"/tmp/check_sf{sf}.json"))
    except Exception as e:
        rec[f"sf{sf}"] = {"error": str(e)}
json.dump(rec, open("CORRECTNESS_BOTH.json", "w"), indent=1, sort_keys=True)
print("wrote CORRECTNESS_BOTH.json")
EOF
exit $rc
