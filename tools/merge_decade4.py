#!/usr/bin/env python3
"""Merge the per-process 4th-decade op records (tools/decade4.sh runs one
op per JVM so shuffle files die with each process) into BENCH_SCALE.json
as a single corpus point. Reads the `[bench_scale] op <name> n_docs=N ...`
stderr records from the run dir's *.log files; the trailing JSON object on
each line is the op's task/shuffle/spill attribution."""
import json
import re
import sys
from pathlib import Path

run_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/decade4b")
bench = Path(__file__).resolve().parent.parent / "BENCH_SCALE.json"

pat = re.compile(
    r"\[bench_scale\] op (\S+) n_docs=(\d+) ([\d.]+)s (\{.*\})")
ops, metrics, n_docs = {}, {}, None
for log in sorted(run_dir.glob("*.log")):
    for line in log.read_text(errors="replace").splitlines():
        m = pat.search(line)
        if not m:
            continue
        op, n, sec, mj = m.group(1), int(m.group(2)), float(m.group(3)), m.group(4)
        n_docs = n if n_docs is None else n_docs
        assert n == n_docs, f"mixed sizes in {run_dir}: {n} vs {n_docs}"
        ops[op] = sec  # last record wins (re-runs overwrite)
        metrics[op] = json.loads(mj)
if not ops:
    sys.exit(f"no op records found under {run_dir}")

doc = json.loads(bench.read_text())
# merge into an existing point for this size (several run dirs can each
# contribute ops); new records win on op-name collision
existing = next((p for p in doc["corpus_points"]
                 if p.get("n_docs") == n_docs), None)
point = existing or {"n_docs": n_docs, "ops": {}, "ops_metrics": {},
                     "note": "one JVM per op (tools/decade4.sh), "
                             "zstd shuffle codec"}
point.setdefault("ops", {}).update(ops)
point.setdefault("ops_metrics", {}).update(metrics)
pts = [p for p in doc["corpus_points"] if p.get("n_docs") != n_docs]
pts.append(point)
pts.sort(key=lambda p: p["n_docs"])
doc["corpus_points"] = pts
bench.write_text(json.dumps(doc) + "\n")
prev = next((p for p in pts if p["n_docs"] == n_docs // 10), None)
print(f"merged {len(ops)} ops at n_docs={n_docs}")
for op, sec in sorted(ops.items()):
    ratio = f" ({sec / prev['ops'][op]:.1f}x/decade)" \
        if prev and op in prev["ops"] else ""
    mm = metrics[op]
    print(f"  {op}: {sec:.1f}s sw={mm['shuffle_write_mb']}MB "
          f"spill={mm['spill_disk_mb']}MB{ratio}")
