#!/bin/bash
# Three consecutive official bench runs (r8 verdict #1 "done" criterion):
# each run's stdout JSON and BENCH_DETAIL.json are preserved per-run.
set -u
cd "$(dirname "$0")/.."
for i in 1 2 3; do
  python bench.py > /tmp/bench_r9_run$i.out 2> /tmp/bench_r9_run$i.err
  echo "run$i rc=$?"
  cp BENCH_DETAIL.json /tmp/bench_r9_detail$i.json 2>/dev/null
  tail -1 /tmp/bench_r9_run$i.out | python -c "
import json,sys
d=json.loads(sys.stdin.read())
o=d.get('oracle_total') or 1
ow=d.get('oracle_total')
print(f\"run$i: value={d['value']} wall={d['value_wall_drains']} oracle={ow} ratio_credited={d['value']/o:.3f} ratio_wall={d['value_wall_drains']/o:.3f} legacy={d['legacy_total']}\")"
done
