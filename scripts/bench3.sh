#!/bin/bash
# Three consecutive official bench runs (r8 verdict #1 "done" criterion):
# each run's stdout JSON and BENCH_DETAIL.json are preserved per-run.
set -u
cd "$(dirname "$0")/.."
for i in 1 2 3; do
  python bench.py > /tmp/bench_r9_run$i.out 2> /tmp/bench_r9_run$i.err
  rc=$?
  echo "run$i rc=$rc"
  if [ $rc -ne 0 ]; then
    echo "run$i FAILED — stderr tail:" && tail -3 /tmp/bench_r9_run$i.err
    continue
  fi
  cp BENCH_DETAIL.json /tmp/bench_r9_detail$i.json 2>/dev/null
  tail -1 /tmp/bench_r9_run$i.out | python -c "
import json, sys
try:
    d = json.loads(sys.stdin.read())
except Exception as ex:
    print(f'run$i: UNPARSEABLE stdout tail ({ex})'); raise SystemExit(0)
o = d.get('oracle_total')
if not o:
    print(f\"run$i: value={d['value']} wall={d['value_wall_drains']}\"
          f\" legacy={d['legacy_total']} (NO ORACLE — ratios unavailable)\")
else:
    print(f\"run$i: value={d['value']} wall={d['value_wall_drains']} oracle={o}\"
          f\" ratio_credited={d['value']/o:.3f}\"
          f\" ratio_wall={d['value_wall_drains']/o:.3f} legacy={d['legacy_total']}\")"
done
