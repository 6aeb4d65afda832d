#!/bin/bash
# Snapshot the load-bearing lines of a finished run's log into
# benchmarks/<name>_test_log.txt: the exact invocation, discovery/rescue/
# physics-fit events, every valid-eval line, the throughput line, and the
# final test-split lines. Usage: tools/snapshot_run.sh <run_name>
set -eu
cd /root/repo
name=$1
log=runs/$name/log.txt
out=benchmarks/${name}_test_log.txt
[ -f "$log" ] || { echo "no $log"; exit 1; }
{
  # invocation block (first occurrence): script line + its --flag lines
  awk '/runners\/run_physics\.py$/{p=1; print; next}
       p && /^--/{print; next}
       p{exit}' "$log"
  echo "[...]"
  grep -E "discovery restart arm|discovery restarts:|auto_rescue:|aux_on_recons trigger|first accepted fit|fit_physics: (k|g|A)=" "$log" || true
  # valid curve thinned to every 25 epochs (+ always the last line)
  grep -E " valid - epoch=" "$log" | awk -F'epoch=' \
    '{split($2, a, " "); if (a[1] % 25 == 0) print; last=$0}
     END{if (last != "" && int(a[1]) % 25 != 0) print last}' || true
  grep -E "throughput:" "$log" || true
  grep -E " test - epoch=" "$log" || true
} > "$out"
wc -l "$out"
grep -E " test - epoch=" "$out" | tail -2
