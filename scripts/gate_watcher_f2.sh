#!/bin/bash
# Round-16 session-6 gate watcher: same protocol as gate_watcher.sh but for
# the post-union-elimination tree; fires bench.py once when the sentinel
# floor reaches the clean vintage (<=0.135), writes gate_f2.
cd /root/repo
LOG=scripts/gate_watcher_f2.log
echo "watcher start $(date +%H:%M:%S)" >> "$LOG"
for i in $(seq 1 8); do
  la=$(cut -d' ' -f1 /proc/loadavg)
  if awk "BEGIN{exit !($la < 0.4)}"; then
    probe=$(timeout 120 python scripts/qtime.py rpc_read_filter --runs=1 2>/dev/null | tail -1)
    floor=$(python -c "import json,sys; d=json.loads('''$probe'''); print(min(d['sent']))" 2>/dev/null)
    echo "probe $i $(date +%H:%M:%S) loadavg=$la floor=$floor" >> "$LOG"
    if [ -n "$floor" ] && awk "BEGIN{exit !($floor <= 0.135)}"; then
      echo "clean floor $floor — firing gate $(date +%H:%M:%S)" >> "$LOG"
      sleep 30
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python bench.py > scripts/bench_r16_opt_final_gate_f2.out 2>&1
      echo "gate done $(date +%H:%M:%S): $(grep -o '"value": [0-9.]*' scripts/bench_r16_opt_final_gate_f2.out | head -1) $(grep -o '"noisy_host": [a-z]*' scripts/bench_r16_opt_final_gate_f2.out)" >> "$LOG"
      exit 0
    fi
  else
    echo "probe $i $(date +%H:%M:%S) loadavg=$la (busy, skip)" >> "$LOG"
  fi
  sleep 540
done
echo "watcher exhausted $(date +%H:%M:%S)" >> "$LOG"
