#!/bin/bash
# Round-16 session-4 gate watcher: probe the machine floor every ~20 min;
# when the sentinel floor approaches the clean_a vintage (<=0.135), fire
# the full bench gate once and stop.  Max ~4h.  Honest-measurement tool:
# it only picks WHEN to run bench.py, never touches what is measured.
cd /root/repo
LOG=scripts/gate_watcher.log
echo "watcher start $(date +%H:%M:%S)" >> "$LOG"
for i in $(seq 1 9); do
  la=$(cut -d' ' -f1 /proc/loadavg)
  if awk "BEGIN{exit !($la < 0.4)}"; then
    probe=$(timeout 120 python scripts/qtime.py rpc_read_filter --runs=1 2>/dev/null | tail -1)
    floor=$(python -c "import json,sys; d=json.loads('''$probe'''); print(min(d['sent']))" 2>/dev/null)
    echo "probe $i $(date +%H:%M:%S) loadavg=$la floor=$floor" >> "$LOG"
    if [ -n "$floor" ] && awk "BEGIN{exit !($floor <= 0.115)}"; then
      echo "clean floor $floor — firing gate $(date +%H:%M:%S)" >> "$LOG"
      sleep 30   # short settle: storm waves outlast a 2-min settle (gate_c evidence)
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python bench.py > scripts/bench_r16_opt_final_gate_e.out 2>&1
      echo "gate done $(date +%H:%M:%S): $(grep -o '"value": [0-9.]*' scripts/bench_r16_opt_final_gate_e.out | head -1) $(grep -o '"noisy_host": [a-z]*' scripts/bench_r16_opt_final_gate_e.out)" >> "$LOG"
      exit 0
    fi
  else
    echo "probe $i $(date +%H:%M:%S) loadavg=$la (busy, skip)" >> "$LOG"
  fi
  sleep 600
done
echo "watcher exhausted $(date +%H:%M:%S)" >> "$LOG"
