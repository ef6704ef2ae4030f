#!/bin/bash
# Session-6 third gate attempt: double-probe protocol — fire only when the
# sentinel floor is clean (<=0.135) TWICE, 60s apart, to dodge the
# storm-wave-after-clean-probe failure mode gate_f2 hit (loadavg 1.13->6.17
# mid-run with clean brackets).
cd /root/repo
LOG=scripts/gate_watcher_f3.log
echo "watcher start $(date +%H:%M:%S)" >> "$LOG"
for i in $(seq 1 7); do
  la=$(cut -d' ' -f1 /proc/loadavg)
  if awk "BEGIN{exit !($la < 0.4)}"; then
    probe=$(timeout 120 python scripts/qtime.py rpc_read_filter --runs=1 2>/dev/null | tail -1)
    floor=$(python -c "import json,sys; d=json.loads('''$probe'''); print(min(d['sent']))" 2>/dev/null)
    echo "probe $i $(date +%H:%M:%S) loadavg=$la floor=$floor" >> "$LOG"
    if [ -n "$floor" ] && awk "BEGIN{exit !($floor <= 0.135)}"; then
      sleep 60
      probe2=$(timeout 120 python scripts/qtime.py rpc_read_filter --runs=1 2>/dev/null | tail -1)
      floor2=$(python -c "import json,sys; d=json.loads('''$probe2'''); print(min(d['sent']))" 2>/dev/null)
      la2=$(cut -d' ' -f1 /proc/loadavg)
      echo "confirm $i $(date +%H:%M:%S) loadavg=$la2 floor2=$floor2" >> "$LOG"
      if [ -n "$floor2" ] && awk "BEGIN{exit !($floor2 <= 0.135)}"; then
        echo "double-clean $floor/$floor2 — firing gate $(date +%H:%M:%S)" >> "$LOG"
        SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
          python bench.py > scripts/bench_r16_opt_final_gate_f3.out 2>&1
        echo "gate done $(date +%H:%M:%S): $(grep -o '"value": [0-9.]*' scripts/bench_r16_opt_final_gate_f3.out | head -1) $(grep -o '"noisy_host": [a-z]*' scripts/bench_r16_opt_final_gate_f3.out) loadavg_now=$(cut -d' ' -f1 /proc/loadavg)" >> "$LOG"
        exit 0
      fi
    fi
  else
    echo "probe $i $(date +%H:%M:%S) loadavg=$la (busy, skip)" >> "$LOG"
  fi
  sleep 420
done
echo "watcher exhausted $(date +%H:%M:%S)" >> "$LOG"
