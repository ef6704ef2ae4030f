#!/bin/bash
# Round-17 sf10 probe watcher: the double-probe quiet-window discipline
# (gate_watcher_f3 lineage) applied to the sf10 probe sweep.  Fire only
# when the sf10 lineitem-sum sentinel floor is machine-typical (<=1.2)
# twice, 60s apart; otherwise sleep and retry.
cd /root/repo
LOG=scripts/probe_watcher_r17.log
OUT=${PROBE_OUT:-scripts/sf10_probes_r17.out}
NAMES="tpch_q3_shipping_priority tpch_q21_waiting_supplier events_lttb_downsample simhash_near_dup minhash_near_dup corpus_ngram_topk doc_bm25_topk doc_nb_classify doc_dup_spans doc_dup_span_removal events_kmv_overlap series_seasonal_decompose doc_dsir_weights doc_incremental_dedup doc_paragraph_dedup"
echo "watcher start $(date +%H:%M:%S)" >> "$LOG"
probe_floor() {
  timeout 300 python - <<'PY' 2>/dev/null | tail -1
import time, os, sys
sys.path.insert(0, "/root/repo")
from influxdb_iox_spark.session import get_spark
spark = get_spark(master="local[32]", shuffle_partitions=32,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
import pyspark.sql.functions as F
df = spark.read.parquet("/tmp/spark_graft_sf10/lineitem.parquet")
def once():
    t = time.time()
    df.select(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))).collect()
    return time.time() - t
once(); once()
print(round(min(once() for _ in range(3)), 3))
spark.stop()
PY
}
for i in $(seq 1 12); do
  la=$(cut -d' ' -f1 /proc/loadavg)
  if awk "BEGIN{exit !($la < 1.0)}"; then
    f1=$(probe_floor)
    echo "probe $i $(date +%H:%M:%S) loadavg=$la floor=$f1" >> "$LOG"
    if [ -n "$f1" ] && awk "BEGIN{exit !($f1 <= 1.2)}"; then
      sleep 60
      f2=$(probe_floor)
      la2=$(cut -d' ' -f1 /proc/loadavg)
      echo "confirm $i $(date +%H:%M:%S) loadavg=$la2 floor2=$f2" >> "$LOG"
      if [ -n "$f2" ] && awk "BEGIN{exit !($f2 <= 1.2)}"; then
        echo "double-clean $f1/$f2 — firing probes $(date +%H:%M:%S)" >> "$LOG"
        timeout 3600 python scripts/bench_r16_opt_probes.py /tmp/spark_graft_sf10 $NAMES > "$OUT" 2>&1
        echo "probes done $(date +%H:%M:%S) rc=$? loadavg_now=$(cut -d' ' -f1 /proc/loadavg)" >> "$LOG"
        exit 0
      fi
    fi
  else
    echo "probe $i $(date +%H:%M:%S) loadavg=$la (busy, skip)" >> "$LOG"
  fi
  sleep 420
done
echo "watcher exhausted $(date +%H:%M:%S)" >> "$LOG"
