#!/bin/bash
# TPU tunnel window queue: probe-then-fire harness for flaky remote-TPU
# links (CLAUDE.md "tunnel observations"). Evolved across rounds 3-5 as
# /tmp/tpu_queue*.sh; committed in round 5 so the pattern survives VM
# resets.
#
# Loop: probe the tunnel in a subprocess (tools/tunnel_probe.py — tiny
# matmul + forced host readback) every ~50 s; when a probe passes, fire
# the next pending job from the ladder below. While a TPU job runs, every
# long CPU job that registered its pid under /tmp/r5_cpujobs/*.pid is
# SIGSTOPped — on a small host a background training inflates the timed
# dispatch loop.
#
# Jobs are marked done on a SUCCESS regex against their accumulated
# output, with a bounded attempt count, so a window that closes mid-job
# (the common case: windows can die within seconds of a passed probe)
# just queues a retry. Queue-fired bench runs use BENCH_ASSUME_UP=1: the
# queue probed seconds ago, and bench's own probe would spend the scarce
# in-window seconds re-proving the tunnel.
#
# Usage: nohup tools/tpu_window_queue.sh > /tmp/r5q/nohup.out 2>&1 &
#        (pre-create /tmp/r5q; tail /tmp/r5q/queue.log)
cd "$(dirname "$0")/.."
Q=${QUEUE_DIR:-/tmp/r5q}
mkdir -p $Q /tmp/r5_cpujobs
echo $$ > $Q/queue.pid
END=$(( $(date +%s) + ${QUEUE_LIFETIME_S:-25200} ))

log() { echo "[$(date +%H:%M:%S)] $*" >> $Q/queue.log; }

pause_cpu() {
  for f in /tmp/r5_cpujobs/*.pid; do
    [ -f "$f" ] || continue
    kill -STOP $(cat "$f") 2>/dev/null && log "paused cpu job $f"
  done
}
resume_cpu() {
  for f in /tmp/r5_cpujobs/*.pid; do
    [ -f "$f" ] || continue
    kill -CONT $(cat "$f") 2>/dev/null && log "resumed cpu job $f"
  done
}
trap resume_cpu EXIT

declare -A CMD SUCC ATT
JOBS=(bench_default bench_confirm aot entry latency gnmatrix)
CMD[bench_default]='BENCH_ASSUME_UP=1 BENCH_DEADLINE_S=1400 timeout 1500 python bench.py'
SUCC[bench_default]='"value": [0-9]'
CMD[bench_confirm]='BENCH_ASSUME_UP=1 BENCH_DEADLINE_S=300 timeout 360 python bench.py'
SUCC[bench_confirm]='"value": [0-9]'
CMD[aot]='AOT_ASSUME_UP=1 AOT_DEADLINE_S=420 timeout 480 python tools/aot_tpu_check.py'
SUCC[aot]='"check": "aot_vs_live".*"ok": true'
CMD[entry]='timeout 900 python __graft_entry__.py'
SUCC[entry]='entry ok'
CMD[latency]='timeout 900 python tools/latency_probe.py --server-trickle 30 --buckets 1,8 --batch 32 --frames 64'
SUCC[latency]='server_trickle'
CMD[gnmatrix]='MATRIX_DEADLINE_S=1500 timeout 1600 python tools/bench_gn_matrix.py --only default,einsum_decode,exact'
SUCC[gnmatrix]='einsum_decode'

for j in "${JOBS[@]}"; do ATT[$j]=0; done

next_job() {
  for j in "${JOBS[@]}"; do
    [ -f $Q/$j.done ] && continue
    [ "${ATT[$j]}" -ge 6 ] && continue
    echo "$j"; return
  done
  echo ""
}

log "queue armed (pid $$)"
while [ $(date +%s) -lt $END ]; do
  j=$(next_job)
  if [ -z "$j" ]; then log "all jobs done/exhausted — exiting"; break; fi
  if timeout 70 python tools/tunnel_probe.py 50 >> $Q/probe.log 2>&1; then
    log "probe OK -> firing $j (attempt $((ATT[$j]+1)))"
    ATT[$j]=$((ATT[$j]+1))
    pause_cpu
    eval "${CMD[$j]}" >> $Q/$j.out 2>&1
    rc=$?
    resume_cpu
    if grep -qE "${SUCC[$j]}" $Q/$j.out; then
      touch $Q/$j.done
      log "$j SUCCESS (rc=$rc)"
    else
      log "$j failed (rc=$rc, attempt ${ATT[$j]})"
      sleep 20
    fi
  else
    sleep 50
  fi
done
log "queue exiting"
