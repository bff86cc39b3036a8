#!/bin/bash
# Round-3 relay-outage watchdog. On relay recovery:
#   1. FIRST drain the quick measurements (env_probe ~3min, perf_vit ~25min,
#      bench ~15min, 20-task PAE row ~30min) — banks the round's numbers
#      even if the round ends before the long cycle completes;
#   2. THEN run/resume the leg-B cycle (tpu_cycle_r3.py --skip-a — resumes
#      from fingerprinted checkpoints + cached baselines, also across
#      rounds), babysitting it: if it stalls >15 min with the relay up, kill
#      the RECORDED pid (never by pattern) and relaunch.
# Log: /tmp/r3_watchdog.log. Cycle pid: /tmp/cycle_r3b.pid.
set -u
cd /root/repo
PY=/opt/venv/bin/python
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
LOG=/tmp/r3_watchdog.log
CK=ck_r3_legB_s0
CK2=ck_r3_legB_s1
DRAIN_STAMP=/tmp/r3_drain_done

log() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

relay_up() {
  timeout 60 $PY -c "import jax; assert any(d.platform=='tpu' for d in jax.devices())" 2>/dev/null
}

ck_mtime() {  # newest mtime across both leg dirs (epoch seconds)
  { find "$CK" "$CK2" -printf '%T@\n' 2>/dev/null || true; } \
    | sort -n | tail -1 | cut -d. -f1
}

cycle_alive() {
  # trust the pidfile only if the pid is alive AND is actually our cycle
  # (pids recycle; /tmp is cleaned on reboot)
  [ -f /tmp/cycle_r3b.pid ] || return 1
  local p; p=$(cat /tmp/cycle_r3b.pid)
  kill -0 "$p" 2>/dev/null || return 1
  grep -q tpu_cycle_r3 "/proc/$p/cmdline" 2>/dev/null
}

any_cycle_running() {
  # detect a cycle THIS watchdog didn't start (stale/removed pidfile) —
  # launching a second one would share the chip's HBM (CLAUDE.md OOM trap).
  # Inspection only; never used to kill.
  local d
  for d in /proc/[0-9]*; do
    grep -q tpu_cycle_r3 "$d/cmdline" 2>/dev/null && {
      basename "$d"; return 0; }
  done
  return 1
}

launch_cycle() {
  local other
  if other=$(any_cycle_running); then
    log "adopting already-running cycle pid $other (no second launch)"
    echo "$other" > /tmp/cycle_r3b.pid
    return
  fi
  log "launching cycle --skip-a"
  setsid nohup $PY scripts/tpu_cycle_r3.py --skip-a \
    >> /tmp/cycle_r3b.log 2>> /tmp/cycle_r3b.err < /dev/null &
  echo $! > /tmp/cycle_r3b.pid
}

drain_measurements() {
  # one at a time — never share the chip
  log "drain: env_probe"
  timeout 1800 $PY scripts/env_probe.py > ENV_PROBE_r3.json 2>> "$LOG" \
    && log "env_probe ok" || log "env_probe FAILED"
  log "drain: perf_vit"
  timeout 3600 $PY scripts/perf_vit.py > PERF_vit_r3.json 2>> "$LOG" \
    && log "perf_vit ok" || log "perf_vit FAILED"
  log "drain: bench"
  timeout 3600 $PY bench.py > BENCH_local_r3.json 2>> "$LOG" \
    && log "bench ok" || log "bench FAILED"
  log "drain: 20-task PAE row (paper Exp-1 trio)"
  timeout 7200 $PY -m cpg_tpu pae --experiment cifar100 \
    --synthetic-train-per-class 400 --synthetic-test-per-class 80 \
    --batch-size 256 --lr 0.02 --dtype bfloat16 \
    --finetune-epochs 10 --prune-epochs 4 --retrain-epochs 4 \
    --prune-ratios 0.2 0.4 0.6 0.8 --goals-file baseline_acc_r2.json \
    > PAE_r3.json 2>> "$LOG" \
    && log "pae ok" || log "pae FAILED"
  touch "$DRAIN_STAMP"
}

log "watchdog start (drain-first ordering)"
# Phase 1: wait for the relay, then bank the quick measurements once
while [ ! -f "$DRAIN_STAMP" ]; do
  if relay_up; then
    log "relay UP — draining quick measurements before the cycle"
    drain_measurements
    break
  fi
  log "relay down"
  sleep 120
done

# Phase 2: run/resume the leg-B cycle until RESULTS_r3_cycle.json exists
STALL_SINCE=""
while [ ! -f RESULTS_r3_cycle.json ]; do
  if ! relay_up; then
    log "relay down"
    STALL_SINCE=""
    sleep 120
    continue
  fi
  if ! cycle_alive; then
    log "relay up, cycle dead -> launch/adopt"
    launch_cycle
    STALL_SINCE=""
    sleep 180
    continue
  fi
  M=$(ck_mtime); NOW=$(date +%s)
  if [ -n "$M" ] && [ $((NOW - M)) -gt 900 ]; then
    if [ -z "$STALL_SINCE" ]; then
      STALL_SINCE=$NOW
      log "relay up but cycle stalled (ck age $((NOW - M))s) — confirming"
      sleep 300
      continue
    fi
    PID=$(cat /tmp/cycle_r3b.pid)
    log "cycle pid $PID stalled >15min with relay up -> kill + relaunch"
    kill "$PID" 2>/dev/null; sleep 10; kill -9 "$PID" 2>/dev/null
    launch_cycle
    STALL_SINCE=""
    sleep 180
    continue
  fi
  STALL_SINCE=""
  log "cycle progressing (ck age $((NOW - ${M:-NOW}))s)"
  sleep 180
done
log "watchdog done (cycle complete)"

# Phase 3: the 20-task PAE row (paper Exp-1 trio) — only after the cycle,
# never sharing the chip; skip if already banked.
if [ ! -f PAE_r3.json ]; then
  if relay_up; then
    log "phase 3: PAE row"
    timeout 7200 $PY -m cpg_tpu pae --experiment cifar100 \
      --synthetic-train-per-class 400 --synthetic-test-per-class 80 \
      --batch-size 256 --lr 0.02 --dtype bfloat16 \
      --finetune-epochs 10 --prune-epochs 4 --retrain-epochs 4 \
      --prune-ratios 0.2 0.4 0.6 0.8 --goals-file baseline_acc_r2.json \
      > PAE_r3.json 2>> "$LOG" \
      && log "pae ok" || log "pae FAILED"
  else
    log "phase 3 skipped: relay down"
  fi
fi
# Phase 4: MoE-ViT TPU throughput row (new family, round-3 leg 2)
if [ ! -f PERF_moe_r3.json ]; then
  if relay_up; then
    log "phase 4: perf_moe"
    timeout 3600 $PY scripts/perf_moe.py > PERF_moe_r3.json 2>> "$LOG" \
      && log "perf_moe ok" || log "perf_moe FAILED"
  else
    log "phase 4 skipped: relay down"
  fi
fi
log "watchdog exit"
