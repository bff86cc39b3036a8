#!/bin/bash
# Round-4 TPU queue watchdog. Runs scripts/tpu_exp1_r4.py (Exp-1 trio at the
# calibrated regime) to completion, relaunching across relay outages and
# session deaths; resumes from fingerprinted checkpoints + the incremental
# RESULTS_r4_exp1.json. Done when the file contains the "ordering" key.
# Log: /tmp/r4_watchdog.log. Job pid: /tmp/exp1_r4.pid.
set -u
cd /root/repo
PY=/opt/venv/bin/python
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
LOG=/tmp/r4_watchdog.log

log() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

relay_up() {
  timeout 60 $PY -c "import jax; assert any(d.platform=='tpu' for d in jax.devices())" 2>/dev/null
}

done_yet() {
  $PY - <<'EOF' 2>/dev/null
import json, sys
sys.exit(0 if "ordering" in json.load(open("RESULTS_r4_exp1.json")) else 1)
EOF
}

job_alive() {
  [ -f /tmp/exp1_r4.pid ] || return 1
  local p; p=$(cat /tmp/exp1_r4.pid)
  kill -0 "$p" 2>/dev/null || return 1
  grep -q tpu_exp1_r4 "/proc/$p/cmdline" 2>/dev/null
}

any_job_running() {
  local d
  for d in /proc/[0-9]*; do
    grep -q tpu_exp1_r4 "$d/cmdline" 2>/dev/null && {
      basename "$d"; return 0; }
  done
  return 1
}

launch_job() {
  local other
  if other=$(any_job_running); then
    log "adopting already-running job pid $other"
    echo "$other" > /tmp/exp1_r4.pid
    return
  fi
  log "launching tpu_exp1_r4"
  setsid nohup $PY scripts/tpu_exp1_r4.py \
    >> /tmp/exp1_r4.log 2>> /tmp/exp1_r4.err < /dev/null &
  echo $! > /tmp/exp1_r4.pid
}

progress_mtime() {
  { find RESULTS_r4_exp1.json ck_r4_packnet ck_r4_pae -printf '%T@\n' \
      2>/dev/null || true; } | sort -n | tail -1 | cut -d. -f1
}

log "r4 watchdog start"
STALL_SINCE=""
while ! done_yet; do
  if ! relay_up; then
    log "relay down"
    STALL_SINCE=""
    sleep 120
    continue
  fi
  if ! job_alive; then
    log "relay up, job dead -> launch/adopt"
    launch_job
    STALL_SINCE=""
    sleep 180
    continue
  fi
  M=$(progress_mtime); NOW=$(date +%s)
  if [ -n "$M" ] && [ $((NOW - M)) -gt 1200 ]; then
    if [ -z "$STALL_SINCE" ]; then
      STALL_SINCE=$NOW
      log "job stalled (progress age $((NOW - M))s) — confirming"
      sleep 300
      continue
    fi
    PID=$(cat /tmp/exp1_r4.pid)
    log "job pid $PID stalled >20min with relay up -> kill + relaunch"
    kill "$PID" 2>/dev/null; sleep 10; kill -9 "$PID" 2>/dev/null
    launch_job
    STALL_SINCE=""
    sleep 180
    continue
  fi
  STALL_SINCE=""
  sleep 180
done
log "r4 watchdog done (ordering banked)"
