#!/bin/bash
# Round-5 TPU queue 2: corrected env probe -> ResNet-50 row -> MoE refresh.
# Waits for r5_flash_queue.sh to finish (one TPU user at a time).
#   setsid nohup bash scripts/r5_queue2.sh > /tmp/r5_queue2.log 2>&1 < /dev/null &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
PY=/opt/venv/bin/python

while [ -f /tmp/r5_flash_queue.pid ] && ! grep -q "QUEUE COMPLETE\|aborting queue" /tmp/r5_flash_queue.log 2>/dev/null; do
  sleep 30
done
echo "queue1 done, starting queue2 $(date +%H:%M:%S)"

probe() {
  timeout 90 $PY -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

run_to() {  # run_to <outfile> <cmd...>
  local out=$1; shift
  if [ -s "$out" ]; then echo "SKIP $out"; return 0; fi
  if ! probe; then echo "RELAY DEAD before $out — abort"; exit 3; fi
  echo "=== $(date +%H:%M:%S) start $out: $*"
  "$@" > "$out.tmp" 2> "$out.err"
  if [ $? -eq 0 ] && [ -s "$out.tmp" ]; then
    mv "$out.tmp" "$out"; echo "=== done $out"
  else
    echo "=== FAILED $out:"; tail -3 "$out.err"
  fi
}

# 1. corrected MXU ceiling (conv-chain variants) — MUST land before the
#    perf rows so they divide by the new measured ceiling
run_to /root/repo/ENV_PROBE_r5.json $PY scripts/env_probe.py

# 2. the reference's Exp-2 model: first roofline-accountable ResNet row
run_to /root/repo/PERF_resnet_r5.json $PY scripts/perf.py --exp resnet \
  --vmem-kib 65536

# 3. MoE refresh on the post-qkv/layout code
run_to /root/repo/PERF_moe_r5.json $PY scripts/perf.py --exp moe \
  --vmem-kib 65536

echo "QUEUE2 COMPLETE $(date +%H:%M:%S)"
