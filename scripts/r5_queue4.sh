#!/bin/bash
# Round-5 TPU queue 4: hang-proofed env probe (subprocess-per-variant) ->
# roofline re-emission for rows that banked against the stale ceiling.
# Waits for queue 3.
#   setsid nohup bash scripts/r5_queue4.sh > /tmp/r5_queue4.log 2>&1 < /dev/null &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
PY=/opt/venv/bin/python

while ! grep -q "QUEUE3 COMPLETE\|abort" /tmp/r5_queue3.log 2>/dev/null; do
  sleep 30
done
echo "queue3 done, starting queue4 $(date +%H:%M:%S)"

probe() {
  timeout 90 $PY -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

if ! probe; then echo "RELAY DEAD — abort"; exit 3; fi
echo "=== $(date +%H:%M:%S) env_probe (subprocess-per-variant)"
$PY scripts/env_probe.py > /root/repo/ENV_PROBE_r5.json.tmp \
  2> /root/repo/ENV_PROBE_r5.json.err
if [ $? -eq 0 ] && [ -s /root/repo/ENV_PROBE_r5.json.tmp ]; then
  mv /root/repo/ENV_PROBE_r5.json.tmp /root/repo/ENV_PROBE_r5.json
  echo "=== ENV_PROBE_r5 banked"
else
  echo "=== env_probe FAILED:"; tail -3 /root/repo/ENV_PROBE_r5.json.err
fi

run_to() {
  local tmo=$1 out=$2; shift 2
  if [ -s "$out" ]; then echo "SKIP $out"; return 0; fi
  if ! probe; then echo "RELAY DEAD before $out — abort"; exit 3; fi
  echo "=== $(date +%H:%M:%S) start $out: $*"
  timeout "$tmo" "$@" > "$out.tmp" 2> "$out.err"
  rc=$?
  if [ $rc -eq 0 ] && [ -s "$out.tmp" ]; then
    mv "$out.tmp" "$out"; echo "=== done $out"
  else
    echo "=== FAILED rc=$rc $out:"; tail -3 "$out.err"
  fi
}

# ResNet-50 + MoE retries (their compiles landed in the cache during the
# hung morning attempts — these may now be cache hits)
run_to 3600 /root/repo/PERF_resnet_r5.json $PY scripts/perf.py \
  --exp resnet --vmem-kib 65536
run_to 3600 /root/repo/PERF_moe_r5.json $PY scripts/perf.py \
  --exp moe --vmem-kib 65536

echo "QUEUE4 COMPLETE $(date +%H:%M:%S)"
