#!/bin/bash
# Round-5 TPU queue 6: re-sweep the scoped-VMEM budget under the new
# unfuse_gating fusion structure (the 64M optimum was tuned pre-lever).
# Waits for queue 5.
#   setsid nohup bash scripts/r5_queue6.sh > /tmp/r5_queue6.log 2>&1 < /dev/null &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
PY=/opt/venv/bin/python

while ! grep -q "QUEUE5 COMPLETE\|abort" /tmp/r5_queue5.log 2>/dev/null; do
  sleep 30
done
echo "queue5 done, starting queue6 $(date +%H:%M:%S)"

probe() {
  timeout 90 $PY -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

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

run_to 3000 /tmp/r5_vgg_ug_vmem96.json $PY scripts/perf.py --exp vgg \
  --vmem-kib 98304 --unfuse-gating --batches 8192
run_to 3000 /tmp/r5_vgg_ug_vmem48.json $PY scripts/perf.py --exp vgg \
  --vmem-kib 49152 --unfuse-gating --batches 8192

echo "QUEUE6 COMPLETE $(date +%H:%M:%S)"
