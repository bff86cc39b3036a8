#!/bin/bash
# Round-5 TPU queue 7: ResNet-50 large-batch probe — the b128 row is pinned
# to the HBM byte floor; does b256 (+ remat_policy=convs if it OOMs) buy
# amortization? Waits for queue 6.
#   setsid nohup bash scripts/r5_queue7.sh > /tmp/r5_queue7.log 2>&1 < /dev/null &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
PY=/opt/venv/bin/python

while ! grep -q "QUEUE6 COMPLETE\|abort" /tmp/r5_queue6.log 2>/dev/null; do
  sleep 30
done
echo "queue6 done, starting queue7 $(date +%H:%M:%S)"

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

run_to 2700 /tmp/r5_resnet_b256.json $PY scripts/perf.py --exp resnet \
  --vmem-kib 65536 --batches 256
run_to 2700 /tmp/r5_resnet_b256_remat.json $PY scripts/perf.py --exp resnet \
  --vmem-kib 65536 --batches 256 --remat-policy convs

echo "QUEUE7 COMPLETE $(date +%H:%M:%S)"
