#!/bin/bash
# Round-5 TPU queue 5: text-family perf row -> final insurance bench
# (bench.py picks up any lever folded in after the queue-3 A/Bs).
# Waits for queue 4.
#   setsid nohup bash scripts/r5_queue5.sh > /tmp/r5_queue5.log 2>&1 < /dev/null &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
PY=/opt/venv/bin/python

while ! grep -q "QUEUE4 COMPLETE\|abort" /tmp/r5_queue4.log 2>/dev/null; do
  sleep 30
done
echo "queue4 done, starting queue5 $(date +%H:%M:%S)"

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

run_to 2700 /root/repo/PERF_text_r5.json $PY scripts/perf.py \
  --exp text --vmem-kib 65536
run_to 3600 /root/repo/BENCH_r5_insurance.json $PY bench.py

echo "QUEUE5 COMPLETE $(date +%H:%M:%S)"
