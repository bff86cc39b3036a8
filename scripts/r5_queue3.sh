#!/bin/bash
# Round-5 TPU queue 3 (reordered for today's fragile remote-compile path:
# lost compile responses leave clients futex-hung — every fresh-compile job
# gets a hard timeout; cache-only jobs run first).
#   1. Exp-1 PackNet/PAE re-run (compile-cache hits only)
#   2. transformer serving row (small fresh compiles)
#   3. VGG unfuse A/Bs (big fresh compiles, timeout-bounded)
# Waits for queue 2.
#   setsid nohup bash scripts/r5_queue3.sh > /tmp/r5_queue3.log 2>&1 < /dev/null &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
PY=/opt/venv/bin/python

while ! grep -q "QUEUE2 COMPLETE\|abort" /tmp/r5_queue2.log 2>/dev/null; do
  sleep 30
done
echo "queue2 done, starting queue3 $(date +%H:%M:%S)"

probe() {
  timeout 90 $PY -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

run_to() {  # run_to <timeout_s> <outfile> <cmd...>
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

# 1. Exp-1 rows under the compaction fix — VGG b128 programs are all
#    compile-cache hits from the r3/r4 cycles; ~60-90 min of pure running
if ! probe; then echo "RELAY DEAD before exp1 — abort"; exit 3; fi
echo "=== $(date +%H:%M:%S) start exp1_r5"
$PY scripts/tpu_exp1_r5.py > /tmp/r5_exp1.log 2>&1
echo "=== exp1_r5 rc=$? (RESULTS_r5_exp1.json written incrementally)"

# 2. transformer serving row (bf16 + calibrated int8)
run_to 2700 /root/repo/PERF_vit_serving_r5.json $PY scripts/serve_bench.py \
  --arch vit_cifar --batch 4096

# 3. headline lever A/Bs (fresh big compiles — bounded)
run_to 3000 /tmp/r5_vgg_unfuse.json $PY scripts/perf.py --exp vgg \
  --vmem-kib 65536 --unfuse-gating --batches 8192
run_to 3000 /tmp/r5_vgg_unfuse_bn.json $PY scripts/perf.py --exp vgg \
  --vmem-kib 65536 --unfuse-bn-bwd --batches 8192
run_to 3000 /tmp/r5_vgg_unfuse_both.json $PY scripts/perf.py --exp vgg \
  --vmem-kib 65536 --unfuse-gating --unfuse-bn-bwd --batches 8192

echo "QUEUE3 COMPLETE $(date +%H:%M:%S)"
