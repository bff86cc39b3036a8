#!/bin/bash
# Round-5 flash-attention measurement queue (VERDICT r4 next-step #1).
# Serial TPU jobs; each output lands incrementally in /root/repo/ so a
# relay outage or session death loses at most one job. Run detached:
#   setsid nohup bash scripts/r5_flash_queue.sh > /tmp/r5_flash_queue.log 2>&1 < /dev/null &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
PY=/opt/venv/bin/python

probe() {
  timeout 90 $PY -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

run_job() {  # run_job <outfile> <args...>
  local out=$1; shift
  if [ -s "$out" ]; then echo "SKIP $out (exists)"; return 0; fi
  if ! probe; then echo "RELAY DEAD before $out — aborting queue"; exit 3; fi
  echo "=== $(date +%H:%M:%S) start $out: $*"
  $PY scripts/perf.py "$@" > "$out.tmp" 2> "$out.err"
  rc=$?
  if [ $rc -eq 0 ] && [ -s "$out.tmp" ]; then
    mv "$out.tmp" "$out"; echo "=== done $out"
  else
    echo "=== FAILED rc=$rc $out (stderr tail):"; tail -3 "$out.err"
  fi
}

# 1. vit_cifar with flash (T=65 -> pad 128): the small-T question
run_job /tmp/r5_flash_cifar.json --exp vit --arch vit_cifar \
  --flash-attention --vmem-kib 65536 --batches 1024 4096

# 2. vit_b16 flash with 256-tiles (T=197 -> pad 256, one block per seq):
#    grid-overhead hypothesis for the 2x default-block slowdown
run_job /tmp/r5_flash_b16_blk256.json --exp vit --arch vit_b16 \
  --flash-attention --flash-block 256 --vmem-kib 65536 --batches 64 128

# 3. the large-batch unlock question: does flash (no score tensors) let
#    unrolled vit_b16 compile at b512 where non-flash HTTP-500s?
run_job /tmp/r5_flash_b16_b512.json --exp vit --arch vit_b16 \
  --flash-attention --vmem-kib 65536 --batches 512

# 4. control: non-flash b512 (post-layout code has never tried it)
run_job /tmp/r5_noflash_b16_b512.json --exp vit --arch vit_b16 \
  --vmem-kib 65536 --batches 512

echo "QUEUE COMPLETE $(date +%H:%M:%S)"
