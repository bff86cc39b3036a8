#!/bin/bash
# One-shot drain of the round-3 TPU work queued behind the relay outage.
# Runs each job sequentially (NEVER share the chip — CLAUDE.md), logging to
# tpu_queue_r3.log; artifacts land where each script writes them
# (PERF_fused_chain_r3.json here, RESULTS_r3_cycle.json from the cycle).
#
# Usage: bash scripts/tpu_queue_r3.sh [--skip-cycle]
set -u
cd "$(dirname "$0")/.."
LOG=tpu_queue_r3.log
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== tpu_queue_r3 $(date -u +%FT%TZ) ===" | tee -a "$LOG"

# 1. probe — a hung relay must fail fast, not wedge the queue
if ! timeout 90 python -c "import jax; assert any(d.platform=='tpu' for d in jax.devices())" 2>>"$LOG"; then
  echo "relay DOWN — aborting queue" | tee -a "$LOG"; exit 1
fi
echo "relay up" | tee -a "$LOG"

# 2. fused-chain A/B (micro + step + grown + resnet), ~15-25 min of compiles
timeout 5400 python scripts/perf_fused_chain.py all 2>>"$LOG" \
  | tee -a "$LOG" | tail -1 > PERF_fused_chain_r3.json
echo "fused-chain A/B done rc=$?" | tee -a "$LOG"

# 3. headline bench (auto-promotes the fused step only if it measured faster)
timeout 3600 python bench.py 2>>"$LOG" | tee -a "$LOG"
echo "bench done rc=$?" | tee -a "$LOG"

# 4. validation cycle (legs A+B -> RESULTS_r3_cycle.json) — the long one
if [ "${1:-}" != "--skip-cycle" ]; then
  timeout 14400 python scripts/tpu_cycle_r3.py 2>>"$LOG" | tee -a "$LOG"
  echo "cycle done rc=$?" | tee -a "$LOG"
fi
echo "=== queue drained $(date -u +%FT%TZ) ===" | tee -a "$LOG"
