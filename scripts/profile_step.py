"""Attribute the headline step's residual with numbers (VERDICT r3 weak #2/#3).

BENCH_r03: the masked VGG16-BN b8192 step ran 124.3 ms vs a 98.6 ms
measured-achievable flop floor — RESULTS.md r3 asserted the ~26 ms gap was
"scheduling/occupancy" with no evidence. This script produces the evidence
two ways, reusing bench.py's metering discipline (device-resident inputs,
host-scalar completion barrier against the relay's early-return trap):

1. DIFFERENTIAL DECOMPOSITION — each stage of the production step is jitted
   and timed standalone at the headline config (b8192 bf16, scoped-VMEM
   64 MiB):
     * augment-only            (on-device crop/flip from uint8)
     * mask-select-only        (effective_params: weight-sized elementwise)
     * forward-only            (select + fwd to loss)
     * forward+backward        (select + fwd + grads; no optimizer)
     * optimizer-only          (gate_and_decay + SGD + piggymask Adam + re-zero)
     * full step               (the production program, = bench.py headline)
   residual = full − (augment + fwd+bwd + optimizer): time the monolithic
   program spends that NO stage accounts for. NOTE the stages double-count
   nothing: fwd+bwd includes the mask select (it is inside value_and_grad),
   so select/fwd rows are reported for attribution but not summed.

2. IN-GRAPH K-STEP LOOP — the same step body wrapped in ONE lax.fori_loop
   program (weights as carry, rng folded in-graph, K=8). Per-step time here
   has ZERO host dispatch / relay round-trips between steps: if it drops
   toward the floor, the single-step residual is dispatch/scheduling
   (between-program gaps); if it matches the single-step time, the residual
   lives INSIDE the compiled program (op scheduling, bubbles, fusion misses).

Also attempts jax.profiler.start_trace; on this relay-backed axon backend
device traces are not expected to materialize — the outcome is recorded
either way (trace_files).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py
Writes PROFILE_r4.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _probe_backend
from cpg_tpu.core.gating import gate_and_decay, gate_piggymask_grads
from cpg_tpu.core.ownership import FREE
from cpg_tpu.data.augment import cifar_train_augment
from cpg_tpu.models import framework as fw
from cpg_tpu.models import get_model
from cpg_tpu.ops.masked import effective_params
from cpg_tpu.train.losses import call_loss, cross_entropy
from cpg_tpu.train.step import TrainConfig, build_train_step, make_train_step
from cpg_tpu.utils.roofline import cost_of, load_measured, roofline

import argparse

_ap = argparse.ArgumentParser(
    description="stage-decompose + trace-profile a production train step "
                "(arch-generic; defaults reproduce the r4 VGG headline run)")
_ap.add_argument("--arch", default="vgg16_bn_cifar")
_ap.add_argument("--batch", type=int,
                 default=int(os.environ.get("PROFILE_BATCH", 8192)))
_ap.add_argument("--warmup", type=int,
                 default=int(os.environ.get("PROFILE_WARMUP", 4)))
_ap.add_argument("--iters", type=int,
                 default=int(os.environ.get("PROFILE_ITERS", 8)))
_ap.add_argument("--k", type=int,
                 default=int(os.environ.get("PROFILE_K", 8)),
                 help="in-graph loop trip count")
_ap.add_argument("--out", default=os.environ.get("PROFILE_OUT",
                                                 "PROFILE_r4.json"))
_ap.add_argument("--scan-blocks", action="store_true",
                 help="transformer block stack as one lax.scan body")
_ARGS = _ap.parse_args()

BATCH = _ARGS.batch
WARMUP = _ARGS.warmup
ITERS = _ARGS.iters
K = _ARGS.k
OUT = _ARGS.out
VMEM64M = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def summarize_trace(tdir, top=30, steps=2):
    """Leaf-op time breakdown from the jax.profiler Chrome-trace dump
    (plugins/profile/<ts>/*.trace.json.gz), DEVICE 'XLA Ops' lane only
    (host python spans and the relay readback would otherwise dominate the
    table). Aggregates by op-name class (fusion kind, digits stripped) and
    by duration bucket — the evidence layer behind the attribution claims;
    `steps` = steps captured inside the trace (per-step = total/steps)."""
    import collections
    import glob
    import gzip
    import re

    traces = sorted(glob.glob(os.path.join(
        tdir, "**", "*.trace.json.gz"), recursive=True))
    if not traces:
        return None
    ev = json.load(gzip.open(traces[-1]))["traceEvents"]
    dev_pid = {e["pid"] for e in ev
               if e.get("ph") == "M" and e.get("name") == "process_name"
               and "TPU" in e["args"].get("name", "")}
    op_tid = {(e["pid"], e["tid"]) for e in ev
              if e.get("ph") == "M" and e.get("name") == "thread_name"
              and e["args"].get("name") == "XLA Ops" and e["pid"] in dev_pid}
    leaf = [e for e in ev if e.get("ph") == "X"
            and (e.get("pid"), e.get("tid")) in op_tid]
    if not leaf:
        return {"trace_file": os.path.relpath(traces[-1], tdir),
                "error": "no device XLA-Ops lane found"}

    def cls(n):
        return re.sub(r"\d+$", "", n.split(".")[0])

    agg = collections.Counter()
    cnt = collections.Counter()
    for e in leaf:
        agg[cls(e["name"])] += e["dur"] / 1e3 / steps
        cnt[cls(e["name"])] += 1
    buckets = {}
    for lo, hi in ((0, 50), (50, 100), (100, 200), (200, 500),
                   (500, 1000), (1000, 10**9)):
        sel = [e["dur"] for e in leaf if lo <= e["dur"] < hi]
        buckets[f"{lo}-{hi if hi < 10**9 else 'inf'}us"] = {
            "n": len(sel), "ms_per_step": round(sum(sel) / 1e3 / steps, 2)}
    total = sum(agg.values())
    return {"trace_file": os.path.relpath(traces[-1], tdir),
            "leaf_ops_per_step": len(leaf) // steps,
            "device_ms_per_step": round(total, 2),
            "by_class_ms_per_step": {
                k: {"ms": round(v, 2), "n_per_step": cnt[k] // steps}
                for k, v in agg.most_common(top)},
            "duration_buckets": buckets}


def _bank(result):
    json.dump(result, open(OUT + ".tmp", "w"), indent=1)
    os.replace(OUT + ".tmp", OUT)


def _timed(fn, args, warmup=WARMUP, iters=ITERS, barrier=None):
    """ms per call; completion barrier = host readback of a scalar that
    data-depends on the output (block_until_ready lies on this relay)."""
    barrier = barrier or (lambda out: float(
        jax.tree.leaves(out)[0].ravel()[0]))
    for _ in range(warmup):
        barrier(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        barrier(fn(*args))
    return 1e3 * (time.perf_counter() - t0) / iters


def main():
    if not _probe_backend():
        sys.exit(2)
    import __graft_entry__ as ge

    arch = _ARGS.arch
    # scoped-VMEM is a TPU-only compile option (CPU smoke runs reject it)
    co = VMEM64M if jax.default_backend() != "cpu" else None
    cfg = TrainConfig(compute_dtype=jnp.bfloat16, compiler_options=co,
                      scan_blocks=_ARGS.scan_blocks)
    model_fn, in_shape = get_model(arch)
    state = ge._build_state(arch=arch, mult=1.0, num_classes=5, seed=0)
    task = state.tasks[2]
    shared, pm = state.shared, task.piggymask
    priv, bn, own = task.private, task.bn_state, state.ownership

    rng = jax.random.PRNGKey(0)
    x = jax.device_put(jax.random.randint(
        rng, (BATCH, *in_shape), 0, 256, jnp.int32).astype(jnp.uint8))
    y = jax.device_put(jax.random.randint(rng, (BATCH,), 0, 5, jnp.int32))

    result = {"config": {"arch": arch, "batch": BATCH, "dtype": "bfloat16",
                         "compiler_options": co, "iters": ITERS,
                         "scan_blocks": _ARGS.scan_blocks},
              "device": str(jax.devices()[0]), "stages_ms": {}}
    S = result["stages_ms"]

    # --- stage: augment only -------------------------------------------------
    aug = jax.jit(cifar_train_augment, compiler_options=co)
    S["augment"] = round(_timed(aug, (x, rng)), 2)
    _bank(result)
    xa = aug(x, rng)  # pre-augmented input for the isolated stages below
    xa.block_until_ready()

    # --- stage: mask select only (effective_params) --------------------------
    sel = jax.jit(
        lambda s, o, p: effective_params(s, o, p, 2, cfg.threshold,
                                         compute_dtype=cfg.compute_dtype),
        compiler_options=co)
    S["mask_select"] = round(_timed(sel, (shared, own, pm)), 2)
    _bank(result)

    # --- stage: forward only (select + fwd to loss) ---------------------------
    def fwd_loss(s, p, pr, b, xx, yy):
        eff = effective_params(s, own, p, 2, cfg.threshold,
                               compute_dtype=cfg.compute_dtype)
        logits, _ = fw.apply(model_fn, eff, pr, b, xx, train=True,
                             compute_dtype=cfg.compute_dtype,
                             scan_blocks=cfg.scan_blocks,
                             num_classes=5, mult=1.0)
        return call_loss(cross_entropy, logits, yy, 0)

    fwd = jax.jit(fwd_loss, compiler_options=co)
    S["forward"] = round(_timed(
        fwd, (shared, pm, priv, bn, xa, y), barrier=float), 2)
    _bank(result)

    # --- stage: forward + backward (no optimizer) -----------------------------
    fb = jax.jit(jax.value_and_grad(fwd_loss, argnums=(0, 1, 2)),
                 compiler_options=co)

    def _fb_barrier(out):
        return float(out[0])

    S["forward_backward"] = round(_timed(
        fb, (shared, pm, priv, bn, xa, y), barrier=_fb_barrier), 2)
    _bank(result)

    # --- stage: optimizer only (gate+decay, SGD, pm Adam, re-zero) ------------
    step_un, (opt_w, opt_pm) = build_train_step(
        model_fn, num_classes=5, mult=1.0, has_piggymask=True, cfg=cfg,
        augment_fn=cifar_train_augment)
    ows = opt_w.init({"shared": shared, "private": priv})
    opms = opt_pm.init(pm)
    _, grads = fb(shared, pm, priv, bn, xa, y)

    def opt_only(s, p, pr, ow, opm, g):
        import optax
        gs = gate_and_decay(g[0], s, own, 2, cfg.weight_decay)
        up, ow = opt_w.update({"shared": gs, "private": g[2]}, ow,
                              {"shared": s, "private": pr})
        s = optax.apply_updates(s, up["shared"])
        pr = optax.apply_updates(pr, up["private"])
        gpm = gate_piggymask_grads(g[1], own, 2)
        pmu, opm = opt_pm.update(gpm, opm, p)
        p = optax.apply_updates(p, pmu)
        s = jax.tree.map(
            lambda w, m: jnp.where(m == FREE, jnp.zeros((), w.dtype), w),
            s, own)
        return s, p, pr, ow, opm

    opt_j = jax.jit(opt_only, compiler_options=co)
    S["optimizer"] = round(_timed(
        opt_j, (shared, pm, priv, ows, opms, grads)), 2)
    _bank(result)

    # --- full production step (bench.py headline program) ---------------------
    step, _ = make_train_step(model_fn, num_classes=5, mult=1.0,
                              has_piggymask=True, cfg=cfg,
                              augment_fn=cifar_train_augment)

    def run_full(n, sh, p, pr, b, ow, opm, r):
        m = None
        for i in range(n):
            r, sub = jax.random.split(r)
            (sh, p, pr, b, ow, opm, m) = step(sh, p, pr, b, ow, opm, own, 2,
                                              x, y, sub, i)
        return float(m["loss"]), (sh, p, pr, b, ow, opm)

    cshared = jax.tree.map(lambda a: a.copy(), shared)
    cpm = jax.tree.map(lambda a: a.copy(), pm)
    cpriv = jax.tree.map(lambda a: a.copy(), priv)
    cbn = jax.tree.map(lambda a: a.copy(), bn)
    cows = opt_w.init({"shared": cshared, "private": cpriv})
    copms = opt_pm.init(cpm)
    _, st = run_full(WARMUP, cshared, cpm, cpriv, cbn, cows, copms, rng)
    t0 = time.perf_counter()
    _, st = run_full(ITERS, *st, rng)
    S["full_step"] = round(1e3 * (time.perf_counter() - t0) / ITERS, 2)
    full_cost = cost_of(step.lower(shared, pm, priv, bn, ows, opms, own, 2,
                                   x, y, rng, 0).compile())
    result["roofline_full_step"] = roofline(S["full_step"], full_cost,
                                            measured=load_measured())
    _bank(result)

    # --- in-graph K-step loop: zero dispatch between steps --------------------
    def k_steps(sh, p, pr, b, ow, opm, r):
        def tick(i, carry):
            sh, p, pr, b, ow, opm, r = carry
            sub = jax.random.fold_in(r, i)
            sh, p, pr, b, ow, opm, m = step_un(sh, p, pr, b, ow, opm, own, 2,
                                               x, y, sub, i)
            return (sh, p, pr, b, ow, opm, r)
        out = jax.lax.fori_loop(0, K, tick, (sh, p, pr, b, ow, opm, r))
        return out

    kj = jax.jit(k_steps, donate_argnums=(0, 1, 2, 3, 4, 5),
                 compiler_options=co)

    def _kbar(out):
        return float(jax.tree.leaves(out[0])[0].ravel()[0])

    kshared = jax.tree.map(lambda a: a.copy(), shared)
    kpm = jax.tree.map(lambda a: a.copy(), pm)
    kpriv = jax.tree.map(lambda a: a.copy(), priv)
    kbn = jax.tree.map(lambda a: a.copy(), bn)
    kows = opt_w.init({"shared": kshared, "private": kpriv})
    kopms = opt_pm.init(kpm)
    st = (kshared, kpm, kpriv, kbn, kows, kopms, rng)
    st = kj(*st)  # warmup/compile
    _kbar(st)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        st = kj(*st)
        _kbar(st)
    S["in_graph_per_step"] = round(
        1e3 * (time.perf_counter() - t0) / (reps * K), 2)
    result["k"] = K
    _bank(result)

    # --- attribution ----------------------------------------------------------
    acc = S["augment"] + S["forward_backward"] + S["optimizer"]
    result["attribution"] = {
        "sum_of_stages_ms": round(acc, 2),
        "residual_ms": round(S["full_step"] - acc, 2),
        "dispatch_and_gap_ms": round(
            S["full_step"] - S["in_graph_per_step"], 2),
        "note": ("residual = full − (augment + fwd+bwd + optimizer): time "
                 "the monolith spends that no isolated stage accounts for "
                 "(negative = the monolith fuses/overlaps stages better than "
                 "they run standalone). dispatch_and_gap = single-dispatch "
                 "step − in-graph per-step: host dispatch + relay round-trip "
                 "+ inter-program gap."),
    }

    # --- jax.profiler attempt --------------------------------------------------
    tdir = "/tmp/jax_trace_r4"
    try:
        jax.profiler.start_trace(tdir)
        _, st2 = run_full(2, *st[:6], rng)
        jax.profiler.stop_trace()
        files = []
        for root, _, fns in os.walk(tdir):
            files += [os.path.join(root, f) for f in fns]
        result["trace_files"] = {
            os.path.relpath(f, tdir): os.path.getsize(f) for f in files}
        result["trace_summary"] = summarize_trace(tdir)
    except Exception as e:
        result["trace_files"] = f"failed: {type(e).__name__}: {str(e)[:200]}"
    _bank(result)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
