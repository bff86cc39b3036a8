"""The jitted CPG train/eval step: everything fused into one XLA program.

Replaces the reference's per-batch eager pipeline (ref:CPG_*_main*.py
Manager.train: forward -> backward -> `pruner.do_weight_decay_and_make_grads_
zero()` (a Python sweep over every parameter, every step) -> two optimizer
steps). Here one donated jit fuses: on-device augmentation -> piggymask
binarize -> masked forward -> loss -> grads -> ownership gating + selective
weight decay -> SGD(weights)+Adam(piggymasks) updates -> released-weights
re-zeroing (ref `make_pruned_zero`).

Shapes/ownership/task id are traced values, so one compiled program serves
every task at a given (arch, width multiplier, num_classes) and every prune
ratio — no recompile inside the compact loop.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.gating import gate_and_decay, gate_piggymask_grads
from ..core.ownership import FREE
from ..models import framework as fw
from ..ops.binarize import DEFAULT_THRESHOLD
from ..ops.masked import effective_params
from .losses import accuracy, call_loss, class_logits, cross_entropy


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 0.01                # SGD lr for weights (ref --lr)
    lr_mask: float = 1e-4           # Adam lr for piggymasks (ref --lr_mask)
    momentum: float = 0.9
    optimizer: str = "sgd"          # weight optimizer: 'sgd' (ref-faithful,
                                    # momentum) | 'adam' (transformer recipe;
                                    # models/vit.py). Weight decay in BOTH
                                    # cases is the selective per-task L2 that
                                    # core/gating.py adds to the gradient
                                    # BEFORE the optimizer (decaying frozen
                                    # prior-task weights would be a
                                    # forgetting bug) — i.e. Adam+L2, NOT
                                    # decoupled AdamW; set weight_decay=0 if
                                    # pure Adam is wanted.
    weight_decay: float = 4e-5      # applied ONLY to current-task weights
    threshold: float = DEFAULT_THRESHOLD
    compute_dtype: Any = jnp.bfloat16  # MXU-friendly; masking happens in f32
    label_smoothing: float = 0.0
    train_piggymask: bool = True  # False = PackNet mode: prior weights reused
                                  # unmasked and frozen (ref:packnet_*_main.py)
    remat: bool = False  # jax.checkpoint the forward: trade FLOPs for HBM
                         # (large models / batches; ResNet-50 @ 224px)
    remat_policy: Optional[str] = None  # 'convs' = selective remat: save ONLY
                         # sconv/sdense outputs as backward residuals and
                         # recompute the BN/ReLU/pool epilogues from them
                         # (VPU-cheap, zero conv recompute) — targets the
                         # HBM-bound step's second activation-sized residual
                         # per layer. Mutually exclusive with `remat` (which
                         # recomputes EVERYTHING incl. convs: measured +25%
                         # slower on the VGG step; this policy exists because
                         # of that result).
    grad_clip_norm: Optional[float] = None  # global-norm clip (SGD side);
                         # unnormalized trunks (SphereNet) diverge at high lr
    use_pallas: bool = False  # fused Pallas masked matmul in sdense layers:
                         # ownership/binarize/select happen in the MXU tile
                         # loads, the effective weight never hits HBM
    use_pallas_conv: bool = False  # fused masked conv (implicit GEMM over
                         # patches). NOTE: im2col inflates activation traffic
                         # ~k^2 x; XLA's native conv usually wins — measure
                         # (bench.py ablation) before enabling
    use_fused_chain: bool = False  # route BN+ReLU+conv3x3 chains through the
                         # VMEM-resident Pallas kernel (ops/pallas/
                         # fused_chain.py): the normalized activation between
                         # adjacent convs never touches HBM. VGG-only call
                         # sites; orthogonal to use_pallas/use_pallas_conv
                         # (which fuse the MASK into the op — don't combine).
    flash_attention: bool = False  # transformer attention via the Pallas
                         # flash kernel (ops/flash.py): the (T, S) score
                         # tensor never exists in HBM, fwd or bwd — targets
                         # the ViT step's score/softmax traffic. Same math,
                         # not bit-identical (tile reassociation); keep it
                         # constant across a task sequence.
    qkv_fused: Optional[bool] = None  # fused (D, 3*inner) QKV GEMM in ViT
                         # attention. None = measured default: OFF (the r4
                         # D<512 crossover vanished post-layout-pass — the
                         # fused path's slice traffic loses ~5% at D=256;
                         # PERF_vit_r5.json, PROFILE_r5_vit.json). True
                         # forces it on for probes/future shapes.
    scan_blocks: bool = False  # run homogeneous transformer `blocks/{i}/`
                         # stacks as ONE lax.scan over in-graph stacked
                         # params (models/vit.scan_vit_blocks): the HLO
                         # shrinks ~depth x — fixes the relay's remote-
                         # compile failures on deep/large-batch ViT programs
                         # and cuts compile time. Composes with `remat`
                         # (which then checkpoints each scanned block — the
                         # transformer remat standard — instead of the whole
                         # forward). Default effective-params path only
                         # (exclusive with use_pallas*/fused-chain masking).
    act_sharder: Optional[Any] = None  # (array, tag) -> array activation-
                         # sharding hook (parallel/mesh.act_sharder): models
                         # constrain labeled seams — "tokens" (sequence
                         # parallelism) and "experts" (expert parallelism) —
                         # under the step's mesh. None = mesh-agnostic.
    pipeliner: Optional[Any] = None  # pipeline-parallel hook
                         # (parallel/pipeline.make_pipeliner): models run
                         # their homogeneous blocks/{i}/ stack as an S-stage
                         # GPipe over a `pipe` mesh axis — TRAINABLE (the
                         # tick loop reverse-differentiates; its scan
                         # transpose is GPipe's microbatch gradient
                         # accumulation), so this same step trains through
                         # the pipeline unchanged. None = blocks run inline.
    compiler_options: Optional[Dict[str, str]] = None  # per-executable XLA
                         # options for the jitted steps, e.g.
                         # {"xla_tpu_scoped_vmem_limit_kib": "65536"} — a
                         # larger scoped-VMEM budget deepens fusion on the
                         # HBM-bound VGG step (measured r3: +4% at b8192).
                         # None = compiler defaults.
    unfuse_bn_bwd: bool = False  # backward-only barrier on every sconv
                         # input (models/framework.Ctx.unfuse_bn_bwd): keeps
                         # the BN-backward reduction epilogues OUT of the
                         # conv dgrad fusions (PROFILE_r4_trace fusion.20
                         # class: 89 vs 193 TFLOPS). Identity math; measured
                         # lever.
    unfuse_gating: bool = False  # optimization_barrier between the grads and
                         # the ownership-gating selects: PROFILE_r4_trace
                         # shows the gate_and_decay select/add fused into
                         # conv wgrads as epilogues (add_select_fusion.11,
                         # 96 TFLOPS vs the 193 of clean conv fusions). The
                         # barrier forces wgrads to complete unfused; gating
                         # then runs as separate elementwise kernels over
                         # weight-sized (small) tensors. Measured lever —
                         # keep whichever way the chip says.


def remat_policy(name: str):
    """Resolve TrainConfig.remat_policy to a jax.checkpoint policy."""
    if name == "convs":
        return jax.checkpoint_policies.save_only_these_names(
            "sconv_out", "sdense_out")
    raise ValueError(f"unknown remat_policy {name!r} (expected 'convs')")


def make_optimizers(cfg: TrainConfig):
    """SGD+momentum for weights/private (lr injectable at runtime), Adam for
    piggymasks (ref:utils/__init__.py `Optimizers` container)."""
    def sgd(learning_rate, momentum):
        tx = optax.sgd(learning_rate, momentum=momentum)
        if cfg.grad_clip_norm:
            tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
        return tx

    def adam(learning_rate):
        # weight decay arrives in the GRADIENT (core/gating.py selective
        # per-task L2) — so this is Adam+L2, not decoupled AdamW; see the
        # TrainConfig.optimizer comment
        tx = optax.adam(learning_rate)
        if cfg.grad_clip_norm:
            tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
        return tx

    if cfg.optimizer == "adam":
        opt_w = optax.inject_hyperparams(adam)(learning_rate=cfg.lr)
    elif cfg.optimizer == "sgd":
        opt_w = optax.inject_hyperparams(sgd)(
            learning_rate=cfg.lr, momentum=cfg.momentum
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r} "
                         "(expected 'sgd' | 'adam')")
    opt_pm = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr_mask)
    return opt_w, opt_pm


def set_lr(opt_state, lr):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def build_train_step(
    model_fn: Callable,
    *,
    num_classes: int,
    mult: float,
    has_piggymask: bool,
    cfg: TrainConfig,
    augment_fn: Optional[Callable] = None,
    loss_fn: Callable = cross_entropy,
    model_kwargs: Optional[Dict] = None,
    mask_mode: str = "binary",
):
    """Build the UNJITTED step (for custom jit/pjit wrapping — see
    parallel/mesh.py) plus its optimizers.

    step(shared, piggymask, private, bn_state, opt_w_state, opt_pm_state,
         ownership, task_id, x, y, rng) -> (new states..., metrics)
    """
    opt_w, opt_pm = make_optimizers(cfg)
    model_kwargs = model_kwargs or {}
    if cfg.label_smoothing and loss_fn is cross_entropy:
        from .losses import make_cross_entropy

        loss_fn = make_cross_entropy(cfg.label_smoothing)

    use_fused = cfg.use_pallas or cfg.use_pallas_conv
    if use_fused and mask_mode == "packnet":
        raise ValueError(
            "PackNet mode (mask_mode='packnet') has no piggymasks to fuse — "
            "use the default XLA path (use_pallas/use_pallas_conv=False)")

    def forward(params, private, bn_state, x, masking=None):
        return fw.apply(
            model_fn, params, private, bn_state, x, train=True,
            compute_dtype=cfg.compute_dtype, masking=masking,
            fused_chain=cfg.use_fused_chain, act_sharder=cfg.act_sharder,
            pipeline=cfg.pipeliner, scan_blocks=cfg.scan_blocks,
            scan_remat=cfg.remat and cfg.scan_blocks,
            flash_attention=cfg.flash_attention, qkv_fused=cfg.qkv_fused,
            unfuse_bn_bwd=cfg.unfuse_bn_bwd,
            num_classes=num_classes, mult=mult, **model_kwargs,
        )

    if cfg.remat and cfg.remat_policy:
        raise ValueError("remat and remat_policy are mutually exclusive")
    if cfg.remat and not cfg.scan_blocks:
        # rematerialize activations in the backward pass instead of storing
        # them: HBM is the usual TPU bottleneck for 224px models. Under
        # scan_blocks the checkpoint moves INSIDE the scan body instead
        # (per-block remat — see fw.Ctx.scan_remat).
        forward = jax.checkpoint(forward)
    elif cfg.remat_policy:
        forward = jax.checkpoint(forward, policy=remat_policy(cfg.remat_policy))

    def step(shared, piggymask, private, bn_state, opt_w_state, opt_pm_state,
             ownership, task_id, x, y, rng, it=0):
        if augment_fn is not None:
            x = augment_fn(x, rng)

        def compute_loss(shared, piggymask, private):
            if use_fused:
                # raw-weight mode: per-layer selection inside the model —
                # sdense/sconv call the fused Pallas kernels (Masking)
                masking = fw.Masking(
                    ownership=ownership,
                    piggymask=piggymask if has_piggymask else None,
                    task_id=task_id, threshold=cfg.threshold,
                    mask_mode=mask_mode, pallas_dense=cfg.use_pallas,
                    pallas_conv=cfg.use_pallas_conv)
                logits, new_bn = forward(shared, private, bn_state, x, masking)
            else:
                eff = effective_params(
                    shared, ownership, piggymask if has_piggymask else None,
                    task_id, cfg.threshold, compute_dtype=cfg.compute_dtype,
                    mask_mode=mask_mode,
                )
                logits, new_bn = forward(eff, private, bn_state, x)
            return call_loss(loss_fn, logits, y, it), (logits, new_bn)

        # Flash attention off-TPU: the kernel's custom-VJP BACKWARD is
        # linearized by value_and_grad OUTSIDE flash_mha's interpret-mode
        # scope (ops/flash.py docstring), so the whole grad trace must sit
        # inside pltpu.force_tpu_interpret_mode() for the bwd Pallas kernel
        # to lower on CPU (tests/dryrun). No-op on TPU. (ADVICE r4 #1.)
        if cfg.flash_attention and jax.default_backend() != "tpu":
            from jax.experimental.pallas import tpu as pltpu
            grad_scope = pltpu.force_tpu_interpret_mode()
        else:
            grad_scope = contextlib.nullcontext()
        with grad_scope:
            (loss, (logits, new_bn)), grads = jax.value_and_grad(
                compute_loss, argnums=(0, 1, 2), has_aux=True
            )(shared, piggymask, private)

        # Ownership gating: prior-task weights get EXACTLY zero grad; weight
        # decay only on current-task entries (ref:pruner.py
        # do_weight_decay_and_make_grads_zero).
        if cfg.unfuse_gating:
            # keep the gating selects OUT of the conv-wgrad fusions (see
            # TrainConfig.unfuse_gating)
            grads = jax.lax.optimization_barrier(grads)
        g_shared = gate_and_decay(grads[0], shared, ownership, task_id,
                                  cfg.weight_decay)
        wp_updates, opt_w_state = opt_w.update(
            {"shared": g_shared, "private": grads[2]},
            opt_w_state,
            {"shared": shared, "private": private},
        )
        shared = optax.apply_updates(shared, wp_updates["shared"])
        private = optax.apply_updates(private, wp_updates["private"])

        if has_piggymask and cfg.train_piggymask:
            g_pm = gate_piggymask_grads(grads[1], ownership, task_id)
            pm_updates, opt_pm_state = opt_pm.update(g_pm, opt_pm_state, piggymask)
            piggymask = optax.apply_updates(piggymask, pm_updates)

        # Keep released/free weights pinned at zero (ref make_pruned_zero):
        # momentum could otherwise drift invisible weights off zero.
        shared = jax.tree.map(
            lambda w, m: jnp.where(m == FREE, jnp.zeros((), w.dtype), w),
            shared, ownership,
        )

        metrics = {"loss": loss, "acc": accuracy(class_logits(logits), y)}
        return (shared, piggymask, private, new_bn, opt_w_state, opt_pm_state,
                metrics)

    return step, (opt_w, opt_pm)


def make_train_step(model_fn: Callable, **kwargs):
    """The donated, jitted single-host train step (see build_train_step)."""
    step, opts = build_train_step(model_fn, **kwargs)
    co = getattr(kwargs.get("cfg"), "compiler_options", None)
    return jax.jit(step, donate_argnums=(0, 1, 2, 3, 4, 5),
                   compiler_options=co), opts


def build_eval_step(
    model_fn: Callable,
    *,
    num_classes: int,
    mult: float,
    has_piggymask: bool,
    cfg: TrainConfig,
    preprocess_fn: Optional[Callable] = None,
    model_kwargs: Optional[Dict] = None,
    mask_mode: str = "binary",
):
    """Task-conditioned inference step, UNJITTED (for custom jit/pjit
    wrapping — see parallel/mesh.py make_parallel_eval_step).

    Semantics (ref --mode inference, SURVEY §3.4): only weights with
    0 < ownership <= task_id are visible, prior entries gated by the task's
    binarized piggymask; task-private BN stats/head."""
    model_kwargs = model_kwargs or {}

    def step(shared, piggymask, private, bn_state, ownership, task_id, x, y):
        if preprocess_fn is not None:
            x = preprocess_fn(x)
        if cfg.use_pallas or cfg.use_pallas_conv:
            masking = fw.Masking(
                ownership=ownership,
                piggymask=piggymask if has_piggymask else None,
                task_id=task_id, threshold=cfg.threshold, mask_mode=mask_mode,
                pallas_dense=cfg.use_pallas, pallas_conv=cfg.use_pallas_conv)
            eff = shared
        else:
            masking = None
            eff = effective_params(
                shared, ownership, piggymask if has_piggymask else None,
                task_id, cfg.threshold, compute_dtype=cfg.compute_dtype,
                mask_mode=mask_mode,
            )
        logits, _ = fw.apply(
            model_fn, eff, private, bn_state, x, train=False,
            compute_dtype=cfg.compute_dtype, masking=masking,
            fused_chain=cfg.use_fused_chain, act_sharder=cfg.act_sharder,
            pipeline=cfg.pipeliner, scan_blocks=cfg.scan_blocks,
            flash_attention=cfg.flash_attention, qkv_fused=cfg.qkv_fused,
            num_classes=num_classes, mult=mult,
            **model_kwargs,
        )
        cl = class_logits(logits)
        return logits, {"acc_sum": (jnp.argmax(cl, -1) == y).sum(),
                        "loss": cross_entropy(cl, y)}

    return step


def make_eval_step(model_fn: Callable, **kwargs):
    """The jitted single-host eval step (see build_eval_step)."""
    co = getattr(kwargs.get("cfg"), "compiler_options", None)
    return jax.jit(build_eval_step(model_fn, **kwargs), compiler_options=co)
