"""Tiny functional layer framework for CPG models.

Why not flax/haiku modules: CPG needs (a) a hard structural split between
*shared* sharable kernels (conv/dense weights that ownership masks govern —
ref:models/layers.py SharableConv2d/SharableLinear) and *task-private* params
(BN affine+stats, biases, PReLU, classifier heads — ref `shared_layer_info`),
and (b) weight-tensor surgery on growth (every kernel resized, old block
embedded). A flat, explicitly-partitioned param dict keyed by layer name makes
both trivial and keeps the whole model a pure function of pytrees — ideal for
jit/pjit donation.

Usage:
    def model_fn(ctx, x): ...            # calls sconv/sdense/batchnorm/...
    shared, private, bn_state = init(rng, model_fn, sample_x)
    y, new_bn = apply(model_fn, eff_shared, private, bn_state, x, train=True)

`shared` holds ONLY maskable kernels; everything else is per-task private.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name


def _name_rng(rng, name: str):
    return jax.random.fold_in(rng, zlib.crc32(name.encode()))


@jax.tree_util.register_dataclass
@dataclass
class Masking:
    """Per-layer masking context: when set on Ctx, `shared` holds RAW weights
    and each sharable layer applies the CPG effective-weight selection itself
    — either as an XLA-fused per-layer select or as the fused Pallas kernels
    (ops/pallas) where ownership/binarize/multiply happen inside the MXU tile
    loads (the north-star Sharable-layer story; ref:models/layers.py
    SharableConv2d/SharableLinear forward).

    Without a Masking (the default), layers consume pre-masked effective
    params (ops/masked.effective_params) — the two paths are numerically
    identical; Pallas changes only where the select runs."""

    ownership: Dict[str, jax.Array]
    piggymask: Optional[Dict[str, jax.Array]]
    task_id: Any
    threshold: float = field(metadata=dict(static=True), default=5e-3)
    mask_mode: str = field(metadata=dict(static=True), default="binary")
    pallas_dense: bool = field(metadata=dict(static=True), default=False)
    pallas_conv: bool = field(metadata=dict(static=True), default=False)


def he_normal_fan_out(rng, shape, dtype=jnp.float32):
    """Kaiming-normal, fan_out, relu gain — torch's VGG/ResNet conv init."""
    if len(shape) == 4:  # HWIO conv kernel
        fan_out = shape[0] * shape[1] * shape[3]
    else:  # (in, out) dense kernel
        fan_out = shape[-1]
    std = np.sqrt(2.0 / fan_out)
    return jax.random.normal(rng, shape, dtype) * std


def normal_init(std):
    def f(rng, shape, dtype=jnp.float32):
        return jax.random.normal(rng, shape, dtype) * std

    return f


def xavier_normal(rng, shape, dtype=jnp.float32):
    fan_in = shape[0] if len(shape) == 2 else shape[0] * shape[1] * shape[2]
    fan_out = shape[-1] if len(shape) == 2 else shape[0] * shape[1] * shape[3]
    std = np.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(rng, shape, dtype) * std


@dataclass
class Ctx:
    """Per-call context threading params through a functional forward."""

    mode: str  # 'init' | 'apply'
    train: bool
    rng: Optional[jax.Array] = None
    shared: Dict[str, jax.Array] = field(default_factory=dict)
    private: Dict[str, jax.Array] = field(default_factory=dict)
    bn_state: Dict[str, jax.Array] = field(default_factory=dict)
    new_bn_state: Dict[str, jax.Array] = field(default_factory=dict)
    compute_dtype: jnp.dtype = jnp.float32
    masking: Optional[Masking] = None  # raw-weight mode (see Masking)
    # int8 serving (serve.py): {kernel key -> per-output-channel f32 scale};
    # when set, ctx.shared holds int8 quantized kernels and sconv/sdense run
    # the int8 MXU path (measured 1.32x bf16 conv on v5e + half the weight
    # and activation bytes). Eval-only — training never quantizes.
    quant_scales: Optional[Dict[str, jax.Array]] = None
    # static per-layer ACTIVATION scales (serve.py calibrate()): when set,
    # the int8 path uses these instead of the dynamic per-batch max — outputs
    # become batching-invariant (a request's logits no longer depend on what
    # else shares its bucket). Keys missing here fall back to dynamic.
    act_scales: Optional[Dict[str, jax.Array]] = None
    # calibration collector: when a dict is attached, the int8 path records
    # each layer's observed activation scale (max over calls) into it —
    # used EAGERLY by TaskServer.calibrate, never under jit.
    act_stats: Optional[Dict[str, float]] = None
    # fuse BN+ReLU+conv3x3 chains into the VMEM-resident Pallas kernel
    # (ops/pallas/fused_chain.py): the normalized activation between adjacent
    # convs never touches HBM. Honored by fused_bn_relu_sconv call sites
    # (VGG); ignored during init and under int8 serving.
    fused_chain: bool = False
    # activation-sharding hook (parallel/mesh.act_sharder): a callable
    # (array, tag) -> array that models call at labeled seams —
    # `"tokens"` on (N, T, D) transformer activations (sequence parallelism:
    # tokens sharded over the model axis, XLA all-gathers only for attention)
    # and `"experts"` on (N, E, C, D) MoE dispatch tensors (expert
    # parallelism: per-expert FFNs run where their weights live). None (the
    # default) = no constraints; models stay mesh-agnostic.
    act_sharder: Optional[Callable] = None
    # run homogeneous `blocks/{i}/...` stacks as ONE lax.scan over in-graph
    # stacked per-block params instead of `depth` unrolled copies (models/
    # vit.py scan branch). The HLO shrinks ~depth x — the lever for the
    # axon relay's remote-compile failures on deep/large-batch transformer
    # programs (tpu_compile_helper exit 1; PERF_vit_remat_r4.json) — and
    # compile time drops with it. Numerics are the same block math on the
    # same params; jnp.stack's transpose (split) routes grads back to the
    # flat per-block dict entries, so optimizers/growth/checkpoints are
    # untouched. Requires the default effective-params path.
    scan_blocks: bool = False
    # jax.checkpoint each scanned block's body (the transformer remat
    # standard: residuals per block are one (N, T, D) carry instead of every
    # intermediate). Set by TrainConfig.remat when scan_blocks is on.
    scan_remat: bool = False
    # route transformer attention through the Pallas flash kernel
    # (ops/flash.py): the (N, H, T, S) score tensor never exists in HBM,
    # forward or backward. Honored by models/vit.py attention(); ignored
    # during init (eager Pallas dispatch at init time is pure waste) and
    # under int8 serving (the kernel has no int8 path).
    flash_attention: bool = False
    # fused-QKV GEMM in models/vit.attention(): compute q|k|v as ONE
    # (D, 3*inner) matmul on the effective-params path (params stay three
    # separate kernels; the concat is in-graph and its transpose is a
    # split). None = auto by embed dim: measured on v5e, the fusion is
    # +24% step time at D=256 (vit_cifar b1024: 16.2k -> 20.2k img/s,
    # activations dominate so reading the block input once wins) but -2%
    # at D=768 (vit_b16 b128: 832 -> 815 img/s, the 2x per-step weight
    # concat/split traffic outweighs the saved activation reads) —
    # PERF_vit_qkv_r4.json. True/False force it for probes.
    qkv_fused: Optional[bool] = None
    # BACKWARD-only fusion barrier on every sconv input (TrainConfig.
    # unfuse_bn_bwd): the cotangent of a conv's input is its dgrad OUTPUT,
    # and XLA fuses the downstream BN-backward reductions into that dgrad
    # as epilogues (PROFILE_r4_trace fusion.20: 89 TFLOPS vs 193 for clean
    # conv fusions). The barrier forces the dgrad to complete clean; the
    # BN-bwd reduces then run as separate kernels. Forward math untouched
    # (identity), backward math untouched (optimization_barrier is
    # scheduling-only) — a measured lever, like unfuse_gating.
    unfuse_bn_bwd: bool = False
    # pipeline-parallel hook (parallel/pipeline.make_pipeliner): a callable
    # (merged_effective_params, tokens, block_kwargs) -> tokens that runs a
    # model's homogeneous `blocks/{i}/...` stack as an S-stage GPipe over a
    # `pipe` mesh axis. Differentiable end-to-end (the tick loop has a
    # static trip count, so reverse AD scans it; microbatch gradient
    # accumulation falls out of the scan transpose) — the FULL CPG train
    # step (piggymask grads included, which flow through effective_params
    # OUTSIDE the block stack) works unchanged. None = run blocks inline.
    pipeline: Optional[Callable] = None

    def constrain(self, x, tag: str):
        """Apply the activation-sharding constraint for `tag`, if any."""
        if self.act_sharder is None:
            return x
        return self.act_sharder(x, tag)

    # -- param accessors ----------------------------------------------------
    def shared_param(self, name, shape, init_fn):
        if self.mode == "init":
            if name in self.shared:
                raise ValueError(f"duplicate shared param {name}")
            self.shared[name] = init_fn(_name_rng(self.rng, name), shape)
        w = self.shared[name]
        assert w.shape == tuple(shape), f"{name}: {w.shape} != {tuple(shape)}"
        return w

    def private_param(self, name, shape, init_fn):
        if self.mode == "init":
            if name in self.private:
                raise ValueError(f"duplicate private param {name}")
            self.private[name] = init_fn(_name_rng(self.rng, name), shape)
        return self.private[name]

    def bn_running(self, name, shape):
        if self.mode == "init":
            self.bn_state[name + "/mean"] = jnp.zeros(shape, jnp.float32)
            self.bn_state[name + "/var"] = jnp.ones(shape, jnp.float32)
        return self.bn_state[name + "/mean"], self.bn_state[name + "/var"]

    # -- masking helpers ------------------------------------------------------
    def mask_entries(self, key):
        """(ownership, piggymask-or-None) for a shared kernel in raw mode."""
        mk = self.masking
        pm = mk.piggymask[key] if mk.piggymask is not None else None
        return mk.ownership[key], pm

    def masked_weight(self, key, w):
        """XLA per-layer effective-weight select (raw mode, non-Pallas)."""
        from ..ops.masked import effective_kernel

        mk = self.masking
        own, pm = self.mask_entries(key)
        return effective_kernel(w, own, pm, mk.task_id, mk.threshold,
                                mk.mask_mode)


def _quantize_activation(x, scale=None):
    """Per-tensor symmetric int8 activation quantization.

    `scale=None`: dynamic — scale from this batch's max |x| (default PTQ;
    outputs then depend on batch composition). With a static `scale`
    (TaskServer.calibrate), identical inputs give identical outputs
    regardless of co-batched traffic; out-of-range activations clip.

    Serving-grade PTQ: weights carry per-output-channel static scales (set at
    TaskServer load), activations quantize per call. The int32 accumulator
    rescales by s_x * s_w — exact integer math inside, one f32 epilogue."""
    xf = x.astype(jnp.float32)
    s = (jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
         if scale is None else jnp.asarray(scale, jnp.float32))
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def _act_scale_in(ctx: "Ctx", key: str):
    """The static activation scale for a layer, if calibrated."""
    if ctx.act_scales is not None:
        return ctx.act_scales.get(key)
    return None


def _record_act(ctx: "Ctx", key: str, s):
    """Calibration collection (eager only): track the max observed scale."""
    if ctx.act_stats is not None:
        ctx.act_stats[key] = max(float(s), ctx.act_stats.get(key, 0.0))


# ---------------------------------------------------------------------------
# Layers. Sharable kernels -> ctx.shared; everything else -> ctx.private.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _bwd_barrier(x):
    """Identity forward; optimization_barrier on the COTANGENT in backward.
    Placed on a conv's input, it keeps that conv's dgrad fusion clean of
    downstream epilogues (see Ctx.unfuse_bn_bwd)."""
    return x


def _bwd_barrier_fwd(x):
    return x, None


def _bwd_barrier_bwd(_, g):
    return (jax.lax.optimization_barrier(g),)


_bwd_barrier.defvjp(_bwd_barrier_fwd, _bwd_barrier_bwd)


def _patchify_dot(x, w, k: int, out_dtype):
    """kernel==stride==k VALID conv as space-to-depth + GEMM.

    x: (N, H, W, C) with H, W divisible by k; w: (k, k, C, F) HWIO. The
    patch flatten order (kh, kw, cin) matches HWIO's row-major (H, W, I)
    flatten, so `w.reshape(k*k*C, F)` pairs elements identically to the
    strided conv — same math, MXU-shaped."""
    n, hh, ww, c = x.shape
    f = w.shape[-1]
    x = x.reshape(n, hh // k, k, ww // k, k, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, (hh // k) * (ww // k), k * k * c)
    y = jnp.dot(x, w.reshape(k * k * c, f), preferred_element_type=out_dtype)
    return y.reshape(n, hh // k, ww // k, f)


def sconv(
    ctx: Ctx,
    name: str,
    x: jax.Array,
    features: int,
    kernel: int = 3,
    stride: int = 1,
    padding="SAME",
    use_bias: bool = False,
    kernel_init=he_normal_fan_out,
) -> jax.Array:
    """Sharable 2D conv (ref:models/layers.py SharableConv2d). NHWC/HWIO."""
    if ctx.unfuse_bn_bwd and ctx.mode != "init" and ctx.train:
        x = _bwd_barrier(x)
    cin = x.shape[-1]
    key = f"{name}/kernel"
    w = ctx.shared_param(key, (kernel, kernel, cin, features), kernel_init)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    mk = ctx.masking
    if mk is not None and ctx.mode != "init":
        own, pm = ctx.mask_entries(key)
        if mk.pallas_conv and pm is not None:
            from ..ops.pallas.masked_conv import masked_conv2d

            y = masked_conv2d(x.astype(ctx.compute_dtype), w, own, pm,
                              mk.task_id, stride=stride, padding=padding,
                              threshold=mk.threshold, mask_mode=mk.mask_mode)
            if use_bias:
                b = ctx.private_param(f"{name}/bias", (features,),
                                      lambda r, s: jnp.zeros(s))
                y = y + b.astype(y.dtype)
            return y
        w = ctx.masked_weight(key, w)
    if ctx.quant_scales is not None and key in ctx.quant_scales:
        xq, s_x = _quantize_activation(x, _act_scale_in(ctx, key))
        _record_act(ctx, key, s_x)
        yi = jax.lax.conv_general_dilated(
            xq, w, window_strides=(stride, stride), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = yi.astype(jnp.float32) * (s_x * ctx.quant_scales[key])
        if use_bias:
            b = ctx.private_param(f"{name}/bias", (features,),
                                  lambda r, s: jnp.zeros(s))
            y = y + b.astype(y.dtype)
        return y
    # output dtype == compute dtype so fwd/bwd conv dtypes agree; the TPU MXU
    # accumulates in f32 internally either way, and BN upcasts to f32 next.
    if (kernel == stride and kernel > 1 and padding == "VALID"
            and x.shape[1] % kernel == 0 and x.shape[2] % kernel == 0):
        # Non-overlapping patch embedding (ViT stems). XLA's conv lowering
        # runs this geometry at ~2 TFLOPS (PROFILE_vit_b16_r4.json: ~13.5 ms
        # of conv fusions for a ~30 GFLOP patchify); as an input-side
        # space-to-depth + one GEMM the contraction is (k*k*cin) x features —
        # clean MXU tiles, and wgrad becomes a GEMM too. The transpose
        # touches only the (gradient-free) input image once.
        y = _patchify_dot(x.astype(ctx.compute_dtype),
                          w.astype(ctx.compute_dtype), kernel,
                          ctx.compute_dtype)
    else:
        y = jax.lax.conv_general_dilated(
            x.astype(ctx.compute_dtype),
            w.astype(ctx.compute_dtype),
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=ctx.compute_dtype,
        )
    if use_bias:
        b = ctx.private_param(f"{name}/bias", (features,), lambda r, s: jnp.zeros(s))
        y = y + b.astype(y.dtype)
    # Residual tag for TrainConfig.remat_policy='convs': under that policy the
    # backward pass stores ONLY these conv outputs and recomputes the cheap
    # BN/ReLU/pool epilogues from them — no conv is ever recomputed, but the
    # second activation-sized residual per layer (the post-ReLU copy) is never
    # written. No-op outside a jax.checkpoint(policy=...) context.
    return checkpoint_name(y, "sconv_out")


def sdense(
    ctx: Ctx,
    name: str,
    x: jax.Array,
    features: int,
    use_bias: bool = True,
    kernel_init=normal_init(0.01),
) -> jax.Array:
    """Sharable dense layer (ref:models/layers.py SharableLinear).

    Accepts any leading batch shape — (N, F_in) or (N, T, F_in): jnp.dot
    contracts the LAST axis and XLA's dot_general merges the leading dims
    INSIDE the GEMM, where the layout is known. Callers must NOT pre-flatten
    (N, T, D) to (N*T, D): with a non-lane-aligned T (e.g. 196 tokens) that
    reshape crosses padded sublanes and materializes as a real copy — the
    vit_b16 trace showed ~13 ms/step of reshape traffic from exactly this
    (PROFILE_vit_b16_r4.json)."""
    key = f"{name}/kernel"
    w = ctx.shared_param(key, (x.shape[-1], features), kernel_init)
    mk = ctx.masking
    if mk is not None and ctx.mode != "init":
        own, pm = ctx.mask_entries(key)
        if mk.pallas_dense and pm is not None:
            from ..ops.pallas.masked_matmul import masked_matmul

            # the Pallas kernel is 2D (M, K) — flatten leading dims for
            # this path only
            x2 = x.reshape(-1, x.shape[-1])
            y = masked_matmul(x2.astype(ctx.compute_dtype), w, own, pm,
                              mk.task_id, mk.threshold, mk.mask_mode)
            y = y.reshape(*x.shape[:-1], features)
            if use_bias:
                b = ctx.private_param(f"{name}/bias", (features,),
                                      lambda r, s: jnp.zeros(s))
                y = y + b.astype(y.dtype)
            return y
        w = ctx.masked_weight(key, w)
    if ctx.quant_scales is not None and key in ctx.quant_scales:
        xq, s_x = _quantize_activation(x, _act_scale_in(ctx, key))
        _record_act(ctx, key, s_x)
        yi = jnp.dot(xq, w, preferred_element_type=jnp.int32)
        y = yi.astype(jnp.float32) * (s_x * ctx.quant_scales[key])
        if use_bias:
            b = ctx.private_param(f"{name}/bias", (features,),
                                  lambda r, s: jnp.zeros(s))
            y = y + b.astype(y.dtype)
        return y
    y = jnp.dot(
        x.astype(ctx.compute_dtype),
        w.astype(ctx.compute_dtype),
        preferred_element_type=ctx.compute_dtype,
    )
    if use_bias:
        b = ctx.private_param(f"{name}/bias", (features,), lambda r, s: jnp.zeros(s))
        y = y + b.astype(y.dtype)
    # See sconv: saved residual under remat_policy='convs'.
    return checkpoint_name(y, "sdense_out")


BN_MOMENTUM = 0.1  # torch default: running = (1-m)*running + m*batch
BN_EPS = 1e-5


def _bn_moments(ctx: Ctx, name: str, x: jax.Array):
    """Shared BN machinery: register affine+running params, compute the
    normalization (mean, var) for this call (batch stats in train, running
    in eval), and record the running-stat updates. Returns
    (mean, var, scale, bias)."""
    c = x.shape[-1]
    scale = ctx.private_param(f"{name}/scale", (c,), lambda r, s: jnp.ones(s))
    bias = ctx.private_param(f"{name}/bias", (c,), lambda r, s: jnp.zeros(s))
    rmean, rvar = ctx.bn_running(name, (c,))
    if ctx.train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axes, dtype=jnp.float32)
        msq = jnp.mean(jnp.square(x.astype(jnp.float32)), axes)
        var = jnp.maximum(msq - jnp.square(mean), 0.0)
        n = np.prod([x.shape[a] for a in axes])
        unbiased = var * (n / max(n - 1, 1))
        ctx.new_bn_state[name + "/mean"] = (
            (1 - BN_MOMENTUM) * rmean + BN_MOMENTUM * mean
        )
        ctx.new_bn_state[name + "/var"] = (
            (1 - BN_MOMENTUM) * rvar + BN_MOMENTUM * unbiased
        )
    else:
        mean, var = rmean, rvar
        ctx.new_bn_state[name + "/mean"] = rmean
        ctx.new_bn_state[name + "/var"] = rvar
    return mean, var, scale, bias


def batchnorm(ctx: Ctx, name: str, x: jax.Array) -> jax.Array:
    """BatchNorm with task-private affine AND task-private running stats
    (ref: `shared_layer_info[dataset]['bn_layer_running_mean'/...]`).

    TPU note: batch stats use the one-pass form E[x^2] - mean^2 (f32
    accumulation) so XLA fuses BOTH reductions into a single read of the
    activation — the textbook two-pass mean-then-var costs one extra
    activation sweep per BN per step (profiled at ~0.15-0.25 ms each on the
    VGG16 step, 13 BNs). The normalize stays f32 math on bf16 reads."""
    mean, var, scale, bias = _bn_moments(ctx, name, x)
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x.astype(jnp.float32) - mean) * inv * scale + bias
    return y.astype(x.dtype if x.dtype != jnp.float32 else jnp.float32)


def batchnorm_affine(ctx: Ctx, name: str, x: jax.Array):
    """BN folded to a per-channel affine (a, b) with BN(x) = a*x + b —
    identical stats/running-update semantics to `batchnorm` (same param
    names, same one-pass moments), but the normalized tensor is NOT
    materialized: the affine feeds ops/pallas/fused_chain so the activation
    stays in VMEM. Gradients through train-mode batch stats flow via the
    a(x), b(x) closures."""
    mean, var, scale, bias = _bn_moments(ctx, name, x)
    a = jax.lax.rsqrt(var + BN_EPS) * scale
    return a, bias - mean * a


def fused_bn_relu_sconv(ctx: Ctx, bn_name: str, conv_name: str, x: jax.Array,
                        features: int) -> jax.Array:
    """conv3x3(relu(BN(x))) — the cross-layer chain. Under
    `ctx.fused_chain` (and outside init / int8 serving) this runs the
    VMEM-resident Pallas kernel: BN folds to an affine, and the
    normalized/ReLU'd activation between the two convs never touches HBM
    (the boundary write+read XLA cannot elide). Otherwise it is EXACTLY the
    unfused composition — same param names, same registration order, same
    numerics — so checkpoints and goldens are path-independent."""
    fused = (ctx.fused_chain and ctx.mode != "init"
             and ctx.quant_scales is None)
    if not fused:
        return sconv(ctx, conv_name, relu(batchnorm(ctx, bn_name, x)),
                     features, kernel=3, stride=1, padding="SAME")
    from ..ops.pallas.fused_chain import fused_affine_relu_conv

    a, b = batchnorm_affine(ctx, bn_name, x)
    key = f"{conv_name}/kernel"
    w = ctx.shared_param(key, (3, 3, x.shape[-1], features),
                         he_normal_fan_out)
    if ctx.masking is not None:
        w = ctx.masked_weight(key, w)
    y = fused_affine_relu_conv(x, a, b, w, ctx.compute_dtype)
    # same residual tag as sconv (TrainConfig.remat_policy='convs')
    return checkpoint_name(y, "sconv_out")


def sembed(ctx: Ctx, name: str, ids: jax.Array, vocab: int,
           features: int) -> jax.Array:
    """Sharable token embedding: a (vocab, features) maskable kernel looked
    up by row. The CPG select runs on the TABLE (ownership visibility +
    piggymask binarize over all vocab rows — identical semantics to sdense's
    kernel), then the gather reads masked rows; XLA fuses the select into
    the gather's operand. ids may arrive as f32 zeros from init()'s sample
    batch — cast here. No Pallas/int8 variant: a (vocab, D) table gather is
    bandwidth-trivial next to the block GEMMs.

    Growth: the table keeps its shape across width multipliers (vocab and
    the embed dim are both fixed — models/vit.py growth law), so grow_shared
    passes it through untouched; it still prunes/picks like any kernel."""
    key = f"{name}/kernel"
    w = ctx.shared_param(key, (vocab, features), normal_init(0.02))
    if ctx.masking is not None and ctx.mode != "init":
        w = ctx.masked_weight(key, w)
    ids = ids.astype(jnp.int32)
    if ctx.quant_scales is not None and key in ctx.quant_scales:
        # int8 serving (serve._quantize_tree): the table rows are int8 with
        # per-output-channel scales — gather then dequantize (no activation
        # quantization: this is a lookup, not a matmul)
        return jnp.take(w, ids, axis=0).astype(jnp.float32) \
            * ctx.quant_scales[key]
    return jnp.take(w.astype(ctx.compute_dtype), ids, axis=0)


LN_EPS = 1e-6


def layernorm(ctx: Ctx, name: str, x: jax.Array) -> jax.Array:
    """LayerNorm with task-private affine (transformer counterpart of the
    task-private BN: normalization is stateless, so there is no running-stat
    entry — only `scale`/`bias` in ctx.private, padded by the standard
    grow_private fills if their channel dim ever grows).

    CPG-growth note (models/vit.py): LN normalizes ACROSS the channel axis,
    so growing that axis would change old tasks' mean/var — which is why the
    transformer growth law keeps the embed dim fixed and adds capacity as
    new heads / MLP hidden units instead. f32 moments on bf16 reads, like
    batchnorm."""
    c = x.shape[-1]
    scale = ctx.private_param(f"{name}/scale", (c,), lambda r, s: jnp.ones(s))
    bias = ctx.private_param(f"{name}/bias", (c,), lambda r, s: jnp.zeros(s))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + LN_EPS) * scale + bias
    return y.astype(x.dtype if x.dtype != jnp.float32 else jnp.float32)


def gelu(x):
    """tanh-approximation GELU (torch nn.GELU('tanh') / ViT standard).
    gelu(0) == 0 exactly — required by the growth law: a grown MLP hidden
    unit outputs 0 for old tasks, and the activation must keep it 0."""
    return jax.nn.gelu(x, approximate=True)


def prelu(ctx: Ctx, name: str, x: jax.Array) -> jax.Array:
    """PReLU with task-private slope (ref: SphereNet PReLU in shared_layer_info)."""
    a = ctx.private_param(f"{name}/slope", (x.shape[-1],), lambda r, s: jnp.full(s, 0.25))
    xf = x.astype(jnp.float32)
    return jnp.where(xf >= 0, xf, a * xf)


def head(
    ctx: Ctx,
    name: str,
    x: jax.Array,
    num_classes: int,
    kernel_init=normal_init(0.01),
) -> jax.Array:
    """Task-private classifier head (ref: per-dataset `classifiers` ModuleDict)."""
    w = ctx.private_param(f"{name}/kernel", (x.shape[-1], num_classes), kernel_init)
    b = ctx.private_param(f"{name}/bias", (num_classes,), lambda r, s: jnp.zeros(s))
    return jnp.dot(x.astype(jnp.float32), w) + b


def maxpool(x, window=2, stride=2):
    """2x2/2 max pool via reduce_window. Measured alternatives on v5e
    (reshape(N,H/2,2,W/2,2,C).max and strided-slice maxima) were BOTH slower
    than XLA's reduce_window + select-and-scatter — the relayouts they force
    cost more than the scatter they avoid. Keep the native lowering."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )


def avgpool_global(x):
    return jnp.mean(x, axis=(1, 2))


def relu(x):
    return jnp.maximum(x, 0)


# ---------------------------------------------------------------------------
# init / apply drivers
# ---------------------------------------------------------------------------


def init(
    rng, model_fn: Callable, sample_x, compute_dtype=jnp.float32, **kwargs
) -> Tuple[Dict, Dict, Dict]:
    ctx = Ctx(mode="init", train=False, rng=rng, compute_dtype=compute_dtype)
    model_fn(ctx, sample_x, **kwargs)
    return ctx.shared, ctx.private, ctx.bn_state


def apply(
    model_fn: Callable,
    shared: Dict,
    private: Dict,
    bn_state: Dict,
    x,
    train: bool,
    compute_dtype=jnp.float32,
    masking: Optional[Masking] = None,
    quant_scales: Optional[Dict] = None,
    act_scales: Optional[Dict] = None,
    act_stats: Optional[Dict] = None,
    fused_chain: bool = False,
    act_sharder: Optional[Callable] = None,
    pipeline: Optional[Callable] = None,
    scan_blocks: bool = False,
    scan_remat: bool = False,
    flash_attention: bool = False,
    qkv_fused: Optional[bool] = None,
    unfuse_bn_bwd: bool = False,
    **kwargs,
):
    """Run the model. With `masking=None` (default), `shared` must hold
    pre-masked effective params; with a Masking, `shared` holds RAW weights
    and each sharable layer selects (or Pallas-fuses) its effective weight.
    With `quant_scales` (serve.py int8 path), `shared` holds int8 kernels;
    `act_scales` swaps its dynamic activation scales for calibrated static
    ones and `act_stats` (a plain dict, EAGER calls only) collects observed
    scales for TaskServer.calibrate. `fused_chain` routes BN+ReLU+conv3x3
    chains through the VMEM-resident Pallas kernel (fused_bn_relu_sconv)."""
    ctx = Ctx(
        mode="apply",
        train=train,
        shared=shared,
        private=private,
        bn_state=bn_state,
        compute_dtype=compute_dtype,
        masking=masking,
        quant_scales=quant_scales,
        act_scales=act_scales,
        act_stats=act_stats,
        fused_chain=fused_chain,
        act_sharder=act_sharder,
        pipeline=pipeline,
        scan_blocks=scan_blocks,
        scan_remat=scan_remat,
        flash_attention=flash_attention,
        qkv_fused=qkv_fused,
        unfuse_bn_bwd=unfuse_bn_bwd,
    )
    out = model_fn(ctx, x, **kwargs)
    return out, ctx.new_bn_state
