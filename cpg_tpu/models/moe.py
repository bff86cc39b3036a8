"""Sharable Mixture-of-Experts — expert-parallel capacity for the CPG engine.

No reference counterpart (ivclab/CPG's zoo is dense CNNs; SURVEY §2); this
family exists because experts are the natural continual-learning capacity
unit on TPU pods: *growth adds whole experts*, and expert parallelism (EP)
shards them over the mesh so a grown network's new capacity lands on new
chips instead of widening every kernel on every chip.

TPU-first design:
  * dense token-choice top-1 routing with a FIXED per-expert capacity —
    everything is static-shaped one-hot matmuls (dispatch/combine einsums on
    the MXU), no sorts, no ragged gathers, no data-dependent shapes;
  * routing and capacity are PER EXAMPLE (cumsum over each example's own
    tokens), so a token's output never depends on what else shares its batch
    — the batching-invariance rule serving already follows (serve.py
    calibrate());
  * the expert-stacked kernels (E, D, F)/(E, F, D) are ordinary sharable
    kernels: ownership / piggymasks / pruning / growth are the SAME
    elementwise machinery as conv kernels (ops/masked.effective_kernel is
    shape-generic; core/grow._embed_block embeds old experts in the leading
    slice). EP = shard axis 0 over the mesh's model axis
    (parallel/mesh.shared_shardings expert rule) + the `"experts"`
    activation seam below; XLA inserts the dispatch all-to-alls.

Exact-preservation growth law (the MoE analogue of models/vit.py's):
  * capacity grows as WHOLE EXPERTS: (E, D, F) -> (E', D, F), old experts in
    the leading block, new entries FREE (zeroed for old tasks by ownership);
  * the router is TASK-PRIVATE: its kernel (D, E) pads new expert columns
    with 0 and its `gate_bias` pads with -1e9 (core/grow._PRIVATE_FILL), so
    an old task's argmax can never select a grown expert and its softmax
    denominator is unchanged (exp(-1e9 - max) underflows to exactly 0.0 in
    f32) — old-task routing, gates, and outputs are bit-identical;
  * per-expert capacity derives from the BASE expert count (static in the
    arch, not the multiplier), so old experts keep their exact token-drop
    behavior at any width.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .framework import (Ctx, gelu, head, layernorm, normal_init, sconv,
                        xavier_normal)
from .vit import _heads, attention, mlp


def _expert_init(rng, shape, dtype=jnp.float32):
    """Xavier-normal per expert for stacked (E, fan_in, fan_out) kernels."""
    std = np.sqrt(2.0 / (shape[-2] + shape[-1]))
    return jax.random.normal(rng, shape, dtype) * std


def smoe(ctx: Ctx, name: str, x, n_experts_base: int, hidden: int,
         mult: float = 1.0, capacity_factor: float = 1.25):
    """Sharable MoE FFN over (N, T, D) tokens: top-1 token-choice routing
    into E = round(n_experts_base * mult) experts, each a gelu MLP
    D -> hidden -> D. Tokens over an expert's capacity are dropped (output 0
    — the residual connection carries them; standard switch-style routing).

    Router (task-private, f32): logits = x @ W_r + b_r. Expert FFN kernels
    (shared, maskable): stacked (E, D, hidden) and (E, hidden, D).
    """
    n, t, d = x.shape
    e = max(1, int(n_experts_base * mult))
    # static per-expert capacity from the BASE count — growth must not
    # change old experts' drop behavior (see module docstring)
    cap = max(1, int(np.ceil(t / n_experts_base * capacity_factor)))

    wr = ctx.private_param(f"{name}/router/kernel", (d, e), normal_init(0.02))
    br = ctx.private_param(f"{name}/router/gate_bias", (e,),
                           lambda r, s: jnp.zeros(s))
    logits = jnp.einsum("ntd,de->nte", x.astype(jnp.float32), wr) + br
    probs = jax.nn.softmax(logits, axis=-1)          # (N, T, E) f32
    gate = jnp.max(probs, axis=-1)                   # (N, T)
    choice = jnp.argmax(probs, axis=-1)              # (N, T)
    onehot = jax.nn.one_hot(choice, e, dtype=jnp.float32)
    # position of each token within its expert's queue, PER EXAMPLE
    pos = jnp.sum(jnp.cumsum(onehot, axis=1) * onehot, axis=-1) - 1.0
    slot = jax.nn.one_hot(pos.astype(jnp.int32), cap,
                          dtype=jnp.float32)          # (N, T, C); overflow -> 0
    disp = onehot[..., None] * slot[:, :, None, :]    # (N, T, E, C)
    disp = disp.astype(ctx.compute_dtype)

    def kernel(key):
        shape = ((e, d, hidden) if key.endswith("fc1/kernel")
                 else (e, hidden, d))
        w = ctx.shared_param(key, shape, _expert_init)
        if ctx.masking is not None and ctx.mode != "init":
            w = ctx.masked_weight(key, w)
        if ctx.quant_scales is not None and key in ctx.quant_scales:
            # int8 serving: dequantize and run bf16/f32 — the dispatch
            # einsums dominate here, not the weight bytes (unlike sdense)
            w = w.astype(jnp.float32) * ctx.quant_scales[key]
        return w.astype(ctx.compute_dtype)

    w1 = kernel(f"{name}/experts/fc1/kernel")
    w2 = kernel(f"{name}/experts/fc2/kernel")

    xe = jnp.einsum("ntec,ntd->necd", disp, x.astype(ctx.compute_dtype),
                    preferred_element_type=ctx.compute_dtype)
    xe = ctx.constrain(xe, "experts")                 # EP seam: shard E
    he = gelu(jnp.einsum("necd,edf->necf", xe, w1,
                         preferred_element_type=ctx.compute_dtype))
    ye = jnp.einsum("necf,efd->necd", he, w2,
                    preferred_element_type=ctx.compute_dtype)
    ye = ctx.constrain(ye, "experts")
    y = jnp.einsum("ntec,necd->ntd", disp, ye,
                   preferred_element_type=jnp.float32)
    return (y * gate[..., None]).astype(x.dtype)


def vit_moe_cifar(ctx: Ctx, x, num_classes: int, mult: float = 1.0,
                  depth: int = 6, dim: int = 256, heads: int = 4,
                  patch: int = 4, mlp_ratio: int = 4, n_experts: int = 4,
                  capacity_factor: float = 1.25):
    """ViT for 32x32 inputs with MoE FFNs on every ODD block (the standard
    alternating dense/MoE stack). Growth: heads and dense-MLP hidden follow
    models/vit.py's law; MoE capacity grows as whole experts (expert hidden
    width stays fixed = dim * mlp_ratio, one dense-MLP's worth per token)."""
    head_dim = dim // heads
    heads_n = _heads(heads, mult)
    hidden = max(1, int(dim * mlp_ratio * mult))
    x = sconv(ctx, "patch/proj", x, dim, kernel=patch, stride=patch,
              padding="VALID", kernel_init=xavier_normal)
    n = x.shape[0]
    t = x.shape[1] * x.shape[2]
    x = x.reshape(n, t, dim)
    pos = ctx.private_param("patch/pos_embed", (t, dim), normal_init(0.02))
    x = (x + pos).astype(ctx.compute_dtype)
    x = ctx.constrain(x, "tokens")
    for i in range(depth):
        x = x + attention(ctx, f"blocks/{i}/attn",
                          layernorm(ctx, f"blocks/{i}/ln1", x),
                          heads_n, head_dim)
        xn = layernorm(ctx, f"blocks/{i}/ln2", x)
        if i % 2 == 1:
            x = x + smoe(ctx, f"blocks/{i}/moe", xn, n_experts,
                         dim * mlp_ratio, mult, capacity_factor)
        else:
            x = x + mlp(ctx, f"blocks/{i}/mlp", xn, hidden)
        x = ctx.constrain(x, "tokens")
    x = layernorm(ctx, "norm", x)
    x = jnp.mean(x.astype(jnp.float32), axis=1)
    return head(ctx, "classifier", x, num_classes)
