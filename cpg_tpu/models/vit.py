"""Sharable Vision Transformer — the CPG framework beyond CNNs.

The reference's model zoo is all-CNN (ref:models/vgg.py, ref:models/resnet.py,
ref:models/spherenet.py); this family has no reference counterpart. It exists
to prove the continual-learning engine (ownership masks, piggybank masks,
gradual pruning, capacity growth, bit-exact zero forgetting) is architecture-
generic: every weight matrix in a transformer block is a Sharable dense kernel
(ops/masked), LayerNorm affines / positional embeddings / heads are
task-private, and growth follows a transformer-specific exact-preservation
law derived below.

TPU-first design notes:
  * all token mixing is MXU matmuls (q/k/v/proj/mlp through `sdense`, scores
    and attention-apply through einsum) on bf16 with f32 softmax/LN moments;
  * sequence length (64 patch tokens for 32x32/p4) and widths are static, so
    the whole forward is one fused XLA program — no dynamic shapes anywhere;
  * sdense is fed 2D (N*T, D) views, keeping every masked/Pallas/int8 kernel
    path of the CNN zoo (ops/pallas/masked_matmul, serve.py PTQ) reusable
    verbatim.

Growth law (the transformer analogue of conv channel growth, grow.py):
the embed dim D is the residual-stream bus and stays FIXED across width
multipliers — LayerNorm normalizes across D, so growing D would change old
tasks' moments (see framework.layernorm). Capacity grows instead by
  * new attention heads:  q/k/v kernels (D, H*hd) -> (D, H'*hd), head_dim
    fixed. Old-task visibility zeroes the new columns, so a new head's
    q=k=0 -> uniform softmax over v=0 -> output 0; the out-proj's new input
    rows then multiply exact zeros. Top-left block embedding is exact
    BECAUSE q/k/v are separate kernels (a fused (D,3*inner) kernel would
    scatter the old q|k|v blocks on growth) and head_dim is fixed (growing
    head_dim would re-interleave old columns across heads).
  * new MLP hidden units: fc1 (D,F)->(D,F'), fc2 (F,D)->(F',D); a grown
    hidden unit is 0 for old tasks, gelu(0)=0, and fc2's new rows multiply 0.
Both follow from the same ownership rule the CNNs use (an old task only sees
entries owned <= itself; grown entries are FREE) — no ViT-specific code in
core/grow.py, and no flatten_dims entry (nothing spatial feeds a dense).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .framework import (Ctx, gelu, head, layernorm, normal_init, sconv,
                        sdense, xavier_normal)


def _heads(heads: int, mult: float) -> int:
    return max(1, int(heads * mult))


def attention(ctx: Ctx, name: str, x, heads_n: int, head_dim: int,
              causal: bool = False):
    """Multi-head self-attention over (N, T, D) with sharable q/k/v/proj.
    `causal=True` masks scores lower-triangularly (models/text.py)."""
    n, t, d = x.shape
    inner = heads_n * head_dim
    # sdense consumes (N, T, D) directly — flattening to (N*T, D) here
    # materializes a copy when T is not lane-aligned (196 tokens @ 224px);
    # the (T, inner) -> (T, H, hd) splits below are minor-most and free.
    fuse = ctx.qkv_fused if ctx.qkv_fused is not None else False
    if (fuse and ctx.mode != "init" and ctx.masking is None
            and ctx.quant_scales is None):
        # One (D, 3*inner) GEMM instead of three (D, inner) GEMMs: the
        # block input is read from HBM once instead of three times and the
        # MXU tile is 3x wider. The three kernels stay SEPARATE params
        # (same names/shapes as the sdense path — masking, growth,
        # optimizers, and checkpoints are untouched); the concat is a few
        # MB of weight bytes per step and its transpose is a split, so
        # grads land back on the per-projection entries. Each output
        # column block contracts identically to its standalone GEMM, so
        # numerics match the 3-GEMM path (bit-equal on CPU; tested).
        # History of the default: r4 measured +24% at D=256 pre-layout-pass
        # (vit_cifar 16.2k -> 20.2k b1024; PERF_vit_qkv_r4.json) and gated
        # auto on D < 512. r5 RE-measured on the post-layout code and the
        # crossover is GONE: unfused 21.3k vs fused 20.3k at b1024 (+5%
        # unfused; b4096 neutral) — the (N,T,3*inner) slice/copy tax now
        # outweighs the saved input reads (the step is op-count-taxed:
        # 2,165 leaf ops, PROFILE_r5_vit.json). Auto is therefore OFF
        # everywhere; "on" stays a tested opt-in (RESULTS.md r5).
        ws = [ctx.shared_param(f"{name}/{p}/kernel", (d, inner),
                               xavier_normal) for p in "qkv"]
        bs = [ctx.private_param(f"{name}/{p}/bias", (inner,),
                                lambda r, s: jnp.zeros(s)) for p in "qkv"]
        w3 = jnp.concatenate(ws, axis=1).astype(ctx.compute_dtype)
        qkv = jnp.dot(x.astype(ctx.compute_dtype), w3,
                      preferred_element_type=ctx.compute_dtype)
        qkv = qkv + jnp.concatenate(bs).astype(qkv.dtype)
        # keep remat_policy='convs' semantics identical to the 3-GEMM sdense
        # path: the projection output stays a saved residual when fused
        qkv = checkpoint_name(qkv, "sdense_out")
        q = qkv[..., :inner]
        k = qkv[..., inner:2 * inner]
        v = qkv[..., 2 * inner:]
    else:
        q = sdense(ctx, f"{name}/q", x, inner, kernel_init=xavier_normal)
        k = sdense(ctx, f"{name}/k", x, inner, kernel_init=xavier_normal)
        v = sdense(ctx, f"{name}/v", x, inner, kernel_init=xavier_normal)
    q = q.reshape(n, t, heads_n, head_dim)
    k = k.reshape(n, t, heads_n, head_dim)
    v = v.reshape(n, t, heads_n, head_dim)
    if (ctx.flash_attention and ctx.mode != "init"
            and ctx.quant_scales is None):
        # Pallas flash kernel (ops/flash.py): online softmax, the (T, S)
        # score matrix never touches HBM fwd or bwd. Same math as the
        # einsum path (f32 softmax inside the kernel), not bit-identical
        # (tile-wise reassociation) — keep the flag constant across a
        # task sequence so old-task bit-exactness holds within a run.
        from ..ops.flash import flash_mha
        out = flash_mha(q, k, v, causal=causal)
    else:
        # f32 scores + softmax (bf16 softmax loses too much around the max)
        scores = jnp.einsum("nthd,nshd->nhts", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (1.0 / head_dim ** 0.5)
        if causal:
            tri = jnp.tril(jnp.ones((t, t), jnp.bool_))
            scores = jnp.where(tri, scores, -1e30)
        att = jax.nn.softmax(scores, axis=-1).astype(ctx.compute_dtype)
        out = jnp.einsum("nhts,nshd->nthd", att, v,
                         preferred_element_type=ctx.compute_dtype)
    out = out.reshape(n, t, inner)  # minor-most merge: free
    return sdense(ctx, f"{name}/proj", out, d, kernel_init=xavier_normal)


def mlp(ctx: Ctx, name: str, x, hidden: int):
    d = x.shape[-1]
    h = gelu(sdense(ctx, f"{name}/fc1", x, hidden,
                    kernel_init=xavier_normal))
    return sdense(ctx, f"{name}/fc2", h, d, kernel_init=xavier_normal)


def vit_block(ctx: Ctx, x, heads_n: int, head_dim: int, hidden: int,
              causal: bool = False):
    """One pre-LN encoder block with RELATIVE param names (attn/..., ln1/...,
    mlp/..., ln2/...). vit_cifar uses the absolute `blocks/{i}/` spelling of
    the same math; this relative form is what parallel/pipeline.py stages
    over (params for block i are sliced out of the stacked tree and fed back
    under these names)."""
    x = x + attention(ctx, "attn", layernorm(ctx, "ln1", x), heads_n,
                      head_dim, causal=causal)
    x = x + mlp(ctx, "mlp", layernorm(ctx, "ln2", x), hidden)
    return x


def _stacked_block_params(tree, depth: int):
    """Stack the per-block entries `blocks/{i}/<rel>` into `{<rel>:
    (depth, ...)}` IN-GRAPH. jnp.stack is differentiable (its transpose is
    split), so gradients land back on the flat per-block dict entries — the
    ownership gating, optimizers, pruning, growth, and checkpoints outside
    the model never see stacked tensors. The stack itself is one
    params-sized concat per step (~2 copies of the block weights' bytes),
    trivial next to the block GEMMs it feeds."""
    rels = sorted(k[len("blocks/0/"):] for k in tree
                  if k.startswith("blocks/0/"))
    return {r: jnp.stack([tree[f"blocks/{i}/{r}"] for i in range(depth)])
            for r in rels}


def scan_vit_blocks(ctx: Ctx, x, depth: int, heads_n: int, head_dim: int,
                    hidden: int, causal: bool = False):
    """Run the homogeneous block stack as ONE `lax.scan` over stacked
    params: the compiled HLO holds a single block body instead of `depth`
    unrolled copies. This is the structural fix for the axon relay's
    remote-compile failures on deep transformer programs (vit_b16 b>=256 /
    vit_cifar b>=4096 died with tpu_compile_helper exit 1 every round —
    PERF_vit_r3.json, PERF_vit_remat_r4.json) and cuts compile time with
    it. `ctx.scan_remat` checkpoints each block body — the transformer
    remat standard (per-block residual = one (N, T, D) carry)."""
    if ctx.masking is not None or ctx.quant_scales is not None:
        raise ValueError("scan_blocks requires the default effective-"
                         "params path (no Masking / int8 serving)")
    stacked = (_stacked_block_params(ctx.shared, depth),
               _stacked_block_params(ctx.private, depth))

    def body(h, sl):
        bsh, bpr = sl
        sub = Ctx(mode="apply", train=ctx.train, shared=bsh, private=bpr,
                  compute_dtype=ctx.compute_dtype,
                  act_sharder=ctx.act_sharder,
                  flash_attention=ctx.flash_attention,
                  qkv_fused=ctx.qkv_fused)
        h = vit_block(sub, h, heads_n, head_dim, hidden, causal=causal)
        return ctx.constrain(h, "tokens"), None

    if ctx.scan_remat:
        body = jax.checkpoint(body, prevent_cse=False)
    x, _ = jax.lax.scan(body, x, stacked)
    return x


def vit_cifar(ctx: Ctx, x, num_classes: int, mult: float = 1.0,
              depth: int = 6, dim: int = 256, heads: int = 4,
              patch: int = 4, mlp_ratio: int = 4):
    """ViT for 32x32 inputs. x: (N, 32, 32, 3) NHWC -> logits.

    Pre-LN blocks, mean-pooled tokens (no CLS token: one fewer non-power-of-
    two sequence length for the MXU tiler, and pooling is maskable-weight-
    free anyway). Patch embedding is a sharable conv (ownership-masked like
    every CNN stem). Positional embedding is task-private, like BN affines.
    """
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
    # sequence-parallel seam: under parallel/mesh.act_sharder the token axis
    # shards over the model axis here and at every block boundary — LN and
    # the MLP are per-token (stay local); XLA all-gathers k/v only where
    # attention actually mixes tokens.
    x = ctx.constrain(x, "tokens")
    if ctx.pipeline is not None and ctx.mode == "apply":
        # pipeline-parallel path (parallel/pipeline.make_pipeliner): the
        # homogeneous block stack runs as an S-stage GPipe over the `pipe`
        # mesh axis. Requires the default effective-params path — raw-weight
        # Masking and int8 serving select weights per-layer inside the
        # block, which the staged block_fn does not thread.
        if ctx.masking is not None or ctx.quant_scales is not None:
            raise ValueError("pipeline requires the default effective-"
                             "params path (no Masking / int8 serving)")
        merged = dict(ctx.shared)
        merged.update(ctx.private)
        x = ctx.pipeline(merged, x,
                         dict(heads_n=heads_n, head_dim=head_dim,
                              hidden=hidden), ctx.compute_dtype)
        x = ctx.constrain(x, "tokens")
    elif ctx.scan_blocks and ctx.mode == "apply":
        x = scan_vit_blocks(ctx, x, depth, heads_n, head_dim, hidden)
    else:
        for i in range(depth):
            x = x + attention(ctx, f"blocks/{i}/attn",
                              layernorm(ctx, f"blocks/{i}/ln1", x),
                              heads_n, head_dim)
            x = x + mlp(ctx, f"blocks/{i}/mlp",
                        layernorm(ctx, f"blocks/{i}/ln2", x), hidden)
            x = ctx.constrain(x, "tokens")
    x = layernorm(ctx, "norm", x)
    x = jnp.mean(x.astype(jnp.float32), axis=1)
    return head(ctx, "classifier", x, num_classes)


def vit_b16(ctx: Ctx, x, num_classes: int, mult: float = 1.0):
    """ViT-B/16 @224 (depth 12, dim 768, heads 12 — the standard production
    shape; ~86M params at mult 1.0). Same sharable/growth semantics as
    vit_cifar; timm-pretrained checkpoints load via
    train/pretrained.convert_torch_vit."""
    return vit_cifar(ctx, x, num_classes, mult, depth=12, dim=768, heads=12,
                     patch=16)
