"""Pipeline parallelism (PP) for homogeneous transformer stacks.

The reference has no distributed story at all (SURVEY §2); DP/TP live in
parallel/mesh.py. This module adds the third axis: GPipe-style pipelining of
the encoder blocks over a `pipe` mesh axis — for models too DEEP to replicate,
where TP's per-layer all-gathers would ride slow links, PP moves one
activation per boundary instead.

TPU-native shape: `jax.shard_map` over the pipe axis; each chip holds
depth/S consecutive blocks (the stacked block params are sharded on their
leading block axis — a pure layout annotation, no scatter code), microbatches
flow through the ring via `lax.ppermute`, and the whole schedule is ONE
`lax.fori_loop` of M + S - 1 ticks compiled into a single XLA program — no
host round-trips between ticks, static shapes everywhere, dead ticks masked
with `jnp.where` instead of control flow.

CPG semantics ride along unchanged: the blocks consume PRE-MASKED effective
params (ops/masked.effective_params — the same tensors every other path
consumes), so ownership/piggymask selection is identical; the stacked layout
is just a transpose of the flat `blocks/{i}/...` dict.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def make_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    """A 1-D ("pipe",) mesh of `n_stages` devices."""
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n_stages:
        raise ValueError(f"pipeline needs {n_stages} devices, "
                         f"only {len(devices)} available")
    return Mesh(np.asarray(devices[:n_stages]), ("pipe",))


def stack_block_params(tree: Dict[str, jax.Array], depth: int,
                       prefix: str = "blocks/"):
    """Transpose {"blocks/i/rest": leaf} into stacked {"rest": (depth, ...)}.

    Returns (stacked, passthrough) — passthrough holds every key outside
    `prefix` (patch embed, final norm, head, ...), untouched. Works on
    effective shared params and private params alike; merge the two dicts
    first when the block math needs both (vit_block reads LN affines from
    the same lookup)."""
    cols: Dict[str, list] = {}
    rest: Dict[str, jax.Array] = {}
    for k, v in tree.items():
        if k.startswith(prefix):
            i, sub = k[len(prefix):].split("/", 1)
            cols.setdefault(sub, [None] * depth)[int(i)] = v
        else:
            rest[k] = v
    for sub, vs in cols.items():
        missing = [i for i, v in enumerate(vs) if v is None]
        if missing:
            raise ValueError(f"block param {sub!r} missing for blocks "
                             f"{missing} (depth={depth})")
    return {k: jnp.stack(v) for k, v in cols.items()}, rest


def _default_block_fn(params: Dict[str, jax.Array], x, compute_dtype,
                      block_kwargs):
    """Apply one ViT encoder block from a per-block param dict (relative
    names: attn/..., ln1/..., mlp/..., ln2/...)."""
    from ..models.framework import Ctx
    from ..models.vit import vit_block

    ctx = Ctx(mode="apply", train=False, shared=params, private=params,
              bn_state={}, compute_dtype=compute_dtype)
    return vit_block(ctx, x, **block_kwargs)


def pipeline_blocks(mesh: Mesh, stacked: Dict[str, jax.Array], x,
                    n_micro: int, block_kwargs: Optional[dict] = None,
                    block_fn: Callable = _default_block_fn,
                    compute_dtype=jnp.float32, axis: str = "pipe"):
    """Run `depth` stacked blocks over `x` (N, T, D) as an S-stage GPipe.

    S = mesh.shape[axis]; depth % S == 0 (each stage scans depth/S blocks);
    N % n_micro == 0. Microbatch m enters stage 0 at tick m and leaves stage
    S-1 at tick m + S - 1; the loop runs n_micro + S - 1 ticks. Bubble
    fraction = (S-1)/(M+S-1) — pick n_micro >> S in production.

    Returns the block-stack output, replicated (identical on every stage —
    the last stage's rows are psum-broadcast around the ring)."""
    S = int(dict(mesh.shape)[axis])
    depth = next(iter(stacked.values())).shape[0]
    if depth % S:
        raise ValueError(f"depth {depth} not divisible by {S} stages")
    n = x.shape[0]
    if n % n_micro:
        raise ValueError(f"batch {n} not divisible by n_micro {n_micro}")
    xm = x.reshape((n_micro, n // n_micro) + x.shape[1:])
    bkw = block_kwargs or {}
    perm = [(i, (i + 1) % S) for i in range(S)]

    def local_fn(params_local, xm):
        idx = jax.lax.axis_index(axis)

        def run_stage(xin):
            def body(c, p):
                return block_fn(p, c, compute_dtype, bkw), None

            y, _ = jax.lax.scan(body, xin, params_local)
            return y

        def tick(t, carry):
            buf, outs = carry
            first = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
            y = run_stage(jnp.where(idx == 0, first, buf))
            slot = jnp.clip(t - (S - 1), 0, n_micro - 1)
            valid = jnp.logical_and(idx == S - 1, t >= S - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, slot, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, y, cur), slot, 0)
            return jax.lax.ppermute(y, axis, perm), outs

        # carries live in the BLOCK-OUTPUT dtype, not the input dtype: a
        # bf16 token stream through f32 compute promotes at the residual
        # add, and a mismatched carry dtype fails inside the fori_loop
        odt = jnp.result_type(xm.dtype, compute_dtype)
        buf = jnp.zeros(xm.shape[1:], odt)
        outs = jnp.zeros(xm.shape, odt)
        # the carries BECOME device-varying inside the loop (ppermute /
        # stage-local writes); the replicated zeros must be pre-marked
        # or the varying-manual-axes check rejects the fori_loop carry
        if hasattr(jax.lax, "pcast"):
            buf, outs = jax.lax.pcast((buf, outs), axis, to="varying")
        elif hasattr(jax.lax, "pvary"):  # pre-pcast jax
            buf, outs = jax.lax.pvary((buf, outs), (axis,))
        _, outs = jax.lax.fori_loop(0, n_micro + S - 1, tick, (buf, outs))
        # only stage S-1 holds real rows; psum broadcasts them around the
        # ring so the output is replicated (out_specs P())
        return jax.lax.psum(outs, axis)

    out = _shard_map(local_fn, mesh=mesh, in_specs=(P(axis), P()),
                     out_specs=P())(stacked, xm)
    return out.reshape(x.shape)


def make_pipeliner(mesh: Mesh, n_micro: int, depth: int,
                   block_fn: Callable = _default_block_fn,
                   axis: str = "pipe") -> Callable:
    """The production PP hook: a callable for `TrainConfig.pipeliner` /
    `Ctx.pipeline` that models invoke on their homogeneous block stack.

    Signature models see: `(merged_params, tokens, block_kwargs,
    compute_dtype) -> tokens`, where merged_params is the model's flat
    {**effective_shared, **private} dict (the stacking transpose happens
    in-graph — a pure layout op XLA folds away). TRAINABLE: the whole
    schedule is reverse-differentiable (static-trip fori_loop scans; the
    scan transpose IS the microbatch gradient accumulation of GPipe — each
    tick's backward adds its contribution into the stacked param cotangent),
    so jax.value_and_grad over a loss through this hook returns exact
    per-parameter grads and the full CPG train step (ownership gating,
    piggymask grads, optimizers) runs unchanged. Parity vs sequential
    training: tests/test_pipeline_train.py."""
    def run(merged, tokens, block_kwargs, compute_dtype=jnp.float32):
        stacked, _ = stack_block_params(merged, depth)
        return pipeline_blocks(mesh, stacked, tokens, n_micro,
                               block_kwargs=block_kwargs, block_fn=block_fn,
                               compute_dtype=compute_dtype, axis=axis)

    return run
