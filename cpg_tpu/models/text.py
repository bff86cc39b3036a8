"""Sharable text-classification transformer — CPG on a second modality.

No reference counterpart (ref is vision-only); exists to prove the engine's
masking/pruning/growth semantics are modality-generic: the token embedding
TABLE is itself a sharable masked kernel (framework.sembed — vocab rows are
owned/pruned/picked exactly like conv channels), the blocks are the same
sharable attention/MLP stack as models/vit.py (same transformer growth law:
embed dim fixed, capacity = new heads + MLP hidden units), and the usual
task-private LN/pos/head split applies.

Sequence classification (tokens (N, T) -> logits (N, C)) rather than
next-token LM so the whole train/eval/serving stack (Manager, losses,
TaskServer) is reused unchanged — the reference's Manager contract is
classification-shaped and this family honors it.

TPU notes: static T, all compute in the same bf16 MXU GEMMs as the ViT; the
embedding gather is bandwidth-trivial next to the block GEMMs. `causal=True`
masks attention scores lower-triangularly (in-graph, no dynamic shapes) for
order-sensitive tasks.
"""

from __future__ import annotations

import jax.numpy as jnp

from .framework import Ctx, head, layernorm, normal_init, sembed
from .vit import _heads, attention, mlp


def textcls(ctx: Ctx, tokens, num_classes: int, mult: float = 1.0,
            depth: int = 4, dim: int = 128, heads: int = 4,
            vocab: int = 256, causal: bool = False):
    """tokens: (N, T) int -> logits (N, num_classes)."""
    n, t = tokens.shape
    head_dim = dim // heads
    heads_n = _heads(heads, mult)
    hidden = max(1, int(dim * 4 * mult))
    x = sembed(ctx, "embed", tokens, vocab, dim)
    pos = ctx.private_param("embed/pos", (t, dim), normal_init(0.02))
    x = (x + pos).astype(ctx.compute_dtype)
    # sequence-parallel seam, same as models/vit.py: under
    # parallel/mesh.act_sharder the token axis shards over the model axis
    # here and at every block boundary
    x = ctx.constrain(x, "tokens")
    if ctx.scan_blocks and ctx.mode == "apply":
        # same homogeneous stack as models/vit.py -> same lax.scan lowering
        # (one block body in the HLO instead of `depth` unrolled copies)
        from .vit import scan_vit_blocks

        x = scan_vit_blocks(ctx, x, depth, heads_n, head_dim, hidden,
                            causal=causal)
    else:
        for i in range(depth):
            x = x + attention(ctx, f"blocks/{i}/attn",
                              layernorm(ctx, f"blocks/{i}/ln1", x),
                              heads_n, head_dim, causal=causal)
            x = x + mlp(ctx, f"blocks/{i}/mlp",
                        layernorm(ctx, f"blocks/{i}/ln2", x), hidden)
            x = ctx.constrain(x, "tokens")
    x = layernorm(ctx, "norm", x)
    x = jnp.mean(x.astype(jnp.float32), axis=1)
    return head(ctx, "classifier", x, num_classes)
