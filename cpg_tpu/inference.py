"""Task-conditioned inference — the public predict() API.

Reference semantics (ref --mode inference, SURVEY §3.4): restore the task's
piggymask + private BN/bias/head, zero out weights with ownership 0 or > t,
forward with binarize(piggymask_t) ⊙ w, pick head t.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

from .core.state import CPGState
from .models import framework as fw
from .models import get_model
from .ops.masked import effective_params


def predict(state: CPGState, task_id: int, x, preprocess_fn=None,
            compute_dtype=None, model_kwargs=None):
    """Logits for `x` under task `task_id`'s view of the network.

    `model_kwargs` overrides the task's stored forward kwargs — e.g.
    head_type='none' to extract SphereNet embeddings for LFW verification."""
    task = state.tasks[task_id]
    model_fn, _ = get_model(state.arch)
    if preprocess_fn is not None:
        x = preprocess_fn(x)
    eff = effective_params(
        state.shared, state.ownership, task.piggymask, task_id,
        state.threshold, compute_dtype=compute_dtype,
        mask_mode=getattr(state, "mask_mode", "binary"),
    )
    mkw = state.forward_kwargs(task_id, override=model_kwargs)
    logits, _ = fw.apply(
        model_fn, eff, task.private, task.bn_state, x, train=False,
        compute_dtype=compute_dtype or _float_dtype_of(x),
        num_classes=task.num_classes, mult=state.width_mult, **mkw,
    )
    return logits


def _float_dtype_of(x):
    """Default compute dtype from the input: its own dtype when floating,
    f32 otherwise (integer TOKEN inputs — models/text.py — must not drag the
    whole model into int arithmetic)."""
    dt = jnp.asarray(x).dtype
    return dt if jnp.issubdtype(dt, jnp.floating) else jnp.float32


def make_predict_fn(state: CPGState, task_id: int, preprocess_fn=None,
                    compute_dtype=None):
    """A jittable closure over the task's (frozen) view — for serving."""
    task = state.tasks[task_id]
    model_fn, _ = get_model(state.arch)
    mult, nc, thr = state.width_mult, task.num_classes, state.threshold
    mkw = state.forward_kwargs(task_id)

    @jax.jit
    def fn(shared, ownership, piggymask, private, bn_state, x):
        xx = preprocess_fn(x) if preprocess_fn is not None else x
        eff = effective_params(shared, ownership, piggymask, task_id, thr,
                               compute_dtype=compute_dtype,
                               mask_mode=getattr(state, "mask_mode", "binary"))
        logits, _ = fw.apply(
            model_fn, eff, private, bn_state, xx, train=False,
            compute_dtype=compute_dtype or _float_dtype_of(xx),
            num_classes=nc, mult=mult, **mkw,
        )
        return logits

    return partial(fn, state.shared, state.ownership, task.piggymask,
                   task.private, task.bn_state)
