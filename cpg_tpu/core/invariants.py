"""State invariant checks — the sanitizer this stack gets instead of the
reference's nothing (SURVEY §5: no race detection/sanitizers exist upstream;
here the failure modes worth guarding are ownership-bookkeeping corruption
and NaN drift inside the jitted step).

`check_state` is a host-side audit run at phase boundaries (cheap relative to
a training phase); `assert_finite_tree` can be folded into steps via
jax.debug/checkify when hunting NaNs.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from .state import CPGState


class InvariantViolation(AssertionError):
    pass


def check_state(state: CPGState, strict: bool = True,
                expect_zero_free: bool = None) -> List[str]:
    """Audit the CPG bookkeeping. Returns violation strings ([] if clean);
    raises InvariantViolation when strict.

    Invariants:
      I1 ownership values are in [0, num_tasks]
      I2 free (ownership==0) weights are exactly zero
      I3 shared weights and piggymasks are finite
      I4 every task's piggymask matches the shared tree's shapes
      I5 shared/ownership pytrees have identical structure and shapes

    I2 scope: two legitimate transients hold fresh kaiming init on FREE
    entries — a fresh init_state before the first start_task, and the window
    between grow_state and the next start_task (grown capacity keeps its
    fresh init until claimed, matching the reference's rebuild-wider init;
    the train step pins FREE at zero, so these values are invisible to every
    forward and vanish at the first claimed train step). `expect_zero_free`
    defaults to auto: I2 is enforced once any task exists (pruned/released
    entries MUST be zero), skipped on virgin states; pass False explicitly
    when auditing mid-transient after grow_state.
    """
    if expect_zero_free is None:
        expect_zero_free = state.num_tasks > 0
    v = []
    n = state.num_tasks
    for k, own in state.ownership.items():
        if k not in state.shared:
            v.append(f"I5: ownership key {k} missing from shared")
            continue
        w = state.shared[k]
        if tuple(own.shape) != tuple(w.shape):
            v.append(f"I5: {k} ownership{own.shape} != weight{w.shape}")
            continue
        mx, mn = int(own.max()), int(own.min())
        if mn < 0 or mx > n:
            v.append(f"I1: {k} ownership range [{mn},{mx}] outside [0,{n}]")
        if expect_zero_free:
            leak = float(jnp.abs(jnp.where(own == 0, w, 0)).max())
            if leak != 0.0:
                v.append(f"I2: {k} free weights nonzero (max |w|={leak:g})")
        if not bool(jnp.all(jnp.isfinite(w))):
            v.append(f"I3: {k} non-finite shared weights")
    for tid, t in state.tasks.items():
        if t.piggymask is None:
            continue
        for k, pm in t.piggymask.items():
            if k not in state.shared:
                v.append(f"I4: task {tid} piggymask key {k} not in shared")
            elif tuple(pm.shape) != tuple(state.shared[k].shape):
                v.append(f"I4: task {tid} {k} piggymask{pm.shape} != "
                         f"weight{state.shared[k].shape}")
            elif not bool(jnp.all(jnp.isfinite(pm))):
                v.append(f"I3: task {tid} {k} non-finite piggymask")
    if v and strict:
        raise InvariantViolation("; ".join(v))
    return v


def checkified(step_fn):
    """Wrap a (possibly jitted) step with jax.experimental.checkify float
    checks — NaN/inf inside the compiled step surfaces as a host-readable
    error instead of silent corruption. Debug tool: adds overhead; not for
    production steps.

    usage:
        err_step = checkified(raw_step)
        err, out = jax.jit(err_step)(*args)
        err.throw()   # raises with the failing op's location
    """
    from jax.experimental import checkify

    return checkify.checkify(step_fn, errors=checkify.float_checks)
