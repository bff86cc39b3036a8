"""Device-mesh parallelism for the CPG train step.

The reference has NO distributed story (SURVEY §2: optional single-process
nn.DataParallel only). The TPU-native replacement: jit auto-SPMD over a
`jax.sharding.Mesh` —

  * `data` axis: batch-sharded inputs; gradient/metric reductions become ICI
    all-reduces inserted by XLA (the NCCL-allreduce analogue). BN batch stats
    are computed with global means -> cross-replica SyncBN for free.
  * `model` axis (optional, for wide grown networks): sharable kernels sharded
    along their output-channel dimension (conv HWIO axis 3, dense axis 1) —
    TP-flavored masked conv whose mask/ownership/piggymask shard identically
    with the weight, so binarize/select/gating stay local; XLA partitions the
    convs and all-gathers activations where needed.

State (params, masks, optimizer) is replicated unless `model_axis_size > 1`.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None, n_dcn: int = 1) -> Mesh:
    """Device mesh for the CPG step.

    Axes: ("data", "model"), or ("dcn", "data", "model") when `n_dcn > 1` —
    the hierarchical pod layout where `dcn` spans slices connected over the
    data-center network and `data`/`model` ride ICI within a slice. The batch
    shards over (dcn, data) jointly (see `batch_sharding`); XLA then lowers
    the gradient/metric reduction as a hierarchical all-reduce: reduce-scatter
    over ICI first, the small cross-slice hop over DCN last.
    """
    devices = devices if devices is not None else jax.devices()
    n_total = (len(devices) // n_dcn // n_model * n_dcn * n_model
               if n_data is None else n_dcn * n_data * n_model)
    n_data = n_total // (n_dcn * n_model)
    if n_dcn > 1:
        dev = np.asarray(devices[:n_total]).reshape(n_dcn, n_data, n_model)
        return Mesh(dev, ("dcn", "data", "model"))
    dev = np.asarray(devices[:n_total]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def _kernel_spec(name: str, ndim: int, model_sharded: bool) -> P:
    """Output-channel sharding for sharable kernels (last axis of HWIO conv
    and (in,out) dense); replicated otherwise."""
    if not model_sharded:
        return P()
    return P(*([None] * (ndim - 1) + ["model"]))


def _expert_spec(ndim: int) -> P:
    """Expert-parallel sharding for stacked MoE kernels (models/moe.py
    smoe: (E, in, out)): the EXPERT axis shards over `model`, so each
    chip holds whole experts and tokens travel to their expert's chip
    (XLA lowers the dispatch einsums to all-to-alls) instead of every
    chip holding a slice of every expert."""
    return P(*(["model"] + [None] * (ndim - 1)))


def shared_shardings(mesh: Mesh, shared, model_sharded: bool = False):
    """Shardings for shared weights AND their parallel pytrees (ownership,
    piggymask — same shapes, same placement).

    Kernel rule under `model_sharded`: output-channel sharding
    (`_kernel_spec`), except keys under an `/experts/` scope — MoE stacked
    kernels — which shard their leading EXPERT axis instead (EP; the mask /
    ownership / piggymask trees shard identically, so binarize/select/gating
    stay chip-local either way). Axes that don't divide evenly stay
    replicated."""
    n_model = dict(mesh.shape).get("model", 1)

    def spec(name: str, w) -> NamedSharding:
        if not model_sharded:
            return NamedSharding(mesh, P())
        if "/experts/" in name and w.shape[0] % n_model == 0:
            return NamedSharding(mesh, _expert_spec(w.ndim))
        return NamedSharding(
            mesh, _kernel_spec(name, w.ndim, w.shape[-1] % n_model == 0))

    if isinstance(shared, dict):
        return {k: spec(k, w) for k, w in shared.items()}
    return jax.tree.map(lambda w: spec("", w), shared)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def act_sharder(mesh: Mesh, tokens: bool = False, experts: bool = False):
    """Activation-sharding hook for models (framework.Ctx.act_sharder).

    Returns a callable (array, tag) -> array applying
    `jax.lax.with_sharding_constraint` at the model's labeled seams:

      * tag `"tokens"` on (N, T, D) transformer activations — SEQUENCE
        PARALLELISM: batch over the data axes, the token axis over `model`.
        LayerNorm / MLPs / routers are per-token and stay chip-local; XLA
        inserts all-gathers only around attention's token mixing.
      * tag `"experts"` on (N, E, C, D) MoE dispatch tensors — EXPERT
        PARALLELISM: the expert axis over `model`, matching the
        expert-kernel layout of `shared_shardings` so each expert's FFN
        runs on the chip that owns its weights.

    Constraints are skipped for arrays whose axis doesn't divide the mesh
    (e.g. an old task evaluated at a pre-growth expert count)."""
    data_axes = tuple(a for a in ("dcn", "data") if a in mesh.axis_names)
    n_model = dict(mesh.shape).get("model", 1)
    specs = {}
    if tokens:
        specs["tokens"] = (1, NamedSharding(
            mesh, P(data_axes, "model", None)))
    if experts:
        specs["experts"] = (1, NamedSharding(
            mesh, P(data_axes, "model", None, None)))

    def shard(x, tag):
        if tag not in specs:
            return x
        axis, sh = specs[tag]
        if x.ndim != len(sh.spec) or x.shape[axis] % n_model != 0:
            return x
        return jax.lax.with_sharding_constraint(x, sh)

    return shard


def batch_sharding(mesh: Mesh):
    """Batch axis sharded over every data-flavored mesh axis (dcn included)."""
    axes = tuple(a for a in ("dcn", "data") if a in mesh.axis_names)
    return NamedSharding(mesh, P(axes))


def shard_batch(mesh: Mesh, x, y):
    """Place a host batch onto the mesh, sharded along the data axis."""
    bs = batch_sharding(mesh)
    return jax.device_put(x, bs), jax.device_put(y, bs)


def place_state(mesh: Mesh, tree, sharding=None):
    """Replicate (or custom-shard) a state pytree across the mesh."""
    if sharding is None:
        sharding = replicated(mesh)
    if isinstance(sharding, NamedSharding):
        return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
    return jax.tree.map(jax.device_put, tree, sharding)


def opt_state_shardings(mesh: Mesh, opt_state):
    """Sharding tree of an ALREADY-PLACED optimizer state: mesh-resident
    leaves (momenta/Adam moments initialized from placed params via
    zeros_like) keep their sharding; everything else (hyperparam scalars,
    counts — SingleDeviceSharding from eager init) maps to replicated."""
    rep = replicated(mesh)
    return jax.tree.map(
        lambda a: a.sharding
        if (isinstance(getattr(a, "sharding", None), NamedSharding)
            and a.sharding.mesh == mesh) else rep,
        opt_state)


def make_parallel_train_step(step_fn, mesh: Mesh, model_sharded: bool = False,
                             shared_template=None, has_piggymask: bool = True,
                             opt_shardings=None, compiler_options=None):
    """Re-jit a built train step with mesh shardings.

    `step_fn` is the UNJITTED step, the full 12-arg shared signature from
    train/step.py: (shared, piggymask, private, bn_state, opt_w, opt_pm,
    ownership, task_id, x, y, rng, it). Inputs x/y are data-sharded;
    everything else replicated — `it` (the global step driving annealed
    losses, e.g. A-Softmax lambda) rides along replicated so the face
    experiment runs data-parallel unchanged. XLA inserts psum for
    grads/metrics/BN stats.

    `model_sharded=True` (needs `shared_template`, the shared pytree, for its
    leaf shapes): sharable kernels — and their parallel ownership/piggymask
    trees — shard along output channels on the `model` axis
    (`shared_shardings`), the TP layout for wide grown networks. Optimizer
    states are left UNCONSTRAINED (`None` in_shardings = infer from the
    committed inputs): init them from the already-placed params
    (`Manager.reset_optimizers` does) and momentum/Adam moments inherit the
    matching shardings via zeros_like.
    """
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    if model_sharded:
        if shared_template is None:
            raise ValueError("model_sharded=True needs shared_template")
        ksh = shared_shardings(mesh, shared_template, model_sharded=True)
        pm_sh = ksh if has_piggymask else rep
        ow_sh, opm_sh = opt_shardings if opt_shardings is not None else (None,
                                                                         None)
        in_shardings = (ksh, pm_sh, rep, rep, ow_sh, opm_sh, ksh, rep, bsh,
                        bsh, rep, rep)
        # outputs MUST be pinned to the input layout: the step's outputs feed
        # the next call's donated inputs, and XLA's auto-spmd would otherwise
        # pick fresh layouts (e.g. model-sharding a private head kernel) that
        # then mismatch the explicit in_shardings.
        out_shardings = (ksh, pm_sh, rep, rep, ow_sh, opm_sh, rep)
        return jax.jit(step_fn, in_shardings=in_shardings,
                       out_shardings=out_shardings,
                       donate_argnums=(0, 1, 2, 3, 4, 5),
                       compiler_options=compiler_options)
    # shardings resolved lazily per-arg by jit when given as trees of
    # NamedSharding; replicated for state, data-sharded for the batch.
    in_shardings = (rep, rep, rep, rep, rep, rep, rep, rep, bsh, bsh, rep,
                    rep)
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        donate_argnums=(0, 1, 2, 3, 4, 5),
        compiler_options=compiler_options,
    )


def make_parallel_eval_step(eval_fn, mesh: Mesh, model_sharded: bool = False,
                            shared_template=None, has_piggymask: bool = True,
                            compiler_options=None):
    """Jit the UNJITTED eval step (train/step.py build_eval_step signature:
    shared, piggymask, private, bn_state, ownership, task_id, x, y) with
    replicated (or TP-sharded, see make_parallel_train_step) state and
    data-sharded batches."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    if model_sharded:
        if shared_template is None:
            raise ValueError("model_sharded=True needs shared_template")
        ksh = shared_shardings(mesh, shared_template, model_sharded=True)
        # piggymask is UNCONSTRAINED (None = infer): eval serves EVERY task
        # from one program, and task 1's piggymask is `{}` — a fixed dict
        # sharding tree would mismatch it. The current task's placed mask
        # keeps its TP sharding; host-resident masks of other tasks are
        # placed by jit on first use.
        in_shardings = (ksh, None, rep, rep, ksh, rep, bsh, bsh)
    else:
        in_shardings = (rep, rep, rep, rep, rep, rep, bsh, bsh)
    return jax.jit(eval_fn, in_shardings=in_shardings,
                   compiler_options=compiler_options)
