"""CLI entry: ``python -m si_mamba_tpu.train.cli --config <yaml> [...]``.

Mirrors the reference's main.py/utils/parser.py surface: --test, --resume,
--finetune_model (pretrain ckpt), --ckpts, --vote, few-shot --way/--shot/
--fold, experiment dir layout, config snapshot, seed control. The reference
YAML configs (cfgs/*.yaml) load unchanged.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from si_mamba_tpu.data.datasets import build_dataset
from si_mamba_tpu.data.loader import Loader
from si_mamba_tpu.train.config import ConfigDict, get_config, save_experiment_config
from si_mamba_tpu.train.logging_utils import get_logger, print_log


def get_args(argv=None):
    p = argparse.ArgumentParser("si-mamba-tpu")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--exp_name", type=str, default="default")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--tsne", action="store_true",
                   help="t-SNE scatter of test-set features (reference "
                        "test_tsne, tools/runner_finetune.py:615-631)")
    p.add_argument("--vote", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from the experiment's ckpt-last when one "
                        "exists, start fresh otherwise (preemption-safe "
                        "relaunch; beyond-reference)")
    p.add_argument("--ckpts", type=str, default=None)
    p.add_argument("--finetune_model", type=str, default=None,
                   help="pretrain checkpoint (orbax dir or torch .pth)")
    p.add_argument("--scratch_model", action="store_true")
    p.add_argument("--way", type=int, default=-1)
    p.add_argument("--shot", type=int, default=-1)
    p.add_argument("--fold", type=int, default=-1)
    p.add_argument("--val_freq", type=int, default=1)
    p.add_argument("--num_workers", type=int, default=4)
    args = p.parse_args(argv)
    if args.test and args.resume:
        raise ValueError("--test and --resume cannot be both activated")
    stem = os.path.splitext(os.path.basename(args.config))[0]
    args.experiment_path = os.path.join("experiments", stem, args.exp_name)
    os.makedirs(args.experiment_path, exist_ok=True)
    return args


def _dataset_kwargs(dcfg: ConfigDict, args, subset: str) -> tuple[str, dict]:
    base = dcfg["_base_"]
    others = dcfg.get("others", ConfigDict())
    name = base["NAME"]
    npoints = others.get("npoints")
    if name == "ShapeNet":
        return name, dict(data_path=base["DATA_PATH"], pc_path=base["PC_PATH"],
                          subset=others.get("subset", subset),
                          npoints=npoints or base.get("N_POINTS", 1024),
                          whole=bool(others.get("whole", subset == "train")))
    if name == "ModelNet":
        return name, dict(data_path=base["DATA_PATH"],
                          subset=others.get("subset", subset),
                          npoints=base.get("N_POINTS", 8192),
                          num_category=base.get("NUM_CATEGORY", 40),
                          use_normals=bool(base.get("USE_NORMALS", False)))
    if name == "ModelNet40SVM":
        return name, dict(data_path=base["DATA_PATH"],
                          partition=others.get("partition", subset),
                          num_points=others.get("num_points", 2048))
    if name in ("ScanObjectNN", "ScanObjectNN_hardest"):
        return name, dict(root=base["ROOT"], subset=others.get("subset", subset))
    if name == "ModelNetFewShot":
        return name, dict(data_path=base["DATA_PATH"],
                          subset=others.get("subset", subset),
                          way=args.way, shot=args.shot, fold=args.fold)
    raise KeyError(name)


def build_loader(dcfg, args, subset: str, batch_size: int, shuffle: bool,
                 drop_last: bool) -> Loader:
    import jax

    name, kwargs = _dataset_kwargs(dcfg, args, subset)
    ds = build_dataset(name, **kwargs)
    return Loader(ds, batch_size=batch_size, shuffle=shuffle, drop_last=drop_last,
                  seed=args.seed, process_index=jax.process_index(),
                  process_count=jax.process_count(),
                  prefetch=max(int(args.num_workers), 0),
                  num_workers=max(int(args.num_workers), 1))


def _archive_source(exp_dir: str) -> None:
    """Snapshot the package source into the experiment dir (reference
    ``archive_project_files_tar``, main.py:17-31)."""
    import tarfile

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(exp_dir, "source_snapshot.tar.gz")
    try:
        with tarfile.open(out, "w:gz") as tar:
            tar.add(pkg_root, arcname="si_mamba_tpu",
                    filter=lambda ti: None if ti.name.endswith((".so", ".pyc"))
                    else ti)
    except OSError:
        pass


def _load_pretrained(path: str):
    """Accept either a torch .pth (importer) or an orbax checkpoint dir."""
    if path.endswith(".pth"):
        from si_mamba_tpu.utils.torch_import import load_pointmamba_checkpoint

        variables, _ = load_pointmamba_checkpoint(path)
        return variables
    from si_mamba_tpu.train.checkpoint import load_checkpoint

    payload = load_checkpoint(os.path.dirname(path) or ".", os.path.basename(path))
    return {"params": payload["params"], "batch_stats": payload["batch_stats"]}


def _should_auto_resume(args, snapshot: str) -> bool:
    """Preemption-safe restarts (beyond-reference, SURVEY §5.3): with
    --auto_resume a relaunched job resumes from the experiment's ckpt-last
    when one exists (plus its config snapshot) and starts fresh otherwise —
    a preempted/requeued run needs no operator decision. Inert when the
    experiment dir is empty; --resume keeps strict fail-if-absent
    semantics."""
    return (getattr(args, "auto_resume", False) and not args.test
            and not args.resume
            and os.path.exists(os.path.join(args.experiment_path, "ckpt-last"))
            and os.path.exists(snapshot))


def main(argv=None):
    # Honor JAX_PLATFORMS even when a sitecustomize hook pre-imported jax
    # with a different platform (the axon-tunnel environment does): env
    # vars are read at import, but jax.config still applies until the
    # backend is first USED — without this, `JAX_PLATFORMS=cpu python -m
    # si_mamba_tpu.train.cli ...` (the documented CPU soak recipe) would
    # silently run on the pre-selected TPU backend.
    _plat = os.environ.get("JAX_PLATFORMS")
    if _plat:
        import jax

        jax.config.update("jax_platforms", _plat)

    # Multi-host rendezvous MUST precede any other jax use (reference
    # main.py:53 init_dist before everything); env-gated no-op single-host.
    from si_mamba_tpu.parallel import maybe_initialize_distributed, per_process_batch

    maybe_initialize_distributed()
    args = get_args(argv)
    snapshot = os.path.join(args.experiment_path, "config.yaml")
    if getattr(args, "auto_resume", False):
        import jax

        auto = _should_auto_resume(args, snapshot)
        if jax.process_count() > 1:
            # the decision must be GLOBAL: only the primary host persists
            # checkpoints, so per-process filesystem checks diverge on pods
            # without a shared FS — a split decision desyncs the collective
            # train/eval/save steps. Take process 0's verdict everywhere.
            from jax.experimental import multihost_utils

            auto = bool(multihost_utils.broadcast_one_to_all(
                np.int32(auto)))
        if auto:
            args.resume = True
            print(f"[AUTO-RESUME] ckpt-last found in {args.experiment_path}")
    if args.resume:
        # resume re-reads the experiment's saved config, not the CLI one
        # (reference utils/config.py:48-54)
        if not os.path.exists(snapshot):
            raise FileNotFoundError(f"cannot resume: {snapshot} not found")
        args.config = snapshot
    config = get_config(args.config)
    logger = get_logger("si_mamba_tpu",
                        os.path.join(args.experiment_path,
                                     f"{time.strftime('%Y%m%d_%H%M%S')}.log"))
    if args.resume:
        print_log(f"[RESUME] config re-read from {snapshot}", logger)
    else:
        save_experiment_config(config, snapshot)
    _archive_source(args.experiment_path)
    np.random.seed(args.seed)

    model_name = config.model.NAME
    # total_bs is the GLOBAL batch; each process loads its 1/P slice and
    # shard_batch reassembles (reference main.py:72-86 per-rank split).
    bs = per_process_batch(int(config.total_bs))
    if args.way > 0:  # few-shot: the classifier width equals the way count
        config.model.cls_dim = args.way
    if args.scratch_model:  # train from scratch: ignore any pretrain ckpt
        args.finetune_model = None
    if args.deterministic:
        # JAX compute is deterministic under fixed keys; this flag just pins
        # the python/numpy side too (reference --deterministic = cuDNN knob)
        print_log(f"[ARGS] deterministic run, seed={args.seed}", logger)

    if model_name == "PartSegModel":
        import jax

        from si_mamba_tpu.data.shapenetpart import PartNormalDataset, PartSegLoader
        from si_mamba_tpu.models.segmentation import PartSegConfig
        from si_mamba_tpu.train.runner_seg import seg_run

        root = config.data_root
        npts = int(config.npoints)
        train_ds = PartNormalDataset(root, npoints=npts, split="trainval",
                                     seed=args.seed)
        test_ds = PartNormalDataset(root, npoints=npts, split="test",
                                    seed=args.seed)
        mk = lambda ds, sh: PartSegLoader(ds, bs, shuffle=sh, drop_last=sh,
                                          seed=args.seed,
                                          process_index=jax.process_index(),
                                          process_count=jax.process_count())
        seg_cfg = PartSegConfig(**{k: (tuple(v) if k == "fetch_idx" else v)
                                   for k, v in config.model.items()
                                   if k in PartSegConfig.__dataclass_fields__})
        pretrained = (_load_pretrained(args.finetune_model)
                      if args.finetune_model else None)
        seg_run(seg_cfg, mk(train_ds, True), mk(test_ds, False),
                args.experiment_path, epochs=int(config.max_epoch),
                lr=float(config.optimizer.kwargs.lr),
                weight_decay=float(config.optimizer.kwargs.get("weight_decay", 0.0)),
                warmup_epochs=int(config.scheduler.kwargs.initial_epochs),
                pretrained_variables=pretrained, logger=logger, seed=args.seed,
                resume=args.resume,
                async_ckpt=bool(config.get("async_ckpt", False)))
        return

    if model_name == "Point_MAE_Mamba":
        from si_mamba_tpu.train.runner_pretrain import pretrain_run

        train_loader = build_loader(config.dataset.train, args, "train", bs,
                                    shuffle=True, drop_last=True)
        svm_loaders = None
        if config.dataset.get("svm") is not None:
            svm_loaders = (
                build_loader(config.dataset.svm.train, args, "train", 64, True, False),
                build_loader(config.dataset.svm.test, args, "test", 64, False, False),
            )
        pretrain_run(config, train_loader, svm_loaders, args.experiment_path,
                     resume=args.resume, logger=logger, seed=args.seed,
                     val_freq=args.val_freq)
        return

    from si_mamba_tpu.train.runner_finetune import finetune_run, test_run, tsne_run

    if args.test or args.tsne:
        from si_mamba_tpu.models import PointMamba, PointMambaConfig
        from si_mamba_tpu.train.checkpoint import load_checkpoint
        from si_mamba_tpu.train.optim import build_optimizer
        from si_mamba_tpu.train.train_state import TrainState
        import jax
        import jax.numpy as jnp

        test_loader = build_loader(config.dataset.test, args, "test", bs,
                                   shuffle=False, drop_last=False)
        model_cfg = PointMambaConfig.from_dict(config.model)
        model = PointMamba(model_cfg)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((2, int(config.npoints), 3)), train=False)
        if args.ckpts:
            pre = _load_pretrained(args.ckpts)
            variables = {"params": pre["params"],
                         "batch_stats": pre.get("batch_stats",
                                                variables["batch_stats"])}
        tx, _ = build_optimizer(variables["params"])
        state = TrainState.create(variables["params"], variables["batch_stats"], tx)
        if args.tsne:
            tsne_run(config, test_loader, state,
                     os.path.join(args.experiment_path, "tsne.png"),
                     logger=logger)
        else:
            test_run(config, test_loader, state, vote=args.vote, logger=logger)
        return

    train_loader = build_loader(config.dataset.train, args, "train", bs,
                                shuffle=True, drop_last=True)
    val_loader = build_loader(config.dataset.val, args, "test", bs * 2,
                              shuffle=False, drop_last=False)
    pretrained = _load_pretrained(args.finetune_model) if args.finetune_model else None
    finetune_run(config, train_loader, val_loader, args.experiment_path,
                 pretrained_variables=pretrained, resume=args.resume,
                 vote=args.vote, logger=logger, seed=args.seed)


if __name__ == "__main__":
    main()
