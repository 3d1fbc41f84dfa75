"""CLI surface tests: arg parsing, dataset-config mapping, experiment dirs."""

import os

import pytest

from si_mamba_tpu.train.cli import _dataset_kwargs, get_args
from si_mamba_tpu.train.config import ConfigDict, _to_config


def test_get_args_defaults(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = get_args(["--config", "cfgs/finetune_modelnet.yaml"])
    assert args.experiment_path.endswith(os.path.join("finetune_modelnet", "default"))
    assert os.path.isdir(args.experiment_path)
    assert args.way == -1 and not args.test


def test_get_args_test_resume_exclusive(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(ValueError):
        get_args(["--config", "x.yaml", "--test", "--resume"])


def _dcfg(d):
    return _to_config(ConfigDict(d))


def test_dataset_kwargs_mapping():
    args = type("A", (), {"way": 5, "shot": 10, "fold": 2})()
    name, kw = _dataset_kwargs(_dcfg({
        "_base_": {"NAME": "ShapeNet", "DATA_PATH": "dp", "PC_PATH": "pc",
                   "N_POINTS": 1024},
        "others": {"subset": "train", "npoints": 1024, "whole": True}}), args, "train")
    assert name == "ShapeNet" and kw["whole"] is True and kw["pc_path"] == "pc"

    name, kw = _dataset_kwargs(_dcfg({
        "_base_": {"NAME": "ScanObjectNN_hardest", "ROOT": "r"},
        "others": {"subset": "test"}}), args, "test")
    assert name == "ScanObjectNN_hardest" and kw == {"root": "r", "subset": "test"}

    name, kw = _dataset_kwargs(_dcfg({
        "_base_": {"NAME": "ModelNetFewShot", "DATA_PATH": "fs"},
        "others": {"subset": "train"}}), args, "train")
    assert kw["way"] == 5 and kw["shot"] == 10 and kw["fold"] == 2

    name, kw = _dataset_kwargs(_dcfg({
        "_base_": {"NAME": "ModelNet40SVM", "DATA_PATH": "d"},
        "others": {"partition": "train", "num_points": 2048}}), args, "train")
    assert kw["partition"] == "train" and kw["num_points"] == 2048


def test_model_registry_builds():
    from si_mamba_tpu.train.registry import build_model_from_cfg

    model, cfg = build_model_from_cfg({
        "NAME": "PointMamba", "trans_dim": 32, "depth": 2, "cls_dim": 4,
        "group_size": 8, "num_group": 16, "encoder_dims": 32, "knn_graph": 4})
    assert cfg.trans_dim == 32 and cfg.depth == 2

    model, cfg = build_model_from_cfg({
        "NAME": "Point_MAE_Mamba", "group_size": 8, "num_group": 16,
        "loss": "cdl2",
        "transformer_config": {"trans_dim": 32, "encoder_dims": 32, "depth": 2,
                               "decoder_depth": 1, "mask_ratio": 0.6,
                               "knn_graph": 4}})
    assert cfg.decoder_depth == 1 and cfg.loss == "cdl2"

    model, cfg = build_model_from_cfg({
        "NAME": "PartSegModel", "trans_dim": 32, "depth": 4,
        "fetch_idx": [1, 2, 3], "knn_graph": 4})
    assert cfg.fetch_idx == (1, 2, 3)


def test_ssd_preset_config_resolves():
    """The opt-in SSD preset resolves through its 2-level _base_ chain to
    the full ModelNet40 recipe with mixer='ssd' on the model config."""
    from si_mamba_tpu.models import PointMambaConfig
    from si_mamba_tpu.train.config import get_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_config(os.path.join(repo, "cfgs", "finetune_modelnet_ssd.yaml"))
    mc = PointMambaConfig.from_dict(cfg.model)
    assert mc.mixer == "ssd"
    assert mc.dtype == "bfloat16" and mc.spectral_method == "subspace"
    assert mc.trans_dim == 384 and mc.depth == 12  # full recipe inherited


def test_pretrain_ssd_preset_config_resolves():
    """The MAE SSD preset merges into the full pretrain recipe with
    mixer='ssd' + the perf switches on the nested transformer_config."""
    from si_mamba_tpu.models.point_mae import PointMAEConfig
    from si_mamba_tpu.train.config import get_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_config(os.path.join(repo, "cfgs", "pretrain_ssd.yaml"))
    t = dict(cfg.model.transformer_config)
    mc = PointMAEConfig(**{k: v for k, v in t.items()
                           if k in PointMAEConfig.__dataclass_fields__})
    assert mc.mixer == "ssd" and mc.dtype == "bfloat16"
    assert mc.wavelet_solver == "jacobi"
    assert mc.trans_dim == 384 and mc.depth == 12  # recipe inherited


def test_auto_resume_decision(tmp_path, monkeypatch):
    """--auto_resume resumes iff ckpt-last + config snapshot exist, never
    fights --test/--resume, and is inert on a fresh experiment dir."""
    from si_mamba_tpu.train.cli import _should_auto_resume, get_args

    monkeypatch.chdir(tmp_path)
    args = get_args(["--config", "cfgs/x.yaml", "--auto_resume"])
    snap = os.path.join(args.experiment_path, "config.yaml")
    # fresh dir: no ckpt-last -> start fresh
    assert not _should_auto_resume(args, snap)
    # ckpt-last without a config snapshot (partial state) -> start fresh
    os.makedirs(os.path.join(args.experiment_path, "ckpt-last"), exist_ok=True)
    assert not _should_auto_resume(args, snap)
    # complete prior run -> resume
    open(snap, "w").write("{}")
    assert _should_auto_resume(args, snap)
    # explicit --resume / --test paths are left alone
    args.resume = True
    assert not _should_auto_resume(args, snap)
    args.resume, args.test = False, True
    assert not _should_auto_resume(args, snap)
    # without the flag: inert
    args.test = False
    args.auto_resume = False
    assert not _should_auto_resume(args, snap)


def test_ssd_fused_preset_configs_resolve():
    """The three ssd_fused presets resolve through their 3-level _base_
    chains with mixer='ssd' + scan_impl='ssd_fused' landing on each model
    family's config (the fused Pallas SSD kernel route)."""
    from si_mamba_tpu.models import PointMambaConfig
    from si_mamba_tpu.models.point_mae import PointMAEConfig
    from si_mamba_tpu.train.config import get_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_config(os.path.join(repo, "cfgs",
                                  "finetune_modelnet_ssd_fused.yaml"))
    mc = PointMambaConfig.from_dict(cfg.model)
    assert mc.mixer == "ssd" and mc.scan_impl == "ssd_fused"
    assert mc.trans_dim == 384 and mc.depth == 12

    cfg = get_config(os.path.join(repo, "cfgs", "pretrain_ssd_fused.yaml"))
    t = dict(cfg.model.transformer_config)
    pc = PointMAEConfig(**{k: v for k, v in t.items()
                           if k in PointMAEConfig.__dataclass_fields__})
    assert pc.mixer == "ssd" and pc.scan_impl == "ssd_fused"

    cfg = get_config(os.path.join(repo, "cfgs",
                                  "part_segmentation_ssd_fused.yaml"))
    assert cfg.model.mixer == "ssd" and cfg.model.scan_impl == "ssd_fused"
