"""Checkpoint-exporter tests: flax variables → reference-keyed torch state
dict must reproduce the original synthetic state dict bit-exactly (the
exporter is the importer's inverse), and a saved ``.pth`` must re-import to
identical variables — the full interop cycle the reference's torch tooling
needs (tools/builder.py:153-162 checkpoint format)."""

import numpy as np
import torch

from si_mamba_tpu.utils.torch_export import (
    export_point_mae,
    export_pointmamba,
    save_torch_checkpoint,
)
from si_mamba_tpu.utils.torch_import import (
    _expected_torch_keys,
    import_point_mae,
    import_pointmamba,
    load_pointmamba_checkpoint,
    to_variables,
)
from tests.test_full_parity import _synthetic_mae_state_dict
from tests.test_torch_import import CFG, synthetic_state_dict

NBT = "num_batches_tracked"


def _roundtrip_check(sd_np, exported):
    """Key sets identical; every tensor bit-exact (num_batches_tracked is
    untracked here — exported as 0 by design, so values are exempt)."""
    assert set(exported) == set(sd_np), (
        sorted(set(sd_np) - set(exported)), sorted(set(exported) - set(sd_np)))
    for k, v in sd_np.items():
        if k.endswith(NBT):
            continue
        got = exported[k]
        assert got.shape == v.shape, (k, got.shape, v.shape)
        np.testing.assert_array_equal(got, v, err_msg=k)


def test_export_pointmamba_roundtrip():
    sd_np = {k: np.asarray(v) for k, v in
             synthetic_state_dict(CFG, seed=11).items()}
    params, stats, unexpected = import_pointmamba(sd_np, depth=CFG.depth)
    assert unexpected == []
    exported = export_pointmamba(params, stats)
    _roundtrip_check(sd_np, exported)
    # exported keys are exactly what the importer (== the reference model's
    # state_dict surface) expects — a strict=True load_state_dict proxy
    assert set(exported) == _expected_torch_keys(CFG.depth)


def test_export_point_mae_roundtrip():
    from si_mamba_tpu.models import PointMAEConfig

    cfg = PointMAEConfig(trans_dim=48, encoder_dims=48, depth=2,
                         decoder_depth=1, group_size=8, num_group=16,
                         knn_graph=4)
    sd_np = _synthetic_mae_state_dict(cfg, seed=4)
    params, stats, _ = import_point_mae(sd_np, depth=cfg.depth,
                                        decoder_depth=cfg.decoder_depth)
    exported = export_point_mae(params, stats)
    _roundtrip_check(sd_np, exported)


def test_save_torch_checkpoint_reimports_identically(tmp_path):
    sd_np = {k: np.asarray(v) for k, v in
             synthetic_state_dict(CFG, seed=12).items()}
    params, stats, _ = import_pointmamba(sd_np, depth=CFG.depth)
    path = str(tmp_path / "exported.pth")
    keys = save_torch_checkpoint(path, params, stats, epoch=7,
                                 metrics={"acc": 91.25})
    assert keys == sorted(_expected_torch_keys(CFG.depth))

    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert raw["epoch"] == 7 and raw["metrics"] == {"acc": 91.25}
    assert all(isinstance(t, torch.Tensor) for t in raw["base_model"].values())

    variables, unexpected = load_pointmamba_checkpoint(path, depth=CFG.depth)
    # num_batches_tracked is expected-and-ignored by the importer
    assert unexpected == []
    import jax

    want = to_variables(params, stats)
    for col in ("params", "batch_stats"):
        leaves_w = jax.tree_util.tree_flatten_with_path(want[col])[0]
        flat_g = dict(jax.tree_util.tree_flatten_with_path(variables[col])[0])
        assert len(leaves_w) == len(flat_g)
        for pth, leaf in leaves_w:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(flat_g[pth]),
                                          err_msg=str(pth))


def test_export_script_from_orbax_checkpoint(tmp_path, monkeypatch):
    """The full user path: orbax checkpoint on disk → scripts/export_torch.py
    main() → .pth that re-imports to the same weights. Runs main() in-process
    (a fresh JAX+torch subprocess takes minutes on the 1-core CI host)."""
    import importlib.util
    import os
    import sys

    import optax

    from si_mamba_tpu.train.checkpoint import save_checkpoint
    from si_mamba_tpu.train.train_state import TrainState

    sd_np = {k: np.asarray(v) for k, v in
             synthetic_state_dict(CFG, seed=13).items()}
    params, stats, _ = import_pointmamba(sd_np, depth=CFG.depth)
    variables = to_variables(params, stats)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              optax.sgd(1e-3))
    save_checkpoint(str(tmp_path), "ckpt-best", state, epoch=3,
                    metrics={"acc": 88.5})

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "export_torch_script", os.path.join(repo, "scripts", "export_torch.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv",
                        ["export_torch.py", "--exp_dir", str(tmp_path)])
    mod.main()
    out = tmp_path / "ckpt-best.pth"
    assert out.exists()

    reimported, unexpected = load_pointmamba_checkpoint(str(out),
                                                        depth=CFG.depth)
    assert unexpected == []
    import jax

    for col in ("params", "batch_stats"):
        flat_g = dict(jax.tree_util.tree_flatten_with_path(reimported[col])[0])
        for pth, leaf in jax.tree_util.tree_flatten_with_path(variables[col])[0]:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(flat_g[pth]),
                                          err_msg=str(pth))
