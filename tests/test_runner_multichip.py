"""End-to-end runner tests on the virtual 8-device CPU mesh (VERDICT r1 #4):
each user-facing runner (finetune / pretrain / seg) trains with EXPLICIT data-
parallel shardings — state replicated on every device, batch sharded on
'data' — then saves and resumes. This covers the code paths users actually
run, not just the dryrun (reference behavior: DDP wrap + DistributedSampler,
tools/runner_finetune.py:124-129, tools/builder.py:24-31)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from si_mamba_tpu.data.loader import Loader
from si_mamba_tpu.train.config import ConfigDict, _to_config


def _assert_replicated(state):
    """Every param leaf must be addressable on ALL devices (replicated)."""
    ndev = jax.device_count()
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == ndev, leaf.sharding
    assert leaf.sharding.is_fully_replicated, leaf.sharding


class _CloudDataset:
    def __init__(self, n=16, npoints=1100, classes=4, seed=0):
        r = np.random.default_rng(seed)
        self.pts = r.standard_normal((n, npoints, 3)).astype(np.float32)
        self.labels = r.integers(0, classes, n).astype(np.int32)

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, i):
        return self.pts[i], self.labels[i]


def _finetune_cfg(max_epoch=1):
    cfg = ConfigDict(yaml.safe_load(f"""
optimizer: {{type: AdamW, kwargs: {{lr: 0.001, weight_decay: 0.05}}}}
scheduler: {{type: CosLR, kwargs: {{epochs: 2, initial_epochs: 1}}}}
model: {{NAME: PointMamba, trans_dim: 32, depth: 2, cls_dim: 4, group_size: 8,
        num_group: 16, encoder_dims: 32, knn_graph: 4, drop_path: 0.0,
        method: SAST}}
npoints: 1024
total_bs: 8
max_epoch: {max_epoch}
grad_norm_clip: 10
"""))
    return _to_config(cfg)


def test_finetune_run_multichip_and_resume(tmp_path):
    from si_mamba_tpu.train.runner_finetune import finetune_run

    assert jax.device_count() == 8
    ds = _CloudDataset()
    train = Loader(ds, 8, shuffle=True, drop_last=True)
    val = Loader(ds, 8, shuffle=False)

    # async_ckpt exercises the background-committed orbax save through the
    # real runner (the riskier path; sync saves are unit- and mh-tested)
    cfg0 = _finetune_cfg(0)
    cfg0["async_ckpt"] = True
    state, best = finetune_run(cfg0, train, val, str(tmp_path), seed=0)
    _assert_replicated(state)
    assert os.path.exists(tmp_path / "ckpt-last")

    # resume continues from the saved epoch with the replicated state
    state2, _ = finetune_run(_finetune_cfg(1), train, val, str(tmp_path),
                             resume=True, seed=0)
    _assert_replicated(state2)
    assert int(state2.step) == 2 * int(state.step)


def test_finetune_run_lambda_lr(tmp_path):
    """A reference-format LambdaLR config (kwargs carry only decay_step/
    lr_decay/lowest_decay — no epochs/initial_epochs) must drive the runner
    (code-review r2 finding #2)."""
    from si_mamba_tpu.train.runner_finetune import finetune_run

    cfg = _finetune_cfg(0)
    cfg.scheduler = _to_config(ConfigDict(
        {"type": "LambdaLR",
         "kwargs": {"decay_step": 21, "lr_decay": 0.9, "lowest_decay": 0.75}}))
    ds = _CloudDataset()
    train = Loader(ds, 8, shuffle=True, drop_last=True)
    val = Loader(ds, 8, shuffle=False)
    state, best = finetune_run(cfg, train, val, str(tmp_path), seed=0)
    assert int(state.step) >= 1


def test_dp_eval_ragged_final_batch():
    """Eval loaders use drop_last=False, so the final batch is usually NOT
    divisible by the device count — dp_eval_jit must pad/slice instead of
    crashing on the P('data') sharding (code-review r2 finding #1)."""
    import jax.numpy as jnp

    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.parallel import dp_eval_jit, make_mesh, replicate
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.runner_finetune import make_eval_step
    from si_mamba_tpu.train.train_state import TrainState

    cfg = _finetune_cfg(0)
    model_cfg = PointMambaConfig(**{
        k: v for k, v in cfg.model.items()
        if k in PointMambaConfig.__dataclass_fields__})
    model = PointMamba(model_cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((2, 1024, 3)), train=False)
    tx, _ = build_optimizer(variables["params"])
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    state = replicate(state, mesh)
    eval_step = dp_eval_jit(make_eval_step(model, 1024), mesh)

    pts = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((13, 1024, 3)).astype(np.float32))
    logits = np.asarray(eval_step(state, pts))
    assert logits.shape == (13, 4)
    # padded rows must not affect the real ones
    logits8 = np.asarray(eval_step(state, pts[:8]))
    np.testing.assert_allclose(logits[:8], logits8, rtol=2e-5, atol=2e-5)

    # Regression (found by tests/test_cli_fewshot.py): the runners install
    # the global mesh via jax.set_mesh around the whole epoch loop, so the
    # wrapper's ragged-pad concatenate used to run under that context and
    # commit the batch replicated — which the 'data'-sharded jit rejects.
    # The pad must stay in host numpy so this also works in-context.
    with jax.set_mesh(mesh):
        logits_ctx = np.asarray(eval_step(state, pts))
    np.testing.assert_allclose(logits_ctx, logits, rtol=2e-5, atol=2e-5)


def test_tsne_run(tmp_path):
    """--tsne eval path (reference test_tsne, tools/runner_finetune.py:615-
    631): features -> host t-SNE -> scatter file."""
    import jax.numpy as jnp

    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.runner_finetune import tsne_run
    from si_mamba_tpu.train.train_state import TrainState

    cfg = _finetune_cfg(0)
    model_cfg = PointMambaConfig(**{
        k: v for k, v in cfg.model.items()
        if k in PointMambaConfig.__dataclass_fields__})
    model = PointMamba(model_cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((2, 1024, 3)), train=False)
    tx, _ = build_optimizer(variables["params"])
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    loader = Loader(_CloudDataset(n=40), 8, shuffle=False)
    out = tsne_run(cfg, loader, state, str(tmp_path / "tsne.png"))
    assert os.path.exists(out)


def test_pretrain_run_multichip(tmp_path):
    from si_mamba_tpu.train.runner_pretrain import pretrain_run

    cfg = _to_config(ConfigDict(yaml.safe_load("""
optimizer: {type: AdamW, kwargs: {lr: 0.001, weight_decay: 0.05}}
scheduler: {type: CosLR, kwargs: {epochs: 2, initial_epochs: 1}}
model:
  NAME: Point_MAE_Mamba
  transformer_config: {trans_dim: 32, encoder_dims: 32, depth: 1,
                       decoder_depth: 1, group_size: 8, num_group: 16,
                       knn_graph: 4, sinkhorn_iters: 5}
npoints: 64
total_bs: 8
max_epoch: 0
""")))

    class _PtsOnly(_CloudDataset):
        def __init__(self):
            super().__init__(n=8, npoints=64)

    train = Loader(_PtsOnly(), 8, shuffle=True, drop_last=True)
    state, _ = pretrain_run(cfg, train, None, str(tmp_path), seed=0)
    _assert_replicated(state)
    assert os.path.exists(tmp_path / "ckpt-last")


def test_seg_run_multichip(tmp_path):
    from si_mamba_tpu.data.shapenetpart import SEG_CLASSES
    from si_mamba_tpu.models.segmentation import PartSegConfig
    from si_mamba_tpu.train.runner_seg import seg_run

    cat0 = list(SEG_CLASSES)[0]
    parts = SEG_CLASSES[cat0]

    class _SegLoader:
        def __init__(self, n=8, npts=64):
            r = np.random.default_rng(0)
            self.pts = r.standard_normal((n, npts, 3)).astype(np.float32)
            self.cls = np.zeros(n, np.int32)
            self.seg = r.choice(parts, (n, npts)).astype(np.int32)

        def __len__(self):
            return 1

        def epoch(self, _):
            yield self.pts, self.cls, self.seg

    cfg = PartSegConfig(trans_dim=32, encoder_dims=32, depth=2,
                        group_size=8, num_group=16, knn_graph=4,
                        fetch_idx=(0, 1), method="SAST")
    loader = _SegLoader()
    state, best = seg_run(cfg, loader, loader, str(tmp_path), epochs=1,
                          warmup_epochs=0, seed=0)
    _assert_replicated(state)
    assert os.path.exists(tmp_path / "ckpt-last")
    assert 0.0 <= best["instance_miou"] <= 1.0

    # resume continues from the saved epoch (1 step/epoch here): epoch 0
    # trained above -> resume with epochs=2 runs exactly epoch 1
    state2, _ = seg_run(cfg, loader, loader, str(tmp_path), epochs=2,
                        warmup_epochs=0, seed=0, resume=True)
    assert int(state2.step) == 2 * int(state.step)


def test_per_process_batch_split_and_loader_assembly():
    """Multi-host global-batch math (reference main.py:72-86): total_bs is
    split per process, each process's Loader yields a disjoint 1/P index
    shard, and concatenating the P local batches reassembles exactly one
    global batch — the data-side contract of shard_batch's
    make_array_from_process_local_data path."""
    import pytest

    from si_mamba_tpu.parallel import per_process_batch

    total_bs, P = 16, 4
    assert per_process_batch(total_bs, P) == 4
    assert per_process_batch(total_bs, 1) == total_bs
    with pytest.raises(ValueError, match="divide evenly"):
        per_process_batch(10, P)

    ds = _CloudDataset(n=32, npoints=16)
    bs_local = per_process_batch(total_bs, P)
    loaders = [Loader(ds, bs_local, shuffle=True, drop_last=True, seed=7,
                      process_index=p, process_count=P, prefetch=0)
               for p in range(P)]
    # every process sees the same number of steps = n_total / total_bs
    assert all(len(ld) == 32 // total_bs for ld in loaders)

    per_proc = [list(ld.epoch(3)) for ld in loaders]
    for step in range(32 // total_bs):
        pts = np.concatenate([per_proc[p][step][0] for p in range(P)], 0)
        labels = np.concatenate([per_proc[p][step][1] for p in range(P)], 0)
        assert pts.shape == (total_bs, 16, 3)
        assert labels.shape == (total_bs,)
    # the epoch's union over processes covers each sample exactly once
    seen = np.concatenate(
        [np.concatenate([b[0] for b in bl], 0) for bl in per_proc], 0)
    uniq = {arr.tobytes() for arr in seen}
    assert len(uniq) == 32


def test_maybe_initialize_distributed_gated_off(monkeypatch):
    """Without SI_MAMBA_MULTIHOST the bring-up must be a no-op (single-host
    runs never touch jax.distributed)."""
    from si_mamba_tpu.parallel import maybe_initialize_distributed

    monkeypatch.delenv("SI_MAMBA_MULTIHOST", raising=False)
    assert maybe_initialize_distributed() is False

    called = {}
    monkeypatch.setenv("SI_MAMBA_MULTIHOST", "1")
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: called.setdefault("yes", True))
    assert maybe_initialize_distributed() is True
    assert called.get("yes")
