"""Train-harness tests: YAML _base_ config merge on the real reference
configs, loader sharding/shuffle semantics, orbax checkpoint roundtrip +
resume, pretrain/finetune mini-runs on synthetic data."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from si_mamba_tpu.data.loader import Loader
from si_mamba_tpu.train.config import ConfigDict, get_config


def _write_cfgs(tmp_path):
    (tmp_path / "dataset_configs").mkdir()
    (tmp_path / "dataset_configs" / "base.yaml").write_text(
        "NAME: ScanObjectNN\nROOT: /data/scan\n")
    (tmp_path / "exp.yaml").write_text(
        """
optimizer: {type: AdamW, kwargs: {lr: 0.0003, weight_decay: 0.05}}
scheduler: {type: CosLR, kwargs: {epochs: 300, initial_epochs: 10}}
dataset:
  train: {_base_: dataset_configs/base.yaml, others: {subset: train}}
model: {NAME: PointMamba, trans_dim: 384}
npoints: 1024
total_bs: 32
""")
    return tmp_path / "exp.yaml"


def test_config_base_merge(tmp_path):
    cfg = get_config(str(_write_cfgs(tmp_path)))
    assert cfg.optimizer.kwargs.lr == 0.0003
    assert cfg.dataset.train._base_.NAME == "ScanObjectNN"
    assert cfg.dataset.train.others.subset == "train"
    assert cfg.model.NAME == "PointMamba"


def test_config_top_level_base_inherits():
    """Top-level _base_ = whole-config inheritance (preset extension);
    subtree _base_ keeps the reference load-into-subtree semantics."""
    cfg = get_config("cfgs/finetune_modelnet_perf.yaml")
    assert cfg.model.dtype == "bfloat16"
    assert cfg.model.spectral_method == "subspace"
    # everything else inherited from cfgs/finetune_modelnet.yaml
    assert cfg.model.trans_dim == 384 and cfg.model.depth == 12
    assert cfg.max_epoch == 300 and cfg.scheduler.type == "CosLR"
    assert cfg.dataset.train._base_.NAME == "ModelNet"


def test_reference_configs_parse():
    """The shipped reference YAMLs load unchanged (cfgs/*.yaml)."""
    for name in ["finetune_modelnet.yaml", "pretrain.yaml",
                 "finetune_scan_hardest.yaml"]:
        cfg = get_config(f"/root/reference/cfgs/{name}",
                         base_dir="/root/reference")
        assert cfg.model.NAME in ("PointMamba", "Point_MAE_Mamba")
        assert cfg.total_bs in (32, 128)
        assert cfg.dataset.train._base_.NAME


class _ToyDataset:
    def __init__(self, n=37, npoints=32):
        self.n, self.npoints = n, npoints
        rng = np.random.default_rng(0)
        self.data = rng.standard_normal((n, npoints, 3)).astype(np.float32)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.data[i], i % 4


def test_loader_basic():
    ds = _ToyDataset()
    ld = Loader(ds, batch_size=8, shuffle=True, drop_last=True)
    batches = list(ld.epoch(0))
    assert len(batches) == 4 == len(ld)
    pts, labels = batches[0]
    assert pts.shape == (8, 32, 3) and labels.shape == (8,)
    # different epochs shuffle differently; same epoch reproduces
    b0 = list(ld.epoch(0))[0][1]
    b1 = list(ld.epoch(1))[0][1]
    np.testing.assert_array_equal(b0, batches[0][1])
    assert (b0 != b1).any()


def test_loader_host_sharding():
    ds = _ToyDataset(n=40)
    shards = [Loader(ds, 4, shuffle=False, process_index=i, process_count=4)
              for i in range(4)]
    seen = np.concatenate([
        np.concatenate([lab for _, lab in s.epoch(0)]) for s in shards])
    # each of the 40 samples appears exactly once across hosts
    assert len(seen) == 40


def test_checkpoint_roundtrip(tmp_path):
    from si_mamba_tpu.train import checkpoint as ckpt
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.train_state import TrainState

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
    stats = {"bn": {"mean": jnp.zeros(4), "var": jnp.ones(4)}}
    tx, _ = build_optimizer(params)
    state = TrainState.create(params, stats, tx)
    ckpt.save_checkpoint(str(tmp_path), "ckpt-last", state, epoch=7,
                         metrics={"acc": 55.0}, best_metrics={"acc": 60.0})
    state2 = TrainState.create(
        {"w": jnp.zeros((4, 4)), "b": jnp.ones(4)}, stats, tx)
    state2, start_epoch, best = ckpt.resume_state(str(tmp_path), state2)
    assert start_epoch == 8
    assert best["acc"] == 60.0
    np.testing.assert_allclose(np.asarray(state2.params["w"]), 1.0)


def test_checkpoint_async_roundtrip(tmp_path):
    """async_save commits on orbax's background thread; back-to-back saves
    serialize (wait-then-save) and resume reads the committed payload."""
    from si_mamba_tpu.train import checkpoint as ckpt
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.train_state import TrainState

    params = {"w": jnp.full((4, 4), 3.0), "b": jnp.zeros(4)}
    stats = {"bn": {"mean": jnp.zeros(4), "var": jnp.ones(4)}}
    tx, _ = build_optimizer(params)
    state = TrainState.create(params, stats, tx)
    # two back-to-back async saves to different prefixes, then overwrite
    # ckpt-last — exercises the wait-before-next-save path and force=True
    ckpt.save_checkpoint(str(tmp_path), "ckpt-best", state, epoch=1,
                         metrics={"acc": 50.0}, async_save=True)
    ckpt.save_checkpoint(str(tmp_path), "ckpt-last", state, epoch=1,
                         async_save=True)
    ckpt.save_checkpoint(str(tmp_path), "ckpt-last", state, epoch=2,
                         best_metrics={"acc": 61.0}, async_save=True)
    ckpt.wait_for_saves()
    state2 = TrainState.create(
        {"w": jnp.zeros((4, 4)), "b": jnp.ones(4)}, stats, tx)
    state2, start_epoch, best = ckpt.resume_state(str(tmp_path), state2)
    assert start_epoch == 3 and best["acc"] == 61.0
    np.testing.assert_allclose(np.asarray(state2.params["w"]), 3.0)


def test_checkpoint_async_crash_window_fallback(tmp_path):
    """Preemption during an async overwrite must not lose the resume point:
    save_checkpoint parks the previously-committed dir at <prefix>.bak
    before the background commit, and load_checkpoint falls back to it."""
    import shutil

    from si_mamba_tpu.train import checkpoint as ckpt
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.train_state import TrainState

    params = {"w": jnp.full((4, 4), 5.0)}
    stats = {}
    tx, _ = build_optimizer(params)
    state = TrainState.create(params, stats, tx)
    ckpt.save_checkpoint(str(tmp_path), "ckpt-last", state, epoch=4,
                         async_save=True)
    ckpt.save_checkpoint(str(tmp_path), "ckpt-last", state, epoch=5,
                         async_save=True)
    ckpt.wait_for_saves()
    assert (tmp_path / "ckpt-last").exists()
    assert (tmp_path / "ckpt-last.bak").exists()  # epoch-4 copy parked
    # simulate the crash window: the new final dir never committed
    shutil.rmtree(tmp_path / "ckpt-last")
    payload = ckpt.load_checkpoint(str(tmp_path), "ckpt-last")
    assert payload is not None and payload["meta"]["epoch"] == 4
    np.testing.assert_allclose(np.asarray(payload["params"]["w"]), 5.0)


def test_transfer_pretrained_reporting():
    from si_mamba_tpu.train.checkpoint import transfer_pretrained

    new = {"params": {"a": np.zeros((2, 2)), "b": {"c": np.zeros(3)}},
           "batch_stats": {}}
    old = {"params": {"a": np.ones((2, 2)), "extra": np.ones(1)}}
    out = transfer_pretrained(new, old)
    np.testing.assert_allclose(out["params"]["a"], 1.0)
    np.testing.assert_allclose(out["params"]["b"]["c"], 0.0)


def test_finetune_mini_run(tmp_path):
    """Two epochs of the full finetune loop on a toy dataset."""
    from si_mamba_tpu.train.runner_finetune import finetune_run

    cfg = ConfigDict(yaml.safe_load("""
optimizer: {type: AdamW, kwargs: {lr: 0.001, weight_decay: 0.05}}
scheduler: {type: CosLR, kwargs: {epochs: 2, initial_epochs: 1}}
model: {NAME: PointMamba, trans_dim: 32, depth: 2, cls_dim: 4, group_size: 8,
        num_group: 16, encoder_dims: 32, knn_graph: 4, drop_path: 0.0,
        method: SAST}
npoints: 1024
total_bs: 8
max_epoch: 1
grad_norm_clip: 10
"""))
    from si_mamba_tpu.train.config import _to_config

    cfg = _to_config(cfg)
    ds = _ToyDataset(n=16, npoints=1100)
    train = Loader(ds, 8, shuffle=True, drop_last=True)
    val = Loader(ds, 8, shuffle=False)
    state, best = finetune_run(cfg, train, val, str(tmp_path), seed=0)
    assert int(state.step) == 4  # epochs 0..1 inclusive x 2 batches each
    assert os.path.exists(tmp_path / "ckpt-last")
    assert best.acc >= 0


def test_tau_schedule():
    from si_mamba_tpu.train.runner_pretrain import tau_schedule

    assert tau_schedule(0) == pytest.approx(0.01)
    assert tau_schedule(20) == pytest.approx(1.0)
    assert tau_schedule(300) == pytest.approx(0.01)
    assert tau_schedule(10) == pytest.approx(0.01 + 0.99 * 0.5)


def test_step_per_update_accumulation():
    """optax.MultiSteps: params change only every k-th step."""
    from si_mamba_tpu.train.optim import build_optimizer

    params = {"w": jnp.ones((4,))}
    tx, _ = build_optimizer(params, lr=0.1, epochs=1, warmup_epochs=0,
                            steps_per_epoch=1, sched_type="const",
                            grad_clip=None, step_per_update=2)
    state = tx.init(params)
    g = {"w": jnp.ones((4,))}
    up1, state = tx.update(g, state, params)
    p1 = jax.tree.map(lambda p, u: p + u, params, up1)
    np.testing.assert_allclose(np.asarray(p1["w"]), 1.0)  # accumulated, no step
    up2, state = tx.update(g, state, p1)
    p2 = jax.tree.map(lambda p, u: p + u, p1, up2)
    assert float(jnp.abs(p2["w"] - 1.0).max()) > 1e-3  # applied on 2nd


def test_mae_train_step_on_mesh():
    """Pretrain step under the 8-device DP mesh."""
    from si_mamba_tpu.models import PointMAEMamba, PointMAEConfig
    from si_mamba_tpu.parallel import make_mesh, shard_batch
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.runner_pretrain import make_pretrain_step
    from si_mamba_tpu.train.train_state import TrainState

    cfg = PointMAEConfig(trans_dim=32, encoder_dims=32, depth=2, decoder_depth=1,
                         group_size=8, num_group=16, knn_graph=4,
                         sinkhorn_iters=5)
    model = PointMAEMamba(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((8, 64, 3)).astype(np.float32))
    v = model.init({"params": jax.random.key(0), "mask": jax.random.key(1),
                    "gumbel": jax.random.key(2)}, pts[:2], train=False)
    tx, _ = build_optimizer(v["params"], lr=1e-3, epochs=1, warmup_epochs=0,
                            steps_per_epoch=1)
    state = TrainState.create(v["params"], v["batch_stats"], tx)
    mesh = make_mesh(jax.devices()[:8])
    step = jax.jit(make_pretrain_step(model), donate_argnums=(0,))
    (pts_s,) = shard_batch((pts,), mesh)
    state, m = step(state, pts_s, jax.random.key(3), 0.5)
    assert np.isfinite(float(m["loss"]))
    state, m2 = step(state, pts_s, jax.random.key(3), 0.5)
    assert float(m2["loss"]) != float(m["loss"])


def test_svm_probe_pipeline():
    """Feature extraction + host sklearn SVM probe on a separable toy task."""
    from si_mamba_tpu.models import PointMAEMamba, PointMAEConfig
    from si_mamba_tpu.train.runner_pretrain import make_feature_step, svm_probe
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.train_state import TrainState

    cfg = PointMAEConfig(trans_dim=32, encoder_dims=32, depth=1, decoder_depth=1,
                         group_size=8, num_group=16, knn_graph=4, sinkhorn_iters=5)
    model = PointMAEMamba(cfg)
    rng = np.random.default_rng(0)
    pts0 = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    v = model.init({"params": jax.random.key(0), "mask": jax.random.key(1),
                    "gumbel": jax.random.key(2)}, pts0, train=False)
    tx, _ = build_optimizer(v["params"])
    state = TrainState.create(v["params"], v["batch_stats"], tx)

    class SepLoader:
        def __init__(self, n, seed):
            self.n, self.seed = n, seed

        def epoch(self, _):
            r = np.random.default_rng(self.seed)
            labels = r.integers(0, 2, self.n)
            pts = r.standard_normal((self.n, 64, 3)).astype(np.float32) * 0.1
            pts[:, :, 0] += labels[:, None] * 3.0  # separable offset
            yield pts, labels.astype(np.int32)

    feature_step = jax.jit(make_feature_step(model))
    acc = svm_probe(feature_step, state, SepLoader(24, 0), SepLoader(12, 1))
    assert acc > 90.0, acc


def test_loader_worker_error_propagates():
    """Dataset exceptions inside the prefetch thread must surface."""

    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise ValueError("corrupt sample")
            return np.zeros((8, 3), np.float32), 0

    ld = Loader(Bad(), batch_size=2, prefetch=2)
    with pytest.raises(ValueError, match="corrupt sample"):
        list(ld.epoch(0))


def test_loader_no_prefetch_path():
    ds = _ToyDataset(n=5)
    ld = Loader(ds, batch_size=2, prefetch=0)
    batches = list(ld.epoch(0))
    assert len(batches) == 3  # drop_last=False keeps the ragged tail
    assert batches[-1][0].shape[0] == 1


def test_vote_step_in_graph_matches_eager_loop():
    """make_vote_step folds all vote passes into one jitted lax.scan
    (VERDICT r2 #7); its summed logits must equal the eager per-pass loop
    with the same key derivation."""
    from si_mamba_tpu.data import transforms
    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.train.runner_finetune import _point_all, make_vote_step
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.train_state import TrainState

    cfg = PointMambaConfig(trans_dim=32, depth=2, cls_dim=4, group_size=8,
                           num_group=16, encoder_dims=32, knn_graph=4)
    model = PointMamba(cfg)
    r = np.random.default_rng(0)
    pts = jnp.asarray(r.standard_normal((2, 1024, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), pts, train=False)
    tx, _ = build_optimizer(variables["params"])
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    times, rng = 3, jax.random.key(42)
    acc = jax.jit(make_vote_step(model, 1024, rotation=False, times=times))(
        state, pts, rng)

    expect = np.zeros((2, 4), np.float32)
    for k in jax.random.split(rng, times):
        k_fps, k_aug = jax.random.split(k)
        p = transforms.fps_resample(pts, k_fps, 1024, point_all=_point_all(1024))
        p = transforms.scale_and_translate(p, k_aug)
        expect += np.asarray(model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            p, train=False), np.float32)
    np.testing.assert_allclose(np.asarray(acc), expect, rtol=2e-5, atol=2e-5)

    # the scan layout must agree with the (default) pass-batched layout —
    # eval-mode forwards are per-example, so folding passes into the batch
    # axis only reassociates the f32 logit sum
    acc_scan = jax.jit(make_vote_step(model, 1024, rotation=False,
                                      times=times, pass_batching=False))(
        state, pts, rng)
    np.testing.assert_allclose(np.asarray(acc_scan), np.asarray(acc),
                               rtol=2e-5, atol=2e-5)

    # N > point_all engages the shared FPS pool (the reference's
    # fps_idx_raw, tools/runner_finetune.py:368: FPS once per batch,
    # every pass subsets it) — pin against an eager replica of exactly
    # that protocol
    pts_big = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 1600, 3))
        .astype(np.float32))
    acc_big = jax.jit(make_vote_step(model, 1024, rotation=False,
                                     times=times))(state, pts_big, rng)
    from si_mamba_tpu.ops.pointops import fps, gather_points

    pool = gather_points(pts_big, fps(pts_big, _point_all(1024)))
    expect_big = np.zeros((2, 4), np.float32)
    for k in jax.random.split(rng, times):
        k_sub, k_aug = jax.random.split(k)
        p = transforms.fps_resample(pool, k_sub, 1024,
                                    point_all=_point_all(1024))
        p = transforms.scale_and_translate(p, k_aug)
        expect_big += np.asarray(model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            p, train=False), np.float32)
    np.testing.assert_allclose(np.asarray(acc_big), expect_big,
                               rtol=2e-5, atol=2e-5)


def test_deferred_meters_matches_eager_updates():
    """DeferredMeters (lag-1 device readback) must produce the exact same
    epoch averages as the eager float()-per-step pattern, for any number of
    steps including 0 and 1."""
    from si_mamba_tpu.train.logging_utils import AverageMeter, DeferredMeters

    rng = np.random.default_rng(0)
    for n_steps in (0, 1, 2, 7):
        ms = [{"loss": jnp.float32(rng.random()), "acc": jnp.float32(rng.random())}
              for _ in range(n_steps)]
        eager = AverageMeter(["loss", "acc"])
        for m in ms:
            eager.update([float(m["loss"]), float(m["acc"])])
        lagged = AverageMeter(["loss", "acc"])
        lag = DeferredMeters(lagged, ("loss", "acc"))
        for m in ms:
            lag.push(m)
        lag.flush()
        assert lagged.avg() == eager.avg(), n_steps
        # flush is idempotent (second flush must not double-count)
        lag.flush()
        assert lagged.avg() == eager.avg(), n_steps


def test_loader_multiworker_order_and_content():
    """num_workers>1 yields a byte-identical ordered batch stream (batches
    are assigned round-robin but consumed strictly in order)."""
    ds = _ToyDataset(n=37)
    ref = list(Loader(ds, batch_size=4, shuffle=True, seed=3,
                      num_workers=1).epoch(2))
    par = list(Loader(ds, batch_size=4, shuffle=True, seed=3,
                      num_workers=4).epoch(2))
    assert len(par) == len(ref)
    for (p_pts, p_lab), (r_pts, r_lab) in zip(par, ref):
        np.testing.assert_array_equal(p_pts, r_pts)
        np.testing.assert_array_equal(p_lab, r_lab)


def test_loader_multiworker_overlaps_work():
    """4 assembly threads hide a slow (GIL-releasing) __getitem__."""
    import time

    class Slow:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            time.sleep(0.02)  # stands in for file IO / numpy (GIL released)
            return np.full((8, 3), i, np.float32), i

    def run(workers):
        t0 = time.perf_counter()
        out = list(Loader(Slow(), batch_size=2, prefetch=4,
                          num_workers=workers).epoch(0))
        return time.perf_counter() - t0, out

    t1, out1 = run(1)
    t4, out4 = run(4)
    for (a, _), (b, _) in zip(out1, out4):
        np.testing.assert_array_equal(a, b)
    assert t4 < 0.7 * t1, (t1, t4)


def test_loader_multiworker_error_propagates():
    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise ValueError("corrupt sample")
            return np.zeros((8, 3), np.float32), 0

    ld = Loader(Bad(), batch_size=2, prefetch=2, num_workers=3)
    with pytest.raises(ValueError, match="corrupt sample"):
        list(ld.epoch(0))
