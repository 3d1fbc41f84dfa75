"""Part-segmentation model + mIoU accounting tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from si_mamba_tpu.models.segmentation import (
    PartSegConfig,
    PartSegModel,
    feature_propagation_interp,
    nll_loss,
)
from si_mamba_tpu.train.runner_seg import evaluate_miou, make_seg_eval_step

TINY = PartSegConfig(trans_dim=32, depth=4, cls_dim=50, group_size=8, num_group=16,
                     encoder_dims=32, knn_graph=4, fetch_idx=(1, 2, 3),
                     drop_path=0.0, method="HLT")


def test_feature_propagation_exact_at_source():
    """Interpolating at the source points returns (almost) the source feats."""
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((2, 16, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((2, 16, 5)).astype(np.float32))
    out = feature_propagation_interp(xyz, xyz, feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats), atol=1e-3)


def test_nll_loss():
    logp = jnp.log(jnp.full((2, 4, 3), 1 / 3))
    tgt = jnp.zeros((2, 4), jnp.int32)
    np.testing.assert_allclose(float(nll_loss(logp, tgt)), np.log(3), rtol=1e-6)


def _model_and_inputs(method="HLT"):
    cfg = dataclasses.replace(TINY, method=method)
    model = PartSegModel(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((2, 128, 3)).astype(np.float32))
    onehot = jax.nn.one_hot(jnp.array([0, 5]), 16)
    v = model.init({"params": jax.random.key(0), "order": jax.random.key(1)},
                   pts, onehot, train=False)
    return model, v, pts, onehot


def test_seg_forward_shapes():
    for method in ("HLT", "SAST", "Point_MAMBA"):
        model, v, pts, onehot = _model_and_inputs(method)
        logp = model.apply(v, pts, onehot, train=False,
                           rngs={"order": jax.random.key(1)})
        assert logp.shape == (2, 128, 50)
        # log-probs: rows sum to 1 in prob space
        np.testing.assert_allclose(np.asarray(jnp.exp(logp).sum(-1)), 1.0,
                                   rtol=1e-4)


def test_seg_train_grads():
    model, v, pts, onehot = _model_and_inputs()
    seg = jnp.zeros((2, 128), jnp.int32)

    def loss_fn(params):
        logp, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            pts, onehot, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(2), "order": jax.random.key(3)})
        return nll_loss(logp, seg)

    g = jax.grad(loss_fn)(v["params"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


class _ToySegLoader:
    """Two batches with perfectly predictable segmentation for IoU checks."""

    def __init__(self, logits_fn):
        self.logits_fn = logits_fn

    def epoch(self, _):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((2, 64, 3)).astype(np.float32)
        cls = np.array([12, 0], np.int32)  # Airplane=12? index into SEG_CLASSES order
        seg = np.zeros((2, 64), np.int32)
        yield pts, cls, seg


def test_evaluate_miou_perfect_predictions():
    from si_mamba_tpu.data.shapenetpart import SEG_CLASSES

    label_names = list(SEG_CLASSES.keys())

    class Loader:
        def epoch(self, _):
            pts = np.zeros((1, 8, 3), np.float32)
            cls = np.array([label_names.index("Laptop")], np.int32)
            seg = np.full((1, 8), 28, np.int32)  # Laptop part 28
            yield pts, cls, seg

    def eval_step(state, pts, cls):
        # put all probability on part 28
        logp = np.full((1, 8, 50), -1e9, np.float32)
        logp[:, :, 28] = 0.0
        return jnp.asarray(logp)

    metrics = evaluate_miou(eval_step, None, Loader())
    assert metrics["accuracy"] == 1.0
    # Laptop has parts [28, 29]; 29 absent in both gt and pred -> IoU 1.0
    assert metrics["instance_miou"] == 1.0
