"""Degenerate-input robustness: production serving must return FINITE
outputs for pathological clouds (all points identical, near-coincident,
two-cluster) — these stress zero-degree kNN graphs, rank-deficient
Laplacian eigendecompositions, FPS over duplicated points, and the
normalization epsilons. The reference never guards these (a user hitting
its eval scripts with such a cloud gets torch.linalg.eigh NaNs); here they
are a tested contract across all three model families and both traversal
orders."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from si_mamba_tpu.models import (
    PartSegConfig,
    PartSegModel,
    PointMAEConfig,
    PointMAEMamba,
    PointMamba,
    PointMambaConfig,
)


def _degenerate_clouds(n: int):
    rng = np.random.default_rng(0)
    return [
        ("identical", np.zeros((1, n, 3), np.float32)),
        ("one-distinct", np.concatenate(
            [np.zeros((1, n - 1, 3)), np.ones((1, 1, 3))], 1).astype(np.float32)),
        ("two-clusters", np.concatenate(
            [np.zeros((1, n // 2, 3)), np.ones((1, n - n // 2, 3))],
            1).astype(np.float32)),
        ("tiny-noise", (1e-8 * rng.standard_normal((1, n, 3))).astype(np.float32)),
    ]


@pytest.mark.parametrize("method", ["SAST", "HLT"])
def test_classifier_finite_on_degenerate_clouds(method):
    cfg = PointMambaConfig(trans_dim=48, encoder_dims=48, depth=2, cls_dim=15,
                           num_group=32, group_size=16, k_top_eigenvectors=3,
                           knn_graph=8, method=method)
    m = PointMamba(cfg)
    v = m.init(jax.random.key(0), jnp.zeros((2, 1024, 3)), train=False)
    f = jax.jit(lambda pts: m.apply(v, pts, train=False))
    for name, pts in _degenerate_clouds(1024):
        out = np.asarray(f(jnp.asarray(pts)))
        assert np.isfinite(out).all(), (method, name)


def test_segmentation_finite_on_degenerate_clouds():
    cfg = PartSegConfig(trans_dim=32, depth=4, cls_dim=50, group_size=8,
                        num_group=16, encoder_dims=32, knn_graph=4,
                        fetch_idx=(1, 2, 3), drop_path=0.0, method="HLT")
    m = PartSegModel(cfg)
    onehot = jax.nn.one_hot(jnp.array([0]), 16)
    v = m.init({"params": jax.random.key(0), "order": jax.random.key(1)},
               jnp.zeros((1, 128, 3)), onehot, train=False)
    f = jax.jit(lambda pts: m.apply(v, pts, onehot, train=False,
                                    rngs={"order": jax.random.key(1)}))
    for name, pts in _degenerate_clouds(128):
        logp = np.asarray(f(jnp.asarray(pts)))
        assert np.isfinite(logp).all(), name
        np.testing.assert_allclose(np.exp(logp).sum(-1), 1.0, rtol=1e-3,
                                   err_msg=name)


def test_point_mae_finite_on_degenerate_clouds():
    cfg = PointMAEConfig(trans_dim=32, encoder_dims=32, depth=2,
                         decoder_depth=1, group_size=8, num_group=16,
                         knn_graph=4, k_top_eigenvectors=4, wavelet_J=3,
                         sinkhorn_iters=10)
    m = PointMAEMamba(cfg)
    v = m.init({"params": jax.random.key(0), "mask": jax.random.key(1),
                "gumbel": jax.random.key(2)}, jnp.zeros((1, 64, 3)),
               train=False)
    f = jax.jit(lambda pts: m.apply(v, pts, train=False,
                                    rngs={"mask": jax.random.key(1)}))
    for name, pts in _degenerate_clouds(64):
        loss = float(f(jnp.asarray(pts)))
        assert np.isfinite(loss), (name, loss)
