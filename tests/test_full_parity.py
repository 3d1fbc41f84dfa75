"""Full-pipeline numeric parity against a pure-torch reference replica.

The round-1 suite proved per-submodule parity (encoder, one block, graph,
eigh). These tests compose EVERYTHING — Group -> Encoder -> graph -> eigh ->
SAST ordering -> 12 Mamba blocks -> mean-pool -> head — at the published
ModelNet40 config (d=384, depth=12, G=64, k=4; reference
cfgs/finetune_modelnet.yaml) with shared weights, and assert the logits
agree. Eigenvector sign ambiguity (solver-arbitrary; SURVEY.md §7.3) is
handled explicitly: the torch oracle's eigenvectors are sign-aligned to the
JAX ones after asserting |cos| ~= 1 per vector (which rules out subspace
drift/degeneracy), so any remaining difference is real pipeline divergence.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from si_mamba_tpu.models import PointMamba, PointMambaConfig
from si_mamba_tpu.models.grouping import group_divider
from si_mamba_tpu.models.point_mamba import spectral_eigvecs
from si_mamba_tpu.ops.spectral import sort_orders_by_eigenvectors
from si_mamba_tpu.utils.torch_import import import_pointmamba, to_variables

from tests.test_torch_import import synthetic_state_dict
from tests import torch_oracle as oracle

# The published ModelNet40 classification config (reference
# cfgs/finetune_modelnet.yaml model section), eval mode.
FULL_CFG = PointMambaConfig(
    trans_dim=384, depth=12, cls_dim=40, group_size=32, num_group=64,
    encoder_dims=384, method="SAST", reverse=True, knn_graph=20,
    k_top_eigenvectors=4, alpha=100.0, smallest=True, symmetric=True,
    self_loop=False, binary=True, matrix="laplacian", drop_path=0.0,
)


def _clouds(b, n, seed):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((b, n, 3)).astype(np.float32)
    return pts / np.abs(pts).max(axis=(1, 2), keepdims=True)


@pytest.mark.slow
def test_full_pointmamba_logits_match_torch_oracle():
    """End-to-end logit parity at the full ModelNet40 config, B=12 clouds."""
    cfg = FULL_CFG
    sd = synthetic_state_dict(cfg, seed=3)
    params, stats, unexpected = import_pointmamba(sd, depth=cfg.depth)
    assert unexpected == []
    variables = to_variables(params, stats)

    pts = _clouds(12, 1024, seed=7)
    jp = jnp.asarray(pts)

    # --- JAX pipeline pieces for the explicit eigen-structure checks
    grouped = group_divider(jp, cfg.num_group, cfg.group_size)
    _, eig_jax = spectral_eigvecs(grouped.center, cfg)
    eig_jax = np.asarray(eig_jax)

    # --- torch oracle with sign alignment
    logits_t, eig_t = oracle.pointmamba_logits_torch(sd, cfg, pts, eig_align=eig_jax)

    # (a) eigenvectors span the same directions (no degeneracy/subspace drift)
    cos = oracle.eig_cosines(eig_t, eig_jax)
    assert cos.min() > 1 - 1e-4, f"eigenvector mismatch, min |cos| = {cos.min()}"

    # (b) the traversal orders are IDENTICAL after sign alignment
    orders_jax = np.asarray(sort_orders_by_eigenvectors(jnp.asarray(eig_jax)))
    orders_t = np.stack(
        [torch.sort(eig_t[:, :, i], dim=1).indices.numpy()
         for i in range(cfg.k_top_eigenvectors)], axis=1)
    np.testing.assert_array_equal(orders_jax, orders_t)

    # (c) composed logits agree
    logits_j = np.asarray(
        PointMamba(cfg).apply(variables, jp, train=False))
    scale = max(1.0, float(np.abs(logits_t).max()))
    np.testing.assert_allclose(logits_j, logits_t, atol=1e-3 * scale, rtol=2e-3)


def test_full_pointmamba_logits_match_torch_oracle_xyz():
    """Same composition through the 'MAMBA' xyz-triple-sort ordering path
    (reference models/point_mamba.py:850-866) at reduced width/depth."""
    cfg = dataclasses.replace(FULL_CFG, method="MAMBA", depth=4, trans_dim=96,
                              encoder_dims=96, num_group=32, group_size=16,
                              cls_dim=15)
    sd = synthetic_state_dict(cfg, seed=5)
    params, stats, _ = import_pointmamba(sd, depth=cfg.depth)
    variables = to_variables(params, stats)

    pts = _clouds(6, 256, seed=11)
    logits_t, _ = oracle.pointmamba_logits_torch(sd, cfg, pts)
    logits_j = np.asarray(PointMamba(cfg).apply(variables, jnp.asarray(pts), train=False))
    scale = max(1.0, float(np.abs(logits_t).max()))
    np.testing.assert_allclose(logits_j, logits_t, atol=1e-3 * scale, rtol=2e-3)


def test_grouping_matches_torch_oracle():
    """FPS + kNN grouping parity (deterministic start-0 FPS) — the stage
    every downstream comparison depends on."""
    pts = _clouds(4, 512, seed=13)
    grouped = group_divider(jnp.asarray(pts), 32, 16)
    neigh_t, center_t = oracle.group_torch(torch.from_numpy(pts), 32, 16)
    np.testing.assert_allclose(np.asarray(grouped.center), center_t.numpy(),
                               atol=1e-6)
    # neighborhoods as sets: same points per group (k-NN order may differ on
    # exact ties only; compare sorted along the neighbor axis)
    a = np.sort(np.asarray(grouped.neighborhood), axis=2)
    b = np.sort(neigh_t.numpy(), axis=2)
    np.testing.assert_allclose(a, b, atol=1e-6)
