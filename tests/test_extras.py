"""Tests for the permutation policy, complex Meyer SGWT, scattering,
visualization dumps, and profiling harness."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from si_mamba_tpu.models.permute_policy import PermutePolicy, StochasticNeuralSortPermuter
from si_mamba_tpu.ops import knn_adjacency, rw_laplacian
from si_mamba_tpu.ops.wavelets import complex_meyer_sgwt, graph_scattering, chebyshev_sgwt


def _graph(B=2, N=16, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    A = knn_adjacency(pts, k=4, symmetric=True, binary=True)
    return pts, rw_laplacian(A, eps_mode="clamp")


def test_stochastic_permuter_is_permutation():
    perm = StochasticNeuralSortPermuter()
    z = jnp.asarray(np.random.default_rng(0).standard_normal((3, 8)).astype(np.float32))
    P = perm.apply({}, z, 0.5, rngs={"policy": jax.random.key(0)})
    Pn = np.asarray(P)
    assert (Pn.sum(-1) == 1).all() and (Pn.sum(-2) == 1).all()
    # tau -> 0 gives the deterministic argsort permutation
    P0 = np.asarray(perm.apply({}, z, 1e-9, rngs={"policy": jax.random.key(1)}))
    ref = np.asarray(jax.nn.one_hot(jnp.argsort(z, -1), 8))
    np.testing.assert_allclose(P0, ref)


def test_permute_policy_outputs():
    B, G, k, C = 2, 16, 4, 32
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.standard_normal((B, 2 * k * G, C)).astype(np.float32))
    pos = jnp.zeros_like(toks)
    eigvals = jnp.asarray(rng.standard_normal((B, k)).astype(np.float32))
    eigvecs = jnp.asarray(rng.standard_normal((B, G, k)).astype(np.float32))
    policy = PermutePolicy(trans_dim=C, num_group=G, k_top_eigenvectors=k)
    v = policy.init({"params": jax.random.key(0), "policy": jax.random.key(1)},
                    toks, pos, eigvals, eigvecs, 0.5)
    perm, pol = policy.apply(v, toks, pos, eigvals, eigvecs, 0.5,
                             rngs={"policy": jax.random.key(2)})
    assert perm.shape == (B, k * G)
    # a valid permutation of 0..kG-1
    for b in range(B):
        assert sorted(np.asarray(perm[b]).tolist()) == list(range(k * G))
    assert pol.shape == (B,)
    assert np.all(np.asarray(pol) <= 0)  # log-probs


def test_complex_meyer_sgwt():
    pts, L = _graph()
    out = complex_meyer_sgwt(pts, L, J=3, K=12, use_complex=True)
    assert out.shape == (2, 16, 3, 3)
    assert np.iscomplexobj(np.asarray(out))
    out_d = complex_meyer_sgwt(pts, L, J=2, K=12, use_complex=False,
                               use_delta=True, jackson=True)
    assert out_d.shape == (2, 16, 3, 3)
    assert np.isrealobj(np.asarray(out_d))


def test_graph_scattering():
    pts, L = _graph()

    def sgwt(x, Lm):
        c = chebyshev_sgwt(x, Lm, K=8, J=3, tight_frame=True)
        return c.reshape(x.shape[0], x.shape[1], x.shape[2], 4)

    out = graph_scattering(pts, L, sgwt, level=2)
    # S0 + 3 first-order + C(3,2)=3 second-order = 7 channels
    assert out.shape == (2, 16, 3, 7)


def test_visualization_dumps(tmp_path):
    from si_mamba_tpu.utils.visualization import (
        render_cloud_figure,
        save_traversal_dump,
        traversal_viewer_html,
    )

    rng = np.random.default_rng(0)
    center = rng.standard_normal((2, 4, 16, 3)).astype(np.float32)
    nbr = rng.standard_normal((2, 4, 16, 8, 3)).astype(np.float32)
    orders = rng.integers(0, 16, (2, 4, 16))
    npz = str(tmp_path / "dump.npz")
    save_traversal_dump(npz, center, nbr, orders)
    assert os.path.exists(npz)
    render_cloud_figure(center[0, 0], str(tmp_path / "cloud.jpg"))
    assert os.path.exists(tmp_path / "cloud.jpg")
    traversal_viewer_html(npz, str(tmp_path / "viewer.html"))


def test_profiling_harness():
    from si_mamba_tpu.utils.profiling import throughput_fn, time_fn

    f = jax.jit(lambda x: jnp.sum(x * x))
    x = jnp.ones((128, 128))
    stats = time_fn(f, x, iters=5, warmup=1)
    assert stats["p50_ms"] > 0
    tp = throughput_fn(f, x, items_per_call=128, iters=5)
    assert tp["items_per_sec"] > 0
