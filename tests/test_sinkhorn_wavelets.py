"""Sinkhorn sorting + diffusion wavelet tests."""

import jax
import jax.numpy as jnp
import numpy as np

from si_mamba_tpu.ops.sinkhorn import (
    greedy_round,
    hungarian_round,
    neural_sort_perm,
    plackett_luce_log_prob,
    sinkhorn_soft_perm,
    sinkhorn_sort_perm,
)
from si_mamba_tpu.ops.wavelets import (
    DiffusionWaveletSGWT,
    chebyshev_sgwt,
    diffusion_wavelet_bases,
    scale_scores,
)
from si_mamba_tpu.ops import knn_adjacency, rw_laplacian


def test_sinkhorn_soft_doubly_stochastic():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
    P = sinkhorn_soft_perm(s, epsilon=0.05, n_iters=60)
    np.testing.assert_allclose(np.asarray(P.sum(-1)), 1 / 16, atol=1e-3)
    np.testing.assert_allclose(np.asarray(P.sum(-2)), 1 / 16, atol=1e-3)


def test_greedy_round_is_permutation():
    rng = np.random.default_rng(1)
    P = jnp.asarray(rng.uniform(size=(4, 12, 12)).astype(np.float32))
    H = np.asarray(greedy_round(P))
    assert (H.sum(-1) == 1).all() and (H.sum(-2) == 1).all()


def test_hungarian_round_matches_scipy():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(2)
    P = rng.uniform(size=(2, 8, 8)).astype(np.float32)
    H = np.asarray(hungarian_round(jnp.asarray(P)))
    for b in range(2):
        row, col = linear_sum_assignment(-P[b])
        ref = np.zeros((8, 8), np.float32)
        ref[row, col] = 1
        np.testing.assert_array_equal(H[b], ref)


def test_sinkhorn_sort_orders_scores():
    """Hungarian rounding sorts exactly; greedy yields a valid permutation
    that is sorted up to swaps of near-tied neighbors (entropic blur)."""
    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    ref = np.sort(np.asarray(s), axis=-1)

    P_h, _ = sinkhorn_sort_perm(s, epsilon=0.01, n_iters=200, rounding="hungarian")
    np.testing.assert_allclose(np.asarray(jnp.einsum("bij,bj->bi", P_h, s)), ref,
                               atol=1e-5)

    P_g, _ = sinkhorn_sort_perm(s, epsilon=0.01, n_iters=200, rounding="greedy")
    out = np.asarray(jnp.einsum("bij,bj->bi", P_g, s))
    Pg = np.asarray(P_g)
    # straight-through value equals the hard perm up to fp32 recompute noise
    np.testing.assert_allclose(Pg.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(Pg.sum(-2), 1.0, atol=1e-5)
    # any out-of-order step is a near-tie swap, not a gross misordering
    assert np.min(np.diff(out, axis=-1)) > -0.05


def test_sinkhorn_self_target_is_near_identity():
    """The reference-HEAD 'self' cost degenerates to ~the identity plan
    (documents the dead wavelet-ordering quirk, models/point_mamba.py:1599).
    Near-tied entries can swap under entropic smoothing; the bulk must be
    fixed points."""
    rng = np.random.default_rng(7)
    s = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    P, _ = sinkhorn_sort_perm(s, epsilon=0.05, n_iters=60, target="self")
    diag_mass = np.asarray(jnp.diagonal(P, axis1=-2, axis2=-1)).mean()
    assert diag_mass > 0.75, diag_mass


def test_sinkhorn_straight_through_gradient():
    rng = np.random.default_rng(4)
    s = jnp.asarray(rng.standard_normal((2, 10)).astype(np.float32))

    def f(s):
        P, _ = sinkhorn_sort_perm(s, epsilon=0.1, n_iters=20)
        return jnp.sum(P * jnp.arange(10.0)[None, None, :])

    g = jax.grad(f)(s)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_sinkhorn_ift_matches_unrolled_truth():
    """Forward P vs a torch oracle of the reference's _sinkhorn_uv
    (models/new_layers.py:11-28), and the IFT gradient vs the TRUE
    gradient (torch autograd unrolled through the iterations). The
    reference's own implicit_sinkhorn_grad does NOT reproduce this truth
    (transposed adjoint blocks + missing direct term + singular solve —
    see sinkhorn_perm_ift docstring); ours is the corrected adjoint."""
    import torch

    from si_mamba_tpu.ops.sinkhorn import sinkhorn_perm_ift

    rng = np.random.default_rng(7)
    C_np = rng.uniform(0.1, 2.0, (2, 8, 8)).astype(np.float32)
    gP_np = rng.standard_normal((2, 8, 8)).astype(np.float32)
    tau, iters = 0.5, 60

    C_t = torch.tensor(C_np, requires_grad=True)
    K = torch.exp(-C_t / tau)
    N = 8
    u = torch.full((2, N), 1.0 / N)
    v = torch.full((2, N), 1.0 / N)
    for _ in range(iters):
        u = 1.0 / (K.bmm(v.unsqueeze(-1)).squeeze(-1))
        v = 1.0 / (K.transpose(-2, -1).bmm(u.unsqueeze(-1)).squeeze(-1))
    P_t = u.unsqueeze(-1) * K * v.unsqueeze(-2)
    (P_t * torch.tensor(gP_np)).sum().backward()

    P_j, vjp = jax.vjp(lambda c: sinkhorn_perm_ift(c, tau, iters),
                       jnp.asarray(C_np))
    (gC_j,) = vjp(jnp.asarray(gP_np))
    np.testing.assert_allclose(np.asarray(P_j), P_t.detach().numpy(), atol=2e-5)
    g_true = C_t.grad.numpy()
    assert np.linalg.norm(np.asarray(gC_j) - g_true) < 1e-3 * np.linalg.norm(g_true)


def test_neural_sort_perm():
    rng = np.random.default_rng(5)
    s = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))
    P = np.asarray(neural_sort_perm(s, tau=0.1))
    np.testing.assert_allclose(P.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(P.sum(-2), 1.0, atol=1e-5)
    # NeuralSort sorts descending: row 0 picks the max element
    picked = np.einsum("bij,bj->bi", P, np.asarray(s))
    np.testing.assert_allclose(picked[:, 0], np.asarray(s).max(-1), atol=1e-4)


def test_plackett_luce_matches_torch_formula():
    import torch

    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 4, 7)).astype(np.float32)
    got = np.asarray(plackett_luce_log_prob(jnp.asarray(x)))
    t = torch.from_numpy(x)
    ref = torch.sum(t - torch.logcumsumexp(t.flip(-1), dim=-1).flip(-1), dim=-1)
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)


def _laplacian(B=2, N=32, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    A = knn_adjacency(pts, k=6, symmetric=True, binary=True)
    return rw_laplacian(A, eps_mode="clamp"), pts


def test_diffusion_wavelet_bases_orthonormal():
    L, _ = _laplacian()
    W, VJ = diffusion_wavelet_bases(L, J=3)
    assert len(W) == 3
    # VJ has orthonormal columns
    gram = np.asarray(jnp.matmul(jnp.swapaxes(VJ, -1, -2), VJ))
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(gram.shape[-1]), gram.shape),
                               atol=1e-3)
    # rank schedule ceil(N/2^j)
    assert VJ.shape[-1] == 4 and W[0].shape[-1] == 32 and W[1].shape[-1] == 16


def test_diffusion_sgwt_module():
    L, pts = _laplacian()
    mod = DiffusionWaveletSGWT(J=3)
    v = mod.init(jax.random.key(0), pts, L, tau=None, deterministic=True)
    coeffs = mod.apply(v, pts, L, tau=None, deterministic=True)
    assert coeffs.shape == (2, 32, 1, 4)
    assert bool(jnp.all(jnp.isfinite(coeffs)))
    # training adds gumbel noise
    c2 = mod.apply(v, pts, L, tau=0.5, deterministic=False,
                   rngs={"gumbel": jax.random.key(1)})
    assert float(jnp.abs(c2 - coeffs).max()) > 0
    s = scale_scores(coeffs, k=4)
    assert s.shape == (2, 32, 4)


def test_chebyshev_sgwt_shapes():
    L, pts = _laplacian()
    out = chebyshev_sgwt(pts, L, K=10, J=4, tight_frame=True)
    assert out.shape == (2, 32, 3 * 5)
    out2 = chebyshev_sgwt(pts, L, K=10, tight_frame=False, scales=[0.1, 0.5])
    assert out2.shape == (2, 32, 6)


def test_diffusion_bases_jacobi_matches_eigh():
    """The matmul-only wavelet solver ('jacobi': scaling-squaring expm +
    parallel-Jacobi Gram eigh, ops/jacobi.py) must reproduce the exact
    'eigh' path's SPANS: every projector Vj·Vjᵀ / Wj·Wjᵀ agrees (the bases
    themselves may differ in sign/degenerate rotations — downstream
    consumes projections only). The 'subspace' iteration solver is also
    checked for orthonormality (its spans cannot converge at the
    near-degenerate rank cut — why 'jacobi' is the perf path)."""
    import jax.numpy as jnp
    import numpy as np

    from si_mamba_tpu.ops.graph import knn_adjacency, rw_laplacian
    from si_mamba_tpu.ops.wavelets import diffusion_wavelet_bases

    r = np.random.default_rng(3)
    center = jnp.asarray(r.standard_normal((4, 64, 3)).astype(np.float32))
    A = knn_adjacency(center, k=8, alpha=10.0, symmetric=True,
                      self_loop=False, binary=True)
    L = rw_laplacian(A, eps=1e-6, eps_mode="clamp").astype(jnp.float32)

    W_e, VJ_e = diffusion_wavelet_bases(L, J=3, solver="eigh")
    W_j, VJ_j = diffusion_wavelet_bases(L, J=3, solver="jacobi")

    def proj(V):
        return np.asarray(jnp.matmul(V, jnp.swapaxes(V, -1, -2)))

    for We, Wj in zip(W_e, W_j):
        assert We.shape == Wj.shape
        d = np.abs(proj(We) - proj(Wj)).max()
        assert d < 2e-2, d  # exact solver parity (degenerate-cluster noise)
    d = np.abs(proj(VJ_e) - proj(VJ_j)).max()
    assert d < 2e-2, d

    W_s, VJ_s = diffusion_wavelet_bases(L, J=3, solver="subspace")
    for V in W_s + [VJ_s] + W_j + [VJ_j]:
        k = V.shape[-1]
        G = np.asarray(jnp.einsum("bni,bnj->bij", V, V))
        np.testing.assert_allclose(G, np.broadcast_to(np.eye(k), G.shape),
                                   atol=1e-4)


def test_jacobi_eigh_matches_xla_eigh():
    """ops/jacobi.jacobi_eigh vs jnp.linalg.eigh: eigenvalues + spectral
    reconstruction + orthonormality, even/odd n."""
    import jax.numpy as jnp
    import numpy as np

    from si_mamba_tpu.ops.jacobi import jacobi_eigh

    r = np.random.default_rng(0)
    for B, n in [(4, 16), (2, 64), (3, 33)]:
        X = r.standard_normal((B, n, n)).astype(np.float32)
        A = (X + X.transpose(0, 2, 1)) / 2
        vals, V = jacobi_eigh(jnp.asarray(A))
        vr = np.linalg.eigvalsh(A)
        assert np.abs(np.asarray(vals) - vr).max() / np.abs(vr).max() < 1e-4
        rec = np.einsum("bik,bk,bjk->bij", np.asarray(V), np.asarray(vals),
                        np.asarray(V))
        assert np.abs(rec - A).max() / np.abs(A).max() < 1e-4
        orth = np.einsum("bki,bkj->bij", np.asarray(V), np.asarray(V))
        np.testing.assert_allclose(orth, np.broadcast_to(np.eye(n), orth.shape),
                                   atol=1e-5)
    # n beyond the validated sweep range refuses instead of silently
    # under-converging (code-review r3)
    import pytest

    with pytest.raises(ValueError, match="validated to"):
        jacobi_eigh(jnp.zeros((1, 192, 192)))


def test_expm_neg_psd_matches_scipy_expm():
    import jax.numpy as jnp
    import numpy as np
    import jax

    from si_mamba_tpu.ops.graph import knn_adjacency, rw_laplacian
    from si_mamba_tpu.ops.wavelets import _expm_neg_psd, tril_sym

    r = np.random.default_rng(5)
    center = jnp.asarray(r.standard_normal((2, 32, 3)).astype(np.float32))
    A = knn_adjacency(center, k=6, alpha=10.0, symmetric=True,
                      self_loop=False, binary=True)
    L = rw_laplacian(A, eps=1e-6, eps_mode="clamp").astype(jnp.float32)
    for scale in (0.347, 1.386):
        ref = jax.scipy.linalg.expm(-scale * L)
        got = _expm_neg_psd(L, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)
