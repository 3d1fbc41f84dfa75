"""Graph wavelet transforms for traversal-order generation (pretrain path).

Batched, jit-friendly re-implementations of the reference's wavelet stack
(models/point_mamba.py:1324-1429 Chebyshev/Meyer SGWT; :1826-2087 diffusion
wavelets + learned SGWT mixer). All linear algebra is batched XLA
(matrix_exp via jax.scipy, Gram-eigh low-rank factorization, QR complements)
— no per-sample loops.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Meyer tight-frame Chebyshev SGWT (reference GraphWaveletTransform)
# ---------------------------------------------------------------------------

def _meyer_window(lam: jax.Array, lam1: float = 0.5, lam2: float = 1.0) -> jax.Array:
    t = jnp.clip((lam - lam1) / (lam2 - lam1), 0.0, 1.0)
    mid = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    return jnp.where(lam < lam1, 1.0, jnp.where(lam > lam2, 0.0, mid))


def chebyshev_sgwt(x: jax.Array, laplacian: jax.Array, K: int = 25, J: int = 4,
                   tight_frame: bool = True, scales: Optional[List[float]] = None,
                   lam_max: float = 2.0) -> jax.Array:
    """Chebyshev-polynomial SGWT: (B, N, F), (B, N, N) -> (B, N, F*(J+1 or J)).

    tight_frame=True uses Meyer dyadic kernels (scaling + J wavelets);
    otherwise heat-like kernels λe^{-tλ} at the given scales.
    """
    B, N, F = x.shape
    I = jnp.eye(N, dtype=x.dtype)
    L_hat = laplacian - I  # spectrum into [-1, 1]

    polys = [x, jnp.matmul(L_hat, x)]
    for _ in range(2, K):
        polys.append(2.0 * jnp.matmul(L_hat, polys[-1]) - polys[-2])
    P = jnp.stack(polys, axis=0)  # (K, B, N, F)

    k_vec = jnp.arange(K, dtype=x.dtype)
    lam = jnp.cos(jnp.pi * k_vec / K) + 1.0  # sample points in [0, 2]

    blocks = []
    if tight_frame:
        h = _meyer_window(lam / lam_max)
        g = lambda l: jnp.sqrt(jnp.clip(1.0 - _meyer_window(l / lam_max) ** 2, 0.0))
        weights = [h] + [g(lam * (2.0**j)) for j in range(J)]
    else:
        assert scales is not None
        weights = [(t * lam) * jnp.exp(-t * lam) for t in scales]
    for w in weights:
        blocks.append(jnp.einsum("k,kbnf->bnf", w, P))
    return jnp.concatenate(blocks, axis=2)


# ---------------------------------------------------------------------------
# Diffusion wavelets (reference DiffusionWavelets.fit, :1852-1944)
# ---------------------------------------------------------------------------

def _expm_neg_psd(A: jax.Array, scale: float, terms: int = 8,
                  squarings: int = 4) -> jax.Array:
    """``expm(-scale · A)`` for batched PSD ``A`` with spectrum in [0, 2] —
    matmul-only scaling-and-squaring Taylor (MXU path).

    ``jax.scipy.linalg.expm`` lowers to Padé-13 with batched LU/triangular
    solves, which (like tiny batched eigh) is pathologically slow on TPU at
    these sizes. With X = -scale·A/2^s, ‖X‖ ≤ 2·scale/2^s ≤ 0.18 at the
    largest diffusion scale, an 8-term Horner Taylor is accurate to ~1e-12
    and every op is a (B, N, N) matmul.
    """
    B, N, _ = A.shape
    I = jnp.eye(N, dtype=A.dtype)
    X = (-scale / (1 << squarings)) * A
    T = I + X / terms
    for k in range(terms - 1, 0, -1):
        T = I + (X / k) @ T
    for _ in range(squarings):
        T = T @ T
    return T


def _topk_colspace(M: jax.Array, k: int, iters: int = 12,
                   qr_every: int = 4) -> jax.Array:
    """Orthonormal basis (B, N, k) of the dominant-k column space of
    (B, N, r) ``M`` — matmul + QR only (no eigh).

    Subspace iteration on the Gram matrix C = MᵀM (PSD): Q ← orth(C·Q)
    converges to the top-k right-singular subspace; the returned basis is
    orth(M·Q), the matching left subspace. Any orthonormal basis of that
    span is EXACTLY equivalent downstream: diffusion_wavelet_bases consumes
    V_bases only through projectors Vj·Vjᵀ and span complements, all
    invariant to an orthogonal change of basis (see test_sinkhorn_wavelets
    subspace-parity test).
    """
    r = M.shape[-1]
    C = jnp.matmul(jnp.swapaxes(M, -1, -2), M)  # (B, r, r)
    # deterministic start: leading k columns of C (hits dominant directions)
    Q = C[..., :, :k]
    Q, _ = jnp.linalg.qr(Q)
    for i in range(iters):
        Q = jnp.matmul(C, Q)
        if (i + 1) % qr_every == 0 or i == iters - 1:
            Q, _ = jnp.linalg.qr(Q)
    U, _ = jnp.linalg.qr(jnp.matmul(M, Q))
    return U


def diffusion_wavelet_bases(L: jax.Array, J: int, solver: str = "eigh"
                            ) -> tuple[list[jax.Array], jax.Array]:
    """Orthonormal diffusion-wavelet bases on batched Laplacians.

    L: (B, N, N). Returns (W list of (B, N, r_j) for j=0..J-1, VJ (B, N, r_J)).
    Scale construction: T_j = expm(-log2/lam_max · 2^{j-1} · L); rank
    schedule r_j = ceil(N / 2^j); low-rank factor via Gram eigh; wavelet
    complements via projection + QR — all batched.

    ``solver``: 'eigh' = exact Gram eigendecomposition (XLA batched eigh —
    pathologically slow on TPU at these tiny sizes, ~27 ms of the pretrain
    step, ROADMAP round-3); 'jacobi' = EXACT matmul-only parallel Jacobi
    eigh + scaling-squaring expm (ops/jacobi.py — the TPU perf path; same
    selection semantics as 'eigh', parity-gated in tests); 'subspace' =
    matmul-only subspace iteration (kept for reference: the diffusion
    Gram spectrum is near-degenerate at the rank cut, so its spans converge
    too slowly — use 'jacobi').
    """
    if solver not in ("eigh", "jacobi", "subspace"):
        # unknown strings (config typos) must not silently fall through to
        # the slow exact-eigh branch below
        raise ValueError(f"wavelet solver {solver!r} not in "
                         f"('eigh', 'jacobi', 'subspace')")
    B, N, _ = L.shape
    lam_max = 2.0
    t0 = math.log(2.0) / lam_max

    V_prev = jnp.broadcast_to(jnp.eye(N, dtype=L.dtype), (B, N, N))
    V_bases = [V_prev]
    for j in range(1, J + 1):
        k = max(1, -(-N // (1 << j)))  # ceil(N / 2^j)
        scale = t0 * (2.0 ** (j - 1))
        if solver in ("subspace", "jacobi"):
            T = _expm_neg_psd(L, scale)
        else:
            T = jax.scipy.linalg.expm(-scale * L)
        M = jnp.matmul(T, V_prev)  # (B, N, r_prev)
        if solver == "subspace":
            Vj = _topk_colspace(M, k)
        else:
            C = jnp.matmul(jnp.swapaxes(M, -1, -2), M)  # (B, r, r) Gram
            if solver == "jacobi":
                from si_mamba_tpu.ops.jacobi import jacobi_eigh

                evals, V = jacobi_eigh(C.astype(jnp.float32))
            else:
                evals, V = jnp.linalg.eigh(C.astype(jnp.float32))
            V_k = V[..., -k:][..., ::-1]
            sigma = jnp.sqrt(jnp.clip(evals[..., -k:], 1e-12))[..., ::-1]
            U_k = jnp.matmul(M, V_k.astype(L.dtype))
            Vj = U_k / sigma[:, None, :].astype(L.dtype)
        V_bases.append(Vj)
        V_prev = Vj

    W = []
    for j in range(J):
        Vj, Vjp1 = V_bases[j], V_bases[j + 1]
        proj = jnp.einsum("bip,brp,brq->biq", Vjp1, Vjp1, Vj)
        Wj = Vj - proj
        Qj, _ = jnp.linalg.qr(Wj)
        W.append(Qj.astype(L.dtype))
    return W, V_bases[-1]


class DiffusionWaveletSGWT(nn.Module):
    """Learned diffusion-wavelet transform producing per-scale node scores
    (reference DiffusionWaveletSGWT, models/point_mamba.py:1957-2087).

    forward: (x (B,N,F), L (B,N,N)) -> coeffs (B, N, 1, J+1); training adds
    tau-scaled Gumbel noise (rng collection 'gumbel').
    """

    J: int = 3
    in_features: int = 3
    hidden: int = 64
    solver: str = "eigh"  # 'eigh' exact | 'jacobi' matmul-only exact (TPU)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, L: jax.Array, tau: Optional[float] = 0.5,
                 deterministic: bool = True) -> jax.Array:
        B, N, F = x.shape
        W_list, VJ = diffusion_wavelet_bases(L.astype(jnp.float32), self.J,
                                             solver=self.solver)

        ortho = nn.initializers.orthogonal()
        h = nn.Dense(self.hidden, name="pos_embed_fc1")(x.astype(self.dtype))
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, name="pos_embed_fc2")(h)

        projs = [jnp.matmul(VJ, jnp.swapaxes(VJ, -1, -2))] + [
            jnp.matmul(Wj, jnp.swapaxes(Wj, -1, -2)) for Wj in W_list
        ]
        PJ = jnp.stack(projs, axis=1).astype(self.dtype)  # (B, J+1, N, N)
        coeffs = jnp.einsum("bjnm,bmf->bnfj", PJ, h)  # (B, N, hidden, J+1)

        eps = jnp.finfo(coeffs.dtype).eps
        rms = jnp.sqrt(jnp.mean(coeffs**2, axis=(0, 1), keepdims=True) + eps)
        coeffs = coeffs / jnp.maximum(rms, 1e-2)

        # residual mixer MLP over flattened (feature × scale)
        m = coeffs.reshape(B, N, self.hidden * (self.J + 1))
        m = nn.Dense(2 * self.hidden, kernel_init=ortho, name="mixer_fc1")(m)
        m = nn.LayerNorm(name="mixer_ln1")(m)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(self.hidden, kernel_init=ortho, name="mixer_fc2")(m)
        m = nn.LayerNorm(name="mixer_ln2")(m)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(self.hidden * (self.J + 1), kernel_init=ortho, name="mixer_fc3")(m)
        coeffs = coeffs + m.reshape(coeffs.shape)

        # collapse features to a scalar per (node, scale)
        coeffs = jnp.sqrt(jnp.sum(coeffs**2, axis=2, keepdims=True)) / coeffs.shape[2]

        if not deterministic and tau is not None:
            g = -jnp.log(-jnp.log(
                jax.random.uniform(self.make_rng("gumbel"), coeffs.shape) + eps) + eps)
            coeffs = coeffs + tau * g
        return coeffs  # (B, N, 1, J+1)


def scale_scores(coeffs: jax.Array, k: Optional[int] = None,
                 strategy: str = "coarsest_k") -> jax.Array:
    """Pick k per-scale score vectors from (B, N, F, J) coeffs → (B, N, k)
    (reference ``traversal_order_from_coeffs_perm`` score/scale selection,
    models/point_mamba.py:1749-1772)."""
    B, N, F, J = coeffs.shape
    if k is None:
        k = J
    score = jnp.mean(coeffs, axis=2)  # (B, N, J)
    if strategy == "coarsest_k":
        ids = list(range(J - 1, J - 1 - k, -1))
    elif strategy == "finest_k":
        ids = list(range(k))
    elif strategy == "top_energy":
        energy = jnp.sum(score**2, axis=1).mean(0)  # (J,)
        ids = jnp.argsort(-energy)[:k]
        return jnp.take(score, ids, axis=2)
    else:
        raise ValueError(strategy)
    return score[..., jnp.asarray(ids)]


# ---------------------------------------------------------------------------
# Complex Meyer SGWT + graph scattering (reference models/point_mamba.py:
# 1460-1576 ComplexMeyerSGWT, :2090-2128 GraphScattering) — experimental
# traversal-score generators used in the pretrain ablations.
# ---------------------------------------------------------------------------

def _jackson_damping(K: int) -> jax.Array:
    k = jnp.arange(K, dtype=jnp.float32)
    gamma = ((K - k + 1) * jnp.cos(jnp.pi * k / (K + 1))
             + jnp.sin(jnp.pi * k / (K + 1)) / jnp.tan(jnp.pi / (K + 1)))
    return gamma / (K + 1)


def complex_meyer_sgwt(x: jax.Array, L: jax.Array, J: int = 3, K: int = 30,
                       lam_max: float = 2.0, use_complex: bool = True,
                       use_delta: bool = False, jackson: bool = False) -> jax.Array:
    """Analytic complex Meyer SGWT: (B, N, F), (B, N, N) -> complex
    (B, N, F, C) with C = J (+1 with the delta band around lambda_1)."""
    B, N, F = x.shape
    I = jnp.eye(N, dtype=x.dtype)
    Lhat = L - I

    polys = [x, jnp.matmul(Lhat, x)]
    for _ in range(2, K):
        polys.append(2.0 * jnp.matmul(Lhat, polys[-1]) - polys[-2])
    T = jnp.stack(polys, axis=0)  # (K, B, N, F)

    k_vec = jnp.arange(K, dtype=x.dtype)
    lam_k = (jnp.cos(jnp.pi * k_vec / K) + 1.0) * (lam_max / 2)
    gamma = _jackson_damping(K) if jackson else None

    bands = []
    if use_delta:
        eigvals = jnp.linalg.eigvalsh(tril_sym(L))
        lam0, lam1 = eigvals[:, 0], eigvals[:, 1]
        eps = jnp.maximum(jnp.maximum(0.05 * lam_max, (lam1 - lam0) * 0.5),
                          lam_max / K)  # (B,)
        diff = lam_k[None, :] - lam1[:, None]
        inside = jnp.abs(diff) <= eps[:, None]
        g_delta = jnp.where(inside, jnp.cos(0.5 * jnp.pi * diff / eps[:, None]), 0.0)
        if gamma is not None:
            g_delta = g_delta * gamma[None]
        band = jnp.einsum("bk,kbnf->bnf", g_delta, T)
        bands.append(band.astype(jnp.complex64) if use_complex else band)

    for j in range(J):
        lam1 = lam_max / (2 ** (j + 1))
        lam2 = lam_max / (2 ** j)
        nu = jnp.clip((lam_k - lam1) / (lam2 - lam1), 0.0, 1.0)
        gk = jnp.sin(0.5 * jnp.pi * nu)
        hk = jnp.cos(0.5 * jnp.pi * nu)
        if gamma is not None:
            gk, hk = gk * gamma, hk * gamma
        real_j = jnp.einsum("k,kbnf->bnf", gk, T)
        if use_complex:
            imag_j = jnp.einsum("k,kbnf->bnf", hk, T)
            bands.append(real_j + 1j * imag_j)
        else:
            bands.append(real_j)
    return jnp.stack(bands, axis=-1)


def tril_sym(M: jax.Array) -> jax.Array:
    lower = jnp.tril(M)
    return lower + jnp.swapaxes(jnp.tril(M, -1), -1, -2)


def graph_scattering(x: jax.Array, L: jax.Array, sgwt_fn, level: int = 2,
                     nonlin=jnp.abs) -> jax.Array:
    """2nd-order graph scattering over an SGWT that returns (B, N, F, J+1)
    with channel 0 = scaling (reference GraphScattering :2090-2128)."""
    coeffs = sgwt_fn(x, L)  # (B, N, F, J+1)
    S0 = coeffs[..., 0]
    b1 = coeffs[..., 1:]
    B, N, F, J = b1.shape
    if level >= 1:
        b1 = nonlin(b1)
    outputs = [S0] + list(jnp.moveaxis(b1, -1, 0))
    if level >= 2:
        U1 = jnp.moveaxis(b1, -1, 1).reshape(B * J, N, F)
        L_rep = jnp.repeat(L, J, axis=0)
        coeffs2 = sgwt_fn(U1, L_rep)
        b2 = nonlin(coeffs2.reshape(B, J, N, F, -1)[..., 1:])
        for j in range(J):
            for k in range(j + 1, J):
                outputs.append(b2[:, j, :, :, k])
    return jnp.stack(outputs, axis=-1)
