"""Batched symmetric eigendecomposition via parallel-ordered cyclic Jacobi —
matmul-only, for TPU.

XLA's batched ``eigh`` on TPU is pathologically slow at small sizes (tens of
ms for (32, 64, 64) — the MAE wavelet stage's dominant cost, ROADMAP
round-3); its QR-iteration lowering is latency-bound scalar-ish code. Cyclic
Jacobi reformulates the problem as a fixed schedule of n/2 DISJOINT Givens
rotations per step — each step is one (B, n, n) matmul pair on the MXU:

    A ← Jᵀ A J,   V ← V J

with J the block-rotation matrix of that step's pairs. A round-robin
tournament schedule covers all n(n-1)/2 pairs in n-1 steps; cyclic Jacobi
converges quadratically once off(A) is small (~8 sweeps at n≤128, fp32).

This replaces the reference's per-sample cuSOLVER eigh calls (reference
models/point_mamba.py:742,1914) on the TPU perf path; the exact XLA eigh
stays the default/parity solver.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _round_robin_schedule(n: int) -> list[tuple[tuple[int, ...], tuple[int, ...]]]:
    """Tournament pairing: n-1 rounds of n/2 disjoint pairs covering all
    n(n-1)/2 index pairs (n even)."""
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        half = n // 2
        pi = tuple(min(players[k], players[n - 1 - k]) for k in range(half))
        pj = tuple(max(players[k], players[n - 1 - k]) for k in range(half))
        rounds.append((pi, pj))
        # rotate all but the first player
        players = [players[0], players[-1]] + players[1:-1]
    return rounds


@functools.partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(A: jax.Array, sweeps: int | None = None
                ) -> tuple[jax.Array, jax.Array]:
    """Eigendecomposition of symmetric batched ``A`` (B, n, n), fp32.

    Returns (eigenvalues ascending (B, n), eigenvectors in columns
    (B, n, n)) — same convention as ``jnp.linalg.eigh``. Eigenvector sign
    (and basis within degenerate clusters) is solver-arbitrary, exactly as
    with any eigh. Odd n is zero-padded internally with an isolated +4
    diagonal entry (above the L_rw spectral range) and sliced back out.
    """
    A = A.astype(jnp.float32)
    B, n, _ = A.shape
    if sweeps is None:
        # measured convergence (fp32 random symmetric): n<=64 done at 10
        # sweeps (recon 3e-6), n=128 at 14 (1e-5). Larger n is unmeasured
        # AND impractical (the n-1 round-robin rotation rounds are traced
        # inline: compile size grows as n·sweeps) — refuse rather than
        # silently under-converge; the exact XLA eigh solver covers it.
        if n > 128:
            raise ValueError(
                f"jacobi_eigh default sweep count is only validated to "
                f"n=128 (got n={n}); pass sweeps= explicitly or use the "
                f"exact 'eigh' solver")
        sweeps = 10 if n <= 64 else 14
    n0 = n
    if n % 2 == 1:
        pad = jnp.zeros((B, n + 1, n + 1), jnp.float32)
        pad = pad.at[:, :n, :n].set(A)
        big = jnp.abs(A).sum(axis=(-1, -2)).max() + 4.0
        A = pad.at[:, n, n].set(big)
        n = n + 1

    schedule = _round_robin_schedule(n)
    eye = jnp.eye(n, dtype=jnp.float32)

    def one_sweep(_, carry):
        A, V = carry
        for pi, pj in schedule:
            pi_a = jnp.asarray(pi)
            pj_a = jnp.asarray(pj)
            aii = A[:, pi_a, pi_a]  # (B, n/2)
            ajj = A[:, pj_a, pj_a]
            aij = A[:, pi_a, pj_a]
            # rotation angle zeroing a_ij: tan(2θ) = 2 a_ij / (a_ii − a_jj)
            theta = 0.5 * jnp.arctan2(2.0 * aij, aii - ajj)
            c = jnp.cos(theta)
            s = jnp.sin(theta)
            J = jnp.zeros((B, n, n), jnp.float32)
            J = J.at[:, pi_a, pi_a].set(c)
            J = J.at[:, pj_a, pj_a].set(c)
            J = J.at[:, pi_a, pj_a].set(-s)
            J = J.at[:, pj_a, pi_a].set(s)
            AJ = jnp.matmul(A, J)
            A = jnp.matmul(jnp.swapaxes(J, -1, -2), AJ)
            V = jnp.matmul(V, J)
        # re-symmetrize against matmul rounding drift
        A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
        return A, V

    V0 = jnp.broadcast_to(eye, (B, n, n))
    A, V = lax.fori_loop(0, sweeps, one_sweep, (A, V0))

    vals = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(vals, axis=-1)
    vals = jnp.take_along_axis(vals, order, axis=-1)
    V = jnp.take_along_axis(V, order[:, None, :], axis=-1)
    if n0 != n:
        vals = vals[:, :n0]
        V = V[:, :n0, :n0]
    return vals, V
