"""Traversal-sequence construction: SAST (Fiedler sorts), HLT (multilevel
buckets), MAMBA (xyz triple sort) — pure functions over (tokens, pos).

Reference: models/point_mamba.py:843-1112 (PointMamba.forward ordering
branches). All outputs are static-shape concatenations of gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from si_mamba_tpu.ops.spectral import multilevel_codes, sort_orders_by_eigenvectors


def apply_orders(x: jax.Array, orders: jax.Array) -> jax.Array:
    """x: (B, G, C), orders: (B, k, G) -> (B, k*G, C) concatenated gathers."""
    B, k, G = orders.shape
    flat = orders.reshape(B, k * G)
    return jnp.take_along_axis(x, flat[..., None], axis=1)


def sast_sequence(
    tokens: jax.Array,
    pos: jax.Array,
    eigvecs: jax.Array,
    reverse: bool = True,
    reverse_2: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """SAST ordering: sort by each of the k eigenvectors, concat, then append
    the flipped copy (``reverse``) or per-eigenvector reversed blocks
    (``reverse_2``; reference :991-1012 — equivalent to concatenating each
    block reversed in eigenvector order).

    tokens/pos: (B, G, C); eigvecs: (B, G, k). Returns (B, S, C) pairs with
    S = 2kG (reverse or reverse_2) or kG.
    """
    orders = sort_orders_by_eigenvectors(eigvecs)  # (B, k, G)
    tok = apply_orders(tokens, orders)
    pp = apply_orders(pos, orders)
    if reverse:
        tok = jnp.concatenate([tok, tok[:, ::-1]], axis=1)
        pp = jnp.concatenate([pp, pp[:, ::-1]], axis=1)
    elif reverse_2:
        B, kG, C = tok.shape
        k = orders.shape[1]
        G = orders.shape[2]
        rev_blocks = tok.reshape(B, k, G, C)[:, :, ::-1].reshape(B, kG, C)
        rev_pos = pp.reshape(B, k, G, C)[:, :, ::-1].reshape(B, kG, C)
        tok = jnp.concatenate([tok, rev_blocks], axis=1)
        pp = jnp.concatenate([pp, rev_pos], axis=1)
    return tok, pp


def hlt_sequence(
    tokens: jax.Array,
    pos: jax.Array,
    eigvecs: jax.Array,
    k: int,
    rng: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """HLT ordering (reference :1054-1112): bucket tokens by multilevel sign
    codes of the k eigenvectors (+U(0,1) random tiebreak), then emit chunks of
    2^k tokens with the layout the reference's overlapping-write loop
    produces: [c0, rev(c0), c1, c2, …, c_{nd-1}, rev(c_{nd-1}), zeros…] over
    a 2G-token canvas (later iterations overwrite the interleaved reverse
    slots of earlier ones — replicated exactly).
    """
    B, G, C = tokens.shape
    codes = multilevel_codes(eigvecs, k)  # (B, G)
    codes = codes + jax.random.uniform(rng, codes.shape, codes.dtype)
    order = jnp.argsort(codes, axis=1)  # (B, G)
    tok = jnp.take_along_axis(tokens, order[..., None], axis=1)
    pp = jnp.take_along_axis(pos, order[..., None], axis=1)

    ng = 2**k  # chunk size
    nd = G // ng  # number of chunks

    def layout(x):
        # tokens beyond nd*ng are dropped, like the reference's loop that
        # never copies the remainder into its zero canvas
        chunks = x[:, : nd * ng].reshape(B, nd, ng, C)
        parts = [chunks[:, 0], chunks[:, 0, ::-1]]
        for i in range(1, nd):
            parts.append(chunks[:, i])
        parts.append(chunks[:, nd - 1, ::-1])
        seq = jnp.concatenate(parts, axis=1)  # (B, (nd+2)*ng, C)
        pad = 2 * G - seq.shape[1]
        if pad > 0:
            seq = jnp.concatenate([seq, jnp.zeros((B, pad, C), x.dtype)], axis=1)
        return seq

    return layout(tok), layout(pp)


def xyz_sequence(tokens: jax.Array, pos: jax.Array, center: jax.Array
                 ) -> tuple[jax.Array, jax.Array]:
    """'MAMBA' baseline ordering: concat sorts by x, y, z of the centers
    (reference :850-866). -> (B, 3G, C)."""
    orders = jnp.stack(
        [jnp.argsort(center[..., d], axis=-1) for d in range(3)], axis=1
    ).astype(jnp.int32)  # (B, 3, G)
    return apply_orders(tokens, orders), apply_orders(pos, orders)


def cross_merge(ys: jax.Array, eigvecs: jax.Array) -> jax.Array:
    """Merge a 2kG traversal sequence back to original token order and sum
    over traversals: inverse-permutation gather of the k forward and k
    reversed segments (reference ``cross_merg`` :350-370).

    Note: the reference pairs reversed segment j with eigenvector j's inverse
    permutation even though segment j of the flipped half carries traversal
    k-1-j (a latent mismatch in dead-config code); we pair them correctly.
    """
    B, L, D = ys.shape
    G, k = eigvecs.shape[1], eigvecs.shape[2]
    assert L == 2 * k * G, (
        f"cross_merge expects the k-fwd + k-reversed layout (L=2kG); got "
        f"L={L}, k={k}, G={G} — add_after_layer requires reverse=True")
    orders = sort_orders_by_eigenvectors(eigvecs)  # (B, k, G)
    inv = jnp.argsort(orders, axis=-1)  # inverse permutations (B, k, G)
    fwd = ys[:, : k * G].reshape(B, k, G, D)
    # flipped half: segment j holds traversal k-1-j reversed
    rev = ys[:, k * G :].reshape(B, k, G, D)[:, ::-1, ::-1]
    un_f = jnp.take_along_axis(fwd, inv[..., None], axis=2)
    un_r = jnp.take_along_axis(rev, inv[..., None], axis=2)
    return jnp.sum(un_f + un_r, axis=1)  # (B, G, D)


def resort_sequence(x: jax.Array, eigvecs: jax.Array, reverse: bool = True) -> jax.Array:
    """Rebuild the k-traversal (+flip) sequence from per-token features."""
    orders = sort_orders_by_eigenvectors(eigvecs)
    seq = apply_orders(x, orders)
    if reverse:
        seq = jnp.concatenate([seq, seq[:, ::-1]], axis=1)
    return seq
