"""Selective-scan correctness: associative form vs the sequential oracle, the
causal depthwise conv vs torch.nn.functional.conv1d, and the full mixer math
vs an independent numpy recurrence."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from si_mamba_tpu.ops import (
    causal_conv1d,
    mamba_mixer_apply,
    selective_scan_assoc,
    selective_scan_seq,
)


def _rand_inputs(b=2, l=24, d=8, n=4, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((b, l, d)).astype(np.float32)
    delta = rng.standard_normal((b, l, d)).astype(np.float32)
    A = -np.exp(rng.standard_normal((d, n))).astype(np.float32)
    B = rng.standard_normal((b, l, n)).astype(np.float32)
    C = rng.standard_normal((b, l, n)).astype(np.float32)
    D = rng.standard_normal(d).astype(np.float32)
    z = rng.standard_normal((b, l, d)).astype(np.float32)
    dt_bias = rng.standard_normal(d).astype(np.float32)
    return u, delta, A, B, C, D, z, dt_bias


def _np_selective_scan(u, delta, A, B, C, D, z, dt_bias):
    b, l, d = u.shape
    n = A.shape[1]
    delta = np.log1p(np.exp(delta + dt_bias))  # softplus
    h = np.zeros((b, d, n))
    ys = np.zeros((b, l, d))
    for t in range(l):
        dA = np.exp(delta[:, t, :, None] * A[None])
        dBu = (delta[:, t] * u[:, t])[:, :, None] * B[:, t, None, :]
        h = dA * h + dBu
        ys[:, t] = np.einsum("bdn,bn->bd", h, C[:, t]) + D * u[:, t]
    sz = z / (1 + np.exp(-z))
    return ys * sz


def test_seq_matches_numpy():
    args = _rand_inputs()
    got = np.asarray(selective_scan_seq(*args[:5], D=args[5], z=args[6], delta_bias=args[7]))
    ref = _np_selective_scan(*args)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_assoc_matches_seq():
    args = _rand_inputs(b=2, l=64, d=16, n=8, seed=1)
    y_seq = np.asarray(selective_scan_seq(*args[:5], D=args[5], z=args[6], delta_bias=args[7]))
    y_as = np.asarray(selective_scan_assoc(*args[:5], D=args[5], z=args[6], delta_bias=args[7]))
    np.testing.assert_allclose(y_as, y_seq, rtol=1e-4, atol=1e-5)


def test_assoc_no_optional_args():
    u, delta, A, B, C, *_ = _rand_inputs(seed=2)
    y_seq = np.asarray(selective_scan_seq(u, delta, A, B, C, delta_softplus=False))
    y_as = np.asarray(selective_scan_assoc(u, delta, A, B, C, delta_softplus=False))
    np.testing.assert_allclose(y_as, y_seq, rtol=1e-4, atol=1e-5)


def test_causal_conv_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 20, 6)).astype(np.float32)
    w = rng.standard_normal((6, 4)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    got = np.asarray(causal_conv1d(x, w, b, activation=None))
    xt = torch.from_numpy(x).transpose(1, 2)  # (B, D, L)
    ref = F.conv1d(xt, torch.from_numpy(w).unsqueeze(1), torch.from_numpy(b),
                   padding=3, groups=6)[..., :20].transpose(1, 2).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_mixer_apply_shapes_and_grad():
    d_model, d_inner, d_state, dt_rank, d_conv = 16, 32, 4, 2, 4
    rng = np.random.default_rng(0)
    params = {
        "in_proj_w": rng.standard_normal((d_model, 2 * d_inner)).astype(np.float32) * 0.1,
        "conv_w": rng.standard_normal((d_inner, d_conv)).astype(np.float32) * 0.1,
        "conv_b": np.zeros(d_inner, np.float32),
        "x_proj_w": rng.standard_normal((d_inner, dt_rank + 2 * d_state)).astype(np.float32) * 0.1,
        "dt_proj_w": rng.standard_normal((dt_rank, d_inner)).astype(np.float32) * 0.1,
        "dt_proj_b": np.zeros(d_inner, np.float32),
        "A_log": np.log(np.tile(np.arange(1, d_state + 1, dtype=np.float32), (d_inner, 1))),
        "D": np.ones(d_inner, np.float32),
        "out_proj_w": rng.standard_normal((d_inner, d_model)).astype(np.float32) * 0.1,
    }
    params = {k: jnp.asarray(v) for k, v in params.items()}
    x = jnp.asarray(rng.standard_normal((2, 12, d_model)).astype(np.float32))
    y_as = mamba_mixer_apply(params, x, d_state=d_state, dt_rank=dt_rank, impl="assoc")
    y_sq = mamba_mixer_apply(params, x, d_state=d_state, dt_rank=dt_rank, impl="seq")
    assert y_as.shape == x.shape
    np.testing.assert_allclose(np.asarray(y_as), np.asarray(y_sq), rtol=1e-4, atol=1e-5)

    def loss(p):
        return jnp.sum(mamba_mixer_apply(p, x, d_state=d_state, dt_rank=dt_rank) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(g))


def test_chunked_matches_seq():
    from si_mamba_tpu.ops.selective_scan import selective_scan_chunked

    args = _rand_inputs(b=2, l=50, d=12, n=6, seed=3)  # l not divisible by chunk
    y_seq = np.asarray(selective_scan_seq(*args[:5], D=args[5], z=args[6], delta_bias=args[7]))
    y_ch = np.asarray(selective_scan_chunked(*args[:5], D=args[5], z=args[6],
                                             delta_bias=args[7], chunk=16))
    np.testing.assert_allclose(y_ch, y_seq, rtol=1e-4, atol=1e-5)


def test_chunked_grad_finite():
    from si_mamba_tpu.ops.selective_scan import selective_scan_chunked

    u, delta, A, B, C, D, z, dt_bias = _rand_inputs(b=1, l=32, d=8, n=4, seed=4)

    def loss(u, delta, A, B, C):
        return jnp.sum(selective_scan_chunked(u, delta, A, B, C, D=D, z=z,
                                              delta_bias=dt_bias, chunk=8) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
