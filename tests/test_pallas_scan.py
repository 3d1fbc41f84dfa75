"""Pallas selective-scan kernel vs the sequential oracle (interpret mode on
CPU; the same kernel compiles natively on TPU — exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from si_mamba_tpu.ops.pallas.selective_scan_kernel import selective_scan_pallas
from si_mamba_tpu.ops.selective_scan import selective_scan_seq


def _inputs(b=2, l=64, d=32, n=4, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    return dict(u=mk(b, l, d), delta=mk(b, l, d) * 0.5, A=-jnp.exp(mk(d, n)),
                B=mk(b, l, n), C=mk(b, l, n), D=mk(d), z=mk(b, l, d),
                delta_bias=mk(d) * 0.1)


def test_pallas_matches_seq_interpret():
    kw = _inputs()
    y_ref = selective_scan_seq(kw["u"], kw["delta"], kw["A"], kw["B"], kw["C"],
                               D=kw["D"], z=kw["z"], delta_bias=kw["delta_bias"])
    y = selective_scan_pallas(kw["u"], kw["delta"], kw["A"], kw["B"], kw["C"],
                              D=kw["D"], z=kw["z"], delta_bias=kw["delta_bias"],
                              block_d=32, chunk=16, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5)


def test_pallas_ragged_length_padding():
    kw = _inputs(l=50)  # not a multiple of chunk
    y_ref = selective_scan_seq(kw["u"], kw["delta"], kw["A"], kw["B"], kw["C"],
                               D=kw["D"], z=kw["z"], delta_bias=kw["delta_bias"])
    y = selective_scan_pallas(kw["u"], kw["delta"], kw["A"], kw["B"], kw["C"],
                              D=kw["D"], z=kw["z"], delta_bias=kw["delta_bias"],
                              block_d=32, chunk=16, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5)


def test_pallas_backward_matches_chunked():
    kw = _inputs(b=1, l=32, d=16, n=4, seed=1)

    def loss_pallas(u, delta, A, B, C, D, z, db):
        y = selective_scan_pallas(u, delta, A, B, C, D=D, z=z, delta_bias=db,
                                  block_d=16, chunk=16, interpret=True)
        return jnp.sum(y**2)

    def loss_seq(u, delta, A, B, C, D, z, db):
        y = selective_scan_seq(u, delta, A, B, C, D=D, z=z, delta_bias=db)
        return jnp.sum(y**2)

    args = (kw["u"], kw["delta"], kw["A"], kw["B"], kw["C"], kw["D"], kw["z"],
            kw["delta_bias"])
    g_p = jax.grad(loss_pallas, argnums=tuple(range(8)))(*args)
    g_s = jax.grad(loss_seq, argnums=tuple(range(8)))(*args)
    for a, b in zip(g_p, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)


def test_pallas_bf16_inputs_interpret():
    """bf16 activations with fp32 in-kernel state: matches the fp32 oracle to
    bf16 tolerance and returns bf16."""
    kw = _inputs(b=1, l=32, d=16, n=4, seed=5)
    to_bf = lambda x: x.astype(jnp.bfloat16)
    y = selective_scan_pallas(to_bf(kw["u"]), to_bf(kw["delta"]), kw["A"],
                              to_bf(kw["B"]), to_bf(kw["C"]), D=kw["D"],
                              z=to_bf(kw["z"]), delta_bias=kw["delta_bias"],
                              block_d=16, chunk=16, interpret=True)
    assert y.dtype == jnp.bfloat16
    y_ref = selective_scan_seq(kw["u"], kw["delta"], kw["A"], kw["B"], kw["C"],
                               D=kw["D"], z=kw["z"], delta_bias=kw["delta_bias"])
    err = np.abs(np.asarray(y, np.float32) - np.asarray(y_ref))
    rel = err / (np.abs(np.asarray(y_ref)) + 0.1)
    assert rel.max() < 0.1, rel.max()


def test_pallas_bf16_grads_interpret():
    """bf16 mixed-precision gradients vs the fp32 oracle.

    Pins the acceptable bf16 grad tolerance (ADVICE r2): the y_pre backward
    residual is stored in the input dtype, so in bf16 dz is computed from a
    bf16-rounded y0 — expect ~1e-2 rel-to-max error on dz (bf16 has ~3
    decimal digits), and the same order elsewhere from bf16 inputs."""
    kw = _inputs(b=1, l=32, d=16, n=4, seed=9)
    to_bf = lambda x: x.astype(jnp.bfloat16)

    def lp(u, delta, A, B, C, D, z, db):
        y = selective_scan_pallas(to_bf(u), to_bf(delta), A, to_bf(B),
                                  to_bf(C), D=D, z=to_bf(z), delta_bias=db,
                                  block_d=16, chunk=16, interpret=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def ls(u, delta, A, B, C, D, z, db):
        y = selective_scan_seq(u, delta, A, B, C, D=D, z=z, delta_bias=db)
        return jnp.sum(y**2)

    args = (kw["u"], kw["delta"], kw["A"], kw["B"], kw["C"], kw["D"], kw["z"],
            kw["delta_bias"])
    gp = jax.grad(lp, argnums=tuple(range(8)))(*args)
    gs = jax.grad(ls, argnums=tuple(range(8)))(*args)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dz", "ddelta_bias"]
    for name, a, b_ in zip(names, gp, gs):
        a, b_ = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        rel = np.abs(a - b_).max() / (np.abs(b_).max() + 1e-6)
        assert rel < 3e-2, (name, rel)


@pytest.mark.parametrize("shape", [
    (1, 7, 8, 2),     # tiny ragged L
    (3, 130, 24, 4),  # L just over one chunk, odd d
    (2, 256, 48, 16), # multi-chunk, full state dim
])
def test_pallas_fuzz_shapes_interpret(shape):
    b, l, d, n = shape
    rng = np.random.default_rng(hash(shape) % 2**31)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    u, delta, z = mk(b, l, d), mk(b, l, d) * 0.5, mk(b, l, d)
    A = -jnp.exp(mk(d, n)); B, C = mk(b, l, n), mk(b, l, n)
    D, db = mk(d), mk(d) * 0.1
    y = selective_scan_pallas(u, delta, A, B, C, D=D, z=z, delta_bias=db,
                              block_d=min(32, d), chunk=128, interpret=True)
    y_ref = selective_scan_seq(u, delta, A, B, C, D=D, z=z, delta_bias=db)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-4,
                               atol=2e-5)


def test_pallas_fuzz_grads_interpret():
    b, l, d, n = 2, 100, 16, 8  # ragged L exercises pad-region gradients
    rng = np.random.default_rng(77)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    u, delta, z = mk(b, l, d), mk(b, l, d) * 0.5, mk(b, l, d)
    A = -jnp.exp(mk(d, n)); B, C = mk(b, l, n), mk(b, l, n)
    D, db = mk(d), mk(d) * 0.1

    def lp(*a):
        return jnp.sum(selective_scan_pallas(*a[:5], D=a[5], z=a[6],
                                             delta_bias=a[7], block_d=16,
                                             chunk=128, interpret=True) ** 2)

    def ls(*a):
        return jnp.sum(selective_scan_seq(*a[:5], D=a[5], z=a[6],
                                          delta_bias=a[7]) ** 2)

    args = (u, delta, A, B, C, D, z, db)
    gp = jax.grad(lp, argnums=tuple(range(8)))(*args)
    gs = jax.grad(ls, argnums=tuple(range(8)))(*args)
    for a, b_ in zip(gp, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-3,
                                   atol=2e-4)


def test_pallas_causal_conv_matches_oracle():
    """Fused conv+SiLU Pallas kernel (fwd + full VJP) vs the XLA
    shifted-multiply oracle (ops/selective_scan.py:33), interpret mode."""
    from si_mamba_tpu.ops.pallas.causal_conv_kernel import causal_conv1d_silu_pallas
    from si_mamba_tpu.ops.selective_scan import causal_conv1d

    rng = np.random.default_rng(11)
    for B, L, D in [(2, 250, 128), (1, 64, 256)]:
        x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((D, 4)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(D).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))

        y_ref, vjp_ref = jax.vjp(
            lambda x, w, b: causal_conv1d(x, w, b, activation="silu"), x, w, bias)
        y_p, vjp_p = jax.vjp(
            lambda x, w, b: causal_conv1d_silu_pallas(x, w, b, interpret=True),
            x, w, bias)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)
        for a, b_ in zip(vjp_p(g), vjp_ref(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-5)


def test_pallas_scan_supported_predicate():
    """'auto' must not route widths the compiled kernel cannot tile to
    Pallas (Mosaic needs lane blocks %128 or the full dim). d_inner=96 is
    the dev soak configs' width (trans_dim=48); it picked bd=32 and died
    with a lowering ValueError on the real chip before the guard."""
    from si_mamba_tpu.ops.pallas.selective_scan_kernel import (
        _block_d_for,
        pallas_scan_supported,
    )

    assert pallas_scan_supported(768)   # production: bd=384
    assert pallas_scan_supported(256)   # bd=256
    assert pallas_scan_supported(64)    # bd == full dim: lowerable
    assert not pallas_scan_supported(96)   # bd=32: un-lowerable
    assert not pallas_scan_supported(48)   # bd=16: un-lowerable
    assert _block_d_for(96, 384) == 32  # documents the failing pick
