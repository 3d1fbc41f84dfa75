"""Fused mixer Pallas kernel (conv→proj→scan→gate in one kernel) vs the
unfused sequential-oracle mixer — values AND every parameter gradient, in
interpret mode on CPU. Native-TPU counterparts live in test_pallas_tpu.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from si_mamba_tpu.ops.selective_scan import mamba_mixer_apply


def _params(d_model=32, d_state=4, dt_rank=2, d_conv=4, seed=0):
    d_inner = 2 * d_model
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    return {
        "in_proj_w": mk(d_model, 2 * d_inner) * 0.2,
        "conv_w": mk(d_inner, d_conv) * 0.3,
        "conv_b": mk(d_inner) * 0.1,
        "x_proj_w": mk(d_inner, dt_rank + 2 * d_state) * 0.2,
        "dt_proj_w": mk(dt_rank, d_inner) * 0.3,
        "dt_proj_b": mk(d_inner) * 0.1,
        "A_log": jnp.log(jnp.abs(mk(d_inner, d_state)) + 0.5),
        "D": mk(d_inner),
        "out_proj_w": mk(d_inner, d_model) * 0.2,
    }


def _apply(params, x, impl, d_state=4, dt_rank=2):
    return mamba_mixer_apply(params, x, d_state=d_state, dt_rank=dt_rank,
                             impl=impl)


@pytest.mark.parametrize("L", [64, 80, 7])  # aligned, ragged, sub-chunk
def test_fused_mixer_forward_matches_seq(L):
    params = _params()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, L, 32)).astype(np.float32))
    y_ref = _apply(params, x, "seq")
    y = _apply(params, x, "fused_interpret")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-4,
                               atol=2e-5)


def test_fused_mixer_all_grads_match_seq():
    params = _params(seed=3)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 80, 32)).astype(np.float32))

    def loss(params, x, impl):
        y = _apply(params, x, impl)
        return jnp.sum(y ** 2)

    (gp_ref, gx_ref) = jax.grad(lambda p, x: loss(p, x, "seq"),
                                argnums=(0, 1))(params, x)
    (gp, gx) = jax.grad(lambda p, x: loss(p, x, "fused_interpret"),
                        argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-3,
                               atol=2e-4)
    for k in params:
        a, b = np.asarray(gp[k]), np.asarray(gp_ref[k])
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, rtol=2e-3, atol=2e-4,
                                   err_msg=k)


def test_fused_mixer_multichunk_state_carry():
    """L spanning several chunks exercises the h / conv / dh carries."""
    params = _params(seed=6)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 3 * 64, 32)).astype(np.float32))
    y_ref = _apply(params, x, "seq")
    y = _apply(params, x, "fused_interpret")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-4,
                               atol=2e-5)

    def loss(x, impl):
        return jnp.sum(_apply(params, x, impl) ** 2)

    gx_ref = jax.grad(lambda x: loss(x, "seq"))(x)
    gx = jax.grad(lambda x: loss(x, "fused_interpret"))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-3,
                               atol=2e-4)
