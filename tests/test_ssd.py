"""Chunked SSD (scalar-decay SSM, ops/ssd.py) vs its sequential oracle —
values and gradients — plus the full SSD mixer and the opt-in model path.

The SSD mixer is a beyond-reference MXU-native alternative (no parity
claim); these tests pin its internal consistency, not reference behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from si_mamba_tpu.ops.ssd import ssd_chunked, ssd_mixer_apply, ssd_scan_ref


def _inputs(b=2, l=96, h=3, p=8, n=16, seed=0):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal((b, l, h, p)).astype(np.float32))
    dt = jnp.asarray(r.uniform(0.01, 0.3, (b, l, h)).astype(np.float32))
    A = jnp.asarray(-r.uniform(0.5, 4.0, h).astype(np.float32))
    Bm = jnp.asarray(r.standard_normal((b, l, n)).astype(np.float32) * 0.5)
    Cm = jnp.asarray(r.standard_normal((b, l, n)).astype(np.float32) * 0.5)
    D = jnp.asarray(r.standard_normal(h).astype(np.float32))
    return x, dt, A, Bm, Cm, D


@pytest.mark.parametrize("chunk", [32, 48, 96])  # multi-chunk, ragged-ish, single
def test_ssd_chunked_matches_scan(chunk):
    args = _inputs()
    ref = np.asarray(ssd_scan_ref(*args))
    got = np.asarray(ssd_chunked(*args, chunk=chunk))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5 * np.abs(ref).max())


def test_ssd_chunked_grads_match_scan():
    args = _inputs(b=1, l=64, h=2, p=4, n=8)
    tang = jnp.asarray(np.random.default_rng(1)
                       .standard_normal((1, 64, 2, 4)).astype(np.float32))

    def loss(fn, *a):
        return jnp.sum(fn(*a) * tang)

    g_ref = jax.grad(lambda *a: loss(ssd_scan_ref, *a), argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_got = jax.grad(lambda *a: loss(ssd_chunked, *a), argnums=(0, 1, 2, 3, 4, 5))(*args)
    for name, a, b_ in zip(["x", "dt", "A", "B", "C", "D"], g_ref, g_got):
        a, b_ = np.asarray(a), np.asarray(b_)
        err = np.abs(a - b_).max() / (np.abs(a).max() + 1e-8)
        assert err < 1e-4, (name, err)


def test_ssd_no_overflow_at_strong_decay():
    """Large dt·|A| (production-width regime) must not overflow: the s>t
    decay exponents are POSITIVE and huge — exp before masking gives
    inf*0=NaN (the bug this pins); log-space masking keeps it finite, and
    the result still matches the sequential oracle."""
    r = np.random.default_rng(2)
    b, l, h, p, n = 1, 128, 2, 4, 8
    x = jnp.asarray(r.standard_normal((b, l, h, p)).astype(np.float32))
    dt = jnp.asarray(r.uniform(0.5, 1.0, (b, l, h)).astype(np.float32))
    A = jnp.asarray(np.full(h, -16.0, np.float32))  # exponents up to ~2000
    Bm = jnp.asarray(r.standard_normal((b, l, n)).astype(np.float32))
    Cm = jnp.asarray(r.standard_normal((b, l, n)).astype(np.float32))
    D = jnp.zeros(h)
    got = np.asarray(ssd_chunked(x, dt, A, Bm, Cm, D, chunk=128))
    assert np.isfinite(got).all()
    ref = np.asarray(ssd_scan_ref(x, dt, A, Bm, Cm, D))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5 * np.abs(ref).max())


def test_ssd_chunked_full_tile_geometry():
    """Oracle parity at the PRODUCTION tile geometry (head_dim = d_state =
    chunk = 128 — the full-(8,128)-tile layout the model path defaults to;
    small-width tests above don't cover it)."""
    args = _inputs(b=1, l=256, h=2, p=128, n=128, seed=3)
    ref = np.asarray(ssd_scan_ref(*args))
    got = np.asarray(ssd_chunked(*args, chunk=128))
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5 * np.abs(ref).max())


def test_ssd_decay_reaches_across_chunks():
    """A token's influence must cross chunk boundaries through the carried
    state: zeroing the first chunk's inputs changes later outputs."""
    x, dt, A, Bm, Cm, D = _inputs(l=64)
    y_full = np.asarray(ssd_chunked(x, dt, A, Bm, Cm, D, chunk=32))
    x0 = x.at[:, :32].set(0.0)
    y_cut = np.asarray(ssd_chunked(x0, dt, A, Bm, Cm, D, chunk=32))
    assert np.abs(y_full[:, 32:] - y_cut[:, 32:]).max() > 1e-3


def _mixer_params(d_model=32, n_heads=4, head_p=8, d_state=16, d_conv=4, seed=0):
    d_inner = n_heads * head_p
    r = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(r.standard_normal(s).astype(np.float32))
    return {
        "in_proj_w": mk(d_model, 2 * d_inner + 2 * d_state + n_heads) * 0.2,
        "conv_w": mk(d_inner + 2 * d_state, d_conv) * 0.3,
        "conv_b": mk(d_inner + 2 * d_state) * 0.1,
        "dt_bias": mk(n_heads) * 0.1,
        "A_log": jnp.log(jnp.abs(mk(n_heads)) + 0.5),
        "D": mk(n_heads),
        "norm_scale": jnp.ones(d_inner),
        "out_proj_w": mk(d_inner, d_model) * 0.2,
    }


def test_ssd_mixer_shapes_padding_and_dtype():
    params = _mixer_params()
    r = np.random.default_rng(1)
    for l in (64, 70):  # chunk-aligned and ragged (pads internally)
        u = jnp.asarray(r.standard_normal((2, l, 32)).astype(np.float32))
        y = ssd_mixer_apply(params, u, n_heads=4, d_state=16, chunk=32)
        assert y.shape == (2, l, 32)
        assert np.isfinite(np.asarray(y)).all()
    # ragged == aligned on the shared prefix (padding must not leak back)
    u = jnp.asarray(r.standard_normal((2, 70, 32)).astype(np.float32))
    y_ragged = np.asarray(ssd_mixer_apply(params, u, n_heads=4, d_state=16,
                                          chunk=32))
    y_exact = np.asarray(ssd_mixer_apply(params, u[:, :64], n_heads=4,
                                         d_state=16, chunk=32))
    np.testing.assert_allclose(y_ragged[:, :64], y_exact, rtol=1e-5, atol=1e-5)
    # bf16 in -> bf16 out, fp32 internals keep values sane
    yb = ssd_mixer_apply(params, u.astype(jnp.bfloat16), n_heads=4, d_state=16,
                         chunk=32)
    assert yb.dtype == jnp.bfloat16
    rel = (np.abs(np.asarray(yb, np.float32) - y_ragged).max()
           / (np.abs(y_ragged).max() + 1e-8))
    assert rel < 0.05, rel


def test_pointmamba_ssd_mixer_trains():
    """PointMamba with mixer='ssd' — forward shape + one train step moves
    the loss (smoke; the SSD path is opt-in, no reference parity claim)."""
    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.models.point_mamba import cross_entropy_loss_acc

    cfg = PointMambaConfig(trans_dim=32, depth=2, cls_dim=4, group_size=8,
                           num_group=16, encoder_dims=32, knn_graph=4,
                           drop_path=0.0, mixer="ssd")
    model = PointMamba(cfg)
    r = np.random.default_rng(0)
    pts = jnp.asarray(r.standard_normal((4, 128, 3)).astype(np.float32))
    labels = jnp.asarray(r.integers(0, 4, 4).astype(np.int32))
    variables = model.init(jax.random.key(0), pts, train=False)
    logits = model.apply(variables, pts, train=False)
    assert logits.shape == (4, 4) and np.isfinite(np.asarray(logits)).all()

    def loss_fn(params):
        out, upd = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)})
        loss, _ = cross_entropy_loss_acc(out, labels)
        return jnp.mean(loss)

    l0, g = jax.value_and_grad(loss_fn)(variables["params"])
    p1 = jax.tree.map(lambda p, gr: p - 0.05 * gr, variables["params"], g)
    l1 = loss_fn(p1)
    assert float(l1) < float(l0)


def test_ssd_seq_parallel_matches_chunked():
    """SSD with TIME sharded over an 8-device 'seq' axis == the single-device
    chunked result (values): the chunk-carry is affine, so each slice runs
    from zero and fixes up with one gathered entry state."""
    from si_mamba_tpu.parallel import make_mesh
    from si_mamba_tpu.parallel.seq_scan import ssd_seq_parallel

    args = _inputs(b=2, l=128, h=3, p=8, n=16, seed=4)
    mesh = make_mesh(jax.devices()[:8], axis_names=("seq",))
    # chunk=8 with l_local=16 -> TWO chunks per shard: exercises the
    # slice-total decay being the SUM of every chunk's last entry (a
    # last-chunk-only regression would pass any 1-chunk-per-shard test)
    y = ssd_seq_parallel(*args, mesh=mesh, chunk=8)
    y_ref = ssd_chunked(*args, chunk=8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5,
                               atol=2e-5 * np.abs(np.asarray(y_ref)).max())


def test_ssd_seq_parallel_bf16():
    """bf16 inputs through the sharded path: output dtype preserved and
    values track the fp32 single-device result within bf16 tolerance."""
    from si_mamba_tpu.parallel import make_mesh
    from si_mamba_tpu.parallel.seq_scan import ssd_seq_parallel

    x, dt, A, Bm, Cm, D = _inputs(b=1, l=64, h=2, p=8, n=8, seed=6)
    mesh = make_mesh(jax.devices()[:8], axis_names=("seq",))
    y32 = np.asarray(ssd_chunked(x, dt, A, Bm, Cm, D, chunk=8))
    yb = ssd_seq_parallel(x.astype(jnp.bfloat16), dt, A,
                          Bm.astype(jnp.bfloat16), Cm.astype(jnp.bfloat16),
                          D, mesh=mesh, chunk=8)
    assert yb.dtype == jnp.bfloat16
    rel = (np.abs(np.asarray(yb, np.float32) - y32).max()
           / (np.abs(y32).max() + 1e-8))
    assert rel < 0.05, rel


def test_ssd_seq_parallel_grads():
    """Autodiff through the shard_map'd seq-parallel SSD matches the
    single-device chunked gradients."""
    from si_mamba_tpu.parallel import make_mesh
    from si_mamba_tpu.parallel.seq_scan import ssd_seq_parallel

    x, dt, A, Bm, Cm, D = _inputs(b=1, l=64, h=2, p=4, n=8, seed=5)
    mesh = make_mesh(jax.devices()[:8], axis_names=("seq",))

    def lp(x, dt, Bm, Cm):
        return jnp.sum(ssd_seq_parallel(x, dt, A, Bm, Cm, D, mesh=mesh,
                                        chunk=8) ** 2)

    def ls(x, dt, Bm, Cm):
        return jnp.sum(ssd_chunked(x, dt, A, Bm, Cm, D, chunk=8) ** 2)

    gp = jax.jit(jax.grad(lp, argnums=(0, 1, 2, 3)))(x, dt, Bm, Cm)
    gs = jax.grad(ls, argnums=(0, 1, 2, 3))(x, dt, Bm, Cm)
    for name, a, b_ in zip("x dt B C".split(), gp, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3,
                                   atol=1e-4, err_msg=name)


def test_ssd_mixer_tensor_parallel_matches():
    """TP SSD mixer (heads over a 4-way 'model' axis) == the single-device
    packed ssd_mixer_apply, values and input grads."""
    from si_mamba_tpu.parallel import make_mesh
    from si_mamba_tpu.parallel.tensor_parallel import (
        shard_ssd_mixer_params,
        ssd_mixer_tp,
    )

    params = _mixer_params()  # d_model=32, n_heads=4, head_p=8, d_state=16
    r = np.random.default_rng(2)
    u = jnp.asarray(r.standard_normal((2, 64, 32)).astype(np.float32))
    mesh = make_mesh(jax.devices()[:4], axis_names=("model",))
    tp_params = shard_ssd_mixer_params(params, mesh, n_heads=4, d_state=16)

    y_ref = ssd_mixer_apply(params, u, n_heads=4, d_state=16, chunk=32)
    y_tp = jax.jit(lambda p, x: ssd_mixer_tp(p, x, mesh=mesh, n_heads=4,
                                             d_state=16, chunk=32))(tp_params, u)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(lambda x: jnp.sum(ssd_mixer_apply(
        params, x, n_heads=4, d_state=16, chunk=32) ** 2))(u)
    g_tp = jax.jit(jax.grad(lambda x: jnp.sum(ssd_mixer_tp(
        tp_params, x, mesh=mesh, n_heads=4, d_state=16, chunk=32) ** 2)))(u)
    np.testing.assert_allclose(np.asarray(g_tp), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_ssd_tp_in_model_stack():
    """MixerModel with mixer='ssd' and tp_axis='model' (2 heads over a 2-way
    axis, context mesh) matches the replicated SSD stack on the same params."""
    from si_mamba_tpu.models.layers import MixerModel
    from si_mamba_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    # d_model=128 -> d_inner=256 -> head_dim=128 -> 2 heads (whole heads
    # must divide the model-axis size)
    mesh = make_mesh(jax.devices()[:2], axis_names=("model",))
    mm = MixerModel(d_model=128, n_layer=2, mixer="ssd")
    x = jnp.asarray(rng.standard_normal((2, 32, 128)).astype(np.float32))
    pos = jnp.zeros_like(x)
    vm = mm.init(jax.random.key(1), x, pos)
    y0 = mm.apply(vm, x, pos)

    mm_tp = MixerModel(d_model=128, n_layer=2, mixer="ssd", tp_axis="model")
    with jax.set_mesh(mesh):
        y1 = jax.jit(lambda v, x, p: mm_tp.apply(v, x, p))(vm, x, pos)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=2e-4,
                               atol=2e-5)


def test_ssd_mixer_odd_width_head_fallback():
    """d_inner not divisible by the default head_dim=128 must fall back to a
    true DIVISOR (d_model=224 -> d_inner=448: floor-division would pick the
    non-divisor 149 and crash the head reshape)."""
    from si_mamba_tpu.models.layers import SSDMixer

    m = SSDMixer(d_model=224, d_state=16, chunk=32)
    r = np.random.default_rng(0)
    u = jnp.asarray(r.standard_normal((2, 64, 224)).astype(np.float32))
    v = m.init(jax.random.key(0), u)
    y = m.apply(v, u)
    assert y.shape == u.shape and np.isfinite(np.asarray(y)).all()


def test_pointmae_ssd_mixer_forward():
    """PointMAEMamba with mixer='ssd' — the opt-in mixer is plumbed through
    both MAE encoder/decoder stacks (finite loss, loss rngs wired)."""
    from si_mamba_tpu.models.point_mae import PointMAEConfig, PointMAEMamba

    cfg = PointMAEConfig(trans_dim=32, encoder_dims=32, depth=2,
                         decoder_depth=2, group_size=8, num_group=16,
                         knn_graph=4, k_top_eigenvectors=2, mixer="ssd")
    model = PointMAEMamba(cfg)
    r = np.random.default_rng(0)
    pts = jnp.asarray(r.standard_normal((2, 128, 3)).astype(np.float32))
    rngs = {"params": jax.random.key(0), "mask": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = model.init(rngs, pts, train=False)
    loss = model.apply(variables, pts, train=False,
                       rngs={"mask": jax.random.key(3),
                             "gumbel": jax.random.key(4)})
    assert np.isfinite(float(loss))


def test_partseg_ssd_mixer_forward():
    """PartSegModel with mixer='ssd' — per-point log-probs stay finite."""
    from si_mamba_tpu.models.segmentation import PartSegConfig, PartSegModel

    cfg = PartSegConfig(trans_dim=32, depth=2, cls_dim=10, num_categories=4,
                        group_size=8, num_group=32, encoder_dims=32,
                        knn_graph=4, k_top_eigenvectors=2, fetch_idx=(0, 1),
                        method="SAST", mixer="ssd")
    model = PartSegModel(cfg)
    r = np.random.default_rng(0)
    pts = jnp.asarray(r.standard_normal((2, 256, 3)).astype(np.float32))
    cls_label = jax.nn.one_hot(jnp.asarray([1, 3]), 4)
    variables = model.init(jax.random.key(0), pts, cls_label, train=False)
    logp = model.apply(variables, pts, cls_label, train=False)
    assert logp.shape == (2, 256, 10)
    assert np.isfinite(np.asarray(logp)).all()
