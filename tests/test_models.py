"""Model-layer tests: shapes, jit, determinism, ordering semantics, init
statistics, and gradient flow for the PointMamba classifier."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from si_mamba_tpu.models import MixerModel, PatchEncoder, PointMamba, PointMambaConfig
from si_mamba_tpu.models.ordering import (
    apply_orders,
    cross_merge,
    hlt_sequence,
    resort_sequence,
    sast_sequence,
    xyz_sequence,
)
from si_mamba_tpu.models.point_mamba import cross_entropy_loss_acc

TINY = PointMambaConfig(trans_dim=32, depth=2, cls_dim=5, group_size=8, num_group=16,
                        encoder_dims=32, knn_graph=4, k_top_eigenvectors=4, drop_path=0.1)


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((2, 128, 3)).astype(np.float32))


def test_apply_orders_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32))
    orders = jnp.stack([jnp.tile(jnp.arange(8)[::-1], (2, 1))], axis=1)
    out = apply_orders(x, orders)
    np.testing.assert_allclose(np.asarray(out[:, :8]), np.asarray(x[:, ::-1]))


def test_sast_sequence_layout():
    rng = np.random.default_rng(1)
    tok = jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32))
    pos = jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32))
    vecs = jnp.asarray(rng.standard_normal((2, 8, 3)).astype(np.float32))
    seq, pseq = sast_sequence(tok, pos, vecs, reverse=True)
    assert seq.shape == (2, 48, 4)
    # second half is the flip of the first
    np.testing.assert_allclose(np.asarray(seq[:, 24:]), np.asarray(seq[:, :24][:, ::-1]))
    # first block is tokens sorted by eigvec 0
    order0 = np.argsort(np.asarray(vecs[:, :, 0]), axis=1)
    for b in range(2):
        np.testing.assert_allclose(np.asarray(seq[b, :8]), np.asarray(tok[b])[order0[b]])
    # reverse_2: per-eigenvector reversed blocks
    seq2, _ = sast_sequence(tok, pos, vecs, reverse=False, reverse_2=True)
    np.testing.assert_allclose(np.asarray(seq2[:, 24:32]), np.asarray(seq2[:, :8][:, ::-1]))


def test_cross_merge_inverts_resort():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 6)).astype(np.float32))
    vecs = jnp.asarray(rng.standard_normal((2, 16, 4)).astype(np.float32))
    seq = resort_sequence(x, vecs, reverse=True)
    assert seq.shape == (2, 128, 6)
    merged = cross_merge(seq, vecs)
    # every traversal contributes x back in original order, fwd + rev = 2k copies
    np.testing.assert_allclose(np.asarray(merged), 8 * np.asarray(x), rtol=1e-5)


def test_hlt_sequence_layout():
    rng = np.random.default_rng(3)
    G, k = 64, 4
    tok = jnp.asarray(rng.standard_normal((2, G, 4)).astype(np.float32))
    pos = jnp.asarray(rng.standard_normal((2, G, 4)).astype(np.float32))
    vecs = jnp.asarray(rng.standard_normal((2, G, k)).astype(np.float32))
    seq, _ = hlt_sequence(tok, pos, vecs, k, jax.random.key(0))
    assert seq.shape == (2, 2 * G, 4)
    ng, nd = 2**k, G // 2**k
    # chunk1 is the reverse of chunk0; used region is (nd+2) chunks; tail is zero
    np.testing.assert_allclose(np.asarray(seq[:, ng : 2 * ng]), np.asarray(seq[:, :ng][:, ::-1]))
    used = (nd + 2) * ng
    np.testing.assert_allclose(np.asarray(seq[:, used:]), 0.0)


def test_xyz_sequence(pts):
    tok = pts[:, :16]
    seq, _ = xyz_sequence(tok, tok, tok)
    assert seq.shape == (2, 48, 3)
    # x-sorted block
    xs = np.sort(np.asarray(tok[:, :, 0]), axis=1)
    np.testing.assert_allclose(np.asarray(seq[:, :16, 0]), xs, rtol=1e-6)


def test_patch_encoder_shapes(pts):
    enc = PatchEncoder(32)
    groups = pts[:, :64].reshape(2, 8, 8, 3)
    vars_ = enc.init(jax.random.key(0), groups, train=False)
    out = enc.apply(vars_, groups, train=False)
    assert out.shape == (2, 8, 32)
    out2, updates = enc.apply(vars_, groups, train=True, mutable=["batch_stats"])
    assert "batch_stats" in updates


def test_mixer_model_forward():
    mm = MixerModel(d_model=32, n_layer=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 10, 32)).astype(np.float32))
    pos = jnp.zeros_like(x)
    vars_ = mm.init(jax.random.key(0), x, pos)
    y = mm.apply(vars_, x, pos)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.parametrize("method", ["SAST", "HLT", "MAMBA"])
def test_point_mamba_forward(pts, method):
    cfg = dataclasses.replace(TINY, method=method)
    model = PointMamba(cfg)
    variables = model.init(
        {"params": jax.random.key(0), "order": jax.random.key(1)}, pts, train=False)
    logits = model.apply(variables, pts, train=False,
                         rngs={"order": jax.random.key(1)})
    assert logits.shape == (2, 5)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_point_mamba_jit_and_eval_deterministic(pts):
    model = PointMamba(TINY)
    variables = model.init(jax.random.key(0), pts, train=False)
    f = jax.jit(lambda v, p: model.apply(v, p, train=False))
    l1, l2 = f(variables, pts), f(variables, pts)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))


def test_point_mamba_train_grads(pts):
    model = PointMamba(TINY)
    variables = model.init(jax.random.key(0), pts, train=False)
    labels = jnp.array([1, 3])

    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(2)})
        loss, _ = cross_entropy_loss_acc(logits, labels)
        return jnp.mean(loss)

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # every parameter receives gradient somewhere (mixer + encoder + head)
    nonzero = sum(float(jnp.abs(x).sum()) > 0 for x in leaves)
    assert nonzero / len(leaves) > 0.9


def test_mamba_init_statistics():
    """dt bias init must land softplus(dt_bias) in [1e-3, 0.1] (mamba-ssm)."""
    from si_mamba_tpu.models.layers import MambaMixer

    m = MambaMixer(d_model=64)
    x = jnp.zeros((1, 4, 64))
    v = m.init(jax.random.key(0), x)["params"]
    dt = jax.nn.softplus(v["dt_proj_bias"])
    assert float(dt.min()) >= 1e-4 and float(dt.max()) <= 0.11
    A_log = v["A_log"]
    np.testing.assert_allclose(np.asarray(A_log[:, 0]), 0.0, atol=1e-6)
    assert v["out_proj"].shape == (128, 64)


def test_cross_entropy_loss_acc():
    logits = jnp.array([[10.0, 0.0], [0.0, 10.0]])
    labels = jnp.array([0, 0])
    loss, acc = cross_entropy_loss_acc(logits, labels)
    assert loss.shape == (2,)
    assert float(acc) == 50.0


def test_point_mamba_bf16_forward(pts):
    """bf16 activations (reference pretrain autocast parity): forward must be
    finite with fp32 scan state under the hood."""
    cfg = dataclasses.replace(TINY, dtype="bfloat16")
    model = PointMamba(cfg)
    variables = model.init(jax.random.key(0), pts, train=False)
    logits = model.apply(variables, pts, train=False)
    # head Dense layers promote back to fp32 (params are fp32) — the mixers
    # and encoder ran in bf16; just require finite, sane outputs
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))
