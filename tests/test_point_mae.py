"""Point-MAE pretraining model tests: masking invariants, token restoration,
forward/backward, noaug feature extraction."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from si_mamba_tpu.models import PointMAEMamba, PointMAEConfig
from si_mamba_tpu.models.point_mae import (
    block_mask,
    random_mask,
    restore_tokens,
    select_by_rank,
)

TINY = PointMAEConfig(trans_dim=32, encoder_dims=32, depth=2, decoder_depth=1,
                      group_size=8, num_group=16, knn_graph=4,
                      k_top_eigenvectors=4, wavelet_J=3, sinkhorn_iters=10)


def test_random_mask_exact_count():
    m = np.asarray(random_mask(jax.random.key(0), 4, 64, 38))
    assert m.shape == (4, 64)
    np.testing.assert_array_equal(m.sum(-1), 38)
    m2 = np.asarray(random_mask(jax.random.key(1), 4, 64, 38))
    assert (m != m2).any()


def test_block_mask_contiguous():
    rng = np.random.default_rng(0)
    center = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    m = np.asarray(block_mask(jax.random.key(0), center, 12))
    np.testing.assert_array_equal(m.sum(-1), 12)


def test_restore_tokens_roundtrip():
    """Restoring then selecting must return the original tokens."""
    rng = np.random.default_rng(1)
    B, S, C, n_mask = 2, 12, 4, 5
    mask = np.zeros((B, S), np.float32)
    for b in range(B):
        mask[b, rng.choice(S, n_mask, replace=False)] = 1
    vis = jnp.asarray(rng.standard_normal((B, S - n_mask, C)).astype(np.float32))
    mtok = jnp.asarray(rng.standard_normal((B, n_mask, C)).astype(np.float32))
    canvas = restore_tokens(jnp.asarray(mask), vis, mtok)
    assert canvas.shape == (B, S, C)
    vis_back = select_by_rank(canvas, jnp.asarray(mask), S - n_mask, masked=False)
    msk_back = select_by_rank(canvas, jnp.asarray(mask), n_mask, masked=True)
    np.testing.assert_allclose(np.asarray(vis_back), np.asarray(vis))
    np.testing.assert_allclose(np.asarray(msk_back), np.asarray(mtok))


def _variables_and_pts(cfg=TINY, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    model = PointMAEMamba(cfg)
    v = model.init({"params": jax.random.key(0), "mask": jax.random.key(1),
                    "gumbel": jax.random.key(2)}, pts, train=False)
    return model, v, pts


def test_point_mae_eval_forward():
    model, v, pts = _variables_and_pts()
    loss = model.apply(v, pts, train=False, rngs={"mask": jax.random.key(1)})
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_point_mae_noaug_features():
    model, v, pts = _variables_and_pts()
    feats = model.apply(v, pts, train=False, noaug=True)
    # 2 * K * G visible tokens when nothing is masked
    assert feats.shape == (2, 2 * 4 * 16, 32)


def test_point_mae_train_backward():
    model, v, pts = _variables_and_pts()

    def loss_fn(params):
        loss, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            pts, train=True, tau=0.5, mutable=["batch_stats"],
            rngs={"mask": jax.random.key(3), "dropout": jax.random.key(4),
                  "gumbel": jax.random.key(5)})
        return loss

    loss, g = jax.value_and_grad(loss_fn)(v["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # mask token must receive gradient (it feeds the decoder)
    assert float(jnp.abs(g["mask_token"]).sum()) > 0
    # the wavelet mixer must receive gradient through the sinkhorn ST perms
    assert float(jnp.abs(g["diff_sgwt"]["mixer_fc1"]["kernel"]).sum()) > 0


def test_point_mae_jit():
    model, v, pts = _variables_and_pts()
    f = jax.jit(lambda v, p: model.apply(v, p, train=False,
                                         rngs={"mask": jax.random.key(1)}))
    l1 = f(v, pts)
    l2 = f(v, pts)
    np.testing.assert_allclose(float(l1), float(l2))


def test_point_mae_vis_output(tmp_path):
    model, v, pts = _variables_and_pts()
    loss, rec = model.apply(v, pts, train=False, vis=True,
                            rngs={"mask": jax.random.key(1)})
    # 2 * K * n_mask masked groups of group_size points
    assert rec["rebuild"].shape == rec["gt"].shape
    assert rec["rebuild"].shape[0] == 2 and rec["rebuild"].shape[-2:] == (8, 3)

    from si_mamba_tpu.train.runner_vis import vis_run

    class L:
        def epoch(self, _):
            yield np.asarray(pts), np.zeros(2, np.int32)

    tags = vis_run(TINY, v, L(), str(tmp_path), max_samples=2)
    assert len(tags) == 2
    import os

    assert os.path.exists(tmp_path / "sample_0000_full.jpg")


def test_point_mae_legacy_mamba_method():
    import dataclasses

    cfg = dataclasses.replace(TINY, method="MAMBA")
    model = PointMAEMamba(cfg)
    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    v = model.init({"params": jax.random.key(0), "mask": jax.random.key(1)},
                   pts, train=False)
    loss = model.apply(v, pts, train=False, rngs={"mask": jax.random.key(1)})
    assert np.isfinite(float(loss)) and float(loss) > 0
    feats = model.apply(v, pts, train=False, noaug=True)
    assert feats.shape == (2, 16, 32)  # all G tokens visible

    def loss_fn(params):
        loss, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            pts, train=True, mutable=["batch_stats"],
            rngs={"mask": jax.random.key(2), "dropout": jax.random.key(3)})
        return loss

    g = jax.grad(loss_fn)(v["params"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))
