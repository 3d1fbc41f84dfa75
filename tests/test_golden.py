"""Golden regression tests: fixed-seed forward outputs snapshotted to
tests/golden/*.npz. Catch silent numerics drift in future refactors (the
reference's 'published logs as golden records' idea, done properly —
SURVEY.md §4). Regenerate deliberately with REGEN_GOLDEN=1."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _check_or_save(name: str, value: np.ndarray, atol=2e-4):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if os.environ.get("REGEN_GOLDEN") == "1" or not os.path.exists(path):
        np.savez_compressed(path, value=value)
        pytest.skip(f"golden {name} (re)generated")
    ref = np.load(path)["value"]
    np.testing.assert_allclose(value, ref, atol=atol, rtol=1e-4)


def test_golden_point_mamba_logits():
    from si_mamba_tpu.models import PointMamba, PointMambaConfig

    cfg = PointMambaConfig(trans_dim=48, depth=3, cls_dim=7, group_size=8,
                           num_group=16, encoder_dims=48, knn_graph=4,
                           drop_path=0.0)
    model = PointMamba(cfg)
    rng = np.random.default_rng(1234)
    pts = jnp.asarray(rng.standard_normal((2, 96, 3)).astype(np.float32))
    v = model.init(jax.random.key(42), pts, train=False)
    logits = np.asarray(model.apply(v, pts, train=False))
    _check_or_save("point_mamba_logits", logits)


def test_golden_mae_loss():
    from si_mamba_tpu.models import PointMAEMamba, PointMAEConfig

    cfg = PointMAEConfig(trans_dim=48, encoder_dims=48, depth=2, decoder_depth=1,
                         group_size=8, num_group=16, knn_graph=4,
                         sinkhorn_iters=10)
    model = PointMAEMamba(cfg)
    rng = np.random.default_rng(99)
    pts = jnp.asarray(rng.standard_normal((2, 96, 3)).astype(np.float32))
    v = model.init({"params": jax.random.key(7), "mask": jax.random.key(8),
                    "gumbel": jax.random.key(9)}, pts, train=False)
    loss = np.asarray(model.apply(v, pts, train=False,
                                  rngs={"mask": jax.random.key(8)}))
    _check_or_save("mae_loss", np.atleast_1d(loss))


def test_golden_selective_scan():
    from si_mamba_tpu.ops import selective_scan_assoc

    rng = np.random.default_rng(5)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    y = selective_scan_assoc(mk(1, 48, 12), mk(1, 48, 12) * 0.4,
                             -jnp.exp(mk(12, 4)), mk(1, 48, 4), mk(1, 48, 4),
                             D=mk(12), z=mk(1, 48, 12), delta_bias=mk(12) * 0.1)
    _check_or_save("selective_scan", np.asarray(y))


def test_golden_spectral_orders():
    from si_mamba_tpu.ops import knn_adjacency, rw_laplacian, topk_eigh
    from si_mamba_tpu.ops.spectral import sort_orders_by_eigenvectors

    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    A = knn_adjacency(pts, k=6, symmetric=True, binary=True)
    _, vecs, _, _ = topk_eigh(rw_laplacian(A), 4, smallest=True)
    orders = np.asarray(sort_orders_by_eigenvectors(vecs))
    _check_or_save("spectral_orders", orders.astype(np.float32), atol=0)


def test_golden_partseg_logp():
    from si_mamba_tpu.models import PartSegModel, PartSegConfig

    cfg = PartSegConfig(trans_dim=48, depth=3, cls_dim=50, group_size=8,
                        num_group=16, encoder_dims=48, knn_graph=4,
                        fetch_idx=(0, 1, 2), drop_path=0.0, method="SAST")
    model = PartSegModel(cfg)
    rng = np.random.default_rng(21)
    pts = jnp.asarray(rng.standard_normal((1, 128, 3)).astype(np.float32))
    onehot = jax.nn.one_hot(jnp.array([3]), 16)
    v = model.init({"params": jax.random.key(5), "order": jax.random.key(6)},
                   pts, onehot, train=False)
    logp = np.asarray(model.apply(v, pts, onehot, train=False,
                                  rngs={"order": jax.random.key(6)}))
    _check_or_save("partseg_logp", logp)


def test_golden_hlt_sequence():
    from si_mamba_tpu.models.ordering import hlt_sequence

    rng = np.random.default_rng(31)
    tok = jnp.asarray(rng.standard_normal((1, 32, 4)).astype(np.float32))
    vecs = jnp.asarray(rng.standard_normal((1, 32, 4)).astype(np.float32))
    seq, _ = hlt_sequence(tok, tok, vecs, 4, jax.random.key(3))
    _check_or_save("hlt_sequence", np.asarray(seq))
