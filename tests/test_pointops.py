import jax
import jax.numpy as jnp
import numpy as np
import pytest

from si_mamba_tpu.ops import (
    fps,
    gather_points,
    group_points,
    knn,
    pairwise_dist,
    pairwise_sqdist,
    pairwise_sqdist_exact,
)


def _np_pairwise_sq(x, y):
    return ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)


@pytest.fixture
def clouds():
    rng = np.random.default_rng(0)
    return rng.standard_normal((2, 64, 3)).astype(np.float32)


def test_pairwise_matches_numpy(clouds):
    ref = _np_pairwise_sq(clouds, clouds)
    np.testing.assert_allclose(pairwise_sqdist_exact(clouds, clouds), ref, rtol=1e-6)
    np.testing.assert_allclose(pairwise_sqdist(clouds, clouds), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pairwise_dist(clouds, clouds), np.sqrt(ref), rtol=1e-5, atol=1e-6)


def _np_fps(points, n, start=0):
    B, N, _ = points.shape
    out = np.zeros((B, n), dtype=np.int64)
    for b in range(B):
        idxs = [start]
        mind = np.full(N, np.inf)
        for i in range(1, n):
            d = ((points[b] - points[b, idxs[-1]]) ** 2).sum(-1)
            mind = np.minimum(mind, d)
            idxs.append(int(np.argmax(mind)))
        out[b] = idxs
    return out


def test_fps_matches_numpy_oracle(clouds):
    got = np.asarray(fps(clouds, 16))
    ref = _np_fps(clouds, 16)
    np.testing.assert_array_equal(got, ref)


def test_fps_spreads_points(clouds):
    # FPS must pick distinct indices and cover better than the first-n prefix.
    idx = np.asarray(fps(clouds, 16))
    for b in range(idx.shape[0]):
        assert len(set(idx[b].tolist())) == 16


def test_fps_random_start():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((3, 32, 3)).astype(np.float32)
    starts = jnp.array([0, 5, 11], dtype=jnp.int32)
    idx = np.asarray(fps(pts, 8, start_idx=starts))
    np.testing.assert_array_equal(idx[:, 0], [0, 5, 11])


def test_knn_matches_numpy(clouds):
    q = clouds[:, :10]
    idx = np.asarray(knn(q, clouds, 5))
    d = _np_pairwise_sq(q, clouds)
    ref = np.argsort(d, axis=-1, kind="stable")[..., :5]
    # compare as sets per query (top_k tie order may differ)
    for b in range(idx.shape[0]):
        for i in range(idx.shape[1]):
            assert set(idx[b, i].tolist()) == set(ref[b, i].tolist())
    # nearest must be the query itself
    np.testing.assert_array_equal(idx[..., 0], np.arange(10)[None, :].repeat(2, 0))


def test_group_points_shapes(clouds):
    idx = knn(clouds[:, :8], clouds, 4)
    grouped = group_points(clouds, idx)
    assert grouped.shape == (2, 8, 4, 3)
    g = gather_points(clouds, idx[:, :, 0])
    np.testing.assert_allclose(grouped[:, :, 0], g)


def test_ops_jittable(clouds):
    f = jax.jit(lambda p: group_points(p, knn(gather_points(p, fps(p, 8)), p, 4)))
    out = f(clouds)
    assert out.shape == (2, 8, 4, 3)


def test_ball_query(clouds):
    from si_mamba_tpu.ops.pointops import ball_query

    q = clouds[:, :6]
    idx = np.asarray(ball_query(q, clouds, radius=0.8, max_samples=8))
    assert idx.shape == (2, 6, 8)
    d = _np_pairwise_sq(np.asarray(q), clouds)
    for b in range(2):
        for i in range(6):
            # all returned neighbors are within the radius
            assert (d[b, i, idx[b, i]] <= 0.8**2 + 1e-5).all()
    # the query point itself is always in-radius -> slot 0 is itself
    np.testing.assert_array_equal(idx[:, :, 0], np.arange(6)[None].repeat(2, 0))


def test_set_abstraction(clouds):
    from si_mamba_tpu.ops.pointops import set_abstraction

    feats = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((2, 64, 5)).astype(np.float32))
    mlp = lambda g: g.sum(-1, keepdims=True) * jnp.ones((1, 1, 1, 7))
    new_xyz, new_f = set_abstraction(jnp.asarray(clouds), feats, 16, 0.8, 8, mlp)
    assert new_xyz.shape == (2, 16, 3) and new_f.shape == (2, 16, 7)


def test_set_abstraction_msg(clouds):
    """MSG semantics vs reference PointNetSetAbstractionMsg (part_segmentation/
    models/pointnet2_utils.py:200-259): shared FPS centroids, per-scale ball
    query + MLP + max-pool, concat over scales; grouping concat order is
    [features, centered-xyz]."""
    from si_mamba_tpu.ops.pointops import (
        ball_query, fps, gather_points, group_points, set_abstraction_msg)

    pts = jnp.asarray(clouds)
    feats = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((2, 64, 5)).astype(np.float32))
    mlps = [lambda g: g * jnp.ones((1, 1, 1, g.shape[-1])),
            lambda g: g[..., :2] * 2.0]
    new_xyz, new_f = set_abstraction_msg(
        pts, feats, 16, [0.4, 0.9], [4, 8], mlps)
    assert new_xyz.shape == (2, 16, 3)
    assert new_f.shape == (2, 16, 8 + 2)  # (3+5) + 2 channels

    # centroids are the same shared FPS set, scale 0 reproduces manually
    np.testing.assert_allclose(new_xyz, gather_points(pts, fps(pts, 16)))
    idx0 = ball_query(new_xyz, pts, 0.4, 4)
    g0 = jnp.concatenate([group_points(feats, idx0),
                          group_points(pts, idx0) - new_xyz[:, :, None, :]],
                         axis=-1)
    np.testing.assert_allclose(new_f[..., :8], jnp.max(mlps[0](g0), axis=2),
                               rtol=1e-6)
