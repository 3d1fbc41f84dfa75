"""Pipeline parallelism (parallel/pipeline.py): depth sharded over a 'pipe'
mesh axis with GPipe microbatching. Values AND grads must match the
sequential MixerModel (reference models/point_mamba.py:178-272) exactly —
the pipeline is a pure re-scheduling of the same math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from si_mamba_tpu.models.layers import MixerModel
from si_mamba_tpu.parallel.pipeline import pipeline_mixer_apply, stack_mixer_params

D_MODEL, N_LAYER, B, L = 32, 8, 8, 48


@pytest.fixture(scope="module")
def setup():
    model = MixerModel(D_MODEL, N_LAYER, scan_impl="chunked")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, D_MODEL)).astype(np.float32))
    pos = jnp.asarray(rng.standard_normal((B, L, D_MODEL)).astype(np.float32))
    params = model.init(jax.random.key(0), x, pos)["params"]
    return model, params, x, pos


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (2, 8), (8, 2)])
def test_pipeline_matches_sequential(setup, n_stages, n_micro):
    model, params, x, pos = setup
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("pipe",))
    y_ref = model.apply({"params": params}, x, pos)
    stacked, norm_f = stack_mixer_params(params, N_LAYER, n_stages)
    y = pipeline_mixer_apply(stacked, norm_f, x + pos, mesh=mesh,
                             n_micro=n_micro, scan_impl="chunked")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_sequential(setup):
    model, params, x, pos = setup
    n_stages = 4
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("pipe",))

    def f_seq(params, x):
        return jnp.sum(model.apply({"params": params}, x, pos) ** 2)

    def f_pipe(params, x):
        stacked, norm_f = stack_mixer_params(params, N_LAYER, n_stages)
        y = pipeline_mixer_apply(stacked, norm_f, x + pos, mesh=mesh,
                                 n_micro=4, scan_impl="chunked")
        return jnp.sum(y ** 2)

    gs_p, gs_x = jax.grad(f_seq, argnums=(0, 1))(params, x)
    gp_p, gp_x = jax.grad(f_pipe, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gs_x),
                               rtol=1e-4, atol=1e-4)
    # Param grads through the final LayerNorm are heavily cancelled (~1e-5
    # of the per-example contribution scale), and microbatching legitimately
    # reorders the fp32 batch summation — so compare ABSOLUTE error against
    # the contribution scale, not relative against the tiny cancelled sums.
    flat_s, _ = jax.tree_util.tree_flatten_with_path(gs_p)
    flat_p = dict(jax.tree_util.tree_flatten_with_path(gp_p)[0])
    for path, leaf in flat_s:
        got = np.asarray(flat_p[path])
        leaf = np.asarray(leaf)
        err = np.abs(got - leaf).max()
        assert err < 1e-5 + 1e-3 * np.abs(leaf).max(), (path, err)


def test_pipeline_full_classifier_logits_match():
    """pipeline_pointmamba_logits (full composition: ordering → pipelined
    stack → head) == PointMamba.apply on an 8-stage pipe mesh, with
    n_micro != n_stages (VERDICT r2 #6)."""
    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.parallel import make_mesh
    from si_mamba_tpu.parallel.pipeline import pipeline_pointmamba_logits

    cfg = PointMambaConfig(trans_dim=32, depth=8, cls_dim=4, group_size=8,
                           num_group=16, encoder_dims=32, knn_graph=4,
                           drop_path=0.0, scan_impl="chunked")
    model = PointMamba(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((8, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), pts[:2], train=False)
    ref = np.asarray(model.apply(variables, pts, train=False))

    mesh = make_mesh(jax.devices()[:8], axis_names=("pipe",))
    for n_micro in (8, 4, 2):  # covers n_micro != n_stages both ways
        got = np.asarray(jax.jit(
            lambda v, p, m=n_micro: pipeline_pointmamba_logits(
                v, cfg, p, mesh=mesh, n_micro=m))(variables, pts))
        np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-5,
                                   err_msg=f"n_micro={n_micro}")


def test_pipeline_full_classifier_ssd_logits_match():
    """The pipelined classifier with the opt-in SSD mixer (4 stages,
    n_micro=2) == PointMamba.apply(mixer='ssd') on the same params."""
    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.parallel import make_mesh
    from si_mamba_tpu.parallel.pipeline import pipeline_pointmamba_logits

    cfg = PointMambaConfig(trans_dim=32, depth=4, cls_dim=4, group_size=8,
                           num_group=16, encoder_dims=32, knn_graph=4,
                           drop_path=0.0, mixer="ssd")
    model = PointMamba(cfg)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.standard_normal((4, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), pts[:2], train=False)
    ref = np.asarray(model.apply(variables, pts, train=False))

    mesh = make_mesh(jax.devices()[:4], axis_names=("pipe",))
    got = np.asarray(jax.jit(
        lambda v, p: pipeline_pointmamba_logits(
            v, cfg, p, mesh=mesh, n_micro=2))(variables, pts))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-5)


def test_pipeline_non_divisible_depth_raises():
    from si_mamba_tpu.parallel.pipeline import stack_mixer_params

    params = {f"layers_{i}": {"norm": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
                              "mixer": {k: jnp.zeros(4) for k in
                                        ("in_proj", "conv1d_weight", "conv1d_bias",
                                         "x_proj", "dt_proj", "dt_proj_bias",
                                         "A_log", "D", "out_proj")}}
              for i in range(6)}
    params["norm_f"] = {"scale": jnp.ones(4), "bias": jnp.zeros(4)}
    with pytest.raises(ValueError, match="divide the stack depth"):
        stack_mixer_params(params, 6, 4)
