"""Harness tests: graft entry compile-check (CPU), multi-device DP train step
on the 8-device virtual mesh, optimizer schedule semantics."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def test_entry_compiles_cpu():
    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    assert compiled is not None


def test_dryrun_multichip_8dev():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_cosine_warmup_schedule():
    from si_mamba_tpu.train.optim import cosine_warmup_epoch_schedule

    import math

    sched = cosine_warmup_epoch_schedule(3e-4, epochs=300, warmup_epochs=10,
                                         steps_per_epoch=100)
    # epoch 0 AND epoch 1 train at warmup_lr_init (timm sets init lr at
    # construction and the reference steps the scheduler at epoch END)
    assert float(sched(0)) < 1e-5 and float(sched(100)) < 1e-5
    # epoch 10 = last warmup value (t=9): init + 0.9*(base-init)
    np.testing.assert_allclose(float(sched(10 * 100)), 0.9 * 3e-4, rtol=1e-3)
    # epoch 11 = first cosine value: t=10 over the FULL t_initial=300 cycle
    # (warmup_prefix=False — timm 0.4.5 default used by the reference)
    expect = 1e-6 + 0.5 * (3e-4 - 1e-6) * (1 + math.cos(math.pi * 10 / 300))
    np.testing.assert_allclose(float(sched(11 * 100)), expect, rtol=1e-6)
    # end of training ~ lr_min
    np.testing.assert_allclose(float(sched(300 * 100)), 1e-6, rtol=1e-1, atol=1e-7)
    # monotone decay after warmup
    vals = [float(sched(e * 100)) for e in range(11, 300, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_wd_mask():
    from si_mamba_tpu.train.optim import wd_mask

    params = {
        "dense": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros(4)},
        "mask_token": jnp.zeros((1, 1, 8)),
        "A_log": jnp.zeros((8, 4)),
        "norm": {"scale": jnp.zeros(4)},
    }
    mask = wd_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["mask_token"] is False  # 'token' in name
    assert mask["A_log"] is True
    assert mask["norm"]["scale"] is False  # 1-D


def test_train_step_reduces_loss():
    """A few DP steps on the virtual mesh should reduce loss on a fixed batch."""
    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.parallel import make_mesh, shard_batch
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.train_state import TrainState, make_classifier_train_step

    cfg = PointMambaConfig(trans_dim=32, depth=2, cls_dim=4, group_size=8,
                           num_group=16, encoder_dims=32, knn_graph=4,
                           drop_path=0.0, drop_out=0.0)
    model = PointMamba(cfg)
    rng = np.random.default_rng(0)
    B = 16
    # learnable toy task: label = which octant has most points
    pts = rng.standard_normal((B, 64, 3)).astype(np.float32)
    labels = (pts[:, :, 0].mean(-1) > 0).astype(np.int32) + 2 * (
        pts[:, :, 1].mean(-1) > 0).astype(np.int32)

    mesh = make_mesh(jax.devices()[:8])
    variables = model.init(jax.random.key(0), jnp.asarray(pts[:2]), train=False)
    tx, _ = build_optimizer(variables["params"], lr=1e-3, epochs=10,
                            warmup_epochs=0, steps_per_epoch=1)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = jax.jit(make_classifier_train_step(model), donate_argnums=(0,))

    pts_s, labels_s = shard_batch((jnp.asarray(pts), jnp.asarray(labels)), mesh)
    losses = []
    for i in range(8):
        state, m = step(state, pts_s, labels_s, jax.random.key(5))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_train_step_reduces_loss_bf16():
    """The bf16 mixed-precision config (activations + matmul weights bf16,
    fp32 params/state/scan) trains: loss decreases on the same toy task.
    This is the bench/perf configuration (dtype='bfloat16')."""
    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.train_state import TrainState, make_classifier_train_step

    cfg = PointMambaConfig(trans_dim=32, depth=2, cls_dim=4, group_size=8,
                           num_group=16, encoder_dims=32, knn_graph=4,
                           drop_path=0.0, drop_out=0.0, dtype="bfloat16")
    model = PointMamba(cfg)
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((16, 64, 3)).astype(np.float32)
    labels = (pts[:, :, 0].mean(-1) > 0).astype(np.int32) + 2 * (
        pts[:, :, 1].mean(-1) > 0).astype(np.int32)

    variables = model.init(jax.random.key(0), jnp.asarray(pts[:2]), train=False)
    # params stay fp32 under mixed precision
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(variables["params"]))
    tx, _ = build_optimizer(variables["params"], lr=1e-3, epochs=10,
                            warmup_epochs=0, steps_per_epoch=1)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = jax.jit(make_classifier_train_step(model), donate_argnums=(0,))
    losses = []
    for i in range(8):
        state, m = step(state, jnp.asarray(pts), jnp.asarray(labels),
                        jax.random.key(5))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses


def test_two_axis_mesh_train_step():
    """Train step over a ('data', 'model') mesh with the model axis idle —
    the round-2 tensor-parallel plumbing compiles and runs today."""
    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.parallel import make_mesh
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.train_state import TrainState, make_classifier_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = PointMambaConfig(trans_dim=32, depth=2, cls_dim=4, group_size=8,
                           num_group=16, encoder_dims=32, knn_graph=4,
                           drop_path=0.0)
    model = PointMamba(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((8, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, 8).astype(np.int32))
    mesh = make_mesh(jax.devices()[:8], axis_names=("data", "model"),
                     shape=(4, 2))
    variables = model.init(jax.random.key(0), pts[:2], train=False)
    tx, _ = build_optimizer(variables["params"], lr=1e-3, epochs=1,
                            warmup_epochs=0, steps_per_epoch=1)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state = jax.device_put(state, repl)
    step = jax.jit(make_classifier_train_step(model),
                   in_shardings=(repl, data, data, None),
                   out_shardings=(repl, repl), donate_argnums=(0,))
    state, m = step(state, jax.device_put(pts, data),
                    jax.device_put(labels, data), jax.random.key(1))
    assert np.isfinite(float(m["loss"]))


def test_sequence_parallel_scan():
    """Scan with L sharded over an 8-device 'seq' axis == sequential oracle
    (SURVEY §5.7 long-sequence capability)."""
    from si_mamba_tpu.ops.selective_scan import selective_scan_seq
    from si_mamba_tpu.parallel import make_mesh
    from si_mamba_tpu.parallel.seq_scan import selective_scan_seq_parallel

    b, L, d, n = 2, 64, 16, 4
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    u, delta, z = mk(b, L, d), mk(b, L, d) * 0.5, mk(b, L, d)
    A = -jnp.exp(mk(d, n))
    B, C = mk(b, L, n), mk(b, L, n)
    D, db = mk(d), mk(d) * 0.1

    mesh = make_mesh(jax.devices()[:8], axis_names=("seq",))
    y = selective_scan_seq_parallel(u, delta, A, B, C, D=D, z=z,
                                    delta_bias=db, mesh=mesh)
    y_ref = selective_scan_seq(u, delta, A, B, C, D=D, z=z, delta_bias=db)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4,
                               atol=1e-5)


def test_sequence_parallel_scan_grads():
    """Autodiff through the shard_map'd seq-parallel scan matches the oracle."""
    from si_mamba_tpu.ops.selective_scan import selective_scan_seq
    from si_mamba_tpu.parallel import make_mesh
    from si_mamba_tpu.parallel.seq_scan import selective_scan_seq_parallel

    b, L, d, n = 1, 32, 8, 4
    rng = np.random.default_rng(1)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    u, delta, z = mk(b, L, d), mk(b, L, d) * 0.5, mk(b, L, d)
    A = -jnp.exp(mk(d, n))
    B, C = mk(b, L, n), mk(b, L, n)
    D, db = mk(d), mk(d) * 0.1
    mesh = make_mesh(jax.devices()[:8], axis_names=("seq",))

    def lp(u, delta, A, B, C):
        return jnp.sum(selective_scan_seq_parallel(
            u, delta, A, B, C, D=D, z=z, delta_bias=db, mesh=mesh) ** 2)

    def ls(u, delta, A, B, C):
        return jnp.sum(selective_scan_seq(u, delta, A, B, C, D=D, z=z,
                                          delta_bias=db) ** 2)

    # grads must run under jit: the eager path trips a jax sharding
    # assertion in shard_map's transpose (training is always jitted)
    gp = jax.jit(jax.grad(lp, argnums=(0, 1, 2, 3, 4)))(u, delta, A, B, C)
    gs = jax.grad(ls, argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    for a, b_ in zip(gp, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3,
                                   atol=1e-4)


def test_tensor_parallel_mixer():
    """TP mixer over an 8-way 'model' axis == the single-device mixer."""
    from si_mamba_tpu.ops.selective_scan import mamba_mixer_apply
    from si_mamba_tpu.parallel import make_mesh
    from si_mamba_tpu.parallel.tensor_parallel import (
        mamba_mixer_tp,
        shard_mixer_params,
    )

    d_model, d_state, d_conv, dt_rank = 32, 16, 4, 2
    d_inner = 2 * d_model
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    params = {
        "in_proj_w": mk(d_model, 2 * d_inner),
        "conv_w": mk(d_inner, d_conv),
        "conv_b": mk(d_inner),
        "x_proj_w": mk(d_inner, dt_rank + 2 * d_state),
        "dt_proj_w": mk(dt_rank, d_inner),
        "dt_proj_b": mk(d_inner),
        "A_log": jnp.log(jnp.tile(jnp.arange(1, d_state + 1, dtype=jnp.float32),
                                  (d_inner, 1))),
        "D": jnp.ones(d_inner),
        "out_proj_w": mk(d_inner, d_model),
    }
    x = mk(2, 24, d_model) * 10

    y_ref = mamba_mixer_apply(params, x, d_state=d_state, dt_rank=dt_rank,
                              impl="chunked")

    mesh = make_mesh(jax.devices()[:8], axis_names=("model",))
    sharded = shard_mixer_params(params, mesh)
    y_tp = jax.jit(lambda p, x: mamba_mixer_tp(
        p, x, mesh=mesh, d_state=d_state, dt_rank=dt_rank))(sharded, x)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref), rtol=2e-4,
                               atol=2e-5)


def test_tp_mixer_in_model_stack():
    """The MixerModel stack with tp_axis='model' (context mesh) matches the
    replicated stack on the same parameters."""
    from si_mamba_tpu.models.layers import MixerModel
    from si_mamba_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    mesh = make_mesh(jax.devices()[:8], axis_names=("model",))
    mm = MixerModel(d_model=32, n_layer=2, scan_impl="chunked")
    x = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))
    pos = jnp.zeros_like(x)
    vm = mm.init(jax.random.key(1), x, pos)
    y0 = mm.apply(vm, x, pos)

    mm_tp = MixerModel(d_model=32, n_layer=2, scan_impl="chunked",
                       tp_axis="model")
    with jax.set_mesh(mesh):
        y1 = jax.jit(lambda v, x, p: mm_tp.apply(v, x, p))(vm, x, pos)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=2e-4,
                               atol=2e-5)


def test_dp_tp_composed_train_step_matches_dp_only():
    """FULL-model train step on a ('data','model') 4x2 mesh with the mixers
    genuinely sharded over 'model' (config.tp_axis) must match the 1-D
    DP-only step: same loss/acc, same gradients (rel-to-max — Adam's
    g/(|g|+eps) normalization makes post-update params sign-brittle for
    noise-floor grads, so grads are the right quantity to pin), and same
    updated BatchNorm stats (VERDICT r2 #1b)."""
    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.models.point_mamba import cross_entropy_loss_acc
    from si_mamba_tpu.parallel import make_mesh
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.train_state import TrainState, make_classifier_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    kw = dict(trans_dim=32, depth=2, cls_dim=4, group_size=8, num_group=16,
              encoder_dims=32, knn_graph=4, drop_path=0.0, cls_head_dropout=0.0,
              scan_impl="chunked")
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((8, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, 8).astype(np.int32))

    def one_step(cfg, mesh):
        model = PointMamba(cfg)
        with jax.set_mesh(mesh):  # init + trace both resolve the context mesh
            variables = model.init(jax.random.key(0), pts[:2], train=False)
            tx, _ = build_optimizer(variables["params"], lr=1e-3, epochs=1,
                                    warmup_epochs=0, steps_per_epoch=1)
            state = TrainState.create(variables["params"],
                                      variables["batch_stats"], tx)
            repl, data = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
            state = jax.device_put(state, repl)
            step = jax.jit(make_classifier_train_step(model),
                           in_shardings=(repl, data, data, None),
                           out_shardings=(repl, repl))
            new_state, m = step(state, jax.device_put(pts, data),
                                jax.device_put(labels, data), jax.random.key(1))

            def loss_fn(p, bs, x, y):
                logits, upd = model.apply(
                    {"params": p, "batch_stats": bs}, x, train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.key(2)})
                per, _ = cross_entropy_loss_acc(logits, y)
                return jnp.mean(per), upd["batch_stats"]

            (_, bstats), grads = jax.jit(
                jax.value_and_grad(loss_fn, has_aux=True),
                in_shardings=(repl, repl, data, data),
            )(variables["params"], variables["batch_stats"],
              jax.device_put(pts, data), jax.device_put(labels, data))
            jax.block_until_ready((m, grads))
        return m, grads, bstats, new_state

    dp_m, dp_g, dp_bs, dp_state = one_step(
        PointMambaConfig(**kw), make_mesh(jax.devices()[:8]))
    tp_m, tp_g, tp_bs, tp_state = one_step(
        PointMambaConfig(**kw, tp_axis="model"),
        make_mesh(jax.devices()[:8], axis_names=("data", "model"), shape=(4, 2)))

    np.testing.assert_allclose(float(tp_m["loss"]), float(dp_m["loss"]),
                               rtol=1e-5)
    assert float(tp_m["acc"]) == float(dp_m["acc"])
    assert int(tp_state.step) == int(dp_state.step) == 1
    gmax = max(float(np.abs(np.asarray(l)).max()) for l in jax.tree.leaves(dp_g))
    for a, b in zip(jax.tree.leaves(tp_g), jax.tree.leaves(dp_g)):
        a, b = np.asarray(a), np.asarray(b)
        # floor the denominator: bias-before-BatchNorm leaves have
        # exactly-zero true grads (BN subtracts the mean) — both sides are
        # float noise there and rel-to-max is meaningless
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-3 * gmax)
        # 1e-3: the TP psum/partial-product summation order differs from the
        # dense matmul's, and the scan backward amplifies that fp32 noise
        # (same conditioning effect measured torch-fp32-vs-fp64 at 1.6e-3)
        assert rel < 1e-3, rel
    for a, b in zip(jax.tree.leaves(tp_bs), jax.tree.leaves(dp_bs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
