"""Checkpoint-importer tests: build a synthetic torch state dict shaped like
the reference PointMamba (the reference ships no .pth), import it, and verify
(a) the flax model accepts the variables with no missing params, and (b)
numeric parity of sub-modules against torch ops with the same weights."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from si_mamba_tpu.models import PointMamba, PointMambaConfig
from si_mamba_tpu.utils.torch_import import (
    import_pointmamba,
    to_variables,
)

CFG = PointMambaConfig(trans_dim=48, depth=2, cls_dim=7, group_size=8, num_group=16,
                       encoder_dims=48, knn_graph=4)


def synthetic_state_dict(cfg: PointMambaConfig, seed=0):
    """Random torch-layout state dict with the reference's key names/shapes."""
    g = torch.Generator().manual_seed(seed)
    r = lambda *s: torch.randn(*s, generator=g) * 0.05
    d, di = cfg.trans_dim, cfg.trans_dim * 2
    dt_rank = -(-d // 16)
    sd = {}

    def conv(stem, o, i):
        sd[f"{stem}.weight"] = r(o, i, 1)
        sd[f"{stem}.bias"] = r(o)

    def bn(stem, c):
        sd[f"{stem}.weight"] = 1 + 0.1 * r(c)
        sd[f"{stem}.bias"] = 0.1 * r(c)
        sd[f"{stem}.running_mean"] = 0.1 * r(c)
        sd[f"{stem}.running_var"] = torch.abs(1 + 0.1 * r(c))
        sd[f"{stem}.num_batches_tracked"] = torch.tensor(100)

    def lin(stem, o, i):
        sd[f"{stem}.weight"] = r(o, i)
        sd[f"{stem}.bias"] = r(o)

    conv("encoder.first_conv.0", 128, 3); bn("encoder.first_conv.1", 128)
    conv("encoder.first_conv.3", 256, 128)
    conv("encoder.second_conv.0", 512, 512); bn("encoder.second_conv.1", 512)
    conv("encoder.second_conv.3", d, 512)
    lin("pos_embed.0", 128, 3); lin("pos_embed.2", d, 128)
    for i in range(cfg.depth):
        b = f"blocks.layers.{i}"
        sd[f"{b}.norm.weight"] = torch.ones(d); sd[f"{b}.norm.bias"] = torch.zeros(d)
        m = f"{b}.mixer"
        sd[f"{m}.in_proj.weight"] = r(2 * di, d)
        sd[f"{m}.conv1d.weight"] = r(di, 1, 4)
        sd[f"{m}.conv1d.bias"] = r(di)
        sd[f"{m}.x_proj.weight"] = r(dt_rank + 32, di)
        sd[f"{m}.dt_proj.weight"] = r(di, dt_rank)
        sd[f"{m}.dt_proj.bias"] = torch.abs(r(di)) + 0.01
        sd[f"{m}.A_log"] = torch.log(torch.arange(1, 17).float()).repeat(di, 1)
        sd[f"{m}.D"] = torch.ones(di)
        sd[f"{m}.out_proj.weight"] = r(d, di)
    sd["blocks.norm_f.weight"] = torch.ones(d); sd["blocks.norm_f.bias"] = torch.zeros(d)
    sd["norm.weight"] = torch.ones(d); sd["norm.bias"] = torch.zeros(d)
    lin("cls_head_finetune.0", 256, d); bn("cls_head_finetune.1", 256)
    lin("cls_head_finetune.4", 256, 256); bn("cls_head_finetune.5", 256)
    lin("cls_head_finetune.8", cfg.cls_dim, 256)
    return {k: v.numpy() for k, v in sd.items()}


def test_import_structure_matches_model_init():
    sd = synthetic_state_dict(CFG)
    params, stats, unexpected = import_pointmamba(sd, depth=CFG.depth)
    assert unexpected == []
    variables = to_variables(params, stats)

    model = PointMamba(CFG)
    pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 3)).astype(np.float32))
    ref_vars = model.init(jax.random.key(0), pts, train=False)

    # identical tree structure and shapes
    ref_shapes = jax.tree.map(lambda x: x.shape, ref_vars)
    got_shapes = jax.tree.map(lambda x: x.shape, variables)
    assert ref_shapes == got_shapes

    # and it runs
    logits = model.apply(variables, pts, train=False)
    assert logits.shape == (2, CFG.cls_dim)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_import_prefix_stripping():
    sd = synthetic_state_dict(CFG)
    sd2 = {f"module.MAE_encoder.{k}": v for k, v in sd.items()}
    p1, s1, _ = import_pointmamba(sd, depth=CFG.depth)
    p2, s2, _ = import_pointmamba(sd2, depth=CFG.depth)
    chex_eq = lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    jax.tree.map(chex_eq, p1, p2)


def test_imported_encoder_matches_torch():
    """PatchEncoder with imported weights == torch conv/BN/relu pipeline."""
    from si_mamba_tpu.models import PatchEncoder

    sd = synthetic_state_dict(CFG)
    params, stats, _ = import_pointmamba(sd, depth=CFG.depth)
    enc_vars = {"params": params["encoder"], "batch_stats": stats["encoder"]}

    rng = np.random.default_rng(1)
    groups = rng.standard_normal((2, 4, 8, 3)).astype(np.float32)
    got = PatchEncoder(CFG.encoder_dims).apply(
        jax.tree.map(jnp.asarray, enc_vars), jnp.asarray(groups), train=False)

    # torch oracle (eval-mode BN with running stats)
    t = lambda k: torch.from_numpy(np.asarray(sd[k]))
    x = torch.from_numpy(groups).reshape(8, 8, 3).transpose(1, 2)  # (BG, 3, n)
    h = F.conv1d(x, t("encoder.first_conv.0.weight"), t("encoder.first_conv.0.bias"))
    h = F.batch_norm(h, t("encoder.first_conv.1.running_mean"),
                     t("encoder.first_conv.1.running_var"),
                     t("encoder.first_conv.1.weight"), t("encoder.first_conv.1.bias"),
                     training=False, eps=1e-5)
    h = F.relu(h)
    h = F.conv1d(h, t("encoder.first_conv.3.weight"), t("encoder.first_conv.3.bias"))
    gmax = h.max(dim=2, keepdim=True).values
    h = torch.cat([gmax.expand(-1, -1, 8), h], dim=1)
    h = F.conv1d(h, t("encoder.second_conv.0.weight"), t("encoder.second_conv.0.bias"))
    h = F.batch_norm(h, t("encoder.second_conv.1.running_mean"),
                     t("encoder.second_conv.1.running_var"),
                     t("encoder.second_conv.1.weight"), t("encoder.second_conv.1.bias"),
                     training=False, eps=1e-5)
    h = F.relu(h)
    h = F.conv1d(h, t("encoder.second_conv.3.weight"), t("encoder.second_conv.3.bias"))
    ref = h.max(dim=2).values.reshape(2, 4, CFG.encoder_dims).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_imported_mixer_block_matches_torch_oracle():
    """One imported Mamba block vs an independent torch implementation of the
    published S6 math (LN -> in_proj -> causal dwconv -> silu -> ssm -> gate
    -> out_proj)."""
    from si_mamba_tpu.models.layers import Block

    cfg = CFG
    sd = synthetic_state_dict(cfg)
    params, stats, _ = import_pointmamba(sd, depth=cfg.depth)
    blk = Block(cfg.trans_dim, drop_path=0.0)
    bparams = params["blocks"]["layers_0"]

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 10, cfg.trans_dim)).astype(np.float32)
    got, _ = blk.apply({"params": jax.tree.map(jnp.asarray, bparams)}, jnp.asarray(x))

    # torch oracle
    m = "blocks.layers.0.mixer"
    t = lambda k: torch.from_numpy(np.asarray(sd[k]))
    xt = torch.from_numpy(x)
    h = F.layer_norm(xt, (cfg.trans_dim,), t("blocks.layers.0.norm.weight"),
                     t("blocks.layers.0.norm.bias"), eps=1e-5)
    xz = h @ t(f"{m}.in_proj.weight").T
    di = cfg.trans_dim * 2
    xi, z = xz[..., :di], xz[..., di:]
    xi = F.conv1d(xi.transpose(1, 2), t(f"{m}.conv1d.weight"), t(f"{m}.conv1d.bias"),
                  padding=3, groups=di)[..., :10].transpose(1, 2)
    xi = F.silu(xi)
    dt_rank = -(-cfg.trans_dim // 16)
    xdb = xi @ t(f"{m}.x_proj.weight").T
    dt = xdb[..., :dt_rank] @ t(f"{m}.dt_proj.weight").T + t(f"{m}.dt_proj.bias")
    dt = F.softplus(dt)
    Bc, Cc = xdb[..., dt_rank:dt_rank + 16], xdb[..., dt_rank + 16:]
    A = -torch.exp(t(f"{m}.A_log"))
    hstate = torch.zeros(2, di, 16)
    ys = []
    for s in range(10):
        dA = torch.exp(dt[:, s, :, None] * A[None])
        dBu = (dt[:, s] * xi[:, s])[:, :, None] * Bc[:, s, None, :]
        hstate = dA * hstate + dBu
        ys.append(torch.einsum("bdn,bn->bd", hstate, Cc[:, s]) + t(f"{m}.D") * xi[:, s])
    y = torch.stack(ys, dim=1) * F.silu(z)
    ref = (y @ t(f"{m}.out_proj.weight").T).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-4)


def test_import_point_mae_structure():
    """Synthetic Point_MAE_Mamba state dict -> PointMAEMamba variables."""
    from si_mamba_tpu.models import PointMAEMamba, PointMAEConfig
    from si_mamba_tpu.utils.torch_import import import_point_mae, to_variables

    cfg = PointMAEConfig(trans_dim=48, encoder_dims=48, depth=2, decoder_depth=1,
                         group_size=8, num_group=16, knn_graph=4,
                         sinkhorn_iters=5)
    d, di = cfg.trans_dim, cfg.trans_dim * 2
    dt_rank = -(-d // 16)
    g = torch.Generator().manual_seed(0)
    r = lambda *s: torch.randn(*s, generator=g) * 0.05
    sd = {}

    def conv(stem, o, i):
        sd[f"{stem}.weight"] = r(o, i, 1); sd[f"{stem}.bias"] = r(o)

    def bn(stem, c):
        sd[f"{stem}.weight"] = 1 + 0.1 * r(c); sd[f"{stem}.bias"] = 0.1 * r(c)
        sd[f"{stem}.running_mean"] = 0.1 * r(c)
        sd[f"{stem}.running_var"] = torch.abs(1 + 0.1 * r(c))
        sd[f"{stem}.num_batches_tracked"] = torch.tensor(1)

    def lin(stem, o, i):
        sd[f"{stem}.weight"] = r(o, i); sd[f"{stem}.bias"] = r(o)

    def mixer_stack(prefix, n):
        for i in range(n):
            b = f"{prefix}.layers.{i}"
            sd[f"{b}.norm.weight"] = torch.ones(d); sd[f"{b}.norm.bias"] = torch.zeros(d)
            m = f"{b}.mixer"
            sd[f"{m}.in_proj.weight"] = r(2 * di, d)
            sd[f"{m}.conv1d.weight"] = r(di, 1, 4); sd[f"{m}.conv1d.bias"] = r(di)
            sd[f"{m}.x_proj.weight"] = r(dt_rank + 32, di)
            sd[f"{m}.dt_proj.weight"] = r(di, dt_rank)
            sd[f"{m}.dt_proj.bias"] = torch.abs(r(di)) + 0.01
            sd[f"{m}.A_log"] = torch.log(torch.arange(1, 17).float()).repeat(di, 1)
            sd[f"{m}.D"] = torch.ones(di)
            sd[f"{m}.out_proj.weight"] = r(d, di)
        sd[f"{prefix}.norm_f.weight"] = torch.ones(d)
        sd[f"{prefix}.norm_f.bias"] = torch.zeros(d)

    conv("MAE_encoder.encoder.first_conv.0", 128, 3); bn("MAE_encoder.encoder.first_conv.1", 128)
    conv("MAE_encoder.encoder.first_conv.3", 256, 128)
    conv("MAE_encoder.encoder.second_conv.0", 512, 512); bn("MAE_encoder.encoder.second_conv.1", 512)
    conv("MAE_encoder.encoder.second_conv.3", d, 512)
    lin("MAE_encoder.pos_embed.0", 128, 3); lin("MAE_encoder.pos_embed.2", d, 128)
    mixer_stack("MAE_encoder.blocks", cfg.depth)
    sd["MAE_encoder.norm.weight"] = torch.ones(d); sd["MAE_encoder.norm.bias"] = torch.zeros(d)
    mixer_stack("MAE_decoder.blocks", cfg.decoder_depth)
    sd["MAE_decoder.norm.weight"] = torch.ones(d); sd["MAE_decoder.norm.bias"] = torch.zeros(d)
    sd["mask_token"] = r(1, 1, d)
    conv("increase_dim.0", 3 * cfg.group_size, d)
    lin("diff_sgwt.pos_embed.0", 64, 3); lin("diff_sgwt.pos_embed.2", 64, 64)
    lin("diff_sgwt.mixer.0", 128, 64 * 4)
    sd["diff_sgwt.mixer.1.weight"] = torch.ones(128); sd["diff_sgwt.mixer.1.bias"] = torch.zeros(128)
    lin("diff_sgwt.mixer.3", 64, 128)
    sd["diff_sgwt.mixer.4.weight"] = torch.ones(64); sd["diff_sgwt.mixer.4.bias"] = torch.zeros(64)
    lin("diff_sgwt.mixer.6", 64 * 4, 64)

    sd_np = {k: v.numpy() for k, v in sd.items()}
    params, stats, _ = import_point_mae(sd_np, depth=cfg.depth,
                                        decoder_depth=cfg.decoder_depth)
    variables = to_variables(params, stats)

    model = PointMAEMamba(cfg)
    pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 3)).astype(np.float32))
    ref_vars = model.init({"params": jax.random.key(0), "mask": jax.random.key(1),
                           "gumbel": jax.random.key(2)}, pts, train=False)
    ref_shapes = jax.tree.map(lambda x: x.shape, ref_vars["params"])
    got_shapes = jax.tree.map(lambda x: x.shape, variables["params"])
    assert ref_shapes == got_shapes
    loss = model.apply({"params": variables["params"],
                        "batch_stats": ref_vars["batch_stats"]}, pts,
                       train=False, rngs={"mask": jax.random.key(1)})
    assert np.isfinite(float(loss))
