"""PyTorch checkpoint importer: released SI-Mamba ``.pth`` → flax variables.

Maps the reference's torch key names (reference tools/builder.py:153-162
checkpoint format: dict with 'base_model'; prefix remaps ``module.`` /
``MAE_encoder.`` / ``base_model.`` per models/point_mamba.py:574-604) onto
the ``si_mamba_tpu.models.PointMamba`` parameter pytree. Conventions:

- torch Linear weight (out, in)      -> flax kernel (in, out)  [transpose]
- torch Conv1d k=1 weight (o, i, 1)  -> flax Dense kernel (i, o)
- torch conv1d depthwise (d, 1, W)   -> (d, W)
- BatchNorm weight/bias/running_*    -> scale/bias + batch_stats mean/var
- LayerNorm weight/bias              -> scale/bias

Torch-free at runtime: accepts either a path (loaded with torch, CPU-only)
or an already-materialized ``{key: np.ndarray}`` dict, so tests can verify
the mapping without a released checkpoint (none ships in the reference).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _strip_prefixes(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        for pref in ("MAE_encoder.", "base_model."):
            if k.startswith(pref):
                k = k[len(pref):]
        out[k] = v
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth`` and return a flat numpy state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("base_model", ckpt.get("model", ckpt))
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _dense(sd, key):
    return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}


def _dense_nobias(sd, key):
    return {"kernel": sd[f"{key}.weight"].T}


def _conv1x1(sd, key):
    return {"kernel": sd[f"{key}.weight"].squeeze(-1).T, "bias": sd[f"{key}.bias"]}


def _ln(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _bn_params(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _bn_stats(sd, key):
    return {"mean": sd[f"{key}.running_mean"], "var": sd[f"{key}.running_var"]}


def _mixer(sd, key):
    return {
        "in_proj": sd[f"{key}.in_proj.weight"].T,
        "conv1d_weight": sd[f"{key}.conv1d.weight"].squeeze(1),
        "conv1d_bias": sd[f"{key}.conv1d.bias"],
        "x_proj": sd[f"{key}.x_proj.weight"].T,
        "dt_proj": sd[f"{key}.dt_proj.weight"].T,
        "dt_proj_bias": sd[f"{key}.dt_proj.bias"],
        "A_log": sd[f"{key}.A_log"],
        "D": sd[f"{key}.D"],
        "out_proj": sd[f"{key}.out_proj.weight"].T,
    }


def _encoder(sd, prefix):
    return (
        {
            "conv1": _conv1x1(sd, f"{prefix}.first_conv.0"),
            "bn1": _bn_params(sd, f"{prefix}.first_conv.1"),
            "conv2": _conv1x1(sd, f"{prefix}.first_conv.3"),
            "conv3": _conv1x1(sd, f"{prefix}.second_conv.0"),
            "bn2": _bn_params(sd, f"{prefix}.second_conv.1"),
            "conv4": _conv1x1(sd, f"{prefix}.second_conv.3"),
        },
        {
            "bn1": _bn_stats(sd, f"{prefix}.first_conv.1"),
            "bn2": _bn_stats(sd, f"{prefix}.second_conv.1"),
        },
    )


def _pos_embed(sd, prefix):
    return {"fc1": _dense(sd, f"{prefix}.0"), "fc2": _dense(sd, f"{prefix}.2")}


def _mixer_stack(sd, prefix, depth):
    blocks = {}
    for i in range(depth):
        blocks[f"layers_{i}"] = {
            "norm": _ln(sd, f"{prefix}.layers.{i}.norm"),
            "mixer": _mixer(sd, f"{prefix}.layers.{i}.mixer"),
        }
    blocks["norm_f"] = _ln(sd, f"{prefix}.norm_f")
    return blocks


def import_pointmamba(state_dict: Mapping[str, np.ndarray], depth: int = 12
                      ) -> tuple[Dict[str, Any], Dict[str, Any], list[str]]:
    """Build (params, batch_stats, consumed_keys) for the PointMamba classifier."""
    sd = _strip_prefixes(dict(state_dict))
    enc_p, enc_s = _encoder(sd, "encoder")
    params: Dict[str, Any] = {
        "encoder": enc_p,
        "pos_embed": _pos_embed(sd, "pos_embed"),
        "blocks": _mixer_stack(sd, "blocks", depth),
        "norm": _ln(sd, "norm"),
        "cls_head_finetune": {
            "fc1": _dense(sd, "cls_head_finetune.0"),
            "bn1": _bn_params(sd, "cls_head_finetune.1"),
            "fc2": _dense(sd, "cls_head_finetune.4"),
            "bn2": _bn_params(sd, "cls_head_finetune.5"),
            "out": _dense(sd, "cls_head_finetune.8"),
        },
    }
    batch_stats: Dict[str, Any] = {
        "encoder": enc_s,
        "cls_head_finetune": {
            "bn1": _bn_stats(sd, "cls_head_finetune.1"),
            "bn2": _bn_stats(sd, "cls_head_finetune.5"),
        },
    }
    unexpected = sorted(set(sd) - _expected_torch_keys(depth))
    return params, batch_stats, unexpected


def _expected_torch_keys(depth: int) -> set[str]:
    keys = set()
    for stem, has_stats in (("encoder.first_conv.1", True), ("encoder.second_conv.1", True),
                            ("cls_head_finetune.1", True), ("cls_head_finetune.5", True)):
        keys |= {f"{stem}.weight", f"{stem}.bias"}
        if has_stats:
            keys |= {f"{stem}.running_mean", f"{stem}.running_var",
                     f"{stem}.num_batches_tracked"}
    for stem in ("encoder.first_conv.0", "encoder.first_conv.3", "encoder.second_conv.0",
                 "encoder.second_conv.3", "pos_embed.0", "pos_embed.2", "norm",
                 "cls_head_finetune.0", "cls_head_finetune.4", "cls_head_finetune.8",
                 "blocks.norm_f"):
        keys |= {f"{stem}.weight", f"{stem}.bias"}
    for i in range(depth):
        b = f"blocks.layers.{i}"
        keys |= {f"{b}.norm.weight", f"{b}.norm.bias"}
        m = f"{b}.mixer"
        keys |= {f"{m}.in_proj.weight", f"{m}.conv1d.weight", f"{m}.conv1d.bias",
                 f"{m}.x_proj.weight", f"{m}.dt_proj.weight", f"{m}.dt_proj.bias",
                 f"{m}.A_log", f"{m}.D", f"{m}.out_proj.weight"}
    return keys


def to_variables(params, batch_stats, dtype=np.float32):
    import jax.numpy as jnp

    cast = lambda t: {k: cast(v) if isinstance(v, dict) else jnp.asarray(np.asarray(v, dtype))
                      for k, v in t.items()}
    return {"params": cast(params), "batch_stats": cast(batch_stats)}


def load_pointmamba_checkpoint(path: str, depth: int = 12):
    """One-call import: .pth path -> flax variables dict (+ unexpected keys)."""
    sd = load_torch_state_dict(path)
    params, stats, unexpected = import_pointmamba(sd, depth=depth)
    return to_variables(params, stats), unexpected


# ---------------------------------------------------------------------------
# Point_MAE_Mamba (pretrain model) importer
# ---------------------------------------------------------------------------

def _diff_sgwt(sd):
    """Reference DiffusionWaveletSGWT params (models/point_mamba.py:1996-2023):
    pos_embed Sequential(Linear, GELU, Linear); mixer Sequential(Linear, LN,
    GELU, Linear, LN, GELU, Linear)."""
    return {
        "pos_embed_fc1": _dense(sd, "diff_sgwt.pos_embed.0"),
        "pos_embed_fc2": _dense(sd, "diff_sgwt.pos_embed.2"),
        "mixer_fc1": _dense(sd, "diff_sgwt.mixer.0"),
        "mixer_ln1": _ln(sd, "diff_sgwt.mixer.1"),
        "mixer_fc2": _dense(sd, "diff_sgwt.mixer.3"),
        "mixer_ln2": _ln(sd, "diff_sgwt.mixer.4"),
        "mixer_fc3": _dense(sd, "diff_sgwt.mixer.6"),
    }


def import_point_mae(state_dict: Mapping[str, np.ndarray], depth: int = 12,
                     decoder_depth: int = 4
                     ) -> tuple[Dict[str, Any], Dict[str, Any], list[str]]:
    """Map a reference Point_MAE_Mamba checkpoint (the SST pretrain path)
    onto the PointMAEMamba pytree.

    Key layout (reference models/point_mamba.py:2869-2944): the encoder
    lives under ``MAE_encoder.`` (MaskMamba_2: encoder/pos_embed/blocks/
    norm), the decoder under ``MAE_decoder.`` (MambaDecoder_SST:
    blocks + norm), plus mask_token, increase_dim (Conv1d k=1), and the
    diffusion-wavelet module ``diff_sgwt``.
    """
    raw = {k.replace("module.", ""): v for k, v in state_dict.items()}
    sd = dict(raw)
    # flatten the MAE_encoder prefix for its submodules
    for k in list(sd):
        if k.startswith("MAE_encoder."):
            sd[k[len("MAE_encoder."):]] = sd.pop(k)

    enc_p, enc_s = _encoder(sd, "encoder")
    params: Dict[str, Any] = {
        "encoder": enc_p,
        "pos_embed": _pos_embed(sd, "pos_embed"),
        "blocks": _mixer_stack(sd, "blocks", depth),
        "norm": _ln(sd, "norm"),
        "MAE_decoder": _mixer_stack(sd, "MAE_decoder.blocks", decoder_depth),
        "decoder_norm": _ln(sd, "MAE_decoder.norm"),
        "mask_token": sd["mask_token"].reshape(1, 1, -1),
        "increase_dim": _conv1x1(sd, "increase_dim.0"),
    }
    if "diff_sgwt.pos_embed.0.weight" in sd:
        params["diff_sgwt"] = _diff_sgwt(sd)
    batch_stats: Dict[str, Any] = {"encoder": enc_s}
    return params, batch_stats, []


def load_point_mae_checkpoint(path: str, depth: int = 12, decoder_depth: int = 4):
    sd = load_torch_state_dict(path)
    params, stats, _ = import_point_mae(sd, depth=depth,
                                        decoder_depth=decoder_depth)
    return to_variables(params, stats), []
