"""PyTorch checkpoint exporter: flax variables → reference-layout ``.pth``.

The exact inverse of :mod:`si_mamba_tpu.utils.torch_import` — emits the
reference's torch key names and tensor layouts (reference
tools/builder.py:153-162 save format: ``{'base_model': state_dict, ...}``,
key names per models/point_mamba.py), so weights trained in this framework
load into the reference's torch models with ``strict=True``. Layout
inversions:

- flax Dense kernel (in, out)  -> torch Linear weight (out, in)  [transpose]
- flax Dense kernel (i, o)     -> torch Conv1d k=1 weight (o, i, 1)
- mixer conv (d, W)            -> torch depthwise conv1d (d, 1, W)
- scale/bias + batch_stats     -> BatchNorm weight/bias/running_* (+ a
  ``num_batches_tracked`` scalar, which this framework does not track —
  exported as 0; torch uses it only for ``momentum=None`` BN, which the
  reference never configures)

Torch-free except in :func:`save_torch_checkpoint` (the only function that
materializes ``torch.Tensor``s), mirroring the importer's policy so the
mapping is testable without torch on the hot path.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(v) -> np.ndarray:
    return np.asarray(v)


def _dense(out: Dict[str, np.ndarray], key: str, p: Mapping[str, Any]) -> None:
    out[f"{key}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        out[f"{key}.bias"] = _np(p["bias"])


def _conv1x1(out, key, p) -> None:
    out[f"{key}.weight"] = _np(p["kernel"]).T[..., None]
    out[f"{key}.bias"] = _np(p["bias"])


def _ln(out, key, p) -> None:
    out[f"{key}.weight"] = _np(p["scale"])
    out[f"{key}.bias"] = _np(p["bias"])


def _bn(out, key, p, s) -> None:
    out[f"{key}.weight"] = _np(p["scale"])
    out[f"{key}.bias"] = _np(p["bias"])
    out[f"{key}.running_mean"] = _np(s["mean"])
    out[f"{key}.running_var"] = _np(s["var"])
    out[f"{key}.num_batches_tracked"] = np.asarray(0, np.int64)


def _mixer(out, key, m) -> None:
    out[f"{key}.in_proj.weight"] = _np(m["in_proj"]).T
    out[f"{key}.conv1d.weight"] = _np(m["conv1d_weight"])[:, None, :]
    out[f"{key}.conv1d.bias"] = _np(m["conv1d_bias"])
    out[f"{key}.x_proj.weight"] = _np(m["x_proj"]).T
    out[f"{key}.dt_proj.weight"] = _np(m["dt_proj"]).T
    out[f"{key}.dt_proj.bias"] = _np(m["dt_proj_bias"])
    out[f"{key}.A_log"] = _np(m["A_log"])
    out[f"{key}.D"] = _np(m["D"])
    out[f"{key}.out_proj.weight"] = _np(m["out_proj"]).T


def _encoder(out, prefix, p, s) -> None:
    _conv1x1(out, f"{prefix}.first_conv.0", p["conv1"])
    _bn(out, f"{prefix}.first_conv.1", p["bn1"], s["bn1"])
    _conv1x1(out, f"{prefix}.first_conv.3", p["conv2"])
    _conv1x1(out, f"{prefix}.second_conv.0", p["conv3"])
    _bn(out, f"{prefix}.second_conv.1", p["bn2"], s["bn2"])
    _conv1x1(out, f"{prefix}.second_conv.3", p["conv4"])


def _pos_embed(out, prefix, p) -> None:
    _dense(out, f"{prefix}.0", p["fc1"])
    _dense(out, f"{prefix}.2", p["fc2"])


def _mixer_stack(out, prefix, blocks) -> None:
    depth = sum(1 for k in blocks if k.startswith("layers_"))
    for i in range(depth):
        b = blocks[f"layers_{i}"]
        _ln(out, f"{prefix}.layers.{i}.norm", b["norm"])
        _mixer(out, f"{prefix}.layers.{i}.mixer", b["mixer"])
    _ln(out, f"{prefix}.norm_f", blocks["norm_f"])


def export_pointmamba(params: Mapping[str, Any], batch_stats: Mapping[str, Any]
                      ) -> Dict[str, np.ndarray]:
    """PointMamba classifier pytree → reference-keyed flat numpy state dict
    (inverse of ``torch_import.import_pointmamba``; depth inferred from the
    block tree)."""
    out: Dict[str, np.ndarray] = {}
    _encoder(out, "encoder", params["encoder"], batch_stats["encoder"])
    _pos_embed(out, "pos_embed", params["pos_embed"])
    _mixer_stack(out, "blocks", params["blocks"])
    _ln(out, "norm", params["norm"])
    head_p, head_s = params["cls_head_finetune"], batch_stats["cls_head_finetune"]
    _dense(out, "cls_head_finetune.0", head_p["fc1"])
    _bn(out, "cls_head_finetune.1", head_p["bn1"], head_s["bn1"])
    _dense(out, "cls_head_finetune.4", head_p["fc2"])
    _bn(out, "cls_head_finetune.5", head_p["bn2"], head_s["bn2"])
    _dense(out, "cls_head_finetune.8", head_p["out"])
    return out


def _diff_sgwt(out, p) -> None:
    _dense(out, "diff_sgwt.pos_embed.0", p["pos_embed_fc1"])
    _dense(out, "diff_sgwt.pos_embed.2", p["pos_embed_fc2"])
    _dense(out, "diff_sgwt.mixer.0", p["mixer_fc1"])
    _ln(out, "diff_sgwt.mixer.1", p["mixer_ln1"])
    _dense(out, "diff_sgwt.mixer.3", p["mixer_fc2"])
    _ln(out, "diff_sgwt.mixer.4", p["mixer_ln2"])
    _dense(out, "diff_sgwt.mixer.6", p["mixer_fc3"])


def export_point_mae(params: Mapping[str, Any], batch_stats: Mapping[str, Any]
                     ) -> Dict[str, np.ndarray]:
    """Point_MAE_Mamba pretrain pytree → reference-keyed state dict (the SST
    layout: encoder modules under ``MAE_encoder.``, decoder under
    ``MAE_decoder.`` — reference models/point_mamba.py:2869-2944; inverse of
    ``torch_import.import_point_mae``)."""
    out: Dict[str, np.ndarray] = {}
    _encoder(out, "MAE_encoder.encoder", params["encoder"],
             batch_stats["encoder"])
    _pos_embed(out, "MAE_encoder.pos_embed", params["pos_embed"])
    _mixer_stack(out, "MAE_encoder.blocks", params["blocks"])
    _ln(out, "MAE_encoder.norm", params["norm"])
    _mixer_stack(out, "MAE_decoder.blocks", params["MAE_decoder"])
    _ln(out, "MAE_decoder.norm", params["decoder_norm"])
    out["mask_token"] = _np(params["mask_token"]).reshape(1, 1, -1)
    _conv1x1(out, "increase_dim.0", params["increase_dim"])
    if "diff_sgwt" in params:
        _diff_sgwt(out, params["diff_sgwt"])
    return out


def save_torch_checkpoint(path: str, params: Mapping[str, Any],
                          batch_stats: Mapping[str, Any], *,
                          model: str = "pointmamba",
                          epoch: int = 0,
                          metrics: Mapping[str, Any] | None = None) -> list[str]:
    """Write a reference-format ``.pth``: ``{'base_model': state_dict,
    'epoch', 'metrics'}`` (tools/builder.py:153-162). ``model`` selects the
    key layout: 'pointmamba' (classifier) or 'point_mae' (pretrain).
    Returns the exported torch key names (sorted)."""
    import torch

    export = {"pointmamba": export_pointmamba,
              "point_mae": export_point_mae}[model]
    sd = export(params, batch_stats)
    tsd = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
           for k, v in sd.items()}
    torch.save({"base_model": tsd, "epoch": epoch,
                "metrics": dict(metrics or {})}, path)
    return sorted(sd)
