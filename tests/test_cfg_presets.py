"""Every shipped preset yaml parses AND every model-block key is consumed.

`*Config.from_dict` / the PartSeg entry filter to dataclass fields and
silently IGNORE unknown keys (deliberate: reference yamls carry schema
keys like NAME/rotation that are handled elsewhere). The flip side is
that a typo'd tuning knob in a shipped preset (e.g. `ssd_chunck: 256`)
would load cleanly and silently change nothing. This test closes that
hole: for every yaml under cfgs/ (and cfgs/dev/) the model block must
only contain dataclass fields plus the explicitly-known pass-through
keys consumed by the harness (reference schema: cfgs/finetune_modelnet
.yaml vs tools/runner_finetune.py rotation handling).
"""

from __future__ import annotations

import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# model-block keys consumed outside the model dataclass:
#   NAME          -> cli.py model dispatch
#   rotation      -> finetune runner's vote/aug protocol
KNOWN_PASSTHROUGH = {"NAME", "rotation"}


def _config_class(name):
    if name == "PointMamba":
        from si_mamba_tpu.models import PointMambaConfig
        return PointMambaConfig
    if name == "Point_MAE_Mamba":
        from si_mamba_tpu.models.point_mae import PointMAEConfig
        return PointMAEConfig
    if name == "PartSegModel":
        from si_mamba_tpu.models.segmentation import PartSegConfig
        return PartSegConfig
    raise AssertionError(f"unknown model NAME {name!r}")


def _preset_paths():
    paths = sorted(glob.glob(os.path.join(REPO, "cfgs", "*.yaml"))
                   + glob.glob(os.path.join(REPO, "cfgs", "dev", "*.yaml")))
    assert len(paths) >= 15, paths  # the shipped preset set
    return paths


@pytest.mark.parametrize("path", _preset_paths(),
                         ids=lambda p: os.path.relpath(p, REPO))
def test_preset_parses_and_model_keys_all_consumed(path):
    from si_mamba_tpu.train.config import get_config

    cfg = get_config(path, base_dir=os.path.dirname(path))
    assert cfg.model.NAME in ("PointMamba", "Point_MAE_Mamba",
                              "PartSegModel")
    cls = _config_class(cfg.model.NAME)
    model_keys = dict(cfg.model)
    # Point_MAE_Mamba nests its model fields under transformer_config;
    # the registry flattens it (train/registry.py:_make) — check the
    # inner keys against the dataclass the same way
    inner = model_keys.pop("transformer_config", None)
    if inner is not None:
        assert cfg.model.NAME == "Point_MAE_Mamba", cfg.model.NAME
        model_keys.update(dict(inner))
    unknown = (set(model_keys) - set(cls.__dataclass_fields__)
               - KNOWN_PASSTHROUGH)
    assert not unknown, (
        f"{os.path.relpath(path, REPO)}: model keys {sorted(unknown)} are "
        f"not {cls.__name__} fields and not known pass-throughs — typo'd "
        f"knobs load as silent no-ops")
    # the model block must actually build (field types/values sane)
    built = cls(**{k: (tuple(v) if isinstance(v, list) else v)
                   for k, v in model_keys.items()
                   if k in cls.__dataclass_fields__})
    assert built is not None
