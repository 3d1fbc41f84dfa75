"""Minimal string→builder registry (replaces the reference's 288-line
mmcv-style utils/registry.py with the same NAME-dispatch surface)."""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, Callable] = {}

    def register(self, name: str | None = None):
        def deco(fn):
            self._entries[name or fn.__name__] = fn
            return fn

        return deco

    def build(self, cfg: dict, **extra: Any):
        cfg = dict(cfg)
        name = cfg.pop("NAME")
        if name not in self._entries:
            raise KeyError(f"{self.name}: unknown NAME {name!r}; have "
                           f"{sorted(self._entries)}")
        return self._entries[name](**cfg, **extra)

    def __contains__(self, name):
        return name in self._entries


MODELS = Registry("models")
DATASETS = Registry("datasets")


def build_model_from_cfg(model_cfg: dict):
    """NAME-dispatched model construction (reference models/build.py:5-8):
    returns (flax_module, config_dataclass) for the reference NAME strings."""
    name = model_cfg["NAME"]
    if name not in MODELS:
        _register_builtin_models()
    return MODELS.build(dict(model_cfg))


def _register_builtin_models():
    from si_mamba_tpu.models import (
        PartSegConfig,
        PartSegModel,
        PointMAEConfig,
        PointMAEMamba,
        PointMamba,
        PointMambaConfig,
    )

    def _make(model_cls, cfg_cls, flatten_transformer=False):
        def build(**cfg):
            if flatten_transformer and "transformer_config" in cfg:
                inner = dict(cfg.pop("transformer_config"))
                inner.update({k: v for k, v in cfg.items()
                              if k in cfg_cls.__dataclass_fields__})
                cfg = inner
            fields = cfg_cls.__dataclass_fields__
            kwargs = {k: (tuple(v) if isinstance(v, list) else v)
                      for k, v in cfg.items() if k in fields}
            c = cfg_cls(**kwargs)
            return model_cls(c), c

        return build

    MODELS.register("PointMamba")(_make(PointMamba, PointMambaConfig))
    MODELS.register("Point_MAE_Mamba")(
        _make(PointMAEMamba, PointMAEConfig, flatten_transformer=True))
    MODELS.register("PartSegModel")(_make(PartSegModel, PartSegConfig))
