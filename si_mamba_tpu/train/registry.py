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
