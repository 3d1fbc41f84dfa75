"""YAML config system with recursive ``_base_`` inclusion (reference
utils/config.py:18-58) → attribute-accessible dicts, plus model/optimizer
config extraction helpers."""

from __future__ import annotations

import os
from typing import Any

import yaml


class ConfigDict(dict):
    """dict with attribute access (replacement for EasyDict)."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    def get(self, k, default=None):
        return super().get(k, default)


def _to_config(obj: Any) -> Any:
    if isinstance(obj, dict):
        return ConfigDict({k: _to_config(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_to_config(v) for v in obj]
    return obj


def merge_new_config(config: dict, new_config: dict, base_dir: str = ".") -> dict:
    """Recursive merge with ``_base_`` file inclusion (reference semantics:
    a ``_base_`` key loads the referenced YAML into that subtree first)."""
    for key, val in new_config.items():
        if key == "_base_":
            # Already a dict when re-reading an experiment's config.yaml
            # SNAPSHOT (--resume/--auto_resume): save_experiment_config
            # serializes the RESOLVED subtree, not the file path — merge it
            # directly (found by tests/test_preemption.py: the relaunch
            # crashed on every config whose dataset entries use _base_).
            if isinstance(val, dict):
                config[key] = ConfigDict()
                merge_new_config(config[key], val, base_dir)
                continue
            # candidates: absolute | base_dir-relative | base_dir's parent
            # (repo root when the config lives in cfgs/ — makes the
            # reference's CWD-relative "cfgs/..." refs work from any CWD) |
            # plain CWD-relative (the reference convention)
            if os.path.isabs(val):
                path = val
            else:
                cands = [os.path.join(base_dir, val),
                         os.path.join(os.path.dirname(base_dir.rstrip("/")), val),
                         val]
                path = next((c for c in cands if os.path.isfile(c)), cands[0])
            with open(path) as f:
                base = yaml.safe_load(f) or {}
            config[key] = ConfigDict()
            merge_new_config(config[key], base, base_dir)
            continue
        if isinstance(val, dict):
            if key not in config or not isinstance(config[key], dict):
                config[key] = ConfigDict()
            merge_new_config(config[key], val, base_dir)
        else:
            config[key] = val
    return config


def cfg_from_yaml_file(path: str, base_dir: str | None = None) -> ConfigDict:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    bd = base_dir or os.path.dirname(os.path.abspath(path))
    cfg = ConfigDict()
    # Extension over the reference: a TOP-LEVEL ``_base_`` inherits the
    # whole referenced config (parent-merge), so presets like
    # cfgs/finetune_modelnet_perf.yaml can override a few keys. Subtree
    # ``_base_`` keys keep the reference's load-into-subtree semantics
    # (utils/config.py:18-35) so its dataset configs parse unchanged.
    base_ref = raw.pop("_base_", None)
    if base_ref is not None:
        # resolve against the preset file's dir first, then as-given
        # (CWD-relative — the reference convention for cfgs/ refs)
        candidates = ([base_ref] if os.path.isabs(base_ref)
                      else [os.path.join(bd, base_ref), base_ref])
        bpath = next((c for c in candidates if os.path.isfile(c)),
                     candidates[0])
        cfg = ConfigDict(get_config(bpath))
    merge_new_config(cfg, raw, bd)
    return _to_config(cfg)


def get_config(path: str, base_dir: str | None = None) -> ConfigDict:
    """Load an experiment config. ``base_dir`` anchors relative ``_base_``
    paths (the reference resolves them relative to the CWD; we default to
    the config file's directory and fall back to CWD)."""
    try:
        return cfg_from_yaml_file(path, base_dir)
    except FileNotFoundError:
        return cfg_from_yaml_file(path, os.getcwd())


def save_experiment_config(cfg: ConfigDict, out_path: str) -> None:
    def plain(o):
        if isinstance(o, dict):
            return {k: plain(v) for k, v in o.items()}
        if isinstance(o, list):
            return [plain(v) for v in o]
        return o

    with open(out_path, "w") as f:
        yaml.safe_dump(plain(cfg), f, sort_keys=False)
