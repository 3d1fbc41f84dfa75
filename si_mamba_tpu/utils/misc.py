"""Miscellaneous utilities (reference utils/misc.py): point-cloud cropping
for MAE visualization, parameter summaries, deterministic seeding."""

from __future__ import annotations

import random
from typing import Any

import jax
import numpy as np


def separate_point_cloud(xyz: np.ndarray, num_points: int, crop: int | list,
                         fixed_points=None, padding_zeros: bool = False,
                         rng: np.random.Generator | None = None):
    """Split each cloud into (kept, cropped) halves around a random (or
    fixed) viewpoint direction (reference ``seprate_point_cloud``
    utils/misc.py:136-189, spelling corrected). Returns (input (B, N-crop, 3)
    or zero-padded (B, N, 3), crop (B, crop, 3))."""
    rng = rng or np.random.default_rng()
    B, n, c = xyz.shape
    assert n == num_points and c == 3
    input_list, crop_list = [], []
    for b in range(B):
        num_crop = int(rng.integers(crop[0], crop[1])) if isinstance(crop, list) else crop
        points = xyz[b]
        if fixed_points is None:
            center = rng.standard_normal(3)
            center /= np.linalg.norm(center) + 1e-8
        else:
            fp = fixed_points if not isinstance(fixed_points, list) else \
                fixed_points[int(rng.integers(len(fixed_points)))]
            center = np.asarray(fp, np.float32)
        d = np.linalg.norm(points - center[None, :], axis=-1)
        idx = np.argsort(d)
        if padding_zeros:
            kept = points.copy()
            kept[idx[:num_crop]] = 0.0
        else:
            kept = points[idx[num_crop:]]
        input_list.append(kept)
        crop_list.append(points[idx[:num_crop]])
    if isinstance(crop, list):
        return input_list, crop_list
    return np.stack(input_list), np.stack(crop_list)


def count_parameters(params: Any) -> int:
    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))


def parameter_table(params: Any, max_rows: int = 60) -> str:
    """Per-top-level-module parameter counts (reference summary_parameters
    utils/misc.py:257-280)."""
    rows = []

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            rows.append((prefix, int(np.prod(np.shape(tree)))))

    walk(params)
    agg: dict[str, int] = {}
    for name, cnt in rows:
        top = name.split("/")[0]
        agg[top] = agg.get(top, 0) + cnt
    lines = [f"{'module':<30} {'params':>12}"]
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:max_rows]:
        lines.append(f"{k:<30} {v:>12,}")
    lines.append(f"{'TOTAL':<30} {count_parameters(params):>12,}")
    return "\n".join(lines)


def set_global_seed(seed: int) -> jax.Array:
    """Seed numpy/python and return the root jax key (reference
    set_random_seed utils/misc.py:46-70; jax randomness is key-driven)."""
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.key(seed)
