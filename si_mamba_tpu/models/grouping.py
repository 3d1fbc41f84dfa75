"""FPS + kNN patch grouping (reference ``Group``, models/point_mamba.py:76-111)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from si_mamba_tpu.ops.pointops import fps, gather_points, group_points, knn


class Grouped(NamedTuple):
    neighborhood: jax.Array  # (B, G, M, 3) center-normalized
    center: jax.Array  # (B, G, 3)
    neighborhood_org: jax.Array  # (B, G, M, 3) absolute coords


def group_divider(pts: jax.Array, num_group: int, group_size: int,
                  start_idx: jax.Array | int = 0) -> Grouped:
    """pts: (B, N, 3) -> FPS centers + kNN neighborhoods (center-normalized)."""
    center = gather_points(pts, fps(pts, num_group, start_idx=start_idx))
    idx = knn(center, pts, group_size)
    neighborhood_org = group_points(pts, idx)
    neighborhood = neighborhood_org - center[:, :, None, :]
    return Grouped(neighborhood, center, neighborhood_org)
