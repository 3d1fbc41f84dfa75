"""Core point-cloud / spectral / SSM ops: pure, jittable, batch-first."""

from si_mamba_tpu.ops.pointops import (
    pairwise_sqdist,
    pairwise_sqdist_exact,
    pairwise_dist,
    fps,
    knn,
    gather_points,
    group_points,
)
from si_mamba_tpu.ops.graph import (
    knn_adjacency,
    rw_laplacian,
    sym_laplacian,
)
from si_mamba_tpu.ops.spectral import (
    tril_symmetrize,
    eigh_tril,
    topk_eigh,
    sort_orders_by_eigenvectors,
    multilevel_codes,
    canonicalize_eigenvector_signs,
)
from si_mamba_tpu.ops.chamfer import chamfer_l2, chamfer_l1
from si_mamba_tpu.ops.selective_scan import (
    causal_conv1d,
    selective_scan_seq,
    selective_scan_assoc,
    selective_scan,
    mamba_mixer_apply,
)

__all__ = [
    "pairwise_sqdist",
    "pairwise_sqdist_exact",
    "pairwise_dist",
    "fps",
    "knn",
    "gather_points",
    "group_points",
    "knn_adjacency",
    "rw_laplacian",
    "sym_laplacian",
    "tril_symmetrize",
    "eigh_tril",
    "topk_eigh",
    "sort_orders_by_eigenvectors",
    "multilevel_codes",
    "canonicalize_eigenvector_signs",
    "chamfer_l2",
    "chamfer_l1",
    "causal_conv1d",
    "selective_scan_seq",
    "selective_scan_assoc",
    "selective_scan",
    "mamba_mixer_apply",
]
