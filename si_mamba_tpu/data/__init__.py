from si_mamba_tpu.data.datasets import (
    ShapeNet55,
    ModelNet,
    ModelNet40SVM,
    ScanObjectNN,
    ScanObjectNNHardest,
    ModelNetFewShot,
    build_dataset,
)
from si_mamba_tpu.data.loader import Loader

__all__ = [
    "ShapeNet55",
    "ModelNet",
    "ModelNet40SVM",
    "ScanObjectNN",
    "ScanObjectNNHardest",
    "ModelNetFewShot",
    "build_dataset",
    "Loader",
]
