from si_mamba_tpu.models.layers import MambaMixer, Block, MixerModel, MixerModelAdd
from si_mamba_tpu.models.embed import PatchEncoder, PosEmbedMLP, ClsHead
from si_mamba_tpu.models.point_mamba import PointMamba, PointMambaConfig
from si_mamba_tpu.models.point_mae import PointMAEMamba, PointMAEConfig
from si_mamba_tpu.models.segmentation import PartSegModel, PartSegConfig
from si_mamba_tpu.models.permute_policy import PermutePolicy, StochasticNeuralSortPermuter

__all__ = [
    "PartSegModel",
    "PartSegConfig",
    "PermutePolicy",
    "StochasticNeuralSortPermuter",
    "PointMAEMamba",
    "PointMAEConfig",
    "MambaMixer",
    "Block",
    "MixerModel",
    "MixerModelAdd",
    "PatchEncoder",
    "PosEmbedMLP",
    "ClsHead",
    "PointMamba",
    "PointMambaConfig",
]
