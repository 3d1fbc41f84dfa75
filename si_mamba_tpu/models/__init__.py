from si_mamba_tpu.models.layers import MambaMixer, Block, MixerModel, MixerModelAdd
from si_mamba_tpu.models.embed import PatchEncoder, PosEmbedMLP, ClsHead
from si_mamba_tpu.models.point_mamba import PointMamba, PointMambaConfig

__all__ = [
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
