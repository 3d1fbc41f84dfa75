from si_mamba_tpu.models.layers import MambaMixer, Block, MixerModel, MixerModelAdd
from si_mamba_tpu.models.embed import PatchEncoder, PosEmbedMLP, ClsHead
from si_mamba_tpu.models.point_mamba import PointMamba, PointMambaConfig
from si_mamba_tpu.models.point_mae import PointMAEMamba, PointMAEConfig

__all__ = [
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
