"""si_mamba_tpu — a TPU-native point-cloud learning framework (JAX/XLA/Pallas).

Re-implements the capabilities of SI-Mamba (Spectral Informed Mamba, CVPR 2025)
with a TPU-first design: pure-functional ops, static shapes, batched linear
algebra on-device, a Pallas selective-scan kernel, and pjit/Mesh data
parallelism. See SURVEY.md at the repo root for the reference blueprint.
"""

__version__ = "0.1.0"
