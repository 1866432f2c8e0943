"""holo_diffusion_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of HoloDiffusion.

A from-scratch framework with the capabilities of facebookresearch/holo_diffusion
(CVPR 2023): unconditional 3D generative diffusion over voxel feature grids,
trained only from posed 2D images via differentiable emission-absorption volume
rendering.

Design stance (see SURVEY.md §7): pure functions + pytrees instead of the
reference's Implicitron OO registry; flax.linen modules for parameterized nets;
one jit'd SPMD train step (pool -> noise -> denoise -> render -> loss) over a
`jax.sharding.Mesh`; Pallas kernels for the hot render path; orbax checkpoints.

Data layout: channels-last (NDHWC / points-last) throughout — the idiomatic TPU
layout. The torch-weight import shim (`utils/torch_import.py`) handles layout
conversion from reference checkpoints.
"""

__version__ = "0.1.0"
