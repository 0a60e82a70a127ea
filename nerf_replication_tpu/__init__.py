"""nerf_replication_tpu — TPU-native NeRF replication framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the
rkin100g/Nerf-Replication reference (PyTorch/CUDA), redesigned TPU-first:
SPMD over device meshes, one fused XLA program per render, Pallas kernels
for the hot encoder ops.
"""

__version__ = "0.1.0"
