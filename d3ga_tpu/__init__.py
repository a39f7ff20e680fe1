"""d3ga_tpu — a TPU-native drivable 3D Gaussian avatar framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
facebookresearch/D3GA (Drivable 3D Gaussian Avatars): tetrahedral-cage-
embedded 3D Gaussians driven by LBS body skeletons and pose-conditioned
MLP fields, rendered with a differentiable tile-based Gaussian splat
rasterizer, trained end-to-end against multi-camera video.

Design stance (not a port):
  * functional core — pure functions over pytrees of parameters
  * the rasterizer blend is expressed as log-transmittance cumsum +
    [pixels, K] x [K, C] matmuls (MXU-friendly), not a sequential
    per-pixel CUDA loop; Pallas kernels fuse the hot path
  * parallelism via jax.sharding.Mesh + shard_map (tile/Gaussian/data
    sharding with XLA collectives), not NCCL
"""

__version__ = "0.1.0"
