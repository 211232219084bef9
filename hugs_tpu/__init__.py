"""hugs_tpu — TPU-native Human Gaussian Splats framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
apple/ml-hugs (HUGS, CVPR 2024): animatable human avatars + static scenes
as 3D Gaussians, differentiably rasterized, trained from monocular video.

Design: functional core (pytrees + pure functions), jit-compiled training
step, fixed-capacity padded Gaussian sets (no recompilation on
densify/prune), Pallas kernels for the rasterizer hot path, and
`jax.sharding` meshes for multi-chip scale-out.
"""

__version__ = "0.1.0"
