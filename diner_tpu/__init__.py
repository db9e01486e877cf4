"""diner-tpu: TPU-native depth-aware image-based NeRF framework (JAX/XLA/Pallas).

A ground-up JAX re-design of the capabilities of malteprinzler/diner (CVPR 2023):
sparse-view novel-view synthesis with MVS depth priors, depth-guided ray sampling,
pixel-aligned CNN features and a view-conditioned NeRF MLP, built TPU-first:
NHWC layouts, static shapes, functional scene encodings, SPMD sharding over a
`jax.sharding.Mesh`, and Pallas kernels on the hot ray path.
"""

__version__ = "0.1.0"
