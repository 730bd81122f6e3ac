"""midastouch_tpu — TPU-native tactile localization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
facebookresearch/MidasTouch (CoRL 2022): online global localization of a
DIGIT vision-based tactile sensor on a known object mesh via a Monte-Carlo
particle filter over SE(3), driven by a tactile depth network (TDN), a
tactile code network (TCN), and a precomputed tactile codebook.

Design stance (vs. the reference's CUDA/C++/torch patchwork):
  * one jit-compiled sense-update step over fixed-shape particle state
  * brute-force batched top-k / min-distance kernels instead of KD-trees
  * dense ray-cast rendering instead of OpenGL rasterization
  * masked fixed-capacity particle arrays instead of dynamic add/remove
  * `jax.sharding` + shard_map over particles for multi-chip scaling
"""

__version__ = "0.1.0"
