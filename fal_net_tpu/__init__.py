"""fal_net_tpu — a TPU-native JAX/XLA/Pallas framework for FAL-net.

Re-implementation (from scratch, TPU-first) of the capabilities of the
reference PyTorch codebase `JuanLuisGonzalez/FAL_net` ("Forget About the
LiDAR: Self-Supervised Depth Estimators with MED Probability Volumes",
NeurIPS 2020): self-supervised monocular depth estimation via Mirrored
Exponential Disparity (MED) probability volumes, with Stage-2 Mirrored
Occlusion Module (MOM) distillation.

Design notes (vs. reference):
  * NHWC layouts everywhere; convs ride the MXU in bf16/fp32.
  * The reference's O(N) `grid_sample` launch loops (FAL_netB.py:222-282)
    are replaced by vectorized shift ops and a fused Pallas kernel.
  * Data-parallel scaling via `jax.sharding.Mesh` + NamedSharding instead
    of torch.nn.DataParallel.
"""

__version__ = "0.1.0"
