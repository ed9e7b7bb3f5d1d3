"""autofocusformermod_tpu — a TPU-native JAX/Pallas rebuild of AutoFocusFormer-Segmentation.

Feature maps are point clouds: every feature tensor is a pair (feat: b x n x c,
pos: b x n x 2) plus a canvas spatial_shape (h, w).  All shapes are static —
token counts per stage are compile-time constants derived from the crop size,
and validity masks replace variable-n semantics of the CUDA reference
(see /root/reference/mask2former/modeling/backbone/aff.py).

Layers (bottom-up):
  ops/       gather-einsum neighborhood kernels (cluster_qk/av/wf, weighted_gather,
             msdetrpc) with Pallas fused variants
  geometry/  exact KNN, space-filling-curve balanced clustering, Shepard interpolation
  models/    AFF backbone, point-cloud pixel decoder, Mask2Former decoder, meta-archs
  losses/    Hungarian matcher + SetCriterion (point-sampled mask losses)
  parallel/  mesh/sharding utilities and the jitted train step
  engine/    optimizer/schedule/checkpointing and the training loop
"""

__version__ = "0.1.0"
